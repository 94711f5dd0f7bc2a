"""Hyperparameter loop: scrape once, refit many times with mutated settings.

Reference analog: `examples/library/loop_over_fits/example.py` — there each
loop re-drives LAMMPS to recompute descriptors. Here mutating the
[BISPECTRUM] section between fits triggers the calculator's fingerprint
refresh (`calculators/snap.py:_maybe_refresh`), which rebuilds the kernel
plan; XLA's compilation cache keeps previously-seen (twojmax, shape-bucket)
programs warm, so sweeps recompile only what actually changed.

Run:  python loop_over_fits.py [--data .../Ta_Linear_JCP2014/JSON]
"""

import argparse
import os

from fitsnap_tpu.fitsnap import FitSnap

EXAMPLES = os.environ.get("FITSNAP_EXAMPLES", "/root/reference/examples")

parser = argparse.ArgumentParser()
parser.add_argument("--data", default=f"{EXAMPLES}/Ta_Linear_JCP2014/JSON")
parser.add_argument("--groups", nargs="*", default=["Displaced_A15"])
parser.add_argument("--twojmax", nargs="*", type=int, default=[4, 6, 8])
cli = parser.parse_args()

settings = {
    "BISPECTRUM": {
        "numTypes": 1, "twojmax": 6, "rcutfac": 4.67637, "rfac0": 0.99363,
        "rmin0": 0.0, "wj": 1.0, "radelem": 0.5, "type": "Ta",
        "bzeroflag": 0,
    },
    "CALCULATOR": {"calculator": "LAMMPSSNAP",
                   "energy": 1, "force": 1, "stress": 1},
    "SOLVER": {"solver": "SVD"},
    "SCRAPER": {"scraper": "JSON"},
    "PATH": {"dataPath": cli.data},
    "OUTFILE": {"metrics": "Ta_metrics.md", "potential": "Ta_pot"},
    "REFERENCE": {
        "units": "metal", "atom_style": "atomic",
        "pair_style": "hybrid/overlay zero 10.0 zbl 4.0 4.8",
        "pair_coeff1": "* * zero", "pair_coeff2": "* * zbl 73 73",
    },
    "GROUPS": {
        "group_sections": "name training_size testing_size "
                          "eweight fweight vweight",
        "group_types": "str float float float float float",
        **{g: "0.7 0.3 100 1 1e-8" for g in cli.groups},
    },
}

fs = FitSnap(settings, arglist=["--overwrite"])
fs.scrape_configs()            # configs are reused across the whole sweep

bs = fs.config.sections["BISPECTRUM"]
for tjm in cli.twojmax:
    # mutate the section in place, then rebuild the descriptor index lists;
    # the calculator notices the fingerprint change and rebuilds its plan
    bs.twojmax = [tjm]
    bs._generate_b_list()
    fs.process_configs()
    fs.perform_fit()
    err = fs.solver.errors.loc[("*ALL", "Unweighted")]
    print(f"twojmax={tjm}: width={fs.a.shape[1]:4d}  "
          f"train force MAE={err.loc[('Training', 'Force'), 'mae']:.5f}  "
          f"test force MAE={err.loc[('Testing', 'Force'), 'mae']:.5f}")
