"""Minimal library-mode fit: dict settings -> scrape -> descriptors -> fit.

The four-call pipeline mirrors the reference library API
(`fitsnap3lib/fitsnap.py:43`, `examples/library/basic_examples/example1.py`),
but every stage here runs through jitted TPU kernels: descriptors are one
batched XLA program per shape bucket, and the solve is a dense least squares
on device.

Run:  python basic.py [--data /path/to/Ta_Linear_JCP2014/JSON]
"""

import argparse
import os

from fitsnap_tpu.fitsnap import FitSnap

EXAMPLES = os.environ.get("FITSNAP_EXAMPLES", "/root/reference/examples")

parser = argparse.ArgumentParser()
parser.add_argument("--data", default=f"{EXAMPLES}/Ta_Linear_JCP2014/JSON")
parser.add_argument("--groups", nargs="*",
                    default=["Displaced_A15", "Displaced_BCC", "Volume_BCC"])
cli = parser.parse_args()

settings = {
    "BISPECTRUM": {
        "numTypes": 1, "twojmax": 6, "rcutfac": 4.67637, "rfac0": 0.99363,
        "rmin0": 0.0, "wj": 1.0, "radelem": 0.5, "type": "Ta",
        "bzeroflag": 0,
    },
    "CALCULATOR": {"calculator": "LAMMPSSNAP",
                   "energy": 1, "force": 1, "stress": 1},
    "ESHIFT": {"Ta": 0.0},
    "SOLVER": {"solver": "SVD", "compute_testerrs": 1, "detailed_errors": 1},
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
        **{g: "0.8 0.2 100 1 1e-8" for g in cli.groups},
    },
}

fs = FitSnap(settings, arglist=["--overwrite"])
fs.scrape_configs()       # group tables -> list of config dicts
fs.process_configs()      # batched TPU descriptor kernels -> (A, b, w)
fs.perform_fit()          # least squares + grouped error analysis
fs.write_output()         # .snapcoeff / .snapparam / metrics table

print(f"\nA matrix: {fs.a.shape}, timings: "
      f"{ {k: round(v, 2) for k, v in fs.timings.items()} }")
print(fs.solver.errors.loc[("*ALL", "Unweighted")].to_string())
