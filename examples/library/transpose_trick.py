"""Transpose-trick fitting: accumulate A^T A / A^T b instead of A.

The reference does this with mpi4py Allreduce over per-rank partial normal
equations (`examples/library/transpose_trick/example.py`). Here the same
reduction is what the TPU path does natively: `fitsnap_tpu.parallel.fit`
shards configs over the device mesh and `psum`s the normal equations across
chips, so "the transpose trick" is simply the default multi-chip fit.

This script shows both:
  1. the host loop (`process_single` per config, numpy accumulation) —
     byte-compatible with the reference workflow, never materializes A;
  2. the device path (`NormalSolver` via solver=TPUSVD), which jit-compiles
     the accumulation and runs it sharded.

Run:  python transpose_trick.py [--data .../Ta_Linear_JCP2014/JSON]
"""

import argparse
import os

import numpy as np

from fitsnap_tpu.fitsnap import FitSnap

EXAMPLES = os.environ.get("FITSNAP_EXAMPLES", "/root/reference/examples")

parser = argparse.ArgumentParser()
parser.add_argument("--data", default=f"{EXAMPLES}/Ta_Linear_JCP2014/JSON")
parser.add_argument("--groups", nargs="*",
                    default=["Displaced_A15", "Volume_BCC"])
parser.add_argument("--twojmax", type=int, default=6)
parser.add_argument("--ridge-alpha", type=float, default=0.0)
cli = parser.parse_args()

settings = {
    "BISPECTRUM": {
        "numTypes": 1, "twojmax": cli.twojmax, "rcutfac": 4.67637, "rfac0": 0.99363,
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
        **{g: "1.0 0.0 100 1 1e-8" for g in cli.groups},
    },
}

fs = FitSnap(settings, arglist=["--overwrite"])
fs.scrape_configs()

# --- 1. host loop: one config at a time, O(width^2) memory -----------------
width = fs.calculator.get_width()
c = np.zeros((width, width))
d = np.zeros(width)
for i, configuration in enumerate(fs.data):
    a, b, w = fs.calculator.process_single(configuration)
    aw, bw = w[:, np.newaxis] * a, w * b
    c += aw.T @ aw
    d += aw.T @ bw
if cli.ridge_alpha:
    c += cli.ridge_alpha * np.eye(width)
coeffs_host = np.linalg.lstsq(c, d, rcond=1e-13)[0]

# --- 2. device path: same reduction, jitted + mesh-sharded ------------------
fs.config.sections["SOLVER"].solver = "TPUSVD"
from fitsnap_tpu.fitsnap import _solver_factory
fs.solver = _solver_factory(fs.config)
fs.process_configs()
fs.perform_fit()
coeffs_dev = np.asarray(fs.solver.fit).ravel()

print(f"width={width}, configs={len(fs.data)}")
print("max |host - device| coefficient diff:",
      float(np.max(np.abs(coeffs_host - coeffs_dev))))

# Write LAMMPS-ready potential files from the host-loop fit.
fs.solver.fit = coeffs_host
fs.solver.error_analysis(fs.a, fs.b, fs.w, fs.fs_dict)
fs.write_output()
