"""Manual data injection: build FitSNAP data dicts yourself, then fit.

Mirrors the reference's `examples/library/custom_scrape/example.py`: no
scraper runs at all — the user constructs the per-config dicts (positions,
cell, truths, weights, train/test split) and hands them straight to
`process_configs`.  Useful when configurations come from a database, an MD
loop, or any format without a scraper.

Run:  python custom_scrape.py [--frames N] [--test-fraction F]
"""

import argparse
import os
import random

import numpy as np

from fitsnap_tpu.fitsnap import FitSnap
from fitsnap_tpu.scrapers.ase_funcs import get_apre
from fitsnap_tpu.scrapers.xyz_scraper import read_xyz_frames

EXAMPLES = os.environ.get("FITSNAP_EXAMPLES", "/root/reference/examples")
XYZ = f"{EXAMPLES}/Ta_XYZ/XYZ/Displaced_BCC.xyz"

parser = argparse.ArgumentParser()
parser.add_argument("--frames", type=int, default=4)
parser.add_argument("--test-fraction", type=float, default=0.25)
parser.add_argument("--xyz", default=XYZ)
cli = parser.parse_args()

settings = {
    "BISPECTRUM": {
        "numTypes": 1, "twojmax": 6, "rcutfac": 4.67637, "rfac0": 0.99363,
        "rmin0": 0.0, "wj": 1.0, "radelem": 0.5, "type": "Ta",
        "wselfallflag": 0, "chemflag": 0, "bzeroflag": 0,
        "quadraticflag": 0,
    },
    "CALCULATOR": {"calculator": "LAMMPSSNAP", "energy": 1, "force": 1,
                   "stress": 0},
    "SOLVER": {"solver": "SVD"},
    "OUTFILE": {"metrics": "custom_metrics.md", "potential": "custom_pot"},
    "REFERENCE": {"units": "metal", "atom_style": "atomic",
                  "pair_style": "zero 6.0", "pair_coeff": "* *"},
}


def collate_data(cell, positions, symbols, energy, forces, test_bool):
    """One configuration -> FitSNAP data dict (the reference example's
    `collate_data`, `custom_scrape/example.py:21-58`): normalize the cell
    to the LAMMPS-triangular frame, rotate positions with it, and inject
    truths, weights, and the train/test flag by hand."""
    apre = get_apre(cell)
    R = np.dot(np.linalg.inv(cell), apre)
    n = len(positions)
    data = {}
    data["Group"] = "custom"
    data["File"] = None
    data["Positions"] = np.matmul(positions, R)
    data["Energy"] = energy
    data["AtomTypes"] = symbols
    data["NumAtoms"] = n
    data["Forces"] = np.asarray(forces) @ R
    data["QMLattice"] = apre.T
    data["Lattice"] = apre.T
    data["test_bool"] = test_bool
    data["Rotation"] = np.eye(3)
    data["Translation"] = np.zeros((n, 3))
    data["eweight"] = 1.0
    data["fweight"] = 1.0
    data["vweight"] = 1.0
    return data


fs = FitSnap(settings, arglist=["--overwrite"])

random.seed(13)
data = []
for fr in read_xyz_frames(cli.xyz, limit=cli.frames):
    test = int(random.random() < cli.test_fraction)
    data.append(collate_data(fr["Lattice"], fr["Positions"],
                             fr["AtomTypes"], fr["Energy"], fr["Forces"],
                             test))
ntest = sum(d["test_bool"] for d in data)
print(f"Injecting {len(data)} configurations ({ntest} testing)")

fs.process_configs(data=data)
fs.perform_fit()
fs.write_output()
print("fit coefficients:", np.asarray(fs.solver.fit)[:4], "...")
print(fs.solver.errors)
