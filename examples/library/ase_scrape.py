"""ASE-frames library workflow: frames -> `ase_scraper` -> descriptors -> fit.

Mirrors the reference's `examples/library/ase/example1.py`: read a
trajectory, convert each ASE Atoms into a FitSNAP data dict with
`ase_scraper`, then run the normal process/fit pipeline.  `ase` itself is
an optional dependency here — `collate_data` consumes the Atoms duck-type
(cell / get_positions / get_chemical_symbols / ...), so when `ase` is not
installed this script parses the same extended-XYZ file with the built-in
scraper's reader and wraps the frames in a minimal Atoms-like shim.

Run:  python ase_scrape.py [--frames N]
"""

import argparse
import os

import numpy as np

from fitsnap_tpu.fitsnap import FitSnap
from fitsnap_tpu.scrapers.ase_funcs import ase_scraper

EXAMPLES = os.environ.get("FITSNAP_EXAMPLES", "/root/reference/examples")
XYZ = f"{EXAMPLES}/Ta_XYZ/XYZ/Displaced_BCC.xyz"

parser = argparse.ArgumentParser()
parser.add_argument("--frames", type=int, default=3)
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
                   "stress": 1},
    "REFERENCE": {"units": "metal", "atom_style": "atomic",
                  "pair_style": "zero 6.0", "pair_coeff": "* *"},
}


class _Frame:
    """Minimal ASE-Atoms duck-type over parsed extended-XYZ fields."""

    def __init__(self, cell, positions, symbols, energy, forces):
        self.cell = cell
        self._pos = positions
        self._sym = symbols
        self._energy = energy
        self._forces = forces
        self.info = {}

    def __len__(self):
        return len(self._pos)

    def get_positions(self):
        return self._pos

    def get_chemical_symbols(self):
        return self._sym

    def get_potential_energy(self):
        return self._energy

    def get_forces(self):
        return self._forces

    def get_stress(self, voigt=False):
        raise RuntimeError("no stress in this trajectory")


def read_frames(path, limit):
    """ASE's `read(path, ":")` when available, else the built-in
    extended-XYZ reader wrapped in the Atoms duck-type."""
    try:
        from ase.io import read
        return read(path, f":{limit}")
    except ModuleNotFoundError:
        from fitsnap_tpu.scrapers.xyz_scraper import read_xyz_frames
        frames = []
        for fr in read_xyz_frames(path, limit=limit):
            frames.append(_Frame(fr["Lattice"], fr["Positions"],
                                 fr["AtomTypes"], fr["Energy"],
                                 fr["Forces"]))
        return frames


print("Making instance")
fs = FitSnap(settings, arglist=["--overwrite"])

print("Reading frames")
frames = read_frames(cli.xyz, cli.frames)

# Scrape ASE frames into fitsnap data structures.
data = ase_scraper(frames)
print(f"Found {len(data)} configurations")

# Descriptors for all configs, then a fit on the assembled A-matrix.
fs.process_configs(data=data)
fs.perform_fit()
print("fit coefficients:", np.asarray(fs.solver.fit)[:4], "...")
errors = fs.solver.errors
print(errors)
