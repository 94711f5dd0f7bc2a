"""Inject in-memory configurations (no files on disk) into a fit.

Reference analogs: `examples/library/custom_scrape/example.py` and
`examples/library/ase/example*.py` — both bypass the file scrapers and hand
the calculator a list of data dicts directly. `fitsnap_tpu.scrapers.ase_funcs`
accepts anything with the ASE Atoms duck-type (cell / get_positions /
get_chemical_symbols / ...), so real ASE objects work when ase is installed,
and plain shims (as here) work without it.

The demo builds perturbed-BCC Ta cells with a toy LJ labeller, fits a small
SNAP to them, and prints the grouped errors.

Run:  python inject_configs.py
"""

import numpy as np

from fitsnap_tpu.fitsnap import FitSnap
from fitsnap_tpu.scrapers.ase_funcs import ase_scraper


class Atoms:
    """Minimal ASE-Atoms duck type (positions in a periodic cell)."""

    def __init__(self, cell, positions, symbols, energy, forces,
                 stress=None):
        self.cell = np.asarray(cell, float)
        self._pos = np.asarray(positions, float)
        self._sym = list(symbols)
        self._e, self._f, self._s = energy, forces, stress
        self.info = {}

    def get_positions(self):
        return self._pos

    def get_chemical_symbols(self):
        return self._sym

    def __len__(self):
        return len(self._sym)

    def get_potential_energy(self):
        return self._e

    def get_forces(self):
        return np.asarray(self._f, float)

    def get_stress(self, voigt=True):
        if self._s is None:
            raise RuntimeError("no stress")
        return self._s


def lj(pos, cell, eps=0.04, sig=2.85, rc=6.0):
    """Toy periodic LJ labeller standing in for DFT."""
    n = len(pos)
    e = 0.0
    f = np.zeros_like(pos)
    shifts = np.array([[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
                       for k in (-1, 0, 1)], float) @ cell
    for i in range(n):
        d = pos[None, :, :] + shifts[:, None, :] - pos[i]   # (27, n, 3)
        r = np.linalg.norm(d, axis=-1)
        m = (r > 1e-9) & (r < rc)
        rr = np.where(m, r, 1.0)
        sr6 = (sig / rr) ** 6
        e += 0.5 * np.sum(np.where(m, 4 * eps * (sr6 ** 2 - sr6), 0.0))
        dedr = np.where(m, 4 * eps * (-12 * sr6 ** 2 + 6 * sr6) / rr, 0.0)
        f[i] = np.sum((dedr / rr)[..., None] * d, axis=(0, 1))
    return e, f


rng = np.random.default_rng(7)
a0 = 3.316
base = np.array([[0, 0, 0], [0.5, 0.5, 0.5]]) * a0
cell = np.eye(3) * a0 * 2
# 2x2x2 BCC supercell (16 atoms)
sup = np.concatenate([base + np.array([i, j, k]) * a0
                      for i in range(2) for j in range(2) for k in range(2)])

frames = []
for _ in range(12):
    pos = sup + rng.normal(scale=0.08, size=sup.shape)
    e, f = lj(pos, cell)
    frames.append(Atoms(cell, pos, ["Ta"] * len(pos), e, f))

settings = {
    "BISPECTRUM": {
        "numTypes": 1, "twojmax": 4, "rcutfac": 4.6, "rfac0": 0.99363,
        "rmin0": 0.0, "wj": 1.0, "radelem": 0.5, "type": "Ta",
        "bzeroflag": 1,
    },
    "CALCULATOR": {"calculator": "LAMMPSSNAP",
                   "energy": 1, "force": 1, "stress": 0},
    "SOLVER": {"solver": "SVD"},
    "SCRAPER": {"scraper": "JSON"},   # unused: data is injected below
    "OUTFILE": {"metrics": "inject_metrics.md", "potential": "inject_pot"},
    "REFERENCE": {"units": "metal", "atom_style": "atomic",
                  "pair_style": "zero 6.0", "pair_coeff": "* *"},
    "GROUPS": {
        "group_sections": "name training_size testing_size "
                          "eweight fweight vweight",
        "group_types": "str float float float float float",
        "Perturbed": "0.75 0.25 1e2 1 1e-8",
    },
}

fs = FitSnap(settings, arglist=["--overwrite"])
# ase_scraper applies the LAMMPS cell normalization + weights and returns
# ready data dicts; assign to fs.data in place of scrape_configs().
fs.data = ase_scraper(frames, name="Perturbed",
                      group_dict={"eweight": 1e2, "fweight": 1.0,
                                  "vweight": 1e-8})
for d in fs.data[-3:]:          # hold the last three out as a test set
    d["test_bool"] = 1
fs.process_configs()
fs.perform_fit()
fs.write_output()

print(fs.solver.errors.loc[("*ALL", "Unweighted")].to_string())
