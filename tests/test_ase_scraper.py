"""ASE library-mode scraping (reference `fitsnap3lib/scrapers/ase_funcs.py`).

The `ase` package is not a dependency: `collate_data` consumes the Atoms
duck-type (cell/get_positions/get_chemical_symbols/...), so these tests
drive it with a minimal fake and verify the produced dicts feed the real
calculator via FitSnap.process_single.
"""

import numpy as np
import pytest

from tests.util import TA_EXAMPLE

pytestmark = pytest.mark.skipif(not TA_EXAMPLE.exists(),
                                reason="reference examples not available")


class FakeAtoms:
    def __init__(self, cell, positions, symbols, energy=None, forces=None):
        self.cell = np.asarray(cell, float)
        self._pos = np.asarray(positions, float)
        self._sym = list(symbols)
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
        if self._energy is None:
            raise RuntimeError("no calculator")
        return self._energy

    def get_forces(self):
        if self._forces is None:
            raise RuntimeError("no calculator")
        return self._forces

    def get_stress(self, voigt=False):
        raise RuntimeError("no calculator")


def _bcc_ta(a=3.316, jitter=0.05, seed=0):
    rng = np.random.default_rng(seed)
    base = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    reps = []
    for i in range(2):
        for j in range(2):
            for k in range(2):
                reps.append(base + [i, j, k])
    frac = np.concatenate(reps)
    cell = np.eye(3) * (2 * a)
    # slight triclinic tilt exercises the QR normalization
    cell[1, 0] = 0.3
    pos = frac @ cell + jitter * rng.standard_normal((len(frac), 3))
    f = rng.standard_normal((len(pos), 3))
    f -= f.mean(axis=0)
    return FakeAtoms(cell, pos, ["Ta"] * len(pos), energy=-11.8 * len(pos),
                     forces=f)


def test_collate_data_geometry_and_truths():
    from fitsnap_tpu.scrapers.ase_funcs import ase_scraper

    at = _bcc_ta()
    (d,) = ase_scraper([at], name="g1", group_dict={"eweight": 2.0,
                                                    "fweight": 3.0,
                                                    "vweight": 0.5})
    # LAMMPS-normal cell: upper-triangular with positive diagonal
    L = np.asarray(d["Lattice"])
    assert np.allclose(L[np.tril_indices(3, -1)], 0.0)
    assert (np.diag(L) > 0).all()
    # the rotation preserves the metric: pairwise distances unchanged
    p0, p1 = np.asarray(at.get_positions()), np.asarray(d["Positions"])
    d0 = np.linalg.norm(p0[:, None] - p0[None, :], axis=-1)
    d1 = np.linalg.norm(p1[:, None] - p1[None, :], axis=-1)
    assert np.abs(d0 - d1).max() < 1e-9
    # forces rotate with positions: norms preserved
    assert np.allclose(np.linalg.norm(d["Forces"], axis=1),
                       np.linalg.norm(at.get_forces(), axis=1))
    assert d["Energy"] == pytest.approx(-11.8 * len(at))
    assert d["Group"] == "g1" and d["eweight"] == 2.0
    assert d["NumAtoms"] == len(at)


def test_collate_data_without_calculator_defaults():
    from fitsnap_tpu.scrapers.ase_funcs import collate_data

    at = FakeAtoms(np.eye(3) * 5.0, [[0.1, 0.2, 0.3], [2.0, 2.1, 2.2]],
                   ["Ta", "Ta"])
    at.info["energy"] = -3.5
    d = collate_data(at)
    assert d["Energy"] == pytest.approx(-3.5)
    assert np.allclose(d["Forces"], 0.0)
    assert np.allclose(d["Stress"], 0.0)
    assert d["eweight"] == d["fweight"] == d["vweight"] == 1.0


def test_ase_dicts_feed_process_single():
    """The collated dict runs through the real SNAP calculator
    (reference library/ase example; lammps_base.py:101 process_single)."""
    from fitsnap_tpu.fitsnap import FitSnap
    from fitsnap_tpu.scrapers.ase_funcs import ase_scraper

    settings = {
        "BISPECTRUM": {"numTypes": 1, "twojmax": 6, "rcutfac": 4.67637,
                       "rfac0": 0.99363, "rmin0": 0.0, "wj": 1.0,
                       "radelem": 0.5, "type": "Ta", "bzeroflag": 0},
        "CALCULATOR": {"calculator": "LAMMPSSNAP", "energy": 1, "force": 1,
                       "stress": 0},
        "SOLVER": {"solver": "SVD"},
        # no SCRAPER section: ASE data is injected directly (reference
        # examples/library/ase/example1.py)
        "PATH": {"dataPath": str(TA_EXAMPLE / "JSON")},
        "OUTFILE": {"metrics": "m.md", "potential": "pot"},
        "REFERENCE": {"units": "metal", "atom_style": "atomic",
                      "pair_style": "zero 6.0", "pair_coeff": "* *"},
        "GROUPS": {"group_sections": "name training_size testing_size "
                   "eweight fweight vweight",
                   "group_types": "str float float float float float",
                   "ASE": "1.0 0.0 100 1 1e-8"},
    }
    fs = FitSnap(settings, arglist=["--overwrite"])
    data = ase_scraper([_bcc_ta(seed=1), _bcc_ta(seed=2)], name="ASE")
    a, b, w = fs.calculator.process_single(data[0])
    ncoeff = fs.calculator.get_width()
    nat = data[0]["NumAtoms"]
    assert a.shape == (1 + 3 * nat, ncoeff)
    assert np.isfinite(a).all() and np.isfinite(b).all()
