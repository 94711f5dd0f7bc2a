"""Golden regressions for additional example variants.

- Ta_XYZ: exercises the extended-XYZ scraper end-to-end (19Nov19_Standard).
- Ta_Quadratic: quadraticflag + twojmax=8 (20May21_Standard); several
  minutes of CPU, so marked `slow` (run deliberately with
  `python -m pytest tests/ -m slow`).
"""

import pathlib

import numpy as np
import pytest

from tests.util import REFERENCE, read_snapcoeff

pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference examples not available")


def _run(example_in):
    from fitsnap_tpu.fitsnap import FitSnap

    fs = FitSnap(str(example_in), arglist=["--overwrite"])
    fs.scrape_configs()
    fs.process_configs()
    fs.perform_fit()
    return fs


def test_xyz_group_scrape_cache_roundtrip(tmp_path, monkeypatch):
    """save_group_scrape writes the per-group frame byte offsets;
    read_group_scrape reuses them and reproduces the identical scrape
    (reference xyz_scraper.py:288-376)."""
    monkeypatch.chdir(tmp_path)
    from fitsnap_tpu.config import Config
    from fitsnap_tpu.scrapers.xyz_scraper import XyzScraper

    ex = REFERENCE / "examples/Ta_XYZ"

    def scrape(extra):
        cfg = Config(str(ex / "Ta-example.in"),
                     ["--overwrite", "--keyword", "SCRAPER", *extra,
                      "--keyword", "PATH", "dataPath",
                      str(ex / "XYZ")])
        sc = XyzScraper("XYZ", cfg)
        sc.scrape_groups()
        sc.divvy_up_configs()
        return sc.scrape_configs()

    first = scrape(["save_group_scrape", str(tmp_path / "offsets.dat")])
    assert (tmp_path / "offsets.dat").exists()
    second = scrape(["read_group_scrape", str(tmp_path / "offsets.dat")])
    assert len(second) == len(first) > 0
    for a, b in zip(first, second):
        assert a["Energy"] == b["Energy"]
        np.testing.assert_array_equal(a["Positions"], b["Positions"])


@pytest.mark.heavy
def test_ta_quadratic_subset_golden(tmp_path, monkeypatch):
    """Full-flag (quadraticflag + twojmax=8, 1596 columns) golden in the
    DEFAULT tier: a deterministic every-9th-config subset of
    Ta_Quadratic_JCP2018 (all groups represented, random_sampling=0).

    Pins the weighted A-matrix through two well-conditioned functionals —
    per-column L2 norms and A^T b — against a committed standard produced
    by this repo's CPU f64 pipeline (the same code that passes the
    full-dataset 20May21_Standard golden at <1e-6; slow tier).  Raw
    subset COEFFICIENTS are deliberately not compared: the 41-config
    normal problem is ill-conditioned enough that benign f64
    reordering (e.g. device count) moves the SVD solution ~1e-4 while
    these functionals stay at ~1e-12."""
    monkeypatch.chdir(tmp_path)
    from fitsnap_tpu.fitsnap import FitSnap

    ex = REFERENCE / "examples/Ta_Quadratic_JCP2018"
    fs = FitSnap(str(ex / "Ta-example.in"), arglist=["--overwrite"])
    fs.scrape_configs()
    fs.data = fs.data[::9]
    fs.process_configs()
    aw = fs.a * fs.w[:, None]
    bw = fs.b * fs.w
    colnorm = np.linalg.norm(aw, axis=0)
    atb = aw.T @ bw
    std = np.load(pathlib.Path(__file__).parent / "data"
                  / "ta_quad_subset_atb.npz")
    # 1595 descriptor columns; the solver adds the constant-offset column
    # at solve time (bzeroflag=0 appends it to reach the 1596-wide fit)
    assert colnorm.shape == std["colnorm"].shape == (1595,)
    scale = np.abs(std["colnorm"]).max()
    assert np.abs(colnorm - std["colnorm"]).max() < 1e-8 * scale
    bscale = np.abs(std["atb"]).max()
    assert np.abs(atb - std["atb"]).max() < 1e-8 * bscale


@pytest.mark.slow
def test_ta_quadratic_golden(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    ex = REFERENCE / "examples/Ta_Quadratic_JCP2018"
    fs = _run(ex / "Ta-example.in")
    std = read_snapcoeff(ex / "20May21_Standard/Ta_pot.snapcoeff")
    assert fs.solver.fit.shape == std.shape == (1596,)
    assert np.abs(fs.solver.fit - std).max() < 1e-6


@pytest.mark.slow
def test_fe_spin_golden(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    ex = REFERENCE / "examples/Fe_Linear_NPJ2021"
    fs = _run(ex / "Fe-example.in")
    std = read_snapcoeff(ex / "20May21_Standard/Fe_pot.snapcoeff")
    assert np.abs(fs.solver.fit - std).max() < 1e-6


@pytest.mark.slow
def test_wbe_golden(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    ex = REFERENCE / "examples/WBe_PRB2019"
    fs = _run(ex / "WBe-example.in")
    std = read_snapcoeff(ex / "20May21_Standard/WBe_pot.snapcoeff")
    assert np.abs(fs.solver.fit - std).max() < 1e-6


@pytest.mark.slow
def test_inp_chemflag_golden(tmp_path, monkeypatch):
    """Explicit multi-element (chemflag/EME) full-dataset golden.

    1,894 InP configs, 2 types, wselfallflag=1, bnormflag=1, per-element
    ESHIFT, hybrid/overlay zero+zbl reference.  Verified 2026-08-17 at
    max coeff diff 1.45e-9 vs the committed 20May21_Standard (tol 1e-6).
    """
    monkeypatch.chdir(tmp_path)
    ex = REFERENCE / "examples/InP_JPCA2020"
    fs = _run(ex / "InP-example.in")
    std = read_snapcoeff(ex / "20May21_Standard/InP_pot.snapcoeff")
    assert fs.solver.fit.shape == std.shape == (482,)
    assert np.abs(fs.solver.fit - std).max() < 1e-6
