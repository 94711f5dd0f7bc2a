"""VASP OUTCAR scraper tests against the shipped InP_VASP example.

Covers recursive OUTCAR discovery under group directories, the vJSON
cache round-trip, the full fit pipeline, and TRAINSHIFT energy shifts
(reference fitsnap3lib/scrapers/vasp_scraper.py + io/sections/trainshift.py).

Note: the example's `smallDefects_aa` group ships without OUTCAR files, so
these tests use `Defects_aP` (2 OUTCARs at nested depth, 11 ionic steps,
216 atoms each).
"""

import numpy as np
import pytest

from tests.util import REFERENCE

EXAMPLE = REFERENCE / "examples/InP_VASP"

pytestmark = pytest.mark.skipif(not EXAMPLE.exists(),
                                reason="reference examples not available")


def _settings(tmp_path, force=0, stress=0):
    return {
        "BISPECTRUM": {"numTypes": 2, "twojmax": "6 6", "rcutfac": 1.0,
                       "rfac0": 0.99363, "rmin0": 0.0,
                       "wj": "1.0 0.9293160905266721",
                       "radelem": "3.812045629514403 3.829453817954964",
                       "type": "In P", "wselfallflag": 1, "chemflag": 1,
                       "bnormflag": 1, "bzeroflag": 1},
        "CALCULATOR": {"calculator": "LAMMPSSNAP", "energy": 1,
                       "force": force, "stress": stress},
        "ESHIFT": {"In": -1.65967588701534, "P": 4.38159549501534},
        "SOLVER": {"solver": "SVD"},
        "SCRAPER": {"scraper": "VASP"},
        "PATH": {"dataPath": str(EXAMPLE / "VASP")},
        "OUTFILE": {"metrics": str(tmp_path / "m.md"),
                    "potential": str(tmp_path / "pot")},
        "REFERENCE": {"units": "metal", "atom_style": "atomic",
                      "pair_style": "hybrid/overlay zero 10.0 zbl 4.0 4.2",
                      "pair_coeff1": "* * zero",
                      "pair_coeff2": "1 1 zbl 49 49",
                      "pair_coeff3": "1 2 zbl 49 15",
                      "pair_coeff4": "2 2 zbl 15 15"},
        "GROUPS": {"group_sections":
                   "name training_size testing_size eweight fweight vweight",
                   "group_types": "str float float float float float",
                   "smartweights": 0, "random_sampling": 0,
                   "Defects_aP":
                   "1.0 0.0 280933.371566026 3618.73557864646 1.0e-12"},
    }


def _scrape(tmp_path, extra=None):
    from fitsnap_tpu.config import Config
    from fitsnap_tpu.scrapers.vasp_scraper import VaspScraper

    settings = _settings(tmp_path)
    if extra:
        for k, v in extra.items():
            settings.setdefault(k, {}).update(v)
    cfg = Config(settings, arglist=["--overwrite"])
    sc = VaspScraper("VASP", cfg)
    sc.scrape_groups()
    sc.divvy_up_configs()
    return sc.scrape_configs()


def test_vasp_scrape_recursive_discovery(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    data = _scrape(tmp_path)
    # 2 OUTCARs at depth group/typeN/OUTCAR: 2 + 9 ionic steps
    assert len(data) == 11
    for d in data:
        assert d["NumAtoms"] == 216
        assert len(d["AtomTypes"]) == 216
        assert d["Positions"].shape == (216, 3)
        assert d["Forces"].shape == (216, 3)
        assert np.isfinite(d["Energy"])
        assert set(d["AtomTypes"]) == {"In", "P"}


def test_vasp_json_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    first = _scrape(tmp_path)
    cached = sorted((tmp_path / "vJSON" / "Defects_aP").glob("*.json"))
    assert len(cached) == len(first)
    # second scrape must read the cache and reproduce identical data
    second = _scrape(tmp_path)
    assert len(second) == len(first)
    for a, b in zip(first, second):
        assert a["Energy"] == pytest.approx(b["Energy"], abs=1e-12)
        np.testing.assert_allclose(a["Positions"], b["Positions"],
                                   atol=1e-12)
        np.testing.assert_allclose(a["Forces"], b["Forces"], atol=1e-12)


def test_vasp_cache_dedupes_relabeled_steps(tmp_path, monkeypatch):
    """A step with BOTH 'stem_N.json' and 'stem_N_UNCONVERGED.json' on disk
    (a rerun changed the convergence label without removing the old file)
    must load once, preferring the unlabeled parse."""
    import shutil

    monkeypatch.chdir(tmp_path)
    first = _scrape(tmp_path)
    cached = sorted((tmp_path / "vJSON" / "Defects_aP").glob("*.json"))
    src = cached[0]
    shutil.copy(src, src.with_name(src.stem + "_UNCONVERGED.json"))
    second = _scrape(tmp_path)
    assert len(second) == len(first)


def test_trainshift_shifts_energy(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    base = _scrape(tmp_path, extra={"GROUPS": {"vasp_ignore_jsons": 1}})
    shifted = _scrape(tmp_path, extra={
        "GROUPS": {"vasp_ignore_jsons": 1},
        "TRAINSHIFT": {"In": 0.5, "P": -0.25}})
    for a, b in zip(base, shifted):
        n_in = sum(1 for t in a["AtomTypes"] if t == "In")
        n_p = sum(1 for t in a["AtomTypes"] if t == "P")
        expected = a["Energy"] + 0.5 * n_in - 0.25 * n_p
        assert b["Energy"] == pytest.approx(expected, rel=1e-12)


@pytest.mark.heavy
def test_vasp_full_pipeline(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from fitsnap_tpu.fitsnap import FitSnap

    # The pipeline wiring (OUTCAR scrape -> descriptors -> fit) is what this
    # test covers; physics parity for the InP chemflag descriptors lives in
    # the slow-tier golden (test_golden_variants).  twojmax 4 keeps the
    # 11x216-atom chemflag compute tractable on small CI hosts.
    settings = _settings(tmp_path)
    settings["BISPECTRUM"]["twojmax"] = "4 4"
    fs = FitSnap(settings, arglist=["--overwrite"])
    fs.scrape_configs()
    fs.data = fs.data[:3]     # wiring test: 3 of the 11 216-atom steps
    fs.process_configs()
    fs.perform_fit()
    fit = np.asarray(fs.solver.fit)
    assert fit.ndim == 1 and np.isfinite(fit).all()
