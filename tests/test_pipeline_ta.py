"""End-to-end golden regression: Ta_Linear_JCP2014 vs the committed standard.

Mirrors the reference's CI oracle (`tests/example_checker.py:54-66`): run the
full pipeline on the shipped example and assert max abs coefficient diff vs
`20May21_Standard/Ta_pot.snapcoeff` < 1e-6.  Our actual agreement is ~1e-13.
"""

import numpy as np
import pytest

from tests.util import REFERENCE, TA_EXAMPLE, read_snapcoeff

pytestmark = pytest.mark.skipif(not TA_EXAMPLE.exists(),
                                reason="reference examples not available")


@pytest.mark.heavy
def test_ta_linear_golden(tmp_path, monkeypatch):
    from fitsnap_tpu.fitsnap import FitSnap

    monkeypatch.chdir(tmp_path)
    fs = FitSnap(str(TA_EXAMPLE / "Ta-example.in"), arglist=["--overwrite"])
    fs.scrape_configs()
    assert len(fs.data) == 363
    fs.process_configs()
    assert fs.a.shape == (15213, 31)
    fs.perform_fit()
    std = read_snapcoeff(TA_EXAMPLE / "20May21_Standard/Ta_pot.snapcoeff")
    assert np.abs(fs.solver.fit - std).max() < 1e-6

    fs.write_output()
    out = read_snapcoeff(tmp_path / "Ta_pot.snapcoeff")
    assert np.abs(out - std).max() < 1e-6
    metrics = (tmp_path / "Ta_metrics.md").read_text()
    assert "('*ALL', 'Unweighted', 'Training', 'Energy')" in metrics
    # headline unweighted energy MAE from the committed standard
    assert "0.112787" in metrics


@pytest.mark.heavy
def test_ta_xyz_golden(tmp_path, monkeypatch):
    """Extended-XYZ scraper golden (19Nov19_Standard).  Lives in this
    file ON PURPOSE: it runs right after the JSON golden, whose bucket
    shapes match (same structures, f32-rounded), so the descriptor
    programs are already compiled in-process (was 301 s standalone,
    ~55 s here)."""
    from fitsnap_tpu.fitsnap import FitSnap

    monkeypatch.chdir(tmp_path)
    ex = REFERENCE / "examples/Ta_XYZ"
    fs = FitSnap(str(ex / "Ta-example.in"), arglist=["--overwrite"])
    fs.scrape_configs()
    fs.process_configs()
    fs.perform_fit()
    std = read_snapcoeff(ex / "19Nov19_Standard/Ta_pot.snapcoeff")
    assert np.abs(fs.solver.fit - std).max() < 1e-6
