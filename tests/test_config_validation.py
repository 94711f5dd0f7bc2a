"""Input-validation parity: unknown sections/keys and cross-section picks.

Reference behavior: per-section allowed-key validation
(`fitsnap3lib/io/sections/sections.py:44-50`) and solver/calculator
section-selection asserts (`sections.py:93-96`, `bispectrum.py:16`,
`solver_sections/ridge.py:11`).  Here the allowed-key set is derived from
what each section actually reads (`config._Reader`).
"""

import glob
import os

import pytest

from fitsnap_tpu.config import Config
from tests.util import REFERENCE

TA_IN = REFERENCE / "examples/Ta_Linear_JCP2014/Ta-example.in"

pytestmark = pytest.mark.skipif(not TA_IN.exists(),
                                reason="reference examples not available")


def _ta_text():
    return TA_IN.read_text()


def test_all_reference_examples_parse():
    """Every shipped input script must pass validation unchanged."""
    ins = glob.glob(str(REFERENCE / "examples/*/*.in"))
    assert len(ins) >= 15
    for p in ins:
        if "Standard" in p or "_Ver" in p:
            continue
        Config(p, ["--overwrite"])


def test_unknown_key_rejected(tmp_path):
    bad = tmp_path / "bad.in"
    bad.write_text(_ta_text().replace("twojmax", "twojmaxx"))
    with pytest.raises(ValueError, match="unmatched variable in BISPECTRUM"):
        Config(str(bad), ["--overwrite"])


def test_unknown_solver_key_rejected(tmp_path):
    bad = tmp_path / "bad.in"
    bad.write_text(_ta_text().replace("solver = SVD", "solver = SVD\nsvd_rcnod = 1"))
    with pytest.raises(ValueError, match="unmatched variable in SOLVER"):
        Config(str(bad), ["--overwrite"])


def test_unknown_section_rejected(tmp_path):
    bad = tmp_path / "bad.in"
    bad.write_text(_ta_text() + "\n[BISPECTRVM]\nfoo = 1\n")
    with pytest.raises(ValueError, match=r"Unknown section \[BISPECTRVM\]"):
        Config(str(bad), ["--overwrite"])


def test_solver_section_requires_matching_solver(tmp_path):
    bad = tmp_path / "bad.in"
    bad.write_text(_ta_text() + "\n[RIDGE]\nalpha = 1e-4\n")
    with pytest.raises(ValueError, match="RIDGE section is in input"):
        Config(str(bad), ["--overwrite"])


def test_calculator_section_mismatch(tmp_path):
    bad = tmp_path / "bad.in"
    bad.write_text(_ta_text().replace("calculator = LAMMPSSNAP",
                                      "calculator = LAMMPSPACE"))
    with pytest.raises(ValueError, match="BISPECTRUM section is in input"):
        Config(str(bad), ["--overwrite"])


def test_quadratic_chemflag_rejected_at_config_time(tmp_path):
    bad = tmp_path / "bad.in"
    bad.write_text(_ta_text()
                   .replace("quadraticflag = 0", "quadraticflag = 1")
                   .replace("chemflag = 0", "chemflag = 1"))
    with pytest.raises(ValueError, match="[Qq]uadratic chemsnap"):
        Config(str(bad), ["--overwrite"])


def test_group_names_are_free_keys():
    """Arbitrary group names in [GROUPS] must not trip validation."""
    c = Config(str(TA_IN), ["--overwrite"])
    assert "Displaced_A15" in c.sections["GROUPS"].group_table
