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


def test_quadratic_chemflag_blist_consistent(tmp_path):
    """quadraticflag x chemflag: blist/blank2J/ncoeff stay consistent.

    (The reference's own `_generate_b_list` crashes on this combination —
    blank2J is extended with base-width combinations before the chem
    replication, `bispectrum.py:92-116` — so the layout here is defined by
    the kernel, which computes quadratic products over the full
    chem-extended vector; see `ops/snap.py` quad+chem oracle test.)
    """
    inp = tmp_path / "qc.in"
    inp.write_text(_ta_text()
                   .replace("quadraticflag = 0", "quadraticflag = 1")
                   .replace("chemflag = 0", "chemflag = 1"))
    c = Config(str(inp), ["--overwrite"])
    sec = c.sections["BISPECTRUM"]
    ntrip = 30                       # twojmax=6 base triples (31 cols = +offset)
    w = ntrip * 1 ** 3               # single-type Ta: chem width == base
    assert sec.ncoeff == w + w * (w + 1) // 2
    assert len(sec.blist) == sec.numtypes * sec.ncoeff
    assert len(sec.blank2J) == sec.numtypes * (
        sec.ncoeff + (0 if sec.bzeroflag else 1))


def test_group_names_are_free_keys():
    """Arbitrary group names in [GROUPS] must not trip validation."""
    c = Config(str(TA_IN), ["--overwrite"])
    assert "Displaced_A15" in c.sections["GROUPS"].group_table


def test_default_section_keys_not_flagged(tmp_path):
    """configparser exposes [DEFAULT] keys through every section proxy;
    they must not be reported as unmatched section variables."""
    ok = tmp_path / "ok.in"
    ok.write_text("[DEFAULT]\nshared_flag = 1\n" + _ta_text())
    Config(str(ok), ["--overwrite"])  # must not raise


def test_extra_calc_section_gets_dedicated_error(tmp_path):
    """With calculator=LAMMPSSNAP and a stray [ACE] section present, the
    cross-section message (not a generic unmatched-variable error for the
    never-read ACE keys) must surface."""
    bad = tmp_path / "bad.in"
    bad.write_text(_ta_text() + "\n[ACE]\nranks = 1 2\n")
    with pytest.raises(ValueError, match="ACE section is in input"):
        Config(str(bad), ["--overwrite"])


def test_bad_merr_sampler_rejected_at_config_time(tmp_path):
    bad = tmp_path / "bad.in"
    bad.write_text(_ta_text().replace("solver = SVD",
                                      "solver = MERR\nmerr_sampler = nuts"))
    with pytest.raises(ValueError, match="merr_sampler"):
        Config(str(bad), ["--overwrite"])
