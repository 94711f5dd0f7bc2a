"""Post-processing tools coverage (reference `fitsnap3lib/tools/`)."""

import numpy as np
import pandas as pd
import pytest

from tests.util import TA_EXAMPLE

pytestmark = pytest.mark.skipif(not TA_EXAMPLE.exists(),
                                reason="reference examples not available")


def test_group_tools_table_and_validation():
    from fitsnap_tpu.tools.group_tools import assign_validation, make_table

    table = make_table({
        "group_sections": ["name", "training_size", "testing_size",
                           "eweight", "fweight", "vweight"],
        "A": ["A", 0.7, 0.3, 1.0, 1.0, 1e-8],
    })
    assert table["A"]["training_size"] == 0.7
    gt = {"A": {"nconfigs": 10, "testing_size": 0.3}}
    assign_validation(gt)
    assert len(gt["A"]["test_bools"]) == 10
    assert sum(gt["A"]["test_bools"]) == 2  # tail split: i > ntrain


def test_dataframe_tools_errors(tmp_path):
    from fitsnap_tpu.tools.dataframe_tools import DataframeTools

    df = pd.DataFrame({
        "truths": [1.0, 2.0, 0.5, -0.5, 1.5, 2.5],
        "preds": [1.1, 2.1, 0.7, -0.4, 1.5, 2.0],
        "weights": [1.0] * 6,
        "Row_Type": ["Energy", "Energy", "Force", "Force", "Force",
                     "Energy"],
        "Groups": ["g1", "g1", "g1", "g1", "g1", "g2"],
        "Testing": [False, False, False, False, True, True],
    })
    p = tmp_path / "FitSNAP.df"
    df.to_pickle(p)
    dt = DataframeTools(str(p))
    assert dt.calc_error("Energy", "Training") == pytest.approx(0.1)
    assert dt.calc_error("Force", "Training") == pytest.approx(0.15)
    assert dt.calc_error("Energy", "Testing") == pytest.approx(0.5)
    assert dt.calc_error("Force", "Testing", metric="rmse") == \
        pytest.approx(0.0)
    fig = dt.plot_agreement("Energy", "Training", mode="Linear",
                            fname=str(tmp_path / "agree.png"))
    assert (tmp_path / "agree.png").exists()
    dt.plot_agreement("Force", "Training", mode="Distribution",
                      fname=str(tmp_path / "dist.png"))
    assert (tmp_path / "dist.png").exists()
    with pytest.raises(ValueError, match="mode"):
        dt.plot_agreement("Force", "Training", mode="Scatter")


def test_dataframe_tools_peratom_and_tsne(tmp_path):
    from fitsnap_tpu.tools.dataframe_tools import DataframeTools

    # config 1: 1 atom (3 force rows), config 2: 2 atoms (6 force rows)
    rng = np.random.default_rng(0)
    n = 11
    df = pd.DataFrame({
        "d0": rng.normal(size=n),
        "d1": rng.normal(size=n),
        "truths": [1.0] + [0.1] * 3 + [2.0] + [0.2] * 6,
        "preds": [1.5] + [0.1] * 3 + [2.5] + [0.2] * 6,
        "weights": [1.0] * n,
        "Row_Type": ["Energy"] + ["Force"] * 3 + ["Energy"] + ["Force"] * 6,
        "Groups": ["g1"] * 4 + ["g2"] * 7,
        "Testing": [False] * n,
    })
    dt = DataframeTools(df)
    assert list(dt.natoms_per_config()) == [1, 2]
    # per-atom errors: mean(|0.5|, |0.5|) = 0.5
    assert dt.calc_error("Energy", "Training") == pytest.approx(0.5)
    # total-energy errors: mean(|0.5*1|, |0.5*2|) = 0.75
    assert dt.calc_error("Energy", "Training", peratom=False) == \
        pytest.approx(0.75)
    emb = dt.plot_tsne(2, perplexity=3.0, fname=str(tmp_path / "tsne.png"))
    assert emb.shape == (n, 2)
    assert (tmp_path / "tsne.png").exists()


def test_dataframe_tools_peratom_false_requires_force_rows():
    """Energy-only fits have no Force rows to recover atom counts from;
    peratom=False must fail loudly instead of returning a zeroed error."""
    from fitsnap_tpu.tools.dataframe_tools import DataframeTools

    df = pd.DataFrame({
        "d0": [0.1, 0.2],
        "truths": [1.0, 2.0],
        "preds": [1.5, 2.5],
        "weights": [1.0, 1.0],
        "Row_Type": ["Energy", "Energy"],
        "Groups": ["g1", "g1"],
        "Testing": [False, False],
    })
    dt = DataframeTools(df)
    # per-atom view still works
    assert dt.calc_error("Energy", "Training") == pytest.approx(0.5)
    with pytest.raises(ValueError, match="Force rows"):
        dt.calc_error("Energy", "Training", peratom=False)


def test_nn_tools_errors(tmp_path):
    from fitsnap_tpu.tools.nn_tools import NNTools

    pc = tmp_path / "perconfig.dat"
    pc.write_text(
        "Filename Group Natoms Energy_Truth Energy_Pred Testing_Bool\n"
        "f1 g 2 1.0 1.2 0\n"
        "f2 g 2 2.0 2.1 1\n")
    pa = tmp_path / "peratom.dat"
    pa.write_text(
        "Filename Group AtomID Type Fx_Truth Fy_Truth Fz_Truth "
        "Fx_Pred Fy_Pred Fz_Pred Testing_Bool\n"
        "f1 g 0 1 0.1 0.2 0.3 0.1 0.2 0.4 0\n"
        "f2 g 0 1 0.0 0.0 0.0 0.1 0.0 0.0 1\n")
    nt = NNTools(peratom_file=str(pa), perconfig_file=str(pc))
    e = nt.calc_errors("Energy")
    assert e["train"]["mae"] == pytest.approx(0.2)
    assert e["test"]["mae"] == pytest.approx(0.1)
    f = nt.calc_errors("Force")
    assert f["train"]["mae"] == pytest.approx(0.1 / 3)
    assert f["test"]["mae"] == pytest.approx(0.1 / 3)


@pytest.mark.heavy
def test_fd_harness(tmp_path, monkeypatch):
    """TestTools.finite_difference on a tiny NN fit (reference
    tools/test_tools.py usage pattern)."""
    monkeypatch.chdir(tmp_path)
    from fitsnap_tpu.tools.test_tools import TestTools

    tt = TestTools(str(TA_EXAMPLE.parent / "Ta_PyTorch_NN" /
                       "Ta-example.in"))
    mean_err, max_err, details = tt.finite_difference(
        "Displaced_BCC", config_index=0, max_atoms=2)
    assert mean_err < 1e-5
    assert max_err < 1e-4


def test_vasp2json_roundtrip(tmp_path):
    """OUTCAR -> FitSNAP JSON; output parses under the scraper convention."""
    import glob
    import json

    from fitsnap_tpu.tools.vasp2json import outcar_to_json

    outs = sorted(glob.glob(
        "/root/reference/examples/InP_VASP/VASP/Defects_aP/*/OUTCAR"))
    if not outs:
        import pytest
        pytest.skip("reference OUTCARs not available")
    docs = outcar_to_json(outs[0], str(tmp_path / "cfg_"))
    assert len(docs) >= 1
    fn = sorted(tmp_path.glob("cfg_*.json"))[0]
    with open(fn) as f:
        if f.readline().lstrip().startswith("{"):
            f.seek(0)
        d = json.load(f)
    dd = d["Dataset"]["Data"][0]
    assert {"Positions", "Forces", "Lattice", "Energy",
            "AtomTypes", "NumAtoms"} <= set(dd)
    assert len(dd["Positions"]) == dd["NumAtoms"]


def test_config_convert_roundtrip(tmp_path):
    from fitsnap_tpu.tools.config_convert import (input_to_settings_dict,
                                                  settings_dict_to_input)

    src = "/root/reference/examples/Ta_Linear_JCP2014/Ta-example.in"
    s = input_to_settings_dict(src)
    out = tmp_path / "rt.in"
    settings_dict_to_input(s, str(out))
    assert input_to_settings_dict(str(out)) == s
    assert "BISPECTRUM" in s and "twojmax" in s["BISPECTRUM"]
