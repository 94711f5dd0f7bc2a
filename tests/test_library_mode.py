"""Library-mode API parity (reference examples/library/*).

- dict-settings construction + per-config (a, b, w) extraction
  (basic_examples/example2.py)
- hyperparameter loop: mutate config sections between fits, reprocess,
  refit (loop_over_fits/example1.py) — the calculator refreshes its kernel
  plan when section hyperparameters change.
"""

import numpy as np
import pytest

from tests.util import REFERENCE

pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference examples not available")


def _settings(rcutfac=4.67637, twojmax=6):
    return {
        "BISPECTRUM": {
            "numTypes": 1, "twojmax": twojmax, "rcutfac": rcutfac,
            "rfac0": 0.99363, "rmin0": 0.0, "wj": 1.0, "radelem": 0.5,
            "type": "Ta", "wselfallflag": 0, "chemflag": 0,
            "bzeroflag": 0, "quadraticflag": 0,
        },
        "CALCULATOR": {
            "calculator": "LAMMPSSNAP", "energy": 1, "force": 1,
            "stress": 1,
        },
        "ESHIFT": {"Ta": 0.0},
        "SOLVER": {"solver": "SVD"},
        "SCRAPER": {"scraper": "JSON"},
        "PATH": {
            "dataPath": str(REFERENCE / "examples/Ta_Linear_JCP2014/JSON")},
        "OUTFILE": {"metrics": "md.md", "potential": "pot"},
        "REFERENCE": {
            "units": "metal", "atom_style": "atomic",
            "pair_style": "hybrid/overlay zero 10.0 zbl 4.0 4.8",
            "pair_coeff1": "* * zero", "pair_coeff2": "* * zbl 73 73",
        },
        "GROUPS": {
            "group_sections": "name training_size testing_size eweight "
                              "fweight vweight",
            "group_types": "str float float float float float",
            "smartweights": 0, "random_sampling": 0,
            "Volume_BCC": "1.0 0.0 1.e-2 1.e-2 1.e-2",
        },
        "MEMORY": {}, "EXTRAS": {},
    }


def test_dict_settings_and_process_single(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from fitsnap_tpu.fitsnap import FitSnap

    fs = FitSnap(_settings(), arglist=["--overwrite"])
    data = fs.scrape_configs()
    assert len(data) > 0
    a, b, w = fs.calculator.process_single(data[0])
    na = data[0]["NumAtoms"]
    width = fs.calculator.get_width()
    assert a.shape == (1 + 3 * na + 6, width)
    assert b.shape == (1 + 3 * na + 6,)
    assert np.isfinite(a).all()


@pytest.mark.heavy
def test_loop_over_fits_hyperparam_mutation(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from fitsnap_tpu.fitsnap import FitSnap

    # twojmax 4: this test checks the mutation API plumbing (plans refresh,
    # weights reapply), not descriptor physics — the smaller kernel cuts the
    # two unavoidable recompiles (rcutfac change => new shapes) ~4x
    fs = FitSnap(_settings(twojmax=4), arglist=["--overwrite"])
    fs.scrape_configs()
    fs.process_configs(delete_data=False)
    fs.perform_fit()
    fit1 = np.array(fs.solver.fit)

    # mutate descriptor hyperparams + group weights, then reprocess/refit
    # (reference loop_over_fits: sections are edited in place)
    bs = fs.config.sections["BISPECTRUM"]
    bs.rcutfac = 3.9
    bs._generate_b_list()
    for g in fs.config.sections["GROUPS"].group_table.values():
        for k in g:
            if "weight" in k:
                g[k] = float(g[k]) * 2.0
    fs.scrape_configs()       # weights applied at scrape time
    fs.process_configs(delete_data=False)
    fs.perform_fit()
    fit2 = np.array(fs.solver.fit)
    assert fit1.shape == fit2.shape
    assert np.abs(fit1 - fit2).max() > 1e-8  # hyperparams took effect
    assert np.isfinite(fit2).all()
