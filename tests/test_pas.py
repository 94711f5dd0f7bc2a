"""Per-atom-scalar (PAS) NN fitting and NN-on-ACE coverage.

PAS mirrors the reference's FitTorchPAS path (`lib/neural_networks/pas.py`,
`calculators/calculator.py:103-108`): the network maps per-atom descriptors
to one scalar per atom (e.g. electronegativities in the "Chis" JSON key),
with no energy contraction and no forces.  NN-on-ACE mirrors
Ta_PACE_PyTorch_NN (NN solver on ACE descriptors via dgrad contraction).
"""

import numpy as np
import pytest

from tests.util import TA_EXAMPLE

pytestmark = pytest.mark.skipif(not TA_EXAMPLE.exists(),
                                reason="reference examples not available")


def _pas_settings():
    return {
        "BISPECTRUM": {"numTypes": 1, "twojmax": 6, "rcutfac": 4.67637,
                       "rfac0": 0.99363, "rmin0": 0.0, "wj": 1.0,
                       "radelem": 0.5, "type": "Ta",
                       "wselfallflag": 0, "chemflag": 0, "bzeroflag": 0,
                       "quadraticflag": 0},
        "CALCULATOR": {"calculator": "LAMMPSSNAP", "energy": 0, "force": 0,
                       "stress": 0, "nonlinear": 1, "per_atom_scalar": 1},
        "SOLVER": {"solver": "PYTORCH"},
        "SCRAPER": {"scraper": "JSON"},
        "PATH": {"dataPath": str(TA_EXAMPLE / "JSON")},
        "OUTFILE": {"metrics": "pas_metrics.md", "potential": "pas_pot"},
        "REFERENCE": {"units": "metal", "atom_style": "atomic",
                      "pair_style": "zero 6.0",
                      "pair_coeff": "* *"},
        "PYTORCH": {"layer_sizes": "num_desc 16 16 1",
                    "learning_rate": 1.5e-3, "num_epochs": 30,
                    "batch_size": 4, "energy_weight": 1.0,
                    "force_weight": 0.0, "manual_seed_flag": 1},
        "GROUPS": {"group_sections": "name training_size testing_size "
                   "eweight fweight vweight",
                   "group_types": "str float float float float float",
                   "Displaced_BCC": "0.7 0.3 100 1 1.00E-08"},
    }


@pytest.fixture(scope="module")
def pas_fixture(tmp_path_factory):
    import os

    from fitsnap_tpu.fitsnap import FitSnap

    cwd = os.getcwd()
    os.chdir(tmp_path_factory.mktemp("pas"))
    try:
        fs = FitSnap(_pas_settings(), arglist=["--overwrite"])
        fs.scrape_configs()
        fs.data = fs.data[:8]
        rng = np.random.default_rng(7)
        # synthetic smooth per-atom target: distance-from-origin feature
        for d in fs.data:
            pos = np.asarray(d["Positions"])
            d["Chis"] = (0.3 * np.sin(pos.sum(axis=1))
                         + 0.05 * rng.standard_normal(len(pos)) + 2.0)
        fs.process_configs()
        fs.perform_fit()
        return fs
    finally:
        os.chdir(cwd)


def test_pas_training_loss_decreases(pas_fixture):
    hist = pas_fixture.solver.history
    assert len(hist) == 30
    losses = [h[1] for h in hist]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_pas_predictions_shape_and_errors(pas_fixture):
    fs = pas_fixture
    sol = fs.solver
    ds = sol.buckets[0]
    pred, f = sol.evaluate_bucket(ds)
    assert f is None
    assert pred.shape == np.asarray(ds["pas_target"]).shape
    sol.error_analysis()
    assert ("*ALL", "Training") in sol.errors.index
    # trained on a smooth target: should beat the trivial constant fit
    chis = np.concatenate([np.asarray(b["pas_target"])[np.asarray(b["real"])]
                           for b in sol.buckets])
    assert sol.errors.loc[("*ALL", "Training"), "rmse"] < chis.std()


def test_pas_excludes_energy_fitting():
    from fitsnap_tpu.config import Config

    bad = _pas_settings()
    bad["CALCULATOR"]["energy"] = 1
    with pytest.raises(ValueError):
        Config(bad, arglist=["--overwrite"])


def _ace_nn_settings():
    return {
        "ACE": {"numTypes": 1, "ranks": "1 2 3", "lmax": "1 2 2",
                "nmax": "2 1 1", "nmaxbase": 2, "rcutfac": 4.604694451,
                "lambda": 3.059235105, "type": "Ta", "bzeroflag": 1},
        "CALCULATOR": {"calculator": "LAMMPSPACE", "energy": 1, "force": 1,
                       "stress": 0, "nonlinear": 1},
        "SOLVER": {"solver": "PYTORCH"},
        "SCRAPER": {"scraper": "JSON"},
        "PATH": {"dataPath": str(TA_EXAMPLE / "JSON")},
        "OUTFILE": {"metrics": "m.md", "potential": "ta_ace_nn"},
        "REFERENCE": {"units": "metal", "atom_style": "atomic",
                      "pair_style": "zero 6.0", "pair_coeff": "* *"},
        "PYTORCH": {"layer_sizes": "num_desc 12 12 1",
                    "learning_rate": 1e-3, "num_epochs": 2,
                    "batch_size": 4, "energy_weight": 1e-2,
                    "force_weight": 1.0, "manual_seed_flag": 1},
        "GROUPS": {"group_sections": "name training_size testing_size "
                   "eweight fweight vweight",
                   "group_types": "str float float float float float",
                   "Displaced_BCC": "0.7 0.3 100 1 1.00E-08"},
    }


@pytest.fixture(scope="module")
def ace_nn_fixture(tmp_path_factory):
    """NN solver trained on ACE descriptors (reference Ta_PACE_PyTorch_NN)."""
    import os

    from fitsnap_tpu.fitsnap import FitSnap

    cwd = os.getcwd()
    os.chdir(tmp_path_factory.mktemp("ace_nn"))
    try:
        fs = FitSnap(_ace_nn_settings(), arglist=["--overwrite"])
        fs.scrape_configs()
        fs.data = fs.data[:6]
        fs.process_configs()
        fs.perform_fit()
        return fs
    finally:
        os.chdir(cwd)


def test_nn_on_ace_trains(ace_nn_fixture):
    fs = ace_nn_fixture
    assert len(fs.solver.history) == 2
    assert np.isfinite([h[1] for h in fs.solver.history]).all()
    fs.solver.error_analysis()
    assert ("*ALL", "Training") in fs.solver.errors.index


def _ace_model_eval(fs, pos, cell, types_str):
    """Energy + forces for one config through the full ACE pipeline."""
    import jax.numpy as jnp

    from fitsnap_tpu.calculators.ace import _within_rcut
    from fitsnap_tpu.ops.ace import ace_descriptors_with_jacobian
    from fitsnap_tpu.ops.neighbors import host_neighbors

    sol, calc = fs.solver, fs.calculator
    N = len(pos)
    types = np.array([calc.type_mapping[t] - 1 for t in types_str], np.int32)
    disp, jidx, mask, _ = host_neighbors(pos, cell, N, calc.cutoff)
    smask = mask & np.asarray(
        _within_rcut(jnp.asarray(disp), jnp.asarray(jidx),
                     jnp.asarray(types), calc.plan))
    B, G = ace_descriptors_with_jacobian(
        jnp.asarray(disp), jnp.asarray(types[jidx]), jnp.asarray(smask),
        jnp.asarray(types), calc.plan)
    batch = {
        "B": B[None], "G": G[None],
        "types": jnp.asarray(types)[None],
        "real": jnp.ones((1, N), bool),
        "nat": jnp.full((1,), N, jnp.int32),
        "jidx": jnp.asarray(jidx)[None],
    }
    e_per_atom, forces = sol._forward_batch(sol.params, batch)
    return float(e_per_atom[0]) * N, np.asarray(forces[0])


@pytest.mark.heavy
def test_nn_on_ace_fd_forces(ace_nn_fixture):
    """-dE/dx by central differences through the FULL ACE pipeline must
    match the model's dgrad-contraction forces (reference
    tests/test_pytorch.py test_fd_ace_single_elem)."""
    fs = ace_nn_fixture
    d = fs.data[0]
    pos = np.asarray(d["Positions"], float)
    cell = np.asarray(d["Lattice"], float)
    types_str = d["AtomTypes"]
    _, f0 = _ace_model_eval(fs, pos, cell, types_str)
    h = 1e-5
    errs = []
    for a in range(min(2, len(pos))):
        for c in range(3):
            pp = pos.copy(); pp[a, c] += h
            pm = pos.copy(); pm[a, c] -= h
            ep, _ = _ace_model_eval(fs, pp, cell, types_str)
            em, _ = _ace_model_eval(fs, pm, cell, types_str)
            fd = -(ep - em) / (2 * h)
            errs.append(abs(fd - f0[a, c]))
    errs = np.array(errs)
    # float64: far tighter than the reference CI tolerance (mean<1e-3)
    assert errs.mean() < 1e-6
    assert errs.max() < 1e-5
