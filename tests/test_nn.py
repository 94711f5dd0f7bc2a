"""NN solver tests: finite-difference force consistency + training smoke.

Mirrors the reference's FD oracle (`tests/test_pytorch.py:21-114`): displace
an atom by ±h, recompute per-atom energies through the WHOLE pipeline
(neighbors + descriptors + network), and compare -dE/dx against the model
force from the dgrad contraction.  Reference tolerance: mean err < 1e-3,
max < 0.1; ours is float64 so we assert much tighter.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.util import TA_EXAMPLE

pytestmark = pytest.mark.skipif(not TA_EXAMPLE.exists(),
                                reason="reference examples not available")


@pytest.fixture(scope="module")
def nn_fixture():
    from fitsnap_tpu.fitsnap import FitSnap

    fs = FitSnap(str(TA_EXAMPLE.parent / "Ta_PyTorch_NN" / "Ta-example.in"),
                 arglist=["--overwrite"])
    fs.scrape_configs()
    # small deterministic subset
    data = [d for d in fs.data if d["Group"] == "Displaced_BCC"][:6]
    fs.config.sections["PYTORCH"].num_epochs = 2
    fs.config.sections["PYTORCH"].manual_seed_flag = 1
    fs.solver.prepare_dataset(fs.calculator, data)
    fs.solver.perform_fit(calculator=fs.calculator, data=data)
    return fs, data


def _model_eval(fs, pos, cell, types_str):
    """Energy + forces for one config through the full pipeline."""
    from fitsnap_tpu.ops.neighbors import host_neighbors
    from fitsnap_tpu.ops.snap import descriptors_with_jacobian

    sol = fs.solver
    calc = fs.calculator
    N = len(pos)
    types = np.array([calc.type_mapping[t] - 1 for t in types_str], np.int32)
    disp, jidx, mask, kmax = host_neighbors(pos, cell, N, calc.cutoff)
    params_snap = calc.params
    radelem = np.asarray(params_snap.radelem)
    rcutij = (radelem[types][:, None] + radelem[types[jidx]]) \
        * params_snap.rcutfac
    smask = mask & ((disp ** 2).sum(-1) < rcutij ** 2)
    B, G = descriptors_with_jacobian(
        jnp.asarray(disp), jnp.asarray(types[jidx]), jnp.asarray(smask),
        jnp.asarray(types), params_snap)
    batch = {
        "B": B[None], "G": G[None],
        "types": jnp.zeros((1, N), jnp.int32),
        "real": jnp.ones((1, N), bool),
        "nat": jnp.full((1,), N, jnp.int32),
        "jidx": jnp.asarray(jidx)[None],
    }
    e_per_atom, forces = sol._forward_batch(sol.params, batch)
    return float(e_per_atom[0]) * N, np.asarray(forces[0])


def test_nn_fd_forces(nn_fixture):
    fs, data = nn_fixture
    d = data[0]
    pos = np.asarray(d["Positions"], float)
    cell = np.asarray(d["Lattice"], float)
    types_str = d["AtomTypes"]
    e0, f0 = _model_eval(fs, pos, cell, types_str)
    h = 1e-5
    errs = []
    for a in (0, 3):
        for c in range(3):
            pp = pos.copy()
            pp[a, c] += h
            ep, _ = _model_eval(fs, pp, cell, types_str)
            pm = pos.copy()
            pm[a, c] -= h
            em, _ = _model_eval(fs, pm, cell, types_str)
            fd = -(ep - em) / (2 * h)
            errs.append(abs(fd - f0[a, c]))
    errs = np.array(errs)
    assert errs.mean() < 1e-5, errs
    assert errs.max() < 1e-4, errs


def test_nn_training_reduces_loss(nn_fixture):
    fs, _ = nn_fixture
    hist = fs.solver.history
    assert len(hist) == 2
    assert np.isfinite([h[1] for h in hist]).all()


def test_nn_error_analysis(nn_fixture):
    fs, _ = nn_fixture
    fs.solver.error_analysis()
    assert ("*ALL", "Training") in fs.solver.errors.index
