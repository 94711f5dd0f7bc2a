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
    # multi_element_option=2 routes each atom to its element's subnetwork;
    # option 1 uses one shared network (types mapped to 0)
    net_elem = (types if sol.net.multi_element_option == 2
                else np.zeros_like(types))
    batch = {
        "B": B[None], "G": G[None],
        "types": jnp.asarray(net_elem)[None],
        "real": jnp.ones((1, N), bool),
        "nat": jnp.full((1,), N, jnp.int32),
        "jidx": jnp.asarray(jidx)[None],
    }
    e_per_atom, forces = sol._forward_batch(sol.params, batch)
    return float(e_per_atom[0]) * N, np.asarray(forces[0])


@pytest.mark.heavy
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


@pytest.fixture(scope="module")
def wbe_nn_fixture(tmp_path_factory):
    """Multi-element NN: per-element subnetworks (multi_element_option=2)
    trained on mixed W/Be configs (reference examples/WBe_PyTorch_NN)."""
    import os

    from fitsnap_tpu.fitsnap import FitSnap

    wbe_json = TA_EXAMPLE.parent / "WBe_PRB2019" / "JSON"
    settings = {
        "BISPECTRUM": {"numTypes": 2, "twojmax": "6 6",
                       "rcutfac": 4.812302818, "rfac0": 0.99363,
                       "rmin0": 0.0, "wj": "1.0 0.9590493408",
                       "radelem": "0.5 0.417932464", "type": "W Be",
                       "bzeroflag": 1},
        "CALCULATOR": {"calculator": "LAMMPSSNAP", "energy": 1, "force": 1,
                       "stress": 0, "nonlinear": 1},
        "SOLVER": {"solver": "PYTORCH"},
        "SCRAPER": {"scraper": "JSON"},
        "PATH": {"dataPath": str(wbe_json)},
        "OUTFILE": {"metrics": "m.md", "potential": "wbe_nn"},
        "REFERENCE": {"units": "metal", "atom_style": "atomic",
                      "pair_style": "hybrid/overlay zero 10.0 zbl 4.0 4.8",
                      "pair_coeff1": "* * zero",
                      "pair_coeff2": "1 1 zbl 74 74",
                      "pair_coeff3": "1 2 zbl 74 4",
                      "pair_coeff4": "2 2 zbl 4 4"},
        "PYTORCH": {"layer_sizes": "num_desc 8 8 1",
                    "learning_rate": 1e-3, "num_epochs": 2,
                    "batch_size": 2, "energy_weight": 1e-2,
                    "force_weight": 1.0, "manual_seed_flag": 1,
                    "multi_element_option": 2},
        "GROUPS": {"group_sections": "name training_size testing_size "
                   "eweight fweight vweight",
                   "group_types": "str float float float float float",
                   "random_sampling": 0,
                   # 4 mixed 54-atom W/Be configs; int counts parse only
                   # these files out of the 1,798 in the group
                   "DFT_MD_300K": "4 0 100 1 1e-8"},
    }
    cwd = os.getcwd()
    os.chdir(tmp_path_factory.mktemp("wbe_nn"))
    try:
        fs = FitSnap(settings, arglist=["--overwrite"])
        fs.scrape_configs()
        assert len(fs.data) == 4
        assert {"W", "Be"} <= set(fs.data[0]["AtomTypes"])
        fs.process_configs()
        fs.perform_fit()
        return fs
    finally:
        os.chdir(cwd)


def test_wbe_nn_trains_multi_element(wbe_nn_fixture):
    fs = wbe_nn_fixture
    assert np.isfinite([h[1] for h in fs.solver.history]).all()
    # option 2: one subnetwork stack per element
    w0, _ = fs.solver.params[0]
    assert w0.shape[0] == 2


def test_wbe_nn_fd_forces(wbe_nn_fixture):
    """FD forces through the full pipeline for a 2-element config exercise
    the per-element subnetworks + chain rule (reference
    tests/test_pytorch.py test_fd_multi_elem)."""
    fs = wbe_nn_fixture
    d = fs.data[0]
    pos = np.asarray(d["Positions"], float)
    cell = np.asarray(d["Lattice"], float)
    types_str = d["AtomTypes"]
    # one W atom and one Be atom
    i_w = types_str.index("W")
    i_be = types_str.index("Be")
    _, f0 = _model_eval(fs, pos, cell, types_str)
    h = 1e-5
    errs = []
    for a in (i_w, i_be):
        for c in range(3):
            pp = pos.copy(); pp[a, c] += h
            pm = pos.copy(); pm[a, c] -= h
            ep, _ = _model_eval(fs, pp, cell, types_str)
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


def test_nn_save_state_resume(nn_fixture, tmp_path):
    """save_state_input warm-starts training from a saved state (reference
    solvers/pytorch.py:102-109). With lr=0 the resumed fit must end at
    exactly the loaded parameters; a shape mismatch must error loudly."""
    from fitsnap_tpu.models.mlp import save_params

    fs, data = nn_fixture
    net = fs.config.sections["PYTORCH"]
    saved = [(np.asarray(w), np.asarray(b)) for w, b in fs.solver.params]
    path = tmp_path / "state.pkl"
    save_params(str(path), fs.solver.params, {"layer_sizes": net.layer_sizes})

    old = (net.save_state_input, net.num_epochs, net.learning_rate)
    try:
        net.save_state_input = str(path)
        net.num_epochs = 1
        net.learning_rate = 0.0
        fs.solver.perform_fit(calculator=fs.calculator, data=data)
        for (w, b), (w0, b0) in zip(fs.solver.params, saved):
            np.testing.assert_array_equal(np.asarray(w), w0)
            np.testing.assert_array_equal(np.asarray(b), b0)

        # wrong architecture -> loud config error, not silent garbage
        bad_path = tmp_path / "bad.pkl"
        save_params(str(bad_path), [(np.zeros((1, 2, 2)), np.zeros((1, 2)))],
                    {})
        net.save_state_input = str(bad_path)
        with pytest.raises(ValueError, match="layer shapes"):
            fs.solver.perform_fit(calculator=fs.calculator, data=data)

        # meta cross-check: right shapes, wrong declared layer_sizes
        meta_path = tmp_path / "meta.pkl"
        save_params(str(meta_path), saved,
                    {"layer_sizes": [1] + list(net.layer_sizes)[1:]})
        net.save_state_input = str(meta_path)
        with pytest.raises(ValueError, match="layer_sizes"):
            fs.solver.perform_fit(calculator=fs.calculator, data=data)
    finally:
        net.save_state_input, net.num_epochs, net.learning_rate = old
        fs.solver.params = [(jnp.asarray(w), jnp.asarray(b))
                            for w, b in saved]


def test_nn_save_state_restores_standardization_and_adam(nn_fixture,
                                                         tmp_path):
    """Warm start restores the SAVING fit's descriptor mean/std and Adam
    moments from meta (ADVICE r2: prepare_dataset otherwise re-standardizes
    the loaded network's inputs; reference torch.load restores
    optimizer_state_dict too)."""
    from fitsnap_tpu.models.mlp import load_params, save_params

    fs, data = nn_fixture
    net = fs.config.sections["PYTORCH"]
    saved = [(np.asarray(w), np.asarray(b)) for w, b in fs.solver.params]
    old = (net.save_state_input, net.save_state_output,
           net.num_epochs, net.learning_rate)
    try:
        # 1) produce a full-meta checkpoint
        out_path = tmp_path / "ckpt.pkl"
        net.save_state_output = str(out_path)
        net.num_epochs = 1
        fs.solver.perform_fit(calculator=fs.calculator, data=data)
        _, meta = load_params(str(out_path))
        assert meta["opt_state"], "checkpoint must carry optimizer state"
        assert meta["mean"].shape == np.asarray(fs.solver.mean).shape

        # 2) doctor the standardization in meta and resume: the solver must
        # adopt meta's mean/std, not the recomputed dataset values
        doctored = dict(meta)
        doctored["mean"] = meta["mean"] + 1.0
        params, _ = load_params(str(out_path))
        in_path = tmp_path / "doctored.pkl"
        save_params(str(in_path), params, doctored)
        net.save_state_output = None
        net.save_state_input = str(in_path)
        net.learning_rate = 0.0
        fs.solver.perform_fit(calculator=fs.calculator, data=data)
        np.testing.assert_allclose(np.asarray(fs.solver.mean),
                                   doctored["mean"])

        # 3) truncated optimizer state -> loud error
        doctored["opt_state"] = doctored["opt_state"][:-1]
        save_params(str(in_path), params, doctored)
        with pytest.raises(ValueError, match="optimizer"):
            fs.solver.perform_fit(calculator=fs.calculator, data=data)
    finally:
        (net.save_state_input, net.save_state_output,
         net.num_epochs, net.learning_rate) = old
        fs.solver.params = [(jnp.asarray(w), jnp.asarray(b))
                            for w, b in saved]


def test_nn_otf_matches_precompute(tmp_path, monkeypatch):
    """dgrad_mode=otf (descriptors recomputed in the training step, forces
    by autodiff) must reproduce the precomputed-dgrad path: same loss
    trajectory, same predictions.  The two paths evaluate the same math
    with different contraction orders, so f64 agreement to ~1e-8 is the
    correctness bar."""
    monkeypatch.chdir(tmp_path)
    from fitsnap_tpu.fitsnap import FitSnap

    # scrape once: the example's random_sampling=1 draws a different
    # training subset per FitSnap instance (reference behavior)
    fs0 = FitSnap(str(TA_EXAMPLE.parent / "Ta_PyTorch_NN" /
                      "Ta-example.in"), arglist=["--overwrite"])
    fs0.scrape_configs()
    shared = [d for d in fs0.data if d["Group"] == "Displaced_BCC"][:4]

    def run(mode):
        fs = FitSnap(str(TA_EXAMPLE.parent / "Ta_PyTorch_NN" /
                         "Ta-example.in"), arglist=["--overwrite"])
        data = shared
        net = fs.config.sections["PYTORCH"]
        net.num_epochs = 2
        net.manual_seed_flag = 1
        net.dgrad_mode = mode
        net.save_state_output = "None"
        net.output_file = "None"
        fs.solver.prepare_dataset(fs.calculator, data)
        fs.solver.perform_fit(calculator=fs.calculator, data=data)
        e, f = fs.solver.evaluate_bucket(fs.solver.buckets[0])
        return fs.solver, np.asarray(fs.solver.history, float), e, f

    s_pre, h_pre, e_pre, f_pre = run("precompute")
    s_otf, h_otf, e_otf, f_otf = run("otf")
    assert not s_pre.otf and s_otf.otf
    assert "G" in s_pre.buckets[0] and "G" not in s_otf.buckets[0]
    np.testing.assert_allclose(np.asarray(s_otf.mean), np.asarray(s_pre.mean),
                               rtol=1e-10)
    np.testing.assert_allclose(h_otf, h_pre, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(e_otf, e_pre, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(f_otf, f_pre, rtol=1e-6, atol=1e-8)

    # dgrad_mode=cached: descriptors recomputed from cached neighbor
    # tensors with the ANALYTIC per-pair force contraction — a third
    # contraction order of the same math; same f64 agreement bar
    s_c, h_c, e_c, f_c = run("cached")
    assert s_c.cached and not s_c.otf
    assert "disp" in s_c.buckets[0] and "G" not in s_c.buckets[0]
    np.testing.assert_allclose(np.asarray(s_c.mean), np.asarray(s_pre.mean),
                               rtol=1e-10)
    np.testing.assert_allclose(h_c, h_pre, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(e_c, e_pre, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(f_c, f_pre, rtol=1e-6, atol=1e-8)


def test_nn_dgrad_mode_auto_flips_on_size(monkeypatch):
    """auto picks cached when the would-be dgrad tensor exceeds
    FITSNAP_TPU_NN_G_LIMIT (neighbor tensors still fit), and otf when the
    neighbor cache budget is also exceeded."""
    from fitsnap_tpu.fitsnap import FitSnap

    fs = FitSnap(str(TA_EXAMPLE.parent / "Ta_PyTorch_NN" / "Ta-example.in"),
                 arglist=["--overwrite"])
    fs.scrape_configs()
    data = [d for d in fs.data if d["Group"] == "Displaced_BCC"][:2]
    monkeypatch.setenv("FITSNAP_TPU_NN_G_LIMIT", "1")
    fs.solver.prepare_dataset(fs.calculator, data)
    assert fs.solver.cached and not fs.solver.otf

    fs2 = FitSnap(str(TA_EXAMPLE.parent / "Ta_PyTorch_NN" /
                      "Ta-example.in"), arglist=["--overwrite"])
    monkeypatch.setenv("FITSNAP_TPU_NN_NEIGH_LIMIT", "1")
    fs2.solver.prepare_dataset(fs2.calculator, data)
    assert fs2.solver.otf and not fs2.solver.cached


def test_plateau_step_matches_torch_scheduler():
    """_plateau_step vs the exact scheduler the reference constructs
    (torch ReduceLROnPlateau mode=min/factor=0.5/patience=49/threshold=1e-4/
    threshold_mode=abs, solvers/pytorch.py:113-118 — constructed upstream
    but never stepped; here it actually runs).  Same loss sequence must
    yield the same LR trajectory."""
    import torch
    from fitsnap_tpu.solvers.network import _plateau_step

    rng = np.random.default_rng(3)
    # a loss curve that improves, plateaus, jumps, plateaus again
    losses = np.concatenate([
        1.0 / (1.0 + np.arange(10.0)),          # improving
        np.full(20, 0.09) + 1e-6 * rng.normal(size=20),   # plateau
        [0.5], np.full(25, 0.5) + 1e-6 * rng.normal(size=25),
    ])
    for patience, factor, threshold, lr_min in [(5, 0.5, 1e-4, 0.0),
                                                (3, 0.1, 1e-2, 1e-4),
                                                (0, 0.5, 1e-4, 0.0)]:
        lin = torch.nn.Linear(1, 1)
        opt = torch.optim.Adam(lin.parameters(), lr=1e-2)
        sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="min", factor=factor, patience=patience,
            threshold=threshold, threshold_mode="abs", min_lr=lr_min)
        sched = (jnp.asarray(1e-2), jnp.asarray(np.inf),
                 jnp.asarray(0, np.int32))
        for loss in losses:
            sch.step(float(loss))
            sched = _plateau_step(
                sched, jnp.asarray(loss), factor=factor, patience=patience,
                threshold=threshold, lr_min=lr_min)
            assert abs(float(sched[0]) - opt.param_groups[0]["lr"]) < 1e-15, \
                (patience, factor, float(loss))


def test_nn_plateau_lr_halves_in_training(nn_fixture):
    """End-to-end: a fit whose validation loss never 'improves' (threshold
    set huge) must halve the LR every patience+1 epochs inside the jitted
    epoch blocks, and the final LR must be exposed."""
    fs, data = nn_fixture
    net = fs.config.sections["PYTORCH"]
    old = (net.num_epochs, net.lr_plateau_flag, net.lr_plateau_patience,
           net.lr_plateau_threshold)
    saved = [(np.asarray(w), np.asarray(b)) for w, b in fs.solver.params]
    try:
        net.num_epochs = 10
        net.lr_plateau_flag = 1
        net.lr_plateau_patience = 1
        net.lr_plateau_threshold = 1e9   # nothing ever improves...
        fs.solver.perform_fit(calculator=fs.calculator, data=data)
        lrs = np.asarray(fs.solver.lr_history)
        assert lrs.shape == (10,)
        # ...except epoch 0 (best starts at inf).  bad-epoch count then runs
        # 1, 2(>patience: trip, reset), 1, 2(trip)... -> trips at epochs
        # 2, 4, 6, 8: four halvings in 10 epochs
        assert abs(fs.solver.final_lr - net.learning_rate * 0.5 ** 4) < 1e-12
        assert (np.diff(lrs) <= 0).all()

        # scheduling off: LR constant
        net.lr_plateau_flag = 0
        fs.solver.perform_fit(calculator=fs.calculator, data=data)
        np.testing.assert_allclose(np.asarray(fs.solver.lr_history),
                                   net.learning_rate)
    finally:
        (net.num_epochs, net.lr_plateau_flag, net.lr_plateau_patience,
         net.lr_plateau_threshold) = old
        fs.solver.params = [(jnp.asarray(w), jnp.asarray(b))
                            for w, b in saved]


def test_nn_chunked_matches_fused(tmp_path, monkeypatch):
    """Above FITSNAP_TPU_NN_FUSED_BUCKETS shape buckets, training switches
    to per-epoch per-bucket-chunk programs with a host epilogue (the fused
    all-buckets program faults real TPUs at ~8 OTF bodies).  Both paths run
    the same math in the same order: identical loss/LR trajectories."""
    monkeypatch.chdir(tmp_path)
    from fitsnap_tpu.fitsnap import FitSnap

    fs0 = FitSnap(str(TA_EXAMPLE.parent / "Ta_PyTorch_NN" / "Ta-example.in"),
                  arglist=["--overwrite"])
    fs0.scrape_configs()
    by_group = {}
    for d in fs0.data:
        by_group.setdefault(d["Group"], []).append(d)
    # mix small and large cells so prepare_dataset yields >= 2 buckets
    shared = (by_group["Displaced_BCC"][:4] + by_group["Displaced_A15"][:3]
              + by_group["Volume_FCC"][:3])

    def run(fused_limit):
        monkeypatch.setenv("FITSNAP_TPU_NN_FUSED_BUCKETS", str(fused_limit))
        # keep the natural shape buckets: the cached-mode planner would
        # otherwise merge this small mixed-cell fixture into one program
        monkeypatch.setenv("FITSNAP_TPU_PROGRAM_COST", "0.0")
        fs = FitSnap(str(TA_EXAMPLE.parent / "Ta_PyTorch_NN" /
                         "Ta-example.in"), arglist=["--overwrite"])
        net = fs.config.sections["PYTORCH"]
        net.num_epochs = 6
        net.manual_seed_flag = 1
        net.save_state_output = "None"
        net.output_file = "None"
        # plateau settings that actually trip within 6 epochs, so the
        # chunked host scheduler is exercised against the jitted one
        net.lr_plateau_patience = 1
        net.lr_plateau_threshold = 1e9
        fs.solver.prepare_dataset(fs.calculator, shared)
        fs.solver.perform_fit(calculator=fs.calculator, data=shared)
        return fs.solver

    s_fused = run(99)
    assert len(s_fused.buckets) >= 2, "fixture must span >= 2 buckets"
    s_chunk = run(1)
    h_f = np.asarray(s_fused.history, float)
    h_c = np.asarray(s_chunk.history, float)
    np.testing.assert_allclose(h_c, h_f, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(s_chunk.lr_history, s_fused.lr_history,
                               rtol=1e-12)
    assert s_chunk.final_lr == s_fused.final_lr
    for (wc, bc), (wf, bf) in zip(s_chunk.params, s_fused.params):
        np.testing.assert_allclose(np.asarray(wc), np.asarray(wf),
                                   rtol=1e-6, atol=1e-9)
