"""Pairwise CUSTOM NN path: descriptor units, FD forces, end-to-end run.

Reference: `fitsnap3lib/calculators/lammps_custom.py` (raw neighbor
geometry from a `pair zero` run), `lib/neural_networks/pairwise.py:38`
(Bessel radial + Gaussian-3-body descriptors computed inside the model,
forces by autograd), example `examples/Ta_pytorch_custom_NN`.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.util import REFERENCE

EXAMPLE = REFERENCE / "examples/Ta_pytorch_custom_NN/Ta-example.in"

pytestmark = pytest.mark.skipif(not EXAMPLE.exists(),
                                reason="reference examples not available")


def test_pair_descriptors_basic():
    from fitsnap_tpu.ops.custom_desc import pair_descriptors

    rng = np.random.default_rng(3)
    A, K = 6, 10
    disp = jnp.asarray(rng.normal(size=(A, K, 3)) * 2.0)
    mask = jnp.asarray(rng.random((A, K)) < 0.8)
    cutoff, nrad, n3b = 5.0, 8, 23
    d = pair_descriptors(disp, mask, cutoff, nrad, n3b)
    assert d.shape == (A, K, nrad + n3b)
    assert np.isfinite(np.asarray(d)).all()

    # pairs beyond the cutoff contribute nothing
    far = jnp.asarray(np.full((A, K, 3), 10.0))
    d_far = pair_descriptors(far, mask, cutoff, nrad, n3b)
    assert np.abs(np.asarray(d_far)).max() < 1e-12


@pytest.fixture(scope="module")
def custom_fixture(tmp_path_factory):
    from fitsnap_tpu.fitsnap import FitSnap

    tmp = tmp_path_factory.mktemp("custom_nn")
    import os
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        txt = EXAMPLE.read_text().replace(
            "dataPath = ../Ta_Linear_JCP2014/JSON",
            f"dataPath = {REFERENCE}/examples/Ta_Linear_JCP2014/JSON")
        infile = tmp / "Ta.in"
        infile.write_text(txt)
        fs = FitSnap(str(infile), arglist=["--overwrite"])
        fs.scrape_configs()
        data = [d for d in fs.data if d["Group"] == "Displaced_BCC"][:4]
        sec = fs.config.sections["NETWORK"]
        sec.num_epochs = 2
        sec.manual_seed_flag = 1
        fs.solver.prepare_dataset(fs.calculator, data)
        fs.solver.perform_fit(calculator=fs.calculator, data=data)
    finally:
        os.chdir(cwd)
    return fs, data


def test_custom_nn_trains(custom_fixture):
    fs, data = custom_fixture
    assert len(fs.solver.history) == 2
    assert all(np.isfinite(h[1]) for h in fs.solver.history)


def test_custom_nn_fd_forces(custom_fixture):
    """-dE/dx from finite differences must match the model forces."""
    from fitsnap_tpu.ops.neighbors import host_neighbors

    fs, data = custom_fixture
    sol = fs.solver
    calc = fs.calculator
    d = data[0]
    cell = np.asarray(d["Lattice"], float)
    types_str = d["AtomTypes"]
    N = len(d["Positions"])
    types = np.array([calc.type_mapping[t] - 1 for t in types_str], np.int32)

    def model_eval(pos):
        disp, jidx, mask, kmax = host_neighbors(pos, cell, N, calc.cutoff)
        batch = {
            "disp": jnp.asarray(disp)[None],
            "mask": jnp.asarray(mask)[None],
            "types": jnp.asarray(types)[None],
            "real": jnp.ones((1, N), bool),
            "nat": jnp.full((1,), N, jnp.int32),
            "jidx": jnp.asarray(jidx)[None],
        }
        e_per_atom, forces = sol._forward_pairwise(sol.params, batch)
        return float(e_per_atom[0]) * N, np.asarray(forces[0])

    pos = np.asarray(d["Positions"], float)
    _, f0 = model_eval(pos)
    h = 1e-5
    errs = []
    for a in (0, N // 2):
        for c in range(3):
            pp = pos.copy()
            pp[a, c] += h
            ep, _ = model_eval(pp)
            pm = pos.copy()
            pm[a, c] -= h
            em, _ = model_eval(pm)
            f_fd = -(ep - em) / (2 * h)
            errs.append(abs(f_fd - f0[a, c]))
    errs = np.asarray(errs)
    # reference oracle: mean < 1e-3, max < 0.1 (test_pytorch.py:106-114);
    # float64 here so assert much tighter
    assert errs.mean() < 1e-6, errs
    assert errs.max() < 1e-5, errs


def test_pairnn_export_matches_jax(custom_fixture, tmp_path):
    """The exported LAMMPS mliappy PairNN module (reference write.py:189)
    reproduces the JAX pairwise model: same total energy, and its
    beta = dE/drij gradients match autodiff through `_forward_pairwise`."""
    torch = pytest.importorskip("torch")
    from fitsnap_tpu.io.export_torch import export_pairnn
    from fitsnap_tpu.ops.neighbors import host_neighbors

    fs, data = custom_fixture
    sol = fs.solver
    calc = fs.calculator
    sec = sol._custom_sec
    wrapper = export_pairnn(
        str(tmp_path / "pair.pt"), sol.params, np.asarray(sol.mean),
        np.asarray(sol.std), sec.cutoff, sec.num_radial, sec.num_3body,
        calc.numtypes)
    loaded = torch.load(str(tmp_path / "pair.pt"), weights_only=False)

    d = data[0]
    N = len(d["Positions"])
    types = np.array([calc.type_mapping[t] - 1 for t in d["AtomTypes"]],
                     np.int32)
    disp, jidx, mask, _ = host_neighbors(
        np.asarray(d["Positions"], float), np.asarray(d["Lattice"], float),
        N, calc.cutoff)

    batch = {
        "disp": jnp.asarray(disp)[None], "mask": jnp.asarray(mask)[None],
        "types": jnp.asarray(types)[None],
        "real": jnp.ones((1, N), bool),
        "nat": jnp.full((1,), N, jnp.int32),
        "jidx": jnp.asarray(jidx)[None],
    }
    e_per_atom, _ = sol._forward_pairwise(sol.params, batch)
    e_jax = float(e_per_atom[0]) * N

    # dE/d(disp) for masked pairs via autodiff of the same forward
    def etot(dd):
        b = dict(batch, disp=dd)
        e, _ = sol._forward_pairwise(sol.params, b)
        return e[0] * N
    g_jax = np.asarray(jax.grad(etot)(batch["disp"]))[0][mask]

    ii, kk = np.nonzero(mask)
    rij = np.ascontiguousarray(disp[mask], np.float64)
    beta = np.zeros_like(rij)
    energy = np.zeros(N)
    # LAMMPS global tags need not match local listed-atom indices (atom
    # sorting / MPI): pass a permuted tag order so a tag-keyed energy
    # scatter would land on the wrong atoms
    perm = np.random.default_rng(11).permutation(N)
    loaded.forward(types, None, beta, energy, rij,
                   ii.astype(np.int64), jidx[mask].astype(np.int64),
                   perm[ii].astype(np.int64),
                   perm[jidx[mask]].astype(np.int64))
    # folding (B-mean)/std into layer 1 (export) vs applying it explicitly
    # (JAX) differ by cancellation noise ~1e-8 relative; the reference's
    # deployment oracle is FD at 1e-3 (test_pytorch.py:106-114)
    assert abs(energy.sum() - e_jax) < 1e-7 * max(1.0, abs(e_jax))
    assert np.abs(beta - g_jax).max() < 1e-7
    assert wrapper.n_descriptors == sec.num_radial + sec.num_3body

    # per-atom energies must land by LOCAL index, not tag
    from fitsnap_tpu.ops.custom_desc import (pair_descriptors,
                                             cutoff_function)
    desc = np.asarray(pair_descriptors(
        jnp.asarray(disp), jnp.asarray(mask), sec.cutoff, sec.num_radial,
        sec.num_3body))
    x = (desc - np.asarray(sol.mean)) / np.asarray(sol.std)
    from fitsnap_tpu.models.mlp import atom_energies
    el = types[:, None] * np.ones(mask.shape, np.int32)
    e_pair = np.asarray(atom_energies(sol.params, jnp.asarray(x),
                                      jnp.asarray(el)))
    r = np.linalg.norm(np.where(mask[..., None], disp, 100.0), axis=-1)
    fc = np.asarray(cutoff_function(jnp.asarray(r), sec.cutoff))
    e_atom_jax = (e_pair * fc * mask).sum(axis=1)
    assert np.abs(energy - e_atom_jax).max() < 1e-7


def test_pairnn_export_two_element(tmp_path):
    """Two-element PairNN export: the Elementwise multi-subnet dispatch
    (masked in-place assignment under autograd, subnet picked by atom i's
    element) matches the JAX pairwise math per atom and per pair."""
    torch = pytest.importorskip("torch")
    from fitsnap_tpu.io.export_torch import export_pairnn
    from fitsnap_tpu.ops.custom_desc import (pair_descriptors,
                                             cutoff_function, RMIN_CUT)
    from fitsnap_tpu.models.mlp import atom_energies

    rng = np.random.default_rng(7)
    cutoff, nrad, n3b = 5.0, 4, 6
    D = nrad + n3b
    widths = [D, 8, 1]
    params = [(jnp.asarray(rng.normal(size=(2, nin, nout)) * 0.5),
               jnp.asarray(rng.normal(size=(2, nout)) * 0.1))
              for nin, nout in zip(widths[:-1], widths[1:])]
    mean = rng.normal(size=D) * 0.1
    std = rng.random(D) + 0.5

    N = 8
    pos = rng.random((N, 3)) * 3.5
    types = rng.integers(0, 2, N).astype(np.int32)
    assert len(set(types)) == 2
    dmat = pos[None, :, :] - pos[:, None, :]
    rmat = np.linalg.norm(dmat, axis=-1)
    mask = (rmat < cutoff) & ~np.eye(N, dtype=bool)
    K = mask.sum(axis=1).max()
    disp = np.zeros((N, K, 3))
    jidx = np.zeros((N, K), np.int64)
    pmask = np.zeros((N, K), bool)
    for i in range(N):
        js = np.nonzero(mask[i])[0]
        disp[i, :len(js)] = dmat[i, js]
        jidx[i, :len(js)] = js
        pmask[i, :len(js)] = True

    def config_energy(d):
        desc = pair_descriptors(d, jnp.asarray(pmask), cutoff, nrad, n3b)
        x = (desc - mean) / std
        el = jnp.asarray(types)[:, None] * jnp.ones(pmask.shape, jnp.int32)
        e_pair = atom_energies(params, x, el)
        safe = jnp.where(jnp.asarray(pmask)[..., None], d,
                         jnp.array([2.0 * RMIN_CUT, 0.0, 0.0]))
        fc = cutoff_function(jnp.sqrt(jnp.sum(safe * safe, -1)), cutoff)
        return jnp.sum(e_pair * fc * pmask), e_pair * fc * pmask

    (e_jax, e_pairs), g = jax.value_and_grad(config_energy,
                                             has_aux=True)(jnp.asarray(disp))
    e_atom_jax = np.asarray(e_pairs).sum(axis=1)
    g_jax = np.asarray(g)[pmask]

    wrapper = export_pairnn(str(tmp_path / "pair2.pt"), params, mean, std,
                            cutoff, nrad, n3b, 2)
    loaded = torch.load(str(tmp_path / "pair2.pt"), weights_only=False)
    assert len(loaded.model.subnets) == 2

    ii, _ = np.nonzero(pmask)
    rij = np.ascontiguousarray(disp[pmask], np.float64)
    beta = np.zeros_like(rij)
    energy = np.zeros(N)
    perm = np.random.default_rng(13).permutation(N)
    loaded.forward(types, None, beta, energy, rij,
                   ii, jidx[pmask], perm[ii], perm[jidx[pmask]])
    # same tolerance rationale as the single-element test: folding
    # (B-mean)/std into layer 1 leaves ~1e-8 relative cancellation noise
    assert abs(energy.sum() - float(e_jax)) < 1e-7 * max(1.0, abs(e_jax))
    assert np.abs(energy - e_atom_jax).max() < 1e-6
    assert np.abs(beta - g_jax).max() < 1e-6


def test_custom_end_to_end_cli(tmp_path, monkeypatch):
    """The shipped Ta_pytorch_custom_NN input runs end-to-end unchanged
    (short epochs), producing the custom coefficient/metrics outputs."""
    monkeypatch.chdir(tmp_path)
    from fitsnap_tpu.fitsnap import FitSnap

    txt = EXAMPLE.read_text().replace(
        "dataPath = ../Ta_Linear_JCP2014/JSON",
        f"dataPath = {REFERENCE}/examples/Ta_Linear_JCP2014/JSON")
    txt = txt.replace("num_epochs = 20", "num_epochs = 1")
    # keep runtime bounded: two small groups
    for g in ("Displaced_A15", "Displaced_FCC", "Elastic_BCC", "Elastic_FCC",
              "GSF_110", "GSF_112", "Liquid", "Surface", "Volume_A15",
              "Volume_BCC", "Volume_FCC"):
        txt = "\n".join(ln for ln in txt.splitlines()
                        if not ln.startswith(g))
    infile = tmp_path / "Ta.in"
    infile.write_text(txt)
    fs = FitSnap(str(infile), arglist=["--overwrite"])
    fs.scrape_configs()
    fs.process_configs()
    fs.perform_fit()
    fs.write_output()
    assert (tmp_path / "Ta_metrics.md").exists()
    assert len(fs.solver.history) == 1
