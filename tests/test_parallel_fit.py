"""Distributed (mesh-sharded) normal-equation fit tests on the virtual
8-device CPU mesh."""

import numpy as np
import pytest

from tests.util import TA_EXAMPLE


@pytest.mark.heavy
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    B, G = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(B)).all()
    assert np.isfinite(np.asarray(G)).all()


@pytest.mark.skipif(not TA_EXAMPLE.exists(), reason="no reference examples")
@pytest.mark.heavy
def test_sharded_fit_matches_host_svd():
    """8-way sharded normal-equation fit == host SVD fit on a Ta subset."""
    import jax

    from fitsnap_tpu.fitsnap import FitSnap
    from fitsnap_tpu.parallel.fit import (NormalSolver, build_step_fn,
                                          make_mesh, pack_batch)

    assert len(jax.devices()) >= 8
    fs = FitSnap(str(TA_EXAMPLE / "Ta-example.in"), arglist=["--overwrite"])
    fs.scrape_configs()
    data = [d for d in fs.data if d["Group"] in
            ("Displaced_A15", "Volume_BCC")]
    calc = fs.calculator
    packed, _ = calc.host_preprocess(data)

    a_pad = max(8, -(-max(pc.natoms for pc in packed) // 8) * 8)
    k_pad = max(8, -(-max(pc.kcount for pc in packed) // 8) * 8)
    mesh = make_mesh(8)
    per = 8
    chunks = -(-len(packed) // per)
    batch = pack_batch(packed, a_pad, k_pad, chunks * per, np.float64,
                       chunks=chunks)
    flags = {"energy": True, "force": True, "stress": True}
    step = build_step_fn(calc.params, calc.numtypes, flags, mesh,
                         refspec=calc.refspec)
    AtA, Atb, nrows = step(batch)
    coeff = NormalSolver(AtA).solve(Atb)

    # host reference: assemble rows + SVD
    a, b, w, fs_dict = calc.process_configs(data)
    aw, bw = w[:, None] * a, w * b
    ref, *_ = np.linalg.lstsq(aw, bw, rcond=1e-13)
    assert float(np.asarray(nrows)) == a.shape[0]
    assert np.abs(coeff - ref).max() < 1e-6


@pytest.mark.heavy
@pytest.mark.skipif(not TA_EXAMPLE.exists(), reason="no reference examples")
def test_sharded_ace_fit_matches_host_svd():
    """8-way sharded normal-equation ACE fit == host SVD fit
    (kernel/const_mode/width overrides route the mesh path through
    `ops/ace.py` instead of SNAP)."""
    import jax

    from fitsnap_tpu.fitsnap import FitSnap
    from fitsnap_tpu.parallel.fit import (NormalSolver, ace_kernel,
                                          build_residual_fn,
                                          build_step_fn, fit_refined,
                                          make_mesh, pack_batch)

    assert len(jax.devices()) >= 8
    ex = TA_EXAMPLE.parent / "Ta_PACE"
    fs = FitSnap(str(ex / "Ta.in"), arglist=["--overwrite"])
    fs.scrape_configs()
    data = [d for d in fs.data if d["Group"] in ("Displaced_A15", "Liquid")]
    calc = fs.calculator
    packed, _ = calc.host_preprocess(data)

    a_pad = max(8, -(-max(pc.natoms for pc in packed) // 8) * 8)
    k_pad = max(8, -(-max(pc.kcount for pc in packed) // 8) * 8)
    mesh = make_mesh(8)
    per = 8
    chunks = -(-len(packed) // per)
    batch = pack_batch(packed, a_pad, k_pad, chunks * per, np.float64,
                       chunks=chunks)
    flags = {"energy": True, "force": True, "stress": False}  # Ta.in stress=0
    sec = fs.config.sections["ACE"]
    const = False if sec.bzeroflag else ("ace", calc.numtypes)
    kern = ace_kernel(calc.plan)
    step = build_step_fn(None, calc.numtypes, flags, mesh,
                         refspec=calc.refspec, kernel=kern,
                         const_mode=const, width=calc.get_width())
    res_fn = build_residual_fn(None, calc.numtypes, flags, mesh,
                               refspec=calc.refspec, kernel=kern,
                               const_mode=const)
    AtA, Atb, nrows = step(batch)
    coeff, _, _ = fit_refined(step, res_fn, batch)

    a, b, w, fs_dict = calc.process_configs(data)
    aw, bw = w[:, None] * a, w * b
    assert float(np.asarray(nrows)) == a.shape[0]
    # the mesh path must assemble the same weighted normal equations ...
    AtA_host = aw.T @ aw
    Atb_host = aw.T @ bw
    sA = np.abs(AtA_host).max()
    assert np.abs(np.asarray(AtA).reshape(AtA_host.shape)
                  - AtA_host).max() / sA < 1e-10
    assert np.abs(np.asarray(Atb) - Atb_host).max() / np.abs(
        Atb_host).max() < 1e-10
    # ... its solution must equal the SAME solver run on the host-assembled
    # system (isolates the mesh path from solver cutoff policy) ...
    ns_host = NormalSolver(AtA_host).solve(Atb_host)
    r_mesh = np.linalg.norm(aw @ np.asarray(coeff) - bw)
    r_ns = np.linalg.norm(aw @ ns_host - bw)
    assert abs(r_mesh - r_ns) <= 1e-6 * r_ns
    # ... and sit within 1% of the lstsq optimum (this tiny subset is
    # rank-deficient; the eigh cutoff truncates near-null directions that
    # lstsq at rcond=1e-13 retains)
    ref, *_ = np.linalg.lstsq(aw, bw, rcond=1e-13)
    r_host = np.linalg.norm(aw @ ref - bw)
    assert r_mesh <= r_host * 1.01
