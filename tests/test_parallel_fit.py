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
