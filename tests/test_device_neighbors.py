"""On-device neighbor construction (parallel/fit.py:device_neighbors).

Checks against the host builders: same neighbor sets, and two-float
displacement assembly accurate to ~1 ulp of the displacement (the naive f32
`pos_j + svec - pos_i` loses ~2e-6 A to cancellation, which the steep ZBL
reference subtraction amplifies — see the Liquid-group regression this
guards against).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from fitsnap_tpu.ops.neighbors import host_neighbors  # noqa: E402
from fitsnap_tpu.parallel.fit import (  # noqa: E402
    batch_shift_table, device_neighbors, pack_batch_pos, plan_shift_groups)


def _random_config(rng, na):
    cell = np.triu(rng.uniform(4, 11, (3, 3)))
    cell[0, 1] *= 0.3
    cell[0, 2] *= 0.3
    cell[1, 2] *= 0.3
    pos = rng.uniform(0, 1, (na, 3)) @ cell.T
    return pos, cell


def _split(x, dtype=np.float32):
    hi = np.asarray(x, dtype)
    return hi, np.asarray(x - hi.astype(np.float64), dtype)


def test_device_matches_host_sets():
    rng = np.random.default_rng(3)
    cutoff = 5.0
    for _ in range(4):
        na = int(rng.integers(4, 40))
        pos, cell = _random_config(rng, na)
        s_table = batch_shift_table([cell], cutoff)
        dh, jh, mh, kh = host_neighbors(pos, cell, na, cutoff)
        ph, pl = _split(pos, np.float64)
        sv = np.asarray(s_table, np.float64) @ cell.T
        sh, sl = _split(sv, np.float64)
        dd, jd, md = device_neighbors(
            jnp.asarray(ph), jnp.asarray(pl), jnp.asarray(sh),
            jnp.asarray(sl), na, cutoff, max(kh, 1))
        dd, md = np.asarray(dd), np.asarray(md)
        assert md.sum() == mh.sum()
        for a in range(na):
            hs = sorted(map(tuple, np.round(dh[a][mh[a]], 8)))
            ds = sorted(map(tuple, np.round(dd[a][md[a]], 8)))
            assert hs == ds


def test_two_float_accuracy_f32():
    """f32 device displacements match f64 host to ~1 ulp of |disp|."""
    rng = np.random.default_rng(7)
    cutoff = 5.0
    na = 30
    pos, cell = _random_config(rng, na)
    pos = pos + 40.0  # exaggerate cancellation: coordinates ~40-50 A
    cell = cell.copy()
    s_table = batch_shift_table([cell], cutoff)
    dh, jh, mh, kh = host_neighbors(pos, cell, na, cutoff)
    ph, pl = _split(pos)
    sv = np.asarray(s_table, np.float64) @ cell.T
    sh, sl = _split(sv)
    dd, jd, md = device_neighbors(
        jnp.asarray(ph), jnp.asarray(pl), jnp.asarray(sh), jnp.asarray(sl),
        na, cutoff, kh)
    dd, md = np.asarray(dd, np.float64), np.asarray(md)
    for a in range(na):
        hs = np.array(sorted(map(tuple, dh[a][mh[a]])))
        ds = np.array(sorted(map(tuple, dd[a][md[a]])))
        assert hs.shape == ds.shape
        assert np.abs(hs - ds).max() < 2e-6  # vs ~2e-5 naive at |pos|~50
        # naive f32 would give |err| ~ 50 * 2^-24 ~ 3e-6 per operand pair;
        # two-float stays at ulp(4 A) ~ 2.4e-7 even with the f32 inputs
        assert np.abs(hs - ds).max() < 1e-6


def test_plan_shift_groups_and_pack():
    rng = np.random.default_rng(11)
    cutoff = 5.0

    class PC:
        pass

    packed = []
    for na, scale in [(12, 1.0), (2, 0.35), (20, 1.0)]:
        pos, cell = _random_config(rng, na)
        pc = PC()
        pc.pos, pc.cell, pc.natoms, pc.types = pos, cell * scale, na, \
            np.zeros(na, np.int32)
        pc.pos = (rng.uniform(0, 1, (na, 3)) @ (cell * scale).T)
        pc.data = {"Energy": 1.0, "eweight": 1.0, "fweight": 1.0,
                   "vweight": 1.0}
        packed.append(pc)
    groups = plan_shift_groups(packed, cutoff)
    assert sum(len(g["configs"]) for g in groups) == len(packed)
    assert len(groups) >= 2  # the scaled-down cell needs more images
    for g in groups:
        batch = pack_batch_pos(g["configs"], g["a_pad"], len(g["configs"]),
                               g["s_table"])
        assert batch[0].shape[2] == g["a_pad"]
        assert batch[2].shape[2] == len(g["s_table"])


def test_plan_pos_buckets_coalesces():
    """Many distinct shapes coalesce to <= max_programs covering shapes."""
    from fitsnap_tpu.parallel.fit import plan_pos_buckets

    rng = np.random.default_rng(5)

    class PC:
        pass

    packed = []
    for na in [2, 4, 9, 17, 33, 65, 120, 250, 40, 70]:
        pos, cell = _random_config(rng, min(na, 40))
        pc = PC()
        # scale cell with natoms so density (and kmax) varies
        pc.cell = cell * (0.5 + 0.1 * na) ** (1 / 3)
        pc.pos = rng.uniform(0, 1, (na, 3)) @ pc.cell.T
        pc.natoms = na
        pc.types = np.zeros(na, np.int32)
        pc.data = {"Energy": 0.0, "eweight": 1, "fweight": 1, "vweight": 1}
        packed.append(pc)

    groups = plan_pos_buckets(packed, 5.0, max_programs=3)
    assert len(groups) <= 3
    assert sum(len(g["configs"]) for g in groups) == len(packed)
    for g in groups:
        for pc in g["configs"]:
            assert pc.natoms <= g["a_pad"]


@pytest.mark.heavy
def test_pos_path_matches_tensor_path():
    """positions/device-neighbor step == neighbor-tensor step on real Ta.

    Covers build_step_fn/build_residual_fn/build_eval_fn with neighbors=
    (the WBe streaming path: upload positions, neighbors built on device).
    """
    from tests.util import TA_EXAMPLE
    if not TA_EXAMPLE.exists():
        pytest.skip("no reference examples")

    from fitsnap_tpu.fitsnap import FitSnap
    from fitsnap_tpu.parallel.fit import (
        NormalSolver, build_eval_fn, build_residual_fn, build_step_fn,
        make_mesh, pack_batch, pack_batch_pos, plan_pos_buckets)

    fs = FitSnap(str(TA_EXAMPLE / "Ta-example.in"), arglist=["--overwrite"])
    fs.scrape_configs()
    # two groups with different cells/densities; small count + a 2-device
    # mesh + max_programs=1 keep this to 4 XLA compiles (was 7 on an
    # 8-device mesh: 810 s of the default tier's 48 min)
    data = [d for d in fs.data if d["Group"] in
            ("Displaced_A15", "Volume_BCC")][:8]
    calc = fs.calculator
    packed, _ = calc.host_preprocess(data)

    mesh = make_mesh(2)
    flags = {"energy": True, "force": True, "stress": True}

    # tensor path (host neighbors)
    a_pad = max(8, -(-max(pc.natoms for pc in packed) // 8) * 8)
    k_pad = max(8, -(-max(pc.kcount for pc in packed) // 8) * 8)
    chunks = -(-len(packed) // 2)
    batch_t = pack_batch(packed, a_pad, k_pad, chunks * 2, np.float64,
                         chunks=chunks)
    step_t = build_step_fn(calc.params, calc.numtypes, flags, mesh,
                           refspec=calc.refspec)
    AtA_t, Atb_t, n_t = step_t(batch_t)

    # positions path (device neighbors), through the production planner
    groups = plan_pos_buckets(packed, calc.cutoff, max_programs=1)
    AtA_p = np.zeros_like(AtA_t)
    Atb_p = np.zeros_like(np.asarray(Atb_t))
    n_p = 0.0
    coeff = NormalSolver(AtA_t).solve(Atb_t)
    Atr_p = np.zeros_like(Atb_p)
    se = ne = sf = nf = 0.0
    for g in groups:
        cfgs = g["configs"]
        C = -(-len(cfgs) // 2)
        batch = pack_batch_pos(cfgs, g["a_pad"], C * 2, g["s_table"],
                               np.float64, chunks=C)
        nbr = {"cutoff": calc.cutoff, "k_pad": g["k_pad"]}
        step = build_step_fn(calc.params, calc.numtypes, flags, mesh,
                             refspec=calc.refspec, neighbors=nbr)
        a, b, n = step(batch)
        AtA_p += a
        Atb_p += b
        n_p += float(np.asarray(n))
        res = build_residual_fn(calc.params, calc.numtypes, flags, mesh,
                                refspec=calc.refspec, neighbors=nbr)
        Atr_p += np.asarray(res(jnp.asarray(coeff), batch), np.float64)
        ev = build_eval_fn(calc.params, calc.numtypes, flags, mesh,
                           refspec=calc.refspec, neighbors=nbr)
        o = ev(jnp.asarray(coeff), batch)
        se += float(o[0]); ne += float(o[1])
        sf += float(o[2]); nf += float(o[3])

    scale = max(1.0, np.abs(AtA_t).max())
    assert float(np.asarray(n_t)) == n_p
    assert np.abs(AtA_p - AtA_t).max() / scale < 1e-12
    assert np.abs(Atb_p - np.asarray(Atb_t)).max() \
        / max(1.0, np.abs(Atb_t).max()) < 1e-12

    # residual through the pos path at the tensor-path solution ~ 0-consistent
    res_t = build_residual_fn(calc.params, calc.numtypes, flags, mesh,
                              refspec=calc.refspec)
    Atr_t = np.asarray(res_t(jnp.asarray(coeff), batch_t), np.float64)
    # Atr ~ 0 at the solution (pure cancellation); compare against the
    # un-cancelled scale |Atb|, not |Atr| — pair-summation order differs
    assert np.abs(Atr_p - Atr_t).max() \
        / max(1.0, np.abs(np.asarray(Atb_t)).max()) < 1e-12

    # eval path: MAE identical between paths
    ev_t = build_eval_fn(calc.params, calc.numtypes, flags, mesh,
                         refspec=calc.refspec)
    ot = ev_t(jnp.asarray(coeff), batch_t)
    assert ne == float(ot[1]) and nf == float(ot[3])
    assert abs(se - float(ot[0])) < 1e-9
    assert abs(sf - float(ot[2])) < 1e-9
