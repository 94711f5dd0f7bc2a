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
