"""Pallas TPU kernels for the SNAP bispectrum hot path.

The monomial formulation (`ops/mono.py`) makes the per-pair work a pure
elementwise product chain plus one dense change-of-basis GEMM — exactly the
shape Pallas fuses well: the ~GB-scale per-pair monomial/U tensors that the
XLA path round-trips through HBM stay in VMEM per atom tile here.

Kernels (single element-channel path; the chem path stays on XLA):

  utot_pallas:   disp/pair-params -> neighbor-summed U expansion (A, 2U)
  dbdd_pallas:   disp/pair-params + CL (dB/dutot projected into monomial
                 space) -> per-pair descriptor gradients dBdD (A, W, K, 3)

Both recompute the cheap Cayley-Klein prologue in-kernel; tangents ride the
same chain as explicit duals.  Gated by FITSNAP_TPU_PALLAS=1 (see
`ops/snap.descriptors_with_jacobian`); numerics validated against the XLA
path in tests/test_pallas_kernels.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fitsnap_tpu.ops.mono import mono_plan


def _ck_prologue(disp, rcutij, wjp, mask, rmin0, rfac0, switchflag):
    """Cayley-Klein params + switching weight for one (A_t, K) tile."""
    x = jnp.where(mask, disp[..., 0], 1.0)
    y = jnp.where(mask, disp[..., 1], 0.0)
    z = jnp.where(mask, disp[..., 2], 0.0)
    safe = jnp.stack([x, y, z], -1)
    r = jnp.sqrt(x * x + y * y + z * z)
    theta0 = (r - rmin0) * (rfac0 * jnp.pi) / (rcutij - rmin0)
    sin_t = jnp.sin(theta0)
    cos_t = jnp.cos(theta0)
    z0 = r * cos_t / sin_t
    r0inv = 1.0 / jnp.sqrt(r * r + z0 * z0)
    ar, ai = r0inv * z0, -r0inv * z
    br, bi = r0inv * y, -r0inv * x
    if switchflag:
        rscale = jnp.pi / (rcutij - rmin0)
        ramp = 0.5 * (jnp.cos((r - rmin0) * rscale) + 1.0)
        sfac = jnp.where(r <= rmin0, 1.0,
                         jnp.where(r > rcutij, 0.0, ramp))
    else:
        sfac = jnp.ones_like(r)
    w = jnp.where(mask, sfac * wjp, jnp.zeros_like(r))
    return (ar, ai, br, bi), w, safe, r


def _level_offsets(exps, parent, varidx):
    """Per-degree index ranges of the (degree-sorted) monomial list."""
    deg = exps.sum(1)
    offs = np.searchsorted(deg, np.arange(deg.max() + 2))
    return [(int(offs[d]), int(offs[d + 1]))
            for d in range(int(deg.max()) + 1)]


def _mono_levels(vprim, parent, varidx, levels):
    """Yield (offset, [level monomials]) keeping only one level live.

    VMEM discipline: the full (A_t, K, n_mono) stack exceeds the scoped
    VMEM budget, so consumers accumulate per degree level (parents are
    always exactly one level down)."""
    cur = [jnp.ones_like(vprim[0])]
    yield 0, cur
    prev_lo = 0
    for (lo, hi) in levels[1:]:
        prev = cur
        cur = [prev[int(parent[i]) - prev_lo] * vprim[int(varidx[i])]
               for i in range(lo, hi)]
        prev_lo = lo
        yield lo, cur


def _mono_levels_dual(vprim, vtan, parent, varidx, levels):
    """Dual version of `_mono_levels`: yields (off, prim list, tan list)."""
    cur_p = [jnp.ones_like(vprim[0])]
    cur_t = [jnp.zeros_like(vtan[0])]
    yield 0, cur_p, cur_t
    prev_lo = 0
    for (lo, hi) in levels[1:]:
        prev_p, prev_t = cur_p, cur_t
        cur_p, cur_t = [], []
        for i in range(lo, hi):
            pa = int(parent[i]) - prev_lo
            vi = int(varidx[i])
            cur_p.append(prev_p[pa] * vprim[vi])
            cur_t.append(prev_t[pa] * vprim[vi][None]
                         + prev_p[pa][None] * vtan[vi])
        prev_lo = lo
        yield lo, cur_p, cur_t


def _make_utot_kernel(params, exps, parent, varidx):
    rmin0 = float(params.rmin0)
    rfac0 = float(params.rfac0)
    switchflag = bool(params.switchflag)
    levels = _level_offsets(exps, parent, varidx)

    def kernel(disp_ref, rcut_ref, wj_ref, mask_ref, L_ref, out_ref):
        disp = disp_ref[:]
        mask = mask_ref[:] > 0
        ck, w, _, _ = _ck_prologue(disp, rcut_ref[:], wj_ref[:], mask,
                                   rmin0, rfac0, switchflag)
        At, K = w.shape
        U = None
        for lo, blk in _mono_levels(ck, parent, varidx, levels):
            Md = jnp.stack(blk, -1).reshape(At * K, len(blk))
            part = jnp.dot(Md, L_ref[lo:lo + len(blk), :],
                           preferred_element_type=jnp.float32)
            U = part if U is None else U + part         # (A_t*K, 2U)
        U3 = U.reshape(At, K, -1)
        out_ref[:] = (w[..., None] * U3).sum(axis=1)

    return kernel


def utot_pallas(disp, rcutij, wjp, mask, params, a_tile=8):
    """Neighbor-summed weighted U expansion for one padded config.

    disp (A, K, 3); rcutij/wjp/mask (A, K).  Returns (A, 2U) f32 — the
    [wu_r | wu_i] sum WITHOUT the self term (added by the caller).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plan = params.plan
    exps, parent, varidx, L = mono_plan(plan.twojmax)
    A, K, _ = disp.shape
    a_tile = min(a_tile, A)
    while A % a_tile:
        a_tile -= 1
    u2 = L.shape[1]
    kernel = _make_utot_kernel(params, exps, parent, varidx)
    grid = (A // a_tile,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((a_tile, K, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_tile, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_tile, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_tile, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((a_tile, u2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A, u2), jnp.float32),
    )(disp.astype(jnp.float32), rcutij.astype(jnp.float32),
      wjp.astype(jnp.float32), mask.astype(jnp.float32),
      jnp.asarray(L, jnp.float32))


def _make_dbdd_kernel(params, exps, parent, varidx):
    rmin0 = float(params.rmin0)
    rfac0 = float(params.rfac0)
    switchflag = bool(params.switchflag)
    levels = _level_offsets(exps, parent, varidx)

    def kernel(disp_ref, rcut_ref, wj_ref, mask_ref, cl_ref, out_ref):
        disp = disp_ref[:]
        mask = mask_ref[:] > 0
        rcutij = rcut_ref[:]
        wjp = wj_ref[:]

        def scal(d):
            ck, w, _, _ = _ck_prologue(d, rcutij, wjp, mask, rmin0, rfac0,
                                       switchflag)
            return ck + (w,)

        eye = jnp.eye(3, dtype=disp.dtype)
        tg = jnp.broadcast_to(eye[:, None, None, :], (3,) + disp.shape)
        prim = scal(disp)
        tans = jax.vmap(lambda t: jax.jvp(scal, (disp,), (t,))[1])(tg)
        wp, wt = prim[4], tans[4]
        CL = cl_ref[:]                                  # (A_t, W, nm)

        # D1[a, t, k] = sum_alpha CL[a,t,lo:hi] . M_level[a,k,:] —
        # accumulated per degree level so only one level stays in VMEM
        D1 = None
        D2 = [None, None, None]
        for lo, blk_p, blk_t in _mono_levels_dual(
                prim[:4], tans[:4], parent, varidx, levels):
            nl = len(blk_p)
            CLd = CL[:, :, lo:lo + nl]                  # (A_t, W, nl)
            Md = jnp.stack(blk_p, -1)                   # (A_t, K, nl)
            dn = (((2,), (2,)), ((0,), (0,)))
            part = jax.lax.dot_general(
                CLd, Md, dn, preferred_element_type=jnp.float32)
            D1 = part if D1 is None else D1 + part      # (A_t, W, K)
            for c in range(3):
                Mtd = jnp.stack([t[c] for t in blk_t], -1)
                p2 = jax.lax.dot_general(
                    CLd, Mtd, dn, preferred_element_type=jnp.float32)
                D2[c] = p2 if D2[c] is None else D2[c] + p2

        out = [wp[:, None, :] * D2[c] + wt[c][:, None, :] * D1
               for c in range(3)]
        out_ref[:] = jnp.stack(out, -1)                 # (A_t, W, K, 3)

    return kernel


def dbdd_pallas(disp, rcutij, wjp, mask, CL, params, a_tile=8):
    """Per-pair descriptor gradients dBdD (A, W, K, 3) for one config.

    CL: (A, W, n_mono) = dB/dutot projected through the monomial
    change-of-basis (CL = dBdu @ L^T, computed in XLA — it is per-atom
    sized).  The per-pair dual monomial chains and the contraction run
    fused per atom tile; the (3, A, K, 2U) tangent tensor of the XLA path
    never exists.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plan = params.plan
    exps, parent, varidx, L = mono_plan(plan.twojmax)
    A, K, _ = disp.shape
    a_tile = min(a_tile, A)
    while A % a_tile:
        a_tile -= 1
    W = CL.shape[1]
    kernel = _make_dbdd_kernel(params, exps, parent, varidx)
    grid = (A // a_tile,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((a_tile, K, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_tile, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_tile, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_tile, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_tile, W, L.shape[0]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((a_tile, W, K, 3), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A, W, K, 3), jnp.float32),
    )(disp.astype(jnp.float32), rcutij.astype(jnp.float32),
      wjp.astype(jnp.float32), mask.astype(jnp.float32),
      CL.astype(jnp.float32))
