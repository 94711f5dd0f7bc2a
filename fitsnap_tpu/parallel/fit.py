"""Multi-chip distributed linear fitting over a JAX device mesh.

TPU-native replacement for the reference's MPI/ScaLAPACK machinery
(`fitsnap3lib/parallel_tools.py`, `solvers/scalapack.py`,
`lib/scalapack_solver/scalapack.pyx`):

  - configurations are data-parallel over the mesh's 'dp' axis (the
    reference stride-splits configs across MPI ranks, `scrape.py:203`);
  - each device turns its configs into weighted rows and accumulates the
    normal equations A^T A / A^T b locally (the reference's optional
    "transpose trick", `solvers/svd.py:48`, is the *default* here because it
    shrinks the collective to width^2);
  - one `psum` over ICI reduces the normal equations; the dense solve is
    replicated (width is small: tens to a few thousand).

No shared-memory windows, no row-range bookkeeping, no BLACS grids: the
sharded array axis plus one collective expresses the whole thing.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fitsnap_tpu.ops.refpot import reference_eav
from fitsnap_tpu.ops.snap import descriptors_with_jacobian


def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (f32-safe)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def compile_concurrently(items):
    """AOT-compile many jitted programs at once: [(jit_fn, args)] ->
    [compiled executables], lowered serially (host tracing) but compiled
    through a thread pool.  XLA compilation for the remote TPU happens
    SERVER-side, so concurrent compile RPCs parallelize across the server's
    cores — measured ~N programs in ~1.3x the wall time of one, vs Nx when
    each program compiles lazily at first call.  This is what removes the
    multi-program compile wall from large streamed fits (WBe: 8 bucket
    programs used to pay ~290 s of serial compiles).

    Compiled executables also land in the persistent compile cache, so a
    caller that prefers calling the original jit fns still benefits.
    """
    return [f.result() for f in compile_futures(items)]


def compile_futures(items):
    """Like `compile_concurrently` but returns concurrent.futures so the
    caller can start EXECUTING each program the moment its compile lands
    (`future.result()`), overlapping device compute with the remaining
    server-side compiles instead of barriering on all of them."""
    from concurrent.futures import ThreadPoolExecutor

    lowered = [fn.lower(*args) for fn, args in items]
    ex = ThreadPoolExecutor(max_workers=max(len(lowered), 1))
    futures = [ex.submit(lo.compile) for lo in lowered]
    ex.shutdown(wait=False)
    return futures


def device_neighbors(pos_hi, pos_lo, svec_hi, svec_lo, natoms, cutoff,
                     k_pad):
    """On-device neighbor construction for one padded config.

    Positions are ~50x smaller than the (disp, jidx, mask) tensors, so
    building neighbor lists on-chip removes most of the host->device
    transfer and all of the host-side neighbor pass.

    Inputs come as hi/lo float pairs (host f64 split): naive f32
    `pos_j + svec - pos_i` loses ~2e-6 A to cancellation against ~40 A
    intermediates, which the steep ZBL reference subtraction amplifies to
    percent-level truth errors on close-pair configs.  Selection runs on the
    cheap hi parts; the selected displacements are reassembled with a
    compensated TwoSum chain (error ~1 ulp of the final ~4 A value).

    svec: per-config image shift vectors (S, 3) = shifts @ cell^T, computed
    f64 on host (`pack_batch_pos`); padded images fall outside the cutoff.
    """
    A = pos_hi.shape[0]
    dtp = pos_hi.dtype
    S = svec_hi.shape[0]
    cand = pos_hi[None, :, :] + svec_hi[:, None, :]                # (S, A, 3)
    diff = cand[None, :, :, :] - pos_hi[:, None, None, :]          # (A,S,A,3)
    d2 = jnp.sum(diff * diff, axis=-1)
    i_idx = jnp.arange(A)
    j_real = i_idx[None, None, :] < natoms
    i_real = (i_idx < natoms)[:, None, None]
    home = jnp.all((svec_hi == 0) & (svec_lo == 0), axis=1)        # (S,)
    self_pair = home[None, :, None] & (i_idx[:, None, None]
                                       == i_idx[None, None, :])
    valid = (d2 < cutoff * cutoff) & j_real & i_real & ~self_pair
    # nearest-first top-k selection: if k_pad ever truncates, only the
    # farthest (switching-function-suppressed) pairs are dropped
    score = jnp.where(valid, -d2, -jnp.inf).reshape(A, S * A)
    vals, order = jax.lax.top_k(score, k_pad)                      # (A, K)
    mask = vals > -jnp.inf
    s_sel, j_sel = order // A, order % A
    s1, e1 = _two_sum(svec_hi[s_sel], pos_hi[j_sel])
    s2, e2 = _two_sum(s1, -pos_hi[:, None, :])
    lo = svec_lo[s_sel] + pos_lo[j_sel] - pos_lo[:, None, :]
    disp = s2 + (e1 + e2 + lo)
    disp = jnp.where(mask[..., None], disp, jnp.array([1.0, 0.0, 0.0], dtp))
    jidx = j_sel.astype(jnp.int32)
    return disp, jidx, mask


def batch_shift_table(cells, cutoff):
    """Host-side: one static image-shift table covering all cells."""
    from fitsnap_tpu.ops.neighbors import required_shifts, shift_table
    nmax = np.max([required_shifts(c, cutoff) for c in cells], axis=0)
    return tuple(map(tuple, shift_table(nmax)))


def plan_shift_groups(packed, cutoff):
    """Group configs so image-table size tracks cell size.

    A global shift table sized for the smallest cell (e.g. a 2-atom EOS
    volume scan needing +-3 images) would make every large config pay an
    S*A candidate axis; grouping by per-config max shift keeps S=27 for the
    bulk of a typical dataset.  Returns a list of
    {"configs", "a_pad", "k_pad", "s_table"} with natoms/neighbor pads
    computed per group (native count pass).
    """
    from fitsnap_tpu.ops.neighbors import (count_neighbors, required_shifts,
                                           shift_table)
    by_n = {}
    for pc in packed:
        nmx = int(required_shifts(pc.cell, cutoff).max())
        by_n.setdefault(nmx, []).append(pc)
    groups = []
    for nmx, cfgs in sorted(by_n.items()):
        kmax = max(count_neighbors(pc.pos, pc.cell, pc.natoms, cutoff)
                   for pc in cfgs)
        nvec = np.max([required_shifts(pc.cell, cutoff) for pc in cfgs], 0)
        groups.append({
            "configs": cfgs,
            "a_pad": max(8, -(-max(pc.natoms for pc in cfgs) // 8) * 8),
            "k_pad": max(8, -(-kmax // 8) * 8),
            "s_table": tuple(map(tuple, shift_table(nvec))),
        })
    return groups


def plan_pos_buckets(packed, cutoff, max_programs=10, program_cost=None,
                     units_per_sec=1.0e8):
    """Shape plan for the positions/device-neighbor path on large datasets.

    `plan_shift_groups` pads every config in a shift group to the group max
    natoms — ruinous when a group mixes 8-atom EOS cells with 512-atom
    surfaces (WBe).  Here configs bucket by (shift extent, natoms bucket,
    kmax bucket), then buckets greedily coalesce into covering shapes,
    choosing the merge with the least added padding work at each step.

    Merging continues while the cheapest merge costs less padding compute
    than one program's fixed cost (compile / persistent-cache load +
    dispatch — ~6 s measured through the remote TPU relay; tune with
    `program_cost` seconds or FITSNAP_TPU_PROGRAM_COST), and in any case
    until at most `max_programs` shapes remain.  `units_per_sec` calibrates
    the cost proxy to wall clock (measured: ~1e8 units/s on v5e,
    `benchmarks/kernel_probe.py`).

    Returns the same group dicts as `plan_shift_groups`.
    """
    import os
    if program_cost is None:
        program_cost = float(os.environ.get(
            "FITSNAP_TPU_PROGRAM_COST", "6.0"))
    from fitsnap_tpu.calculators.snap import _A_BUCKETS, _K_BUCKETS, _pad_to
    from fitsnap_tpu.ops.neighbors import (count_neighbors, required_shifts,
                                           shift_table)

    groups = {}
    for pc in packed:
        nvec = np.asarray(required_shifts(pc.cell, cutoff))
        kmax = count_neighbors(pc.pos, pc.cell, pc.natoms, cutoff)
        key = (int(nvec.max()), _pad_to(pc.natoms, _A_BUCKETS),
               _pad_to(kmax, _K_BUCKETS))
        g = groups.setdefault(key, {"configs": [], "nvec": np.zeros(3, int),
                                    "a_pad": key[1], "k_pad": key[2]})
        g["configs"].append(pc)
        g["nvec"] = np.maximum(g["nvec"], nvec)

    def cost(g, a_pad=None, k_pad=None, nvec=None):
        # per-config device work proxy: A*S*A candidate pass + descriptor
        # pass ~ A*K (the per-pair kernel dominates; 30 ~ flops ratio)
        a = a_pad if a_pad is not None else g["a_pad"]
        k = k_pad if k_pad is not None else g["k_pad"]
        nv = nvec if nvec is not None else g["nvec"]
        S = int(np.prod(2 * np.asarray(nv) + 1))
        return len(g["configs"]) * (a * S * a + 30 * a * k)

    items = list(groups.values())
    merge_budget = program_cost * units_per_sec
    while len(items) > 1:
        best = None
        for i, src in enumerate(items):
            for j, dst in enumerate(items):
                if i == j:
                    continue
                a = max(src["a_pad"], dst["a_pad"])
                k = max(src["k_pad"], dst["k_pad"])
                nv = np.maximum(src["nvec"], dst["nvec"])
                added = (cost(src, a, k, nv) + cost(dst, a, k, nv)
                         - cost(src) - cost(dst))
                if best is None or added < best[0]:
                    best = (added, i, j, a, k, nv)
        added, i, j, a, k, nv = best
        if len(items) <= max_programs and added > merge_budget:
            break
        items[j] = {"configs": items[j]["configs"] + items[i]["configs"],
                    "nvec": nv, "a_pad": a, "k_pad": k}
        del items[i]

    return [{"configs": g["configs"], "a_pad": g["a_pad"],
             "k_pad": g["k_pad"],
             "s_table": tuple(map(tuple, shift_table(g["nvec"])))}
            for g in items]


def make_mesh(n_devices=None, devices=None):
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("dp",))


def config_normal_contrib(disp, jidx, mask, types, natoms, cell,
                          energy, forces, stress6, eweight, fweight, vweight,
                          params, numtypes, flags, refspec=None, coeff=None,
                          with_ata=True, accum_dtype=None, kernel=None,
                          const_mode=None):
    """Weighted normal-equation contribution of ONE padded config.

    Returns (AtA (W, W), Atb (W,), nrows scalar).  Padded configs
    (natoms == 0) contribute zero.  With `coeff` given, truths are replaced
    by residuals truth - row.coeff — the mixed-precision iterative
    refinement pass (residuals are small, so f32 rows retain full relative
    accuracy where the directly-formed normal equations cannot).

    `kernel(disp, jelem, ielem, mask) -> (B, G, smask)` overrides the
    descriptor engine (default: SNAP with radelem pair cutoffs); use
    `ace_kernel(plan)` for ACE.  `const_mode` controls the constant-offset
    columns: None derives SNAP's per-type interleave from
    `params.plan.bzeroflag`; ("ace", nelem) prepends nelem atom-count
    columns (AceCalculator._assemble layout); False adds none.
    """
    A = disp.shape[0]
    dtp = disp.dtype
    real = (jnp.arange(A) < natoms).astype(dtp)

    if kernel is None:
        kernel = snap_kernel(params)
    B, G, smask = kernel(disp, types[jidx], types, mask)
    B = B * real[:, None]
    G = G * real[:, None, None, None]

    # SNAP layout interleaves per-type blocks; ACE labels are already
    # element-resolved (one flat block)
    if const_mode is None or const_mode == "snap":
        oh = jax.nn.one_hot(types, numtypes, dtype=dtp) * real[:, None]
    else:
        oh = real[:, None]
    nat_safe = jnp.maximum(natoms, 1).astype(dtp)
    e_row = (oh.T @ B).reshape(-1) / nat_safe

    GT = jnp.einsum("at,awkc->takwc", oh, G)
    W0 = e_row.shape[0]
    oj = jax.nn.one_hot(jidx, A, dtype=dtp)
    scat = jnp.einsum("ikn,tikwc->ntwc", oj, GT).reshape(A, W0, 3)
    rowsum = GT.sum(axis=2).transpose(1, 0, 2, 3).reshape(A, W0, 3)
    f_rows = -(scat - rowsum).transpose(0, 2, 1).reshape(A * 3, W0)

    vol = cell[0, 0] * cell[1, 1] * cell[2, 2]
    pa = jnp.array([0, 1, 2, 1, 0, 0])
    pb = jnp.array([0, 1, 2, 2, 2, 1])
    dm = disp * smask[..., None].astype(dtp)
    vir = -jnp.einsum("ikx,tikwy->xytw", dm, GT).reshape(3, 3, W0)
    v_rows = vir[pa, pb] * (1.6021765e6 / vol)

    if const_mode is None:
        const_mode = False if params.plan.bzeroflag else "snap"
    if const_mode == "snap":
        # per-type constant column (atom-count fraction on energy rows,
        # zero elsewhere) — `lammps_snap.py:455-464`
        ncoeff = W0 // numtypes
        counts = oh.sum(0) / nat_safe                       # (T,)
        e_row = jnp.concatenate(
            [counts[:, None], e_row.reshape(numtypes, ncoeff)],
            axis=1).reshape(-1)
        f_rows = jnp.concatenate(
            [jnp.zeros((A * 3, numtypes, 1), dtp),
             f_rows.reshape(A * 3, numtypes, ncoeff)], axis=2) \
            .reshape(A * 3, -1)
        v_rows = jnp.concatenate(
            [jnp.zeros((6, numtypes, 1), dtp),
             v_rows.reshape(6, numtypes, ncoeff)], axis=2).reshape(6, -1)
    elif const_mode and const_mode[0] == "ace":
        # nelem leading atom-count-fraction columns
        # (calculators/ace.py:_assemble expand)
        nel = const_mode[1]
        ohe = jax.nn.one_hot(types, nel, dtype=dtp) * real[:, None]
        counts = ohe.sum(0) / nat_safe
        e_row = jnp.concatenate([counts, e_row])
        f_rows = jnp.concatenate(
            [jnp.zeros((A * 3, nel), dtp), f_rows], axis=1)
        v_rows = jnp.concatenate([jnp.zeros((6, nel), dtp), v_rows], axis=1)

    if refspec is not None:
        re_, rf_, rv_ = reference_eav(disp, jidx, mask, types, natoms, refspec)
        energy = energy - re_
        forces = forces - rf_
        stress6 = stress6 - rv_ * (1.6021765e6 / vol)

    live = (natoms > 0).astype(dtp)
    W = e_row.shape[0]
    # Accumulate the normal equations at higher precision than the rows:
    # descriptor FLOPs stay f32 on the MXU, the W^2-sized outer products are
    # a negligible FLOP fraction and f64 emulation on TPU is cheap there.
    adt = accum_dtype or dtp
    AtA = jnp.zeros((W, W), adt)
    Atb = jnp.zeros((W,), adt)
    nrows = jnp.zeros((), dtp)
    if flags["energy"]:
        we = (eweight * live).astype(adt)
        b_e = energy / nat_safe
        if coeff is not None:
            b_e = b_e - e_row @ coeff
        e64 = e_row.astype(adt)
        if with_ata:
            AtA += we ** 2 * jnp.outer(e64, e64)
        Atb += we ** 2 * e64 * b_e.astype(adt)
        nrows += live
    if flags["force"]:
        frow_mask = jnp.repeat(real, 3)
        wf = (fweight * frow_mask * live).astype(adt)
        f64r = f_rows.astype(adt)
        fw = f64r * wf[:, None]
        b_f = forces.reshape(-1)
        if coeff is not None:
            b_f = b_f - f_rows @ coeff
        if with_ata:
            AtA += fw.T @ fw
        Atb += fw.T @ (wf * b_f.astype(adt))
        nrows += 3 * natoms * live
    if flags["stress"]:
        wv = (vweight * live).astype(adt)
        v64 = v_rows.astype(adt)
        vw = v64 * wv
        b_v = stress6
        if coeff is not None:
            b_v = b_v - v_rows @ coeff
        if with_ata:
            AtA += vw.T @ vw
        Atb += vw.T @ (wv * b_v.astype(adt))
        nrows += 6 * live
    return AtA, Atb, nrows


def build_step_fn(params, numtypes, flags, mesh, ridge=0.0, refspec=None,
                  neighbors=None, accumulate=False, kernel=None,
                  const_mode=None, width=None):
    """Jitted sharded 'training step': batch of configs -> coefficients.

    Batch arrays have shape (nchunks, per_chunk, ...) with the per-chunk
    axis sharded over mesh axis 'dp'; a `lax.scan` over chunks bounds HBM
    (the full per-pair U tangents of all configs would not fit), the normal
    equations reduce over ICI via the sharding-induced psum, and the
    Cholesky solve is replicated.

    With `neighbors={"cutoff", "k_pad"}` the batch carries positions
    instead of neighbor tensors (13 arrays, `pack_batch_pos`) and neighbor
    lists are built on device (`device_neighbors`).

    With `accumulate=True`, returns (acc_step, init, finish):
    `acc = acc_step(acc, batch)` adds the batch's normal-equation
    contribution into a DEVICE-resident accumulator — streaming a large
    dataset through many calls downloads nothing until `finish(acc)`
    (device->host is the slow direction through the remote relay).
    """
    dp = NamedSharding(mesh, P(None, "dp"))
    repl = NamedSharding(mesh, P())

    def step(batch):
        accum = jnp.float64 if jax.config.jax_enable_x64 else None
        base = partial(config_normal_contrib, params=params,
                       numtypes=numtypes, flags=flags, refspec=refspec,
                       accum_dtype=accum, kernel=kernel,
                       const_mode=const_mode)
        if neighbors is None:
            contrib = jax.vmap(base)
        else:
            def one(ph, pl, sh, sl, types, natoms, cell, *truths):
                disp, jidx, mask = device_neighbors(
                    ph, pl, sh, sl, natoms, neighbors["cutoff"],
                    neighbors["k_pad"])
                return base(disp, jidx, mask, types, natoms, cell, *truths)
            contrib = jax.vmap(one)

        W = width or (numtypes * params.plan.ncoeff
                      + (0 if params.plan.bzeroflag else numtypes))
        dtp = batch[0].dtype

        def body(carry, chunk):
            AtA, Atb, nrows = carry
            a, b, n = contrib(*chunk)
            return (AtA + a.sum(0), Atb + b.sum(0), nrows + n.sum()), None

        adt = accum or dtp
        init = (jnp.zeros((W, W), adt), jnp.zeros((W,), adt),
                jnp.zeros((), dtp))
        (AtA, Atb, nrows), _ = jax.lax.scan(body, init, batch)
        # f64 device->host transfers are pathologically slow through the
        # remote-TPU relay (the X64-rewrite buffers convert per element), so
        # emit hi/lo f32 pairs and recombine on host.
        if adt == jnp.float64 and jax.default_backend() == "tpu":
            flat = AtA.reshape(-1)
            a_hi = flat.astype(jnp.float32)
            a_lo = (flat - a_hi.astype(jnp.float64)).astype(jnp.float32)
            b_hi = Atb.astype(jnp.float32)
            b_lo = (Atb - b_hi.astype(jnp.float64)).astype(jnp.float32)
            return (a_hi, a_lo), (b_hi, b_lo), nrows
        return (AtA.reshape(-1),), (Atb,), nrows

    nbatch = 12 if neighbors is None else 13

    if accumulate:
        def step_acc(acc, batch):
            a_parts, b_parts, nrows = step(batch)
            return (acc[0] + sum(x.astype(acc[0].dtype) for x in a_parts),
                    acc[1] + sum(x.astype(acc[1].dtype) for x in b_parts),
                    acc[2] + nrows)

        jitted_acc = jax.jit(step_acc,
                             in_shardings=((repl,) * 3, (dp,) * nbatch),
                             out_shardings=(repl,) * 3,
                             donate_argnums=(0,))

        def init_fn():
            W = width or (numtypes * params.plan.ncoeff
                          + (0 if params.plan.bzeroflag else numtypes))
            return (jnp.zeros((W * W,), jnp.float64),
                    jnp.zeros((W,), jnp.float64), jnp.zeros(()))

        split = jax.jit(lambda a: tuple(
            (x.astype(jnp.float32),
             (x - x.astype(jnp.float32).astype(jnp.float64))
             .astype(jnp.float32)) for x in a[:2]) + (a[2].astype(
                 jnp.float32),))

        def finish(acc):
            (a_hi, a_lo), (b_hi, b_lo), nrows = split(acc)
            # download as f32 and recombine on host: requesting f64 from a
            # device array converts on device and takes the pathologically
            # slow per-element f64 transfer path through the relay
            AtA = (np.asarray(a_hi).astype(np.float64)
                   + np.asarray(a_lo).astype(np.float64))
            Atb = (np.asarray(b_hi).astype(np.float64)
                   + np.asarray(b_lo).astype(np.float64))
            return AtA, Atb, float(np.asarray(nrows))

        # exposed so streaming callers can precompile the finish program
        # concurrently with the bucket programs (its lazy jit otherwise
        # lands on the critical path as a mystery ~10 s "download")
        finish._jitted = split
        return jitted_acc, init_fn, finish

    jitted = jax.jit(step, in_shardings=((dp,) * nbatch,),
                     out_shardings=(repl, repl, repl))

    def wrapped(batch):
        a_parts, b_parts, nrows = jitted(batch)
        AtA = sum(np.asarray(x, np.float64) for x in a_parts)
        Atb = sum(np.asarray(x, np.float64) for x in b_parts)
        return AtA, Atb, nrows

    wrapped._jitted = jitted   # exposed for XLA cost analysis (bench.py)
    return wrapped


def build_residual_fn(params, numtypes, flags, mesh, refspec=None,
                      kernel=None, const_mode=None, neighbors=None):
    """Jitted sharded refinement pass: A^T (b - A x), truths through rows.

    One or two of these after the direct solve recover near-f64 fit quality
    from f32 device rows (mixed-precision iterative refinement on the
    normal equations).
    """
    dp = NamedSharding(mesh, P(None, "dp"))
    repl = NamedSharding(mesh, P())

    def res(coeff, batch):
        def contrib1(*chunk_cols):
            if neighbors is not None:
                ph, pl, sh, sl, types, natoms = chunk_cols[:6]
                disp, jidx, mask = device_neighbors(
                    ph, pl, sh, sl, natoms, neighbors["cutoff"],
                    neighbors["k_pad"])
                chunk_cols = (disp, jidx, mask, types, natoms) \
                    + chunk_cols[6:]
            return config_normal_contrib(
                *chunk_cols, params=params, numtypes=numtypes, flags=flags,
                refspec=refspec, coeff=coeff, with_ata=False,
                kernel=kernel, const_mode=const_mode)

        contrib = jax.vmap(contrib1)

        W = coeff.shape[0]
        dtp = batch[0].dtype

        def body(Atr, chunk):
            _, b, _ = contrib(*chunk)
            return Atr + b.sum(0), None

        Atr, _ = jax.lax.scan(body, jnp.zeros((W,), dtp), batch)
        return Atr

    nbatch = 12 if neighbors is None else 13
    return jax.jit(res, in_shardings=(repl, (dp,) * nbatch),
                   out_shardings=repl)


class NormalSolver:
    """Host float64 solve of device-accumulated normal equations.

    Column equilibration + eigh pseudo-inverse mirror lstsq's relative
    rcond cutoff; the factorization is kept so iterative-refinement deltas
    reuse it.
    """

    def __init__(self, AtA, ridge=0.0, rcond_factor=10.0):
        self.eps = float(np.finfo(np.asarray(AtA).dtype).eps)
        AtA = np.asarray(AtA, np.float64)
        if AtA.ndim == 1:
            W = int(round(AtA.size ** 0.5))
            AtA = AtA.reshape(W, W)
        W = AtA.shape[0]
        AtA = AtA + ridge * np.eye(W)
        self.AtA = AtA
        self.d = np.sqrt(np.clip(np.diag(AtA), 1e-300, None))
        An = AtA / self.d[:, None] / self.d[None, :]
        self.evals, self.evecs = np.linalg.eigh(An)
        self.inv = np.where(
            self.evals > rcond_factor * self.eps * self.evals[-1],
            1.0 / np.where(self.evals == 0, 1.0, self.evals), 0.0)

    def solve(self, rhs):
        bn = np.asarray(rhs, np.float64) / self.d
        return (self.evecs @ (self.inv * (self.evecs.T @ bn))) / self.d


def fit_refined(step_fn, residual_fn, batch, ridge=0.0, refine_iters=2):
    """Direct normal-equation solve + iterative refinement through rows."""
    import jax

    AtA, Atb, nrows = step_fn(batch)
    solver = NormalSolver(AtA, ridge=ridge)
    x = solver.solve(Atb)
    dtp = np.asarray(Atb).dtype
    for _ in range(refine_iters):
        Atr = residual_fn(jnp.asarray(x, dtp), batch)
        x = x + solver.solve(np.asarray(Atr, np.float64))
    return x, solver, float(np.asarray(nrows))


def build_eval_fn(params, numtypes, flags, mesh, refspec=None,
                  neighbors=None):
    """Jitted sharded evaluation: unweighted energy/force MAE of a fit.

    Returns (sum_abs_e_res, n_e, sum_abs_f_res, n_f) — MAE in the
    reference's metric convention (energies per atom, `solver.py:108`).
    """
    dp = NamedSharding(mesh, P(None, "dp"))
    repl = NamedSharding(mesh, P())

    def one(coeff, disp, jidx, mask, types, natoms, cell,
            energy, forces, stress6, ew, fw, vw):
        A = disp.shape[0]
        dtp = disp.dtype
        radelem = jnp.asarray(params.radelem, dtp)
        rcutij = (radelem[types][:, None] + radelem[types[jidx]]) \
            * params.rcutfac
        r2 = jnp.sum(disp * disp, -1)
        smask = mask & (r2 < rcutij * rcutij)
        jelem = types[jidx]
        real = (jnp.arange(A) < natoms).astype(dtp)
        B, G = descriptors_with_jacobian(disp, jelem, smask, types, params)
        B = B * real[:, None]
        G = G * real[:, None, None, None]
        oh = jax.nn.one_hot(types, numtypes, dtype=dtp) * real[:, None]
        nat_safe = jnp.maximum(natoms, 1).astype(dtp)
        e_row = (oh.T @ B).reshape(-1) / nat_safe
        GT = jnp.einsum("at,awkc->takwc", oh, G)
        W0 = e_row.shape[0]
        oj = jax.nn.one_hot(jidx, A, dtype=dtp)
        scat = jnp.einsum("ikn,tikwc->ntwc", oj, GT).reshape(A, W0, 3)
        rowsum = GT.sum(axis=2).transpose(1, 0, 2, 3).reshape(A, W0, 3)
        f_rows = -(scat - rowsum).transpose(0, 2, 1).reshape(A * 3, W0)
        if refspec is not None:
            re_, rf_, rv_ = reference_eav(disp, jidx, mask, types, natoms,
                                          refspec)
            energy = energy - re_
            forces = forces - rf_
        if not params.plan.bzeroflag:
            ncoeff = W0 // numtypes
            counts = oh.sum(0) / nat_safe
            e_row = jnp.concatenate(
                [counts[:, None], e_row.reshape(numtypes, ncoeff)],
                axis=1).reshape(-1)
            f_rows = jnp.concatenate(
                [jnp.zeros((A * 3, numtypes, 1), dtp),
                 f_rows.reshape(A * 3, numtypes, ncoeff)], axis=2) \
                .reshape(A * 3, -1)
        live = (natoms > 0).astype(dtp)
        e_res = jnp.abs(e_row @ coeff - energy / nat_safe) * live
        frow_mask = jnp.repeat(real, 3) * live
        f_res = jnp.abs(f_rows @ coeff - forces.reshape(-1)) * frow_mask
        return e_res, live, f_res.sum(), frow_mask.sum()

    if neighbors is None:
        onev = one
    else:
        def onev(coeff, ph, pl, sh, sl, types, natoms, cell, *truths):
            disp, jidx, mask = device_neighbors(
                ph, pl, sh, sl, natoms, neighbors["cutoff"],
                neighbors["k_pad"])
            return one(coeff, disp, jidx, mask, types, natoms, cell,
                       *truths)

    def evaluate(coeff, batch):
        ev = jax.vmap(partial(onev))
        def body(carry, chunk):
            se, ne, sf, nf = carry
            e_res, live, f_sum, f_n = ev(jnp.broadcast_to(
                coeff, (chunk[0].shape[0],) + coeff.shape), *chunk)
            return (se + e_res.sum(), ne + live.sum(),
                    sf + f_sum.sum(), nf + f_n.sum()), None
        z = jnp.zeros((), batch[0].dtype)
        (se, ne, sf, nf), _ = jax.lax.scan(body, (z, z, z, z), batch)
        return se, ne, sf, nf

    nbatch = 12 if neighbors is None else 13
    return jax.jit(evaluate, in_shardings=(repl, (dp,) * nbatch),
                   out_shardings=(repl,) * 4)


def pack_batch_pos(packed_configs, a_pad, n_pad, s_table, dtype=np.float32,
                   chunks=1):
    """Positions-based batch tuple for the on-device-neighbor step.

    ~50x less host->device data than `pack_batch` (no disp/jidx/mask).
    Positions and image-shift vectors ship as hi/lo float pairs so device
    displacement assembly reaches f64-quality accuracy (see
    `device_neighbors`).  Returns (pos_hi, pos_lo, svec_hi, svec_lo, types,
    natoms, cell, energy, forces, stress6, ew, fw, vw).
    """
    n = n_pad
    S = len(s_table)
    shifts = np.asarray(s_table, np.float64)
    pos_hi = np.zeros((n, a_pad, 3), dtype)
    pos_lo = np.zeros((n, a_pad, 3), dtype)
    svec_hi = np.zeros((n, S, 3), dtype)
    svec_lo = np.zeros((n, S, 3), dtype)
    types = np.zeros((n, a_pad), np.int32)
    nat = np.zeros((n,), np.int32)
    cell = np.eye(3, dtype=dtype)[None].repeat(n, 0)
    energy = np.zeros((n,), dtype)
    forces = np.zeros((n, a_pad, 3), dtype)
    stress6 = np.zeros((n, 6), dtype)
    ew = np.zeros((n,), dtype)
    fw = np.zeros((n,), dtype)
    vw = np.zeros((n,), dtype)

    def split(x):
        hi = np.asarray(x, dtype)
        return hi, np.asarray(x - hi.astype(np.float64), dtype)

    for j, pc in enumerate(packed_configs):
        na = pc.natoms
        pos_hi[j, :na], pos_lo[j, :na] = split(np.asarray(pc.pos, np.float64))
        sv = shifts @ np.asarray(pc.cell, np.float64).T
        svec_hi[j], svec_lo[j] = split(sv)
        types[j, :na] = pc.types
        nat[j] = na
        cell[j] = pc.cell
        d = pc.data
        energy[j] = d.get("Energy", 0.0)
        fo = d.get("Forces")
        if fo is not None:
            forces[j, :na] = fo
        st = d.get("Stress")
        if st is not None:
            st = np.asarray(st)
            stress6[j] = st[[0, 1, 2, 1, 0, 0], [0, 1, 2, 2, 2, 1]]
        ew[j] = d.get("eweight", 1.0)
        fw[j] = d.get("fweight", 1.0)
        vw[j] = d.get("vweight", 1.0)
    out = (pos_hi, pos_lo, svec_hi, svec_lo, types, nat, cell, energy,
           forces, stress6, ew, fw, vw)
    if chunks > 1:
        assert n % chunks == 0
        return tuple(x.reshape((chunks, n // chunks) + x.shape[1:])
                     for x in out)
    return tuple(x[None] for x in out)


def pack_batch(packed_configs, a_pad, k_pad, n_pad, dtype=np.float32,
               chunks=1):
    """Stack host-preprocessed configs into the sharded-step batch tuple.

    With `chunks` > 1, each array is reshaped to (chunks, n_pad/chunks, ...)
    for the scan-chunked step function.
    """
    n = n_pad
    disp = np.zeros((n, a_pad, k_pad, 3), dtype)
    jidx = np.zeros((n, a_pad, k_pad), np.int32)
    mask = np.zeros((n, a_pad, k_pad), bool)
    types = np.zeros((n, a_pad), np.int32)
    nat = np.zeros((n,), np.int32)
    cell = np.eye(3, dtype=dtype)[None].repeat(n, 0)
    energy = np.zeros((n,), dtype)
    forces = np.zeros((n, a_pad, 3), dtype)
    stress6 = np.zeros((n, 6), dtype)
    ew = np.zeros((n,), dtype)
    fw = np.zeros((n,), dtype)
    vw = np.zeros((n,), dtype)
    for j, pc in enumerate(packed_configs):
        na, kc = pc.natoms, pc.kcount
        disp[j, :na, :kc] = pc.disp[:, :kc]
        jidx[j, :na, :kc] = pc.jidx[:, :kc]
        mask[j, :na, :kc] = pc.mask[:, :kc]
        types[j, :na] = pc.types
        nat[j] = na
        cell[j] = pc.cell
        d = pc.data
        energy[j] = d.get("Energy", 0.0)
        fo = d.get("Forces")
        if fo is not None:
            forces[j, :na] = fo
        st = d.get("Stress")
        if st is not None:
            st = np.asarray(st)
            stress6[j] = st[[0, 1, 2, 1, 0, 0], [0, 1, 2, 2, 2, 1]]
        ew[j] = d.get("eweight", 1.0)
        fw[j] = d.get("fweight", 1.0)
        vw[j] = d.get("vweight", 1.0)
    out = (disp, jidx, mask, types, nat, cell, energy, forces, stress6,
           ew, fw, vw)
    if chunks > 1:
        assert n % chunks == 0
        out = tuple(x.reshape((chunks, n // chunks) + x.shape[1:])
                    for x in out)
    else:
        out = tuple(x[None] for x in out)
    return out


def build_spatial_rows_fn(params, numtypes, flags, mesh, axis=None,
                          accum_dtype=None, kernel=None, const_mode=None):
    """Atom-axis ("context") parallelism: ONE config sharded over the mesh.

    The dp path above shards the *config* axis — useless when a single
    configuration's (natoms, maxneigh) tensors exceed one chip.  Here the
    atom axis is sharded instead (SURVEY §5's long-context analog; the
    reference has no equivalent — a config must fit inside one LAMMPS
    rank):

      - positions/types are replicated (N x 3 is tiny next to the per-pair
        tensors); each device computes descriptors + per-pair jacobians for
        its natoms/ndev slice only;
      - the energy row and virial rows reduce with a `psum`;
      - force rows scatter across shards (a neighbor's row usually lives in
        another shard), so each shard materializes its additive contribution
        to the full (natoms, width, 3) block and a `psum_scatter` returns
        every shard exactly the fully-summed rows of its own atoms — the
        halo exchange of this domain, expressed as one collective;
      - each shard folds its rows into the normal equations; a final psum
        replicates (AtA, Atb, nrows).

    Returns a jitted fn(disp, jidx, mask, types, natoms, cell, energy,
    forces, stress6, eweight, fweight, vweight) -> (AtA, Atb, nrows) where
    disp/jidx/mask are (A_pad, K, ...) with A_pad divisible by the mesh
    size, jidx holds GLOBAL atom indices, and truths are already
    reference-potential-subtracted and eshifted (host responsibility, as in
    `calculators/snap.py:host_preprocess`).  Unlike
    `config_normal_contrib`, there is no refspec or residual-refinement
    (`coeff`) mode here — keep the two row/weight conventions in sync when
    changing either.
    """
    axis = axis or mesh.axis_names[0]
    sh = P(axis)
    rp = P()

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(sh, sh, sh, rp, rp, rp, rp, rp, rp, rp, rp, rp),
             out_specs=(rp, rp, rp))
    def rows(disp, jidx, mask, types, natoms, cell,
             energy, forces, stress6, eweight, fweight, vweight):
        Afull = types.shape[0]
        Ash = disp.shape[0]
        dtp = disp.dtype
        off = jax.lax.axis_index(axis) * Ash
        first = (jax.lax.axis_index(axis) == 0)
        zero = jnp.zeros((), off.dtype)
        types_l = jax.lax.dynamic_slice_in_dim(types, off, Ash)
        gidx = off + jnp.arange(Ash)
        real = (gidx < natoms).astype(dtp)

        kern = snap_kernel(params) if kernel is None else kernel
        B, G, smask = kern(disp, types[jidx], types_l, mask)
        B = B * real[:, None]
        G = G * real[:, None, None, None]

        cmode = const_mode
        if cmode is None:
            cmode = False if params.plan.bzeroflag else "snap"
        if cmode == "snap" or (kernel is None and not cmode):
            oh = jax.nn.one_hot(types_l, numtypes, dtype=dtp) * real[:, None]
        else:
            oh = real[:, None]
        nat_safe = jnp.maximum(natoms, 1).astype(dtp)
        e_row = jax.lax.psum((oh.T @ B).reshape(-1), axis) / nat_safe

        GT = jnp.einsum("at,awkc->takwc", oh, G)
        W0 = e_row.shape[0]
        # Halo exchange for the force rows, one destination block at a
        # time: a shard's pairs scatter into any atom's row, but
        # materializing the full (Afull, W0, 3) buffer per shard would keep
        # per-device memory O(total atoms).  Instead, for each destination
        # shard d, segment-sum only the contributions landing in d's block
        # (out-of-block pairs route to a scrap bin) and psum that
        # shard-sized block — same total ICI bytes as one psum_scatter,
        # per-device memory O(Ash).
        K = disp.shape[1]
        gt_pairs = GT.transpose(1, 2, 0, 3, 4).reshape(Ash * K, W0, 3)
        jflat = jidx.reshape(-1)
        rowsum = GT.sum(axis=2).transpose(1, 0, 2, 3).reshape(Ash, W0, 3)
        my = jax.lax.axis_index(axis)
        ndev = Afull // Ash

        def exchange(d, acc):
            lo = (d * Ash).astype(jflat.dtype)
            seg = jnp.where((jflat >= lo) & (jflat < lo + Ash),
                            jflat - lo, Ash)              # Ash = scrap bin
            scat_d = jax.ops.segment_sum(gt_pairs, seg,
                                         num_segments=Ash + 1)[:Ash]
            mine = (my == d).astype(dtp)
            tot = jax.lax.psum(scat_d - mine * rowsum, axis)
            return acc + mine * tot

        # rowsum * 0: the init carry must already be device-varying for the
        # collective inside the loop body (plain zeros are 'unvarying')
        f_blk = -jax.lax.fori_loop(0, ndev, exchange, rowsum * 0.0)
        f_rows = f_blk.transpose(0, 2, 1).reshape(Ash * 3, W0)

        vol = cell[0, 0] * cell[1, 1] * cell[2, 2]
        pa = jnp.array([0, 1, 2, 1, 0, 0])
        pb = jnp.array([0, 1, 2, 2, 2, 1])
        dm = disp * smask[..., None].astype(dtp)
        vir = -jnp.einsum("ikx,tikwy->xytw", dm, GT).reshape(3, 3, W0)
        v_rows = jax.lax.psum(vir[pa, pb], axis) * (1.6021765e6 / vol)

        if cmode == "snap":
            ncoeff = W0 // numtypes
            counts = jax.lax.psum(oh.sum(0), axis) / nat_safe
            e_row = jnp.concatenate(
                [counts[:, None], e_row.reshape(numtypes, ncoeff)],
                axis=1).reshape(-1)
            f_rows = jnp.concatenate(
                [jnp.zeros((Ash * 3, numtypes, 1), dtp),
                 f_rows.reshape(Ash * 3, numtypes, ncoeff)], axis=2) \
                .reshape(Ash * 3, -1)
            v_rows = jnp.concatenate(
                [jnp.zeros((6, numtypes, 1), dtp),
                 v_rows.reshape(6, numtypes, ncoeff)], axis=2).reshape(6, -1)
        elif cmode and cmode[0] == "ace":
            nel = cmode[1]
            ohe = jax.nn.one_hot(types_l, nel, dtype=dtp) * real[:, None]
            counts = jax.lax.psum(ohe.sum(0), axis) / nat_safe
            e_row = jnp.concatenate([counts, e_row])
            f_rows = jnp.concatenate(
                [jnp.zeros((Ash * 3, nel), dtp), f_rows], axis=1)
            v_rows = jnp.concatenate([jnp.zeros((6, nel), dtp), v_rows],
                                     axis=1)

        W = e_row.shape[0]
        adt = accum_dtype or dtp
        AtA = jnp.zeros((W, W), adt)
        Atb = jnp.zeros((W,), adt)
        nrows = jnp.zeros((), dtp)
        once = first.astype(adt)       # replicated rows count on shard 0 only
        if flags["energy"]:
            we = eweight.astype(adt) * once
            e64 = e_row.astype(adt)
            AtA += we ** 2 * jnp.outer(e64, e64)
            Atb += we ** 2 * e64 * (energy / nat_safe).astype(adt)
            nrows += first.astype(dtp)
        if flags["force"]:
            wf = (fweight * jnp.repeat(real, 3)).astype(adt)
            fw = f_rows.astype(adt) * wf[:, None]
            b_f = jax.lax.dynamic_slice(forces, (off, zero), (Ash, 3))
            AtA += fw.T @ fw
            Atb += fw.T @ (wf * b_f.reshape(-1).astype(adt))
            nrows += 3 * real.sum()
        if flags["stress"]:
            wv = vweight.astype(adt) * once
            v64 = v_rows.astype(adt)
            AtA += wv ** 2 * (v64.T @ v64)
            Atb += wv ** 2 * (v64.T @ stress6.astype(adt))
            nrows += 6 * first.astype(dtp)
        return (jax.lax.psum(AtA, axis), jax.lax.psum(Atb, axis),
                jax.lax.psum(nrows, axis))

    return rows


def ace_kernel(plan):
    """ACE descriptor kernel for the mesh fit paths.

    Gives `build_step_fn`/`config_normal_contrib` the same multi-chip
    scale-out for ACE fits that SNAP gets by default (the reference runs
    both through the same ScaLAPACK machinery).  Pass together with
    `const_mode=("ace", nelem)` (when bzeroflag=0) and
    `width=calculator.get_width()`.
    """
    from fitsnap_tpu.ops.ace import ace_descriptors_with_jacobian

    def kern(disp, jelem, ielem, mask):
        rcm = jnp.asarray(plan.rcut, disp.dtype)[ielem[:, None], jelem]
        r2 = jnp.sum(disp * disp, -1)
        smask = mask & (r2 < rcm * rcm)
        B, G = ace_descriptors_with_jacobian(disp, jelem, smask, ielem, plan)
        return B, G, smask

    return kern


def snap_kernel(params):
    """Default SNAP descriptor kernel (radelem pair cutoffs)."""

    def kern(disp, jelem, ielem, mask):
        dtp = disp.dtype
        radelem = jnp.asarray(params.radelem, dtp)
        rcutij = (radelem[ielem][:, None] + radelem[jelem]) * params.rcutfac
        r2 = jnp.sum(disp * disp, -1)
        smask = mask & (r2 < rcutij * rcutij)
        B, G = descriptors_with_jacobian(disp, jelem, smask, ielem, params)
        return B, G, smask

    return kern
