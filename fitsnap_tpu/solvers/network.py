"""Neural-network solver (JAX/optax), replacing the reference's PYTORCH /
NETWORK / JAX solvers (`fitsnap3lib/solvers/pytorch.py`, `network.py`,
`jax.py`).

Pipeline: per-atom descriptors B and their per-pair gradients dB/dD are
precomputed ON DEVICE once (same kernels as the linear path), bucketed by
padded (atoms, neighbors) shape to bound padding waste and XLA recompiles.
The training loop is pure device compute: per-element MLP energies, forces
from one einsum + one-hot scatter of dE/dB against dB/dD (the reference's
dgrad contraction, `lib/neural_networks/pytorch.py:147-219`), weighted MSE
loss, Adam.  Batches are drawn per bucket; each bucket shape compiles once.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fitsnap_tpu.models.mlp import atom_energies, init_mlp, save_params
from fitsnap_tpu.solvers.solver import Solver


def _net_section(config):
    for name in ("PYTORCH", "NETWORK", "JAX"):
        if name in config.sections:
            return config.sections[name]
    raise ValueError("NN solver requires a PYTORCH/NETWORK/JAX section")


def _plateau_step(sched, metric, *, factor, patience, threshold, lr_min,
                  eps=1e-8):
    """One ReduceLROnPlateau update (torch semantics: mode=min,
    threshold_mode=abs, cooldown=0): a metric is an improvement iff it
    beats the best seen by more than `threshold`; after `patience`
    consecutive non-improvements the LR is multiplied by `factor` (floored
    at `lr_min`) and the bad-epoch counter resets.

    The reference constructs exactly this scheduler
    (`fitsnap3lib/solvers/pytorch.py:113-118`) with factor=0.5, patience=49,
    threshold=1e-4 — but never calls `scheduler.step()`, so upstream it is
    inert.  Here lr_plateau_flag=1 opts into a scheduler that actually runs,
    stepped on the per-epoch validation loss inside the jitted epoch scan
    (default 0 keeps the reference's effective constant-LR trajectory).

    sched = (lr, best_metric, bad_epochs); pure and jittable so it can live
    in the lax.scan carry.
    """
    lr, best, bad = sched
    improved = metric < best - threshold
    best = jnp.where(improved, metric, best)
    bad = jnp.where(improved, 0, bad + 1)
    trip = bad > patience
    # torch skips reductions smaller than eps (ReduceLROnPlateau(eps=1e-8))
    new_lr = jnp.maximum(lr * factor, lr_min)
    lr = jnp.where(trip & (lr - new_lr > eps), new_lr, lr)
    bad = jnp.where(trip, 0, bad)
    return (lr, best, bad.astype(sched[2].dtype))


def _plateau_step_host(sched, metric, *, factor, patience, threshold,
                       lr_min, eps=1e-8):
    """Pure-Python mirror of `_plateau_step` for the chunked training path,
    where the scheduler runs in the host epilogue between per-bucket-chunk
    device programs (same torch semantics; sched = (lr, best, bad))."""
    lr, best, bad = sched
    improved = metric < best - threshold
    best = metric if improved else best
    bad = 0 if improved else bad + 1
    trip = bad > patience
    new_lr = max(lr * factor, lr_min)
    if trip and (lr - new_lr > eps):
        lr = new_lr
    if trip:
        bad = 0
    return (lr, best, bad)


class NetworkSolver(Solver):
    def __init__(self, name, config):
        super().__init__(name, config, linear=False)
        self.net = _net_section(config)
        self.pairwise = "CUSTOM" in config.sections
        # per-atom-scalar fitting (reference lib/neural_networks/pas.py):
        # the network maps descriptors to one scalar per atom, no energy
        # contraction and no forces
        self.pas = config.sections["CALCULATOR"].per_atom_scalar
        self.buckets = None     # list of per-bucket dataset dicts
        self.mean = None
        self.std = None
        self.params = None
        self.history = []
        self.lr_history = np.zeros(0)
        self.final_lr = None
        self._fwd_jit = None
        self.otf = False        # on-the-fly dgrad (see NetworkSection)
        self.cached = False     # cached-neighbor analytic-force mode
        self._nn_analytic = None
        self._desc_fwd = None
        self._otf_cutoff = None

    # ------------- data -------------

    def prepare_dataset(self, calculator, data):
        """Precompute descriptors/dgrad for all configs, bucketed by shape."""
        import optax  # noqa: F401  (fail early if missing)

        if self.pairwise:
            return self._prepare_pairwise(calculator, data)
        if self.pas:
            return self._prepare_pas(calculator, data)
        dtype = np.float32 if jax.default_backend() == "tpu" else np.float64

        # descriptor-gradient strategy: the reference always materializes
        # dgrad rows (~20 GB RAM at 10k configs, docs/source/Pytorch.rst:
        # 258-259); on TPU the dgrad tensor is the HBM hog, so above a size
        # limit we recompute descriptors inside the training step and take
        # forces by autodiff instead (FLOPs are cheap, HBM is not)
        mode = getattr(self.net, "dgrad_mode", "auto")
        if mode in ("auto", "otf", "cached"):
            import os
            from fitsnap_tpu.parallel.fit import plan_pos_buckets
            packed = [calculator._pack(d) for d in data]
            # natural shape buckets; merging everything into a handful of
            # covering shapes was tried and rejected (the WBe merge created
            # (32,384,S=1089)-class shapes whose training backward blows
            # HBM).  Program size is bounded in perform_fit instead: at most
            # FITSNAP_TPU_NN_FUSED_BUCKETS bucket bodies per XLA program.
            pos_groups = plan_pos_buckets(
                packed, calculator.cutoff,
                max_programs=int(os.environ.get(
                    "FITSNAP_TPU_NN_MAX_PROGRAMS", "10")))
            analytic = getattr(calculator, "nn_analytic_fns",
                               lambda: None)()
            if mode == "auto":
                # preference order: cached (analytic forces, neighbor
                # tensors ~55x smaller than dgrad, concurrent prep
                # compiles) > precompute (stored dgrad; chem/quad, or
                # cached cache would blow HBM) > otf (positions only, for
                # datasets whose neighbor tensors exceed HBM too).  The
                # per-step on-device neighbor REBUILD of pure otf is
                # recompute of a static quantity — positions never move
                # during NN training.
                itemsz = np.dtype(dtype).itemsize
                # pairs: disp + jidx + mask; atoms: cached ut + B
                # (~2U + W floats; 2.6 KB/atom at twojmax 8 f32)
                neigh_bytes = sum(
                    len(g["configs"]) * g["a_pad"]
                    * (min(g["k_pad"], g["a_pad"] * len(g["s_table"]))
                       * (3 * itemsz + 5) + 2600)
                    for g in pos_groups)
                neigh_limit = int(os.environ.get(
                    "FITSNAP_TPU_NN_NEIGH_LIMIT", str(4 << 30)))
                limit = int(os.environ.get("FITSNAP_TPU_NN_G_LIMIT",
                                           str(2 << 30)))
                width = calculator.get_width()
                g_bytes = sum(len(g["configs"]) * g["a_pad"] * g["k_pad"]
                              * width * 3 * np.dtype(dtype).itemsize
                              for g in pos_groups)
                if analytic is not None and neigh_bytes <= neigh_limit:
                    mode = "cached"
                elif g_bytes <= limit:
                    mode = "precompute"
                else:
                    mode = "otf"
            if mode == "cached" and analytic is None:
                from fitsnap_tpu.io.screen import warn
                warn("dgrad_mode=cached is not available for this "
                     "descriptor config (chem/quadratic/non-SNAP); "
                     "falling back to otf")
                mode = "otf"
        self.otf = mode == "otf"
        self.cached = mode == "cached"
        if self.cached:
            self._nn_analytic = analytic
            self._desc_fwd = calculator.nn_desc_fn()
            return self._prepare_otf(calculator, pos_groups, dtype,
                                     cache=True)
        if self.otf:
            self._desc_fwd = calculator.nn_desc_fn()
            return self._prepare_otf(calculator, pos_groups, dtype)
        from fitsnap_tpu.calculators.snap import coalesce_shape_buckets
        packed, shape_buckets = calculator.host_preprocess(data)
        shape_buckets = coalesce_shape_buckets(shape_buckets)
        prep = calculator.nn_prep_fn()

        self.buckets = []
        sum_b = None
        sumsq_b = None
        count = 0
        for (a_pad, k_pad), idxs in sorted(shape_buckets.items()):
            n = len(idxs)
            disp = np.zeros((n, a_pad, k_pad, 3), dtype)
            jidx = np.zeros((n, a_pad, k_pad), np.int32)
            mask = np.zeros((n, a_pad, k_pad), bool)
            types = np.zeros((n, a_pad), np.int32)
            nat = np.zeros((n,), np.int32)
            e_t = np.zeros((n,), dtype)
            f_t = np.zeros((n, a_pad, 3), dtype)
            ew = np.zeros((n,), dtype)
            fw = np.zeros((n,), dtype)
            test = np.zeros((n,), bool)
            groups = []
            files = []
            for j, i in enumerate(idxs):
                pc = packed[i]
                na, kc = pc.natoms, pc.kcount
                disp[j, :na, :kc] = pc.disp[:, :kc]
                jidx[j, :na, :kc] = pc.jidx[:, :kc]
                mask[j, :na, :kc] = pc.mask[:, :kc]
                types[j, :na] = pc.types
                nat[j] = na
                d = pc.data
                e_t[j] = d["Energy"]
                f_t[j, :na] = d["Forces"]
                ew[j] = d.get("eweight", 1.0)
                fw[j] = d.get("fweight", 1.0)
                test[j] = bool(d["test_bool"])
                groups.append(d["Group"])
                files.append(str(d.get("File", "")))

            # ONE jitted program per bucket: descriptors+dgrad for all its
            # configs (scan over fixed-size chunks), reference-potential
            # subtraction, and the standardization sums — all on device.
            # B/G stay DEVICE-resident: through the remote-TPU relay,
            # device->host runs ~0.2 MB/s (downloading G once cost minutes)
            # and every eager op on a stored device array is a separate
            # ~0.5-1 s program load, so the only downloads here are
            # W-vector sums and the (n,) energy targets.
            chunk = int(min(32, max(1, 1024 // a_pad), n))
            C = -(-n // chunk)
            n_pad = C * chunk

            def pad_c(x):
                # cyclic repeat (np.resize) pads the tail chunk even when
                # the bucket is smaller than one chunk
                reps = np.resize(x, (n_pad,) + x.shape[1:]) \
                    if n_pad > n else x
                return reps.reshape((C, chunk) + x.shape[1:])

            def prep_bucket(dispC, jidxC, maskC, typesC, natC, e_tC, f_tC):
                def body(_, ch):
                    d, j, m, t, na = ch
                    return None, jax.vmap(prep)(d, j, m, t, na)
                _, (B, G, re_, rf_) = jax.lax.scan(
                    body, None, (dispC, jidxC, maskC, typesC, natC))
                B = B.reshape((n_pad,) + B.shape[2:])[:n]
                G = G.reshape((n_pad,) + G.shape[2:])[:n]
                re_ = re_.reshape(n_pad)[:n]
                rf_ = rf_.reshape((n_pad,) + rf_.shape[2:])[:n]
                natf = natC.reshape(n_pad)[:n]
                e_tgt = (e_tC.reshape(n_pad)[:n] - re_) \
                    / jnp.maximum(natf, 1)
                f_tgt = f_tC.reshape((n_pad,) + f_tC.shape[2:])[:n] - rf_
                realr = jnp.arange(a_pad)[None, :] < natf[:, None]
                Bm = B * realr[:, :, None]
                sb = Bm.sum((0, 1))
                ssq = (Bm * Bm).sum((0, 1))
                cnt = realr.sum()
                return B, G, e_tgt.astype(B.dtype), f_tgt.astype(B.dtype), \
                    sb, ssq, cnt

            B, G, e_target, f_target, sb, ssq, cnt = jax.jit(prep_bucket)(
                *[jnp.asarray(pad_c(x))
                  for x in (disp, jidx, mask, types, nat, e_t, f_t)])

            real = (np.arange(a_pad)[None, :] < nat[:, None])
            sb = np.asarray(sb, np.float64)
            ssq = np.asarray(ssq, np.float64)
            sum_b = sb if sum_b is None else sum_b + sb
            sumsq_b = ssq if sumsq_b is None else sumsq_b + ssq
            count += int(cnt)

            self.buckets.append({
                "B": B, "G": G,
                "jidx": jidx,
                "types": types,
                "nat": nat,
                "real": real,
                "e_target": e_target,
                "f_target": f_target,
                "ew": ew, "fw": fw,
                "test": test, "groups": groups, "files": files,
                "nat_host": nat,
                "shape": (a_pad, k_pad), "dtype": dtype,
            })

        mean = sum_b / count
        var = sumsq_b / count - mean ** 2
        std = np.sqrt(np.clip(var, 0, None))
        std[std < 1e-8] = 1.0
        self.mean = jnp.asarray(np.asarray(mean, dtype))
        self.std = jnp.asarray(np.asarray(std, dtype))
        return self.buckets

    def _prepare_otf(self, calculator, pos_groups, dtype, cache=False):
        """On-the-fly dgrad mode: keep POSITIONS device-resident (hi/lo
        float pairs + per-config image-shift vectors), build neighbor lists
        on device and recompute descriptors inside every training step;
        forces come straight from `-grad(E)` wrt positions.  Memory is
        O(atoms) per config — no dgrad tensor ever exists — so datasets far
        beyond the reference's ~20 GB / 10k-config RAM footprint
        (docs/source/Pytorch.rst:258-267) train on one chip, and the
        host->device upload is ~50x smaller than shipping neighbor tensors
        (the decisive factor through a remote TPU relay).  One forward pass
        here computes standardization stats and reference-subtracted
        targets.

        With `cache=True` (dgrad_mode=cached) the stats pass additionally
        KEEPS the per-config (disp, jidx, mask) it builds, device-resident
        per bucket (~55x smaller than dgrad): positions never move during
        NN training, so the per-step neighbor rebuild of pure otf is
        recompute of a static quantity.  The training step then recomputes
        descriptors from the cached displacements with the analytic force
        contraction (`_forward_batch_cached`)."""
        from fitsnap_tpu.ops.refpot import reference_eav
        from fitsnap_tpu.parallel.fit import device_neighbors, pack_batch_pos

        desc = self._desc_fwd
        refspec = calculator.refspec
        cutoff = float(calculator.cutoff)
        self._otf_cutoff = cutoff
        self.buckets = []
        sum_b = None
        sumsq_b = None
        count = 0

        kit = self._nn_analytic if cache else None

        def make_stats(n, n_pad, k_pad):
            """Per-bucket stats program (factory: binds loop vars early)."""
            def one_cfg(ph_c, pl_c, sh_c, sl_c, t, na):
                d, j, m = device_neighbors(ph_c, pl_c, sh_c, sl_c, na,
                                           cutoff, k_pad)
                if cache:
                    ut, B = kit["utb"](d, j, m, t, na)
                else:
                    B = desc(d, j, m, t, na)
                    ut = None
                re_, rf_, _ = reference_eav(d, j, m, t, na, refspec)
                return B, re_, rf_, d, j, m, ut

            def stats_bucket(ph, pl, sh, sl, tt, nad, e_td, f_td, plan,
                             val):
                def body(_, ch):
                    idx, v = ch
                    B, re_, rf_, d, j, m, ut = jax.vmap(one_cfg)(
                        ph[idx], pl[idx], sh[idx], sl[idx], tt[idx],
                        nad[idx])
                    na = nad[idx]
                    realr = jnp.arange(B.shape[1])[None, :] < na[:, None]
                    w = (realr & v[:, None]).astype(B.dtype)
                    Bm = B * w[..., None]
                    e_tgt = (e_td[idx] - re_) / jnp.maximum(na, 1)
                    f_tgt = f_td[idx] - rf_
                    neigh = (d, j, m, ut, B) if cache else ()
                    return None, (e_tgt.astype(B.dtype),
                                  f_tgt.astype(B.dtype),
                                  Bm.sum((0, 1)), (Bm * B * w[..., None])
                                  .sum((0, 1)), w.sum()) + neigh

                _, out = jax.lax.scan(body, None, (plan, val))
                e_tgt, f_tgt, sb, ssq, cnt = out[:5]
                A = ph.shape[1]
                res = (e_tgt.reshape(n_pad)[:n],
                       f_tgt.reshape(n_pad, A, 3)[:n],
                       sb.sum(0), ssq.sum(0), cnt.sum())
                if cache:
                    d, j, m, ut, B = out[5:]
                    res = res + (d.reshape(n_pad, A, k_pad, 3)[:n],
                                 j.reshape(n_pad, A, k_pad)[:n],
                                 m.reshape(n_pad, A, k_pad)[:n],
                                 ut.reshape((n_pad, A) + ut.shape[3:])[:n],
                                 B.reshape((n_pad, A) + B.shape[3:])[:n])
                return res

            return jax.jit(stats_bucket)

        # phase 1: pack + (async) upload every bucket, build its stats
        # program; phase 2: compile all stats programs concurrently
        # (server-side compiles parallelize through the relay); phase 3:
        # execute.  The serial version paid one compile wall per bucket.
        import os as _os
        dbg = _os.environ.get("FITSNAP_TPU_DEBUG_PREP") == "1"
        t_pack0 = time.time()
        staged = []
        for g in pos_groups:
            cfgs, a_pad, s_table = g["configs"], g["a_pad"], g["s_table"]
            n = len(cfgs)
            k_pad = int(min(g["k_pad"], a_pad * len(s_table)))
            (pos_hi, pos_lo, svec_hi, svec_lo, types, nat, _cell, e_t, f_t,
             _st, ew, fw, _vw) = (x[0] for x in pack_batch_pos(
                 cfgs, a_pad, n, s_table, dtype))
            test = np.array([bool(pc.data["test_bool"]) for pc in cfgs])
            groups = [pc.data["Group"] for pc in cfgs]
            files = [str(pc.data.get("File", "")) for pc in cfgs]

            # upload once; training gathers minibatches from these arrays
            ph = jnp.asarray(pos_hi)
            pl = jnp.asarray(pos_lo)
            sh = jnp.asarray(svec_hi)
            sl = jnp.asarray(svec_lo)
            tt = jnp.asarray(types)
            nad = jnp.asarray(nat)

            # bound the (A, S, A) neighbor-candidate transient
            S = len(s_table)
            chunk = int(min(32, max(1, (1 << 26) // (a_pad * S * a_pad)), n))
            C = -(-n // chunk)
            n_pad = C * chunk
            idx_plan = np.minimum(np.arange(n_pad), n - 1) \
                .reshape(C, chunk).astype(np.int32)
            # the clipped tail duplicates config n-1: exclude from stats
            valid = (np.arange(n_pad) < n).reshape(C, chunk)

            fn = make_stats(n, n_pad, k_pad)
            args = (ph, pl, sh, sl, tt, nad, jnp.asarray(e_t),
                    jnp.asarray(f_t), jnp.asarray(idx_plan),
                    jnp.asarray(valid))
            staged.append((fn, args, dict(
                a_pad=a_pad, k_pad=k_pad, n=n, nat=nat, types=types,
                test=test, groups=groups, files=files, ew=ew, fw=fw,
                ph=ph, pl=pl, sh=sh, sl=sl, tt=tt)))

        if dbg:
            print(f"[prep] pack+upload {time.time() - t_pack0:.1f}s",
                  flush=True)
        from fitsnap_tpu.parallel.fit import compile_concurrently
        t_c0 = time.time()
        try:
            compile_concurrently([(fn, args) for fn, args, _ in staged])
        except Exception:   # pragma: no cover - lazy path still works
            pass
        if dbg:
            print(f"[prep] concurrent compile {time.time() - t_c0:.1f}s",
                  flush=True)

        for fn, args, m in staged:
            a_pad, k_pad, n = m["a_pad"], m["k_pad"], m["n"]
            nat, types = m["nat"], m["types"]
            test, groups, files = m["test"], m["groups"], m["files"]
            ew, fw = m["ew"], m["fw"]
            ph, pl, sh, sl, tt = m["ph"], m["pl"], m["sh"], m["sl"], m["tt"]
            t_e0 = time.time()
            out = fn(*args)
            e_target, f_target, sb, ssq, cnt = out[:5]
            if dbg:
                jax.block_until_ready(out)
                print(f"[prep] exec ({a_pad},{k_pad}) x{n}: "
                      f"{time.time() - t_e0:.1f}s", flush=True)

            real = (np.arange(a_pad)[None, :] < nat[:, None])
            sb = np.asarray(sb, np.float64)
            ssq = np.asarray(ssq, np.float64)
            sum_b = sb if sum_b is None else sum_b + sb
            sumsq_b = ssq if sumsq_b is None else sumsq_b + ssq
            count += int(cnt)

            if cache:
                # positions are no longer needed: the cached (disp, jidx,
                # mask) tensors plus the per-atom (ut, B) ARE the training
                # inputs (all static — positions never move during training)
                d_dev, j_dev, m_dev, ut_dev, b_dev = out[5:]
                bucket = {"disp": d_dev, "jidx": j_dev, "mask": m_dev,
                          "ut": ut_dev, "B": b_dev}
            else:
                bucket = {
                    "pos_hi": ph, "pos_lo": pl,
                    "svec_hi": sh, "svec_lo": sl,
                    # zero-byte shape carrier: k_pad is static per bucket
                    # but must survive the uniform {k: v[idx]} gather
                    "kshape": np.zeros((n, 0, k_pad), np.int8),
                }
            bucket.update({
                "types": tt,
                "elem": types,           # network element index; may be
                "nat": nat,              # zeroed for multi_element_option 1
                "real": real,
                "e_target": e_target,
                "f_target": f_target,
                "ew": ew, "fw": fw,
                "test": test, "groups": groups, "files": files,
                "nat_host": nat,
                "shape": (a_pad, k_pad), "dtype": dtype,
            })
            self.buckets.append(bucket)

        mean = sum_b / count
        var = sumsq_b / count - mean ** 2
        std = np.sqrt(np.clip(var, 0, None))
        std[std < 1e-8] = 1.0
        self.mean = jnp.asarray(np.asarray(mean, dtype))
        self.std = jnp.asarray(np.asarray(std, dtype))
        return self.buckets

    def _prepare_pairwise(self, calculator, data):
        """Pairwise (CUSTOM) mode: keep raw displacement tensors; the model
        computes Bessel/G3b descriptors inside the forward pass
        (reference `lib/neural_networks/pairwise.py`)."""
        from fitsnap_tpu.ops.custom_desc import pair_descriptors
        from fitsnap_tpu.ops.refpot import reference_eav

        from fitsnap_tpu.calculators.snap import coalesce_shape_buckets
        packed, shape_buckets = calculator.host_preprocess(data)
        shape_buckets = coalesce_shape_buckets(shape_buckets)
        sec = calculator.sec
        dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
        self.buckets = []
        s1 = s2 = None
        count = 0
        for (a_pad, k_pad), idxs in sorted(shape_buckets.items()):
            n = len(idxs)
            disp = np.zeros((n, a_pad, k_pad, 3), dtype)
            jidx = np.zeros((n, a_pad, k_pad), np.int32)
            mask = np.zeros((n, a_pad, k_pad), bool)
            types = np.zeros((n, a_pad), np.int32)
            nat = np.zeros((n,), np.int32)
            e_t = np.zeros((n,), dtype)
            f_t = np.zeros((n, a_pad, 3), dtype)
            ew = np.zeros((n,), dtype)
            fw = np.zeros((n,), dtype)
            test = np.zeros((n,), bool)
            groups = []
            files = []
            for j, i in enumerate(idxs):
                pc = packed[i]
                na, kc = pc.natoms, pc.kcount
                disp[j, :na, :kc] = pc.disp[:, :kc]
                jidx[j, :na, :kc] = pc.jidx[:, :kc]
                mask[j, :na, :kc] = pc.mask[:, :kc]
                types[j, :na] = pc.types
                nat[j] = na
                d = pc.data
                e_t[j] = d["Energy"]
                f_t[j, :na] = d["Forces"]
                ew[j] = d.get("eweight", 1.0)
                fw[j] = d.get("fweight", 1.0)
                test[j] = bool(d["test_bool"])
                groups.append(d["Group"])
                files.append(str(d.get("File", "")))
            real = (np.arange(a_pad)[None, :] < nat[:, None])

            # standardization sums on device: downloading the full pair
            # descriptor tensor runs ~0.2 MB/s through the remote relay
            def desc_sums(disp_d, mask_d):
                desc = pair_descriptors(disp_d, mask_d, sec.cutoff,
                                        sec.num_radial, sec.num_3body)
                m = mask_d[..., None].astype(desc.dtype)
                dm = desc * m
                return (dm.sum((0, 1, 2)), (dm * dm).sum((0, 1, 2)),
                        mask_d.sum())

            sb, ssq, cnt = jax.jit(desc_sums)(jnp.asarray(disp),
                                              jnp.asarray(mask))
            sb = np.asarray(sb, np.float64)
            ssq = np.asarray(ssq, np.float64)
            s1 = sb if s1 is None else s1 + sb
            s2 = ssq if s2 is None else s2 + ssq
            count += int(cnt)
            self.buckets.append({
                "disp": disp, "jidx": jidx,
                "mask": mask, "types": types,
                "nat": nat, "real": real,
                "e_target": np.asarray(e_t / np.maximum(nat, 1), dtype),
                "f_target": f_t,
                "ew": ew, "fw": fw,
                "test": test, "groups": groups, "files": files,
                "nat_host": nat,
                "shape": (a_pad, k_pad), "dtype": dtype,
            })
        mean = s1 / count
        var = s2 / count - mean ** 2
        std = np.sqrt(np.clip(var, 0, None))
        std[std < 1e-8] = 1.0
        self.mean = jnp.asarray(np.asarray(mean, dtype))
        self.std = jnp.asarray(np.asarray(std, dtype))
        self._custom_sec = sec
        return self.buckets

    def _prepare_pas(self, calculator, data):
        """Per-atom-scalar mode: descriptors + per-atom 'Chis' truths, no
        jacobian/forces (reference calculator.py:103-108, pas.py)."""
        from fitsnap_tpu.calculators.snap import coalesce_shape_buckets
        packed, shape_buckets = calculator.host_preprocess(data)
        shape_buckets = coalesce_shape_buckets(shape_buckets)
        dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
        prep = calculator.nn_desc_fn()
        self.buckets = []
        sum_b = None
        sumsq_b = None
        count = 0
        for (a_pad, k_pad), idxs in sorted(shape_buckets.items()):
            n = len(idxs)
            disp = np.zeros((n, a_pad, k_pad, 3), dtype)
            jidx = np.zeros((n, a_pad, k_pad), np.int32)
            mask = np.zeros((n, a_pad, k_pad), bool)
            types = np.zeros((n, a_pad), np.int32)
            nat = np.zeros((n,), np.int32)
            chis = np.zeros((n, a_pad), dtype)
            ew = np.zeros((n,), dtype)
            test = np.zeros((n,), bool)
            groups = []
            files = []
            for j, i in enumerate(idxs):
                pc = packed[i]
                na, kc = pc.natoms, pc.kcount
                disp[j, :na, :kc] = pc.disp[:, :kc]
                jidx[j, :na, :kc] = pc.jidx[:, :kc]
                mask[j, :na, :kc] = pc.mask[:, :kc]
                types[j, :na] = pc.types
                nat[j] = na
                d = pc.data
                chis[j, :na] = np.asarray(d["Chis"], dtype).reshape(-1)
                ew[j] = d.get("eweight", 1.0)
                test[j] = bool(d["test_bool"])
                groups.append(d["Group"])
                files.append(str(d.get("File", "")))
            # one jitted program per bucket; B stays device-resident and
            # the standardization sums come back as W-vectors (see
            # prepare_dataset for the remote-relay rationale)
            chunk = int(min(32, max(1, 1024 // a_pad), n))
            C = -(-n // chunk)
            n_pad = C * chunk

            def pad_c(x):
                # cyclic repeat (np.resize) pads the tail chunk even when
                # the bucket is smaller than one chunk
                reps = np.resize(x, (n_pad,) + x.shape[1:]) \
                    if n_pad > n else x
                return reps.reshape((C, chunk) + x.shape[1:])

            def prep_bucket(dispC, jidxC, maskC, typesC, natC):
                def body(_, ch):
                    return None, jax.vmap(prep)(*ch)
                _, B = jax.lax.scan(
                    body, None, (dispC, jidxC, maskC, typesC, natC))
                B = B.reshape((n_pad,) + B.shape[2:])[:n]
                natf = natC.reshape(n_pad)[:n]
                realr = jnp.arange(a_pad)[None, :] < natf[:, None]
                Bm = B * realr[:, :, None]
                return B, Bm.sum((0, 1)), (Bm * Bm).sum((0, 1)), realr.sum()

            B, sb, ssq, cnt = jax.jit(prep_bucket)(
                *[jnp.asarray(pad_c(x))
                  for x in (disp, jidx, mask, types, nat)])
            real = (np.arange(a_pad)[None, :] < nat[:, None])
            sb = np.asarray(sb, np.float64)
            ssq = np.asarray(ssq, np.float64)
            sum_b = sb if sum_b is None else sum_b + sb
            sumsq_b = ssq if sumsq_b is None else sumsq_b + ssq
            count += int(cnt)
            self.buckets.append({
                "B": B, "types": types,
                "nat": nat, "real": real,
                "pas_target": chis,
                "ew": ew,
                "test": test, "groups": groups, "files": files,
                "nat_host": nat,
                "shape": (a_pad, k_pad), "dtype": dtype,
            })
        mean = sum_b / count
        var = sumsq_b / count - mean ** 2
        std = np.sqrt(np.clip(var, 0, None))
        std[std < 1e-8] = 1.0
        self.mean = jnp.asarray(np.asarray(mean, dtype))
        self.std = jnp.asarray(np.asarray(std, dtype))
        return self.buckets

    def _forward_pas(self, params, batch):
        """Per-atom scalars: one MLP evaluation per atom, no contraction."""
        B = batch["B"]
        x = (B - self.mean) / self.std
        scal = jax.vmap(lambda xc, ec: atom_energies(params, xc, ec))(
            x, batch["types"])
        return scal * batch["real"].astype(B.dtype)

    def _forward_pairwise(self, params, batch):
        """Per-atom-normalized energies + autodiff forces, pairwise model."""
        from fitsnap_tpu.ops.custom_desc import pair_descriptors

        sec = self._custom_sec
        disp = batch["disp"]
        mask = batch["mask"].astype(disp.dtype)
        elem = batch["types"]
        nat = jnp.maximum(batch["nat"], 1).astype(disp.dtype)

        def config_energy(d, m, el):
            from fitsnap_tpu.ops.custom_desc import RMIN_CUT, cutoff_function
            desc = pair_descriptors(d, m.astype(bool), sec.cutoff,
                                    sec.num_radial, sec.num_3body)
            x = (desc - self.mean) / self.std
            e_pair = atom_energies(params, x, el[:, None] * jnp.ones(
                m.shape, jnp.int32))
            # pair energies carry the cutoff envelope so E -> 0 smoothly as
            # a pair leaves the cutoff (reference pairwise.py:174-175
            # multiplies eij by the Bessel cutoff function before the
            # per-config index_add); without it the NN bias gives a
            # discontinuity at r = c
            safe = jnp.where(m[..., None] > 0, d,
                             jnp.array([2.0 * RMIN_CUT, 0.0, 0.0], d.dtype))
            fc = cutoff_function(jnp.sqrt(jnp.sum(safe * safe, -1)),
                                 sec.cutoff)
            return jnp.sum(e_pair * fc * m)

        def one(d, m, el):
            e, g = jax.value_and_grad(config_energy)(d, m, el)
            return e, g

        e, g = jax.vmap(one)(disp, mask, elem)
        e_per_atom = e / nat
        A = disp.shape[1]
        oj = jax.nn.one_hot(batch["jidx"], A, dtype=disp.dtype)
        scat = jnp.einsum("nakm,nakc->nmc", oj, g)
        forces = -(scat - g.sum(axis=2))
        return e_per_atom, forces

    # ------------- model -------------

    def _forward_batch(self, params, batch):
        """Per-atom-normalized energies and forces for one gathered batch."""
        B = batch["B"]
        G = batch["G"]
        elem = batch["types"]
        real = batch["real"].astype(B.dtype)
        nat = jnp.maximum(batch["nat"], 1).astype(B.dtype)
        x = (B - self.mean) / self.std

        def e_and_dedb(x_c, elem_c, real_c):
            def etot(xx):
                return jnp.sum(atom_energies(params, xx, elem_c) * real_c)
            return jax.value_and_grad(etot)(x_c)

        e, dEdx = jax.vmap(e_and_dedb)(x, elem, real)
        e_per_atom = e / nat
        dEdB = dEdx / self.std
        fpair = jnp.einsum("naw,nawkc->nakc", dEdB, G)
        A = B.shape[1]
        oj = jax.nn.one_hot(batch["jidx"], A, dtype=B.dtype)
        scat = jnp.einsum("nakm,nakc->nmc", oj, fpair)
        forces = -(scat - fpair.sum(axis=2))
        return e_per_atom, forces

    def _forward_batch_otf(self, params, batch):
        """OTF mode: neighbor lists built on device from resident positions,
        descriptors recomputed in the forward pass, forces = -grad(E) wrt
        positions (autodiff through the neighbor-displacement assembly
        carries both the i-row and the gathered-j contributions — the
        scatter identity the precomputed-G path contracts explicitly)."""
        from fitsnap_tpu.parallel.fit import device_neighbors

        desc = self._desc_fwd
        mean, std = self.mean, self.std
        cutoff = self._otf_cutoff
        k_pad = batch["kshape"].shape[-1]
        dtp = batch["pos_hi"].dtype
        nat = jnp.maximum(batch["nat"], 1).astype(dtp)

        def one(ph, pl, sh, sl, t, na, elem_c, real_c):
            def etot(p):
                d, j, m = device_neighbors(p, pl, sh, sl, na, cutoff, k_pad)
                # rematerialize the descriptor chain in the backward pass:
                # its per-pair monomial intermediates would otherwise be
                # stored as autodiff residuals (~GBs at large atom counts);
                # with checkpoint only (disp, B) survive the forward
                B = jax.checkpoint(
                    lambda dd: desc(dd, j, m, t, na))(d)
                x = (B - mean) / std
                return jnp.sum(atom_energies(params, x, elem_c) * real_c)

            e, g = jax.value_and_grad(etot)(ph)
            return e, -g

        real = batch["real"].astype(dtp)
        e, f = jax.vmap(one)(batch["pos_hi"], batch["pos_lo"],
                             batch["svec_hi"], batch["svec_lo"],
                             batch["types"], batch["nat"], batch["elem"],
                             real)
        return e / nat, f

    def _forward_batch_cached(self, params, batch):
        """Cached-neighbor mode: per-atom descriptors B and utot are CACHED
        (static during training), so the energy side is just the MLP; the
        force side recomputes only the per-pair grid tensors from the
        cached displacements and contracts dE/dB analytically
        (`ops/snap.py` nn_dEdu/nn_vg/nn_pair_force) — autodiff touches only
        the MLP, so the loss's parameter gradient transposes a few einsums
        instead of re-deriving the descriptor kernel (reverse-over-reverse
        through it was measured unusable: minutes of XLA compile per bucket
        shape and ~10x the flops).  Atom-side stages run on the FLATTENED
        (configs x atoms) axis so every GEMM sees full MXU tiles."""
        kit = self._nn_analytic
        B = batch["B"]
        N, A, W = B.shape
        dtp = B.dtype
        real = batch["real"].astype(dtp)
        nat = jnp.maximum(batch["nat"], 1).astype(dtp)
        x = ((B - self.mean) / self.std).reshape(N * A, W)
        elem_flat = batch["elem"].reshape(-1)
        real_flat = real.reshape(-1)
        eat, vjp_fn = jax.vjp(
            lambda xx: atom_energies(params, xx, elem_flat), x)
        e = (eat * real_flat).reshape(N, A).sum(1)
        dEdB = vjp_fn(real_flat)[0] / self.std
        vg = kit["dEdu_vg"](dEdB, batch["ut"].reshape(N * A, -1))
        n_t = vg.shape[-1]
        vg = vg.reshape(N, A, n_t, n_t)
        grid = jax.vmap(kit["pair"])(batch["disp"], batch["jidx"],
                                     batch["mask"], batch["types"])
        g = jax.vmap(kit["force"])(vg, grid)
        # scatter dE/ddisp into forces: disp[a,k] = x_j - x_i (+shift), so
        # atom m collects +g from every pair it neighbors and -sum(g) over
        # its own row (same identity as the precomputed-G path)
        oj = jax.nn.one_hot(batch["jidx"], A, dtype=dtp)
        scat = jnp.einsum("nakm,nakc->nmc", oj, g)
        forces = -(scat - g.sum(axis=2))
        return e / nat, forces

    _BATCH_KEYS = ("B", "G", "types", "real", "nat", "jidx",
                   "e_target", "f_target", "ew", "fw")
    _BATCH_KEYS_OTF = ("pos_hi", "pos_lo", "svec_hi", "svec_lo", "kshape",
                       "types", "elem", "real", "nat", "e_target",
                       "f_target", "ew", "fw")
    _BATCH_KEYS_CACHED = ("disp", "jidx", "mask", "ut", "B", "types",
                          "elem", "real", "nat", "e_target", "f_target",
                          "ew", "fw")
    _BATCH_KEYS_PW = ("disp", "mask", "types", "real", "nat", "jidx",
                      "e_target", "f_target", "ew", "fw")
    _BATCH_KEYS_PAS = ("B", "types", "real", "nat", "pas_target", "ew")

    def _loss(self, params, batch, axis=None):
        """Weighted MSE loss of one minibatch.

        With `axis` set (data-parallel shard_map over a mesh axis), each
        device holds a slice of the minibatch; residual sums and count
        normalizers are psummed so every device sees the GLOBAL loss value
        — exactly the single-device loss, independent of the device count.
        shard_map transposes these psums into a psummed cotangent, so each
        device's gradient is ndev x the global gradient; the training step
        pmeans them back to the exact single-device gradient (SURVEY §7.7:
        gradient reduction over ICI replaces the reference's single-process
        limitation, `docs/source/Pytorch.rst:260`).
        """
        ps = ((lambda x: jax.lax.psum(x, axis)) if axis is not None
              else (lambda x: x))
        net = self.net
        if self.pas:
            pred = self._forward_pas(params, batch)
            real = batch["real"].astype(pred.dtype)
            res = (pred - batch["pas_target"]) * real
            na = jnp.maximum(ps(real.sum()), 1.0)
            return ps(jnp.sum(batch["ew"][:, None] * res ** 2)) / na
        fwd = (self._forward_pairwise if self.pairwise
               else self._forward_batch_cached if self.cached
               else self._forward_batch_otf if self.otf
               else self._forward_batch)
        e_pred, f_pred = fwd(params, batch)
        real = batch["real"].astype(e_pred.dtype)
        live = (batch["nat"] > 0).astype(e_pred.dtype)
        nfc = jnp.maximum(ps((real.sum(1) * 3 * live).sum()), 1.0)
        ne = jnp.maximum(ps(live.sum()), 1.0)
        e_res = (e_pred - batch["e_target"]) * live
        f_res = (f_pred - batch["f_target"]) * real[..., None] \
            * live[:, None, None]
        if net.global_weight_bool:
            loss = (net.energy_weight * ps(jnp.sum(e_res ** 2)) / ne
                    + net.force_weight * ps(jnp.sum(f_res ** 2)) / nfc)
        else:
            loss = (ps(jnp.sum(batch["ew"] * e_res ** 2)) / ne
                    + ps(jnp.sum(batch["fw"][:, None, None] * f_res ** 2))
                    / nfc)
        return loss

    # ------------- training -------------

    def perform_fit(self, a=None, b=None, w=None, fs_dict=None,
                    calculator=None, data=None):
        import optax

        if self.buckets is None:
            assert calculator is not None and data is not None, \
                "NetworkSolver needs (calculator, data) or prepare_dataset()"
            self.prepare_dataset(calculator, data)
        net = self.net

        desc_sec = (self.config.sections.get("BISPECTRUM")
                    or self.config.sections.get("ACE")
                    or self.config.sections.get("CUSTOM"))
        nelem_net = desc_sec.numtypes if net.multi_element_option == 2 else 1
        if net.multi_element_option != 2:
            for ds in self.buckets:
                # OTF buckets carry the network element index separately
                # ("elem"): descriptors still need the true atom types
                key = "elem" if "elem" in ds else "types"
                ds[key] = np.zeros((np.shape(ds[key])), np.int32)
        key = jax.random.PRNGKey(13 if net.manual_seed_flag else
                                 int(time.time()) % 2 ** 31)
        dtype = jnp.float32 if self.buckets[0]["dtype"] == np.float32 \
            else jnp.float64
        if net.layer_sizes[0] == 0:
            # 'num_desc' placeholder unresolved at config time (ACE): use
            # the actual descriptor width of the prepared dataset
            assert not self.pairwise, \
                "pairwise models resolve num_desc at config"
            net.layer_sizes[0] = (int(self.buckets[0]["B"].shape[-1])
                                  if "B" in self.buckets[0]
                                  else int(np.asarray(self.mean).shape[0]))
        self.params = init_mlp(net.layer_sizes, nelem_net, key, dtype)
        warm_start = net.save_state_input and net.save_state_input != "None"
        self._warm_opt = None
        if warm_start:
            # resume/warm-start from a saved state (reference
            # solvers/pytorch.py:102-109 torch.load before training)
            from fitsnap_tpu.models.mlp import load_params
            loaded, meta = load_params(net.save_state_input)
            got = [(tuple(w.shape), tuple(b.shape)) for w, b in loaded]
            want = [(tuple(w.shape), tuple(b.shape)) for w, b in self.params]
            if got != want:
                raise ValueError(
                    f"save_state_input {net.save_state_input!r} has layer "
                    f"shapes {got}, but this fit needs {want} "
                    f"(layer_sizes/multi_element_option mismatch)")
            if meta.get("layer_sizes") is not None and \
                    list(meta["layer_sizes"]) != list(net.layer_sizes):
                raise ValueError(
                    f"save_state_input {net.save_state_input!r} was trained "
                    f"with layer_sizes={meta['layer_sizes']}, this fit uses "
                    f"{net.layer_sizes}")
            if meta.get("multi_element_option") not in (
                    None, net.multi_element_option):
                raise ValueError(
                    f"save_state_input {net.save_state_input!r} was trained "
                    f"with multi_element_option="
                    f"{meta['multi_element_option']}, this fit uses "
                    f"{net.multi_element_option}")
            self.params = [(jnp.asarray(np.asarray(w, dtype)),
                            jnp.asarray(np.asarray(b, dtype)))
                           for w, b in loaded]
            # the saved weights were trained against the SAVING fit's
            # descriptor standardization — restore it so resuming on
            # different/extended data does not silently re-standardize
            # the inputs under the loaded network
            if meta.get("mean") is not None and self.mean is not None:
                m, s = np.asarray(meta["mean"]), np.asarray(meta["std"])
                if m.shape != np.asarray(self.mean).shape:
                    raise ValueError(
                        f"save_state_input {net.save_state_input!r} has "
                        f"descriptor mean of width {m.shape}, this fit "
                        f"computes {np.asarray(self.mean).shape}")
                self.mean = jnp.asarray(np.asarray(m, dtype))
                self.std = jnp.asarray(np.asarray(s, dtype))
            self._warm_opt = meta.get("opt_state")
        # start the output bias at the mean per-atom energy target so the
        # network doesn't spend epochs learning the cohesive-energy offset
        if self.pas:
            e_mean = float(np.concatenate(
                [np.asarray(ds["pas_target"])[np.asarray(ds["real"])]
                 for ds in self.buckets]).mean())
        else:
            e_mean = float(np.mean(np.concatenate(
                [np.asarray(ds["e_target"]) for ds in self.buckets])))
        if self.pairwise:
            # pairwise models sum per-PAIR energies: scale by pairs/atom
            pairs = sum(float(np.asarray(ds["mask"]).sum())
                        for ds in self.buckets)
            atoms = sum(float(ds["nat_host"].sum()) for ds in self.buckets)
            e_mean = e_mean / max(pairs / max(atoms, 1.0), 1.0)
        if not warm_start:
            w_last, b_last = self.params[-1]
            self.params[-1] = (w_last, b_last + e_mean)

        # data parallelism: shard each minibatch over a "dp" mesh axis
        # (--devices N / FITSNAP_TPU_NN_DEVICES); gradients are psummed so
        # the update is the single-device update at any device count
        import os
        ndev = (self.config.args.devices
                or int(os.environ.get("FITSNAP_TPU_NN_DEVICES", "0"))
                or 1)
        ndev = min(ndev, len(jax.devices()))

        # Adam moments only; the LR is applied manually in the step so the
        # plateau scheduler can change it inside the jitted epoch scan
        # (bare scale_by_adam has the same state leaves as optax.adam, so
        # round-3 warm-start checkpoints keep loading).  The reference
        # constructs torch ReduceLROnPlateau(mode=min, factor=0.5,
        # patience=49, threshold=1e-4, threshold_mode=abs) at
        # solvers/pytorch.py:113-118 but never calls scheduler.step() —
        # upstream the scheduler is inert; lr_plateau_flag=1 (opt-in)
        # actually steps it here on the per-epoch validation loss.
        opt = optax.scale_by_adam()
        opt_state = opt.init(self.params)
        sched_on = bool(getattr(net, "lr_plateau_flag", False))
        # STRONG dtypes everywhere in the scan carry: a weak-typed scalar
        # (e.g. bare jnp.asarray(np.inf)) strengthens after the first jitted
        # block, changing the call signature and silently recompiling the
        # whole block program a second time (measured: a duplicated ~20 s
        # compile attributed to "warm" epochs)
        fdt = jnp.zeros(()).dtype
        sched0 = (jnp.asarray(float(net.learning_rate), fdt),  # current lr
                  jnp.asarray(np.inf, fdt),          # best metric seen
                  jnp.asarray(0, jnp.int32))         # bad-epoch count
        if self._warm_opt is not None:
            # resume also restores the Adam moments (reference
            # solvers/pytorch.py:105-109 optimizer_state_dict); stored as
            # the flattened leaf list of the optax state pytree
            leaves, treedef = jax.tree.flatten(opt_state)
            stored = list(self._warm_opt)
            if len(stored) != len(leaves) or any(
                    np.shape(a) != np.shape(b)
                    for a, b in zip(stored, leaves)):
                raise ValueError(
                    f"save_state_input {net.save_state_input!r} optimizer "
                    "state does not match this fit's optimizer (shape "
                    "mismatch)")
            opt_state = jax.tree.unflatten(
                treedef, [jnp.asarray(a, l.dtype)
                          for a, l in zip(stored, leaves)])
        loss_fn = partial(self._loss, axis="dp" if ndev > 1 else None)

        # per-bucket train/val indices
        rng = np.random.default_rng(13)
        bs = net.batch_size
        train_sets, val_sets = [], []
        for ds in self.buckets:
            tr = np.where(~ds["test"])[0]
            va = np.where(ds["test"])[0]
            if net.training_fraction < 1.0 and len(va) == 0:
                ntr = int(len(tr) * net.training_fraction)
                va = tr[ntr:]
                tr = tr[:ntr]
            train_sets.append(tr)
            val_sets.append(va)

        def _plan_bsz(n, ds=None):
            """Minibatch size: with dp, a multiple of the device count.

            In OTF mode the step rebuilds neighbor lists on device, whose
            (A, S, A) candidate tensor (plus the rematerialized descriptor
            backward) scales with the bucket's atom padding — so large-atom
            buckets get a capped minibatch to stay inside HBM.  Atoms per
            minibatch (what sets the gradient noise) stays comparable
            across buckets."""
            if ndev > 1 and bs < ndev:
                raise ValueError(
                    f"batch_size={bs} < devices={ndev}: data-parallel "
                    "training needs at least one example per device per "
                    "minibatch — raise batch_size or lower --devices")
            bsz = min(bs, n)
            # opt-in atoms-based sizing: datasets mixing 8-atom and
            # 512-atom configs leave small-atom buckets at tiny per-step
            # work (config-count batches are the reference's semantics);
            # FITSNAP_TPU_NN_ATOMS_PER_BATCH targets a constant per-step
            # atom count instead, which is what sets both gradient noise
            # and TPU utilization
            apb = int(os.environ.get("FITSNAP_TPU_NN_ATOMS_PER_BATCH", "0"))
            if apb and ds is not None:
                a_pad_b = int(ds["real"].shape[1])
                bsz = min(n, max(bsz, apb // max(a_pad_b, 1)))
                # HBM guard: the OTF descriptor backward materializes
                # ~600-float-per-pair tangents, so bound PAIRS per step
                # (390k pairs ~ 0.9 GB of tangents; a (512,96) bucket at
                # 196k pairs is measured-good on v5e)
                k_pad_b = (int(ds["kshape"].shape[-1]) if "kshape" in ds
                           else int(ds["jidx"].shape[-1]) if "jidx" in ds
                           else 0)
                if k_pad_b:
                    bsz = min(bsz, max(1, 390_000 // (a_pad_b * k_pad_b)))
            if self.otf and ds is not None:
                a_pad = int(ds["real"].shape[1])
                S = int(ds["svec_hi"].shape[1])
                cap = max(1, (1 << 25) // (a_pad * S * a_pad))
                bsz = min(bsz, max(cap, ndev))
            if self.cached and ds is not None:
                # transient per-pair monomial tensors (M + 3 tangent
                # chains, n_mono floats each) bound the minibatch: cap
                # PAIRS per step (FITSNAP_TPU_NN_PAIRS; 390k pairs at
                # n_mono=495 is ~3 GB of transients, measured-safe on v5e)
                a_pad = int(ds["real"].shape[1])
                k_pad = int(ds["jidx"].shape[-1])
                cap = max(1, int(os.environ.get(
                    "FITSNAP_TPU_NN_PAIRS", "390000")) // (a_pad * k_pad))
                bsz = min(bsz, max(cap, ndev))
            if ndev > 1:
                bsz = ndev * max(1, bsz // ndev)
            return bsz

        # Training runs as jitted scans over fixed-size epoch BLOCKS (inner
        # scans over minibatches), with all epochs' shuffled index arrays
        # precomputed on host.  Blocks instead of per-minibatch dispatch:
        # through a remote TPU each dispatch costs ~30 ms of latency, which
        # dominated training.  Blocks instead of one whole-run scan: the
        # block program is independent of num_epochs, so changing the epoch
        # count (the normal tuning loop) never recompiles — at most two
        # programs exist, the BLOCK-epoch one and the remainder.
        # Batches run bucket-sequential within an epoch (the per-minibatch
        # loop shuffled across buckets; Adam sees the same minibatches in a
        # slightly different order).
        E = net.num_epochs
        train_perms, tkeys = [], []
        for bi, tr in enumerate(train_sets):
            if len(tr) == 0:
                continue
            bsz = _plan_bsz(len(tr), self.buckets[bi])
            if len(tr) < bsz:          # fewer examples than devices: wrap
                tr = np.resize(tr, bsz)
            nst = (len(tr) - bsz) // bsz + 1
            perms = np.stack([
                (rng.permutation(tr) if net.shuffle_flag else np.asarray(tr))
                [:nst * bsz].reshape(nst, bsz) for _ in range(E)])
            train_perms.append(np.asarray(perms, np.int32))
            tkeys.append(bi)
        val_plans, vkeys = [], []
        for bi, va in enumerate(val_sets):
            if len(va) == 0:
                continue
            bsz = _plan_bsz(len(va), self.buckets[bi])
            va = np.asarray(va)
            if len(va) < bsz:
                va = np.resize(va, bsz)
            nst = (len(va) - bsz) // bsz + 1
            val_plans.append(jnp.asarray(np.asarray(
                va[:nst * bsz].reshape(nst, bsz), np.int32)))
            vkeys.append(bi)

        batch_keys = (self._BATCH_KEYS_PAS if self.pas
                      else self._BATCH_KEYS_PW if self.pairwise
                      else self._BATCH_KEYS_CACHED if self.cached
                      else self._BATCH_KEYS_OTF if self.otf
                      else self._BATCH_KEYS)
        # device-resident dataset passed as explicit jit args (closures
        # would bake the whole dataset into the executable as constants)
        dev_buckets = tuple({k: jnp.asarray(ds[k]) for k in batch_keys}
                            for ds in self.buckets)

        def epoch_body(bufs, vplans, carry, xs):
            params, opt_state, best_val, best_params, best_opt, sched = carry
            lr = sched[0]
            tl_sum = jnp.zeros(())
            tn = 0
            for slot, bi in enumerate(tkeys):
                perms_e = xs[slot]                     # (nsteps, bsz_local)

                def step(c, idx, _bi=bi):
                    p, s = c
                    batch = {k: v[idx] for k, v in bufs[_bi].items()}
                    loss, grads = jax.value_and_grad(loss_fn)(p, batch)
                    if ndev > 1:
                        # the forward psums inside _loss make each device's
                        # loss the GLOBAL value, and shard_map transposes
                        # those psums into a psummed cotangent — so each
                        # device's grad arrives already ndev-scaled; pmean
                        # (not psum) recovers exactly the single-device
                        # gradient (verified against a 1-device run)
                        grads = jax.tree.map(
                            lambda g: jax.lax.pmean(g, "dp"), grads)
                    updates, s = opt.update(grads, s)
                    updates = jax.tree.map(
                        lambda u: -(lr.astype(u.dtype)) * u, updates)
                    return (optax.apply_updates(p, updates), s), loss

                (params, opt_state), losses = jax.lax.scan(
                    step, (params, opt_state), perms_e)
                tl_sum = tl_sum + losses.sum()
                tn += int(losses.shape[0])
            tl = tl_sum / max(tn, 1)
            if vkeys:
                vl_sum = jnp.zeros(())
                vn = 0
                for slot, bi in enumerate(vkeys):
                    def vstep(_, idx, _bi=bi):
                        batch = {k: v[idx] for k, v in bufs[_bi].items()}
                        return None, loss_fn(params, batch)
                    _, vls = jax.lax.scan(vstep, None, vplans[slot])
                    vl_sum = vl_sum + vls.sum()
                    vn += int(vls.shape[0])
                vl = vl_sum / max(vn, 1)
            else:
                vl = tl
            better = vl <= best_val
            best_params = jax.tree.map(
                lambda b, p: jnp.where(better, p, b), best_params, params)
            best_opt = jax.tree.map(
                lambda b, s: jnp.where(better, s, b), best_opt, opt_state)
            best_val = jnp.minimum(best_val, vl)
            if sched_on:
                sched = _plateau_step(
                    sched, vl, factor=net.lr_plateau_factor,
                    patience=net.lr_plateau_patience,
                    threshold=net.lr_plateau_threshold, lr_min=net.lr_min)
            return (params, opt_state, best_val, best_params, best_opt,
                    sched), (tl, vl, sched[0])

        def train_block(carry, perms, bufs, vplans):
            return jax.lax.scan(partial(epoch_body, bufs, vplans),
                                carry, perms)

        vplans_t = tuple(val_plans)
        # Program-size bound: one XLA program holding EVERY bucket's train
        # and val bodies reliably faults the v5e at ~8 OTF bodies ("TPU
        # device error ... kernel fault"), while the same buckets train fine
        # in smaller programs.  Above FUSED buckets, switch to per-epoch
        # dispatch of per-bucket-chunk programs with a host epilogue
        # (best-params tracking by immutable array reference + host plateau
        # scheduler).  The fused multi-epoch block path below stays the
        # fast path for the common few-bucket case.
        FUSED = int(os.environ.get("FITSNAP_TPU_NN_FUSED_BUCKETS", "4"))
        if len(tkeys) > FUSED:
            if ndev > 1:
                # the chunked anti-fault path is single-device; letting the
                # fused program through would fault the device at this
                # bucket count (measured at 8 OTF bodies on v5e)
                raise ValueError(
                    f"data-parallel NN training with {len(tkeys)} shape "
                    f"buckets exceeds the per-program bucket bound "
                    f"({FUSED}): the fused multi-bucket XLA program faults "
                    "the TPU at this size.  Run with --devices 1, raise "
                    "FITSNAP_TPU_NN_FUSED_BUCKETS at your own risk, or "
                    "reduce the bucket count (FITSNAP_TPU_NN_MAX_PROGRAMS)")
            return self._fit_chunked(
                opt, opt_state, loss_fn, net, E, FUSED, fdt, sched_on,
                tkeys, train_perms, vkeys, vplans_t, dev_buckets, nelem_net)
        if ndev > 1:
            # SPMD over the dp mesh: datasets and params replicated, every
            # index plan sharded on its minibatch axis; each device gathers
            # and differentiates its share, psums make the step global
            from jax.sharding import Mesh, PartitionSpec as P
            mesh = Mesh(np.array(jax.devices()[:ndev]), axis_names=("dp",))
            train_fn = jax.jit(jax.shard_map(
                train_block, mesh=mesh,
                in_specs=((P(),) * 6,
                          tuple(P(None, None, "dp") for _ in train_perms),
                          tuple(P() for _ in dev_buckets),
                          tuple(P(None, "dp") for _ in vplans_t)),
                out_specs=((P(),) * 6, (P(), P(), P())),
                check_vma=False))
        else:
            train_fn = jax.jit(train_block)
        # 32-epoch blocks: each block is ONE dispatch through the (remote)
        # device, so per-epoch overhead = dispatch latency / BLOCK.  8 was
        # measured at 0.26 s/epoch warm on the relay (dispatch-dominated);
        # 32 quarters that.  The block program's shape depends only on
        # min(BLOCK, E), so epoch-count tuning still never recompiles
        # beyond the one remainder program.
        BLOCK = int(os.environ.get("FITSNAP_TPU_NN_BLOCK", "32"))
        carry = (self.params, opt_state, jnp.asarray(np.inf, fdt),
                 self.params, opt_state, sched0)
        tls_l, vls_l, lrs_l = [], [], []
        # (epochs, seconds) per dispatched block; the first full-BLOCK entry
        # carries the XLA compile, later ones are steady-state — bench.py
        # derives warm s/epoch from the post-compile blocks
        self.block_times = []
        e0 = 0
        while e0 < E:
            eb = min(BLOCK, E - e0)
            blk = tuple(jnp.asarray(p[e0:e0 + eb]) for p in train_perms)
            t0 = time.time()
            carry, hist = train_fn(carry, blk, dev_buckets, vplans_t)
            jax.block_until_ready(hist)
            self.block_times.append((eb, time.time() - t0))
            # keep per-block history device-resident; download once at the
            # end (device->host transfers through the relay are the cost)
            tls_l.append(hist[0])
            vls_l.append(hist[1])
            lrs_l.append(hist[2])
            e0 += eb
        _, _, _, best_params, best_opt, sched_f = carry
        self.final_lr = float(sched_f[0])
        self._log_lr_reductions(net)
        # one device->host transfer per curve, not one per block
        tls = np.asarray(jnp.concatenate(tls_l)) if tls_l else np.zeros(0)
        vls = np.asarray(jnp.concatenate(vls_l)) if vls_l else np.zeros(0)
        self.lr_history = (np.asarray(jnp.concatenate(lrs_l)) if lrs_l
                           else np.zeros(0))
        self.history = [(e, float(tls[e]), float(vls[e])) for e in range(E)]
        self.params = best_params
        self.fit = None  # nonlinear: no coefficient vector
        return self._finalize_fit(best_opt, net, nelem_net)

    def _log_lr_reductions(self, net):
        """Make scheduler action visible in run output: the reference's
        effective trajectory is constant-LR (it never steps its scheduler),
        so any reduction here is a deliberate divergence the user opted
        into with lr_plateau_flag=1."""
        if self.lr_history.size and self.final_lr is not None \
                and self.final_lr < float(net.learning_rate) * (1 - 1e-12):
            from fitsnap_tpu.io.screen import info
            first = int(np.argmax(
                self.lr_history < float(net.learning_rate) * (1 - 1e-12)))
            info(f"ReduceLROnPlateau: lr {float(net.learning_rate):g} -> "
                 f"{self.final_lr:g} (first reduction at epoch {first}; "
                 "the reference never steps its scheduler)")

    def _finalize_fit(self, best_opt, net, nelem_net):
        with open("loss_vs_epochs.dat", "w") as f:
            for e, tl, vl in self.history:
                f.write(f"{e} {tl:.8e} {vl:.8e}\n")
        if net.save_state_output and net.save_state_output != "None":
            save_params(net.save_state_output, self.params, {
                "layer_sizes": net.layer_sizes,
                "mean": np.asarray(self.mean),
                "std": np.asarray(self.std),
                "multi_element_option": net.multi_element_option,
                # Adam moments at the best-val epoch (the saved params), so
                # a resume continues the same trajectory (reference
                # solvers/pytorch.py:105-109 optimizer_state_dict)
                "opt_state": [np.asarray(x)
                              for x in jax.tree.leaves(best_opt)],
            })
        if net.output_file and net.output_file != "None":
            # LAMMPS ML-IAP deployment module (torch is an export-time-only
            # dependency; reference `lib/neural_networks/pytorch.py:250`,
            # pairwise: `pairwise.py:226` -> `write.py:189 PairNN`,
            # per-atom scalars: `pas.py:116` uses the same TorchWrapper)
            try:
                from fitsnap_tpu.io.export_torch import (export_mliap,
                                                         export_pairnn)
                out = net.output_file
                if not out.endswith(".pt"):
                    out += ".pt"
                if self.pairwise:
                    sec = self._custom_sec
                    export_pairnn(out, self.params, np.asarray(self.mean),
                                  np.asarray(self.std), sec.cutoff,
                                  sec.num_radial, sec.num_3body, nelem_net)
                else:
                    export_mliap(out, self.params, np.asarray(self.mean),
                                 np.asarray(self.std), nelem_net)
            except ModuleNotFoundError:
                pass
        return self.params

    def _fit_chunked(self, opt, opt_state, loss_fn, net, E, FUSED, fdt,
                     sched_on, tkeys, train_perms, vkeys, vplans_t,
                     dev_buckets, nelem_net):
        """Per-epoch dispatch of per-bucket-chunk programs.

        Used when the dataset spans more than FUSED shape buckets: inlining
        every bucket's train+val body into one epoch-block program produces
        an XLA program the TPU faults on (measured at 8 OTF bodies on v5e,
        WBe full dataset).  Here each program covers <= FUSED buckets'
        minibatch scans for ONE epoch; params/opt thread through sequential
        chunk calls, and the epilogue (validation combine, best-checkpoint
        tracking by immutable array reference, the plateau scheduler) runs
        on host between epochs.  Same math as the fused path — verified
        equal trajectories in tests/test_nn.py (chunked-vs-fused).
        """
        import optax

        chunks = [list(range(i, min(i + FUSED, len(tkeys))))
                  for i in range(0, len(tkeys), FUSED)]
        vchunks = [list(range(i, min(i + FUSED, len(vkeys))))
                   for i in range(0, len(vkeys), FUSED)]

        def make_train(nslots):
            def run(params, opt_state, lr, bufs, perms_e):
                tl_sum = jnp.zeros(())
                for k in range(nslots):
                    def step(c, idx, _k=k):
                        p, s = c
                        batch = {kk: v[idx] for kk, v in bufs[_k].items()}
                        loss, grads = jax.value_and_grad(loss_fn)(p, batch)
                        updates, s = opt.update(grads, s)
                        updates = jax.tree.map(
                            lambda u: -(lr.astype(u.dtype)) * u, updates)
                        return (optax.apply_updates(p, updates), s), loss
                    (params, opt_state), losses = jax.lax.scan(
                        step, (params, opt_state), perms_e[k])
                    tl_sum = tl_sum + losses.sum()
                return params, opt_state, tl_sum
            return jax.jit(run)

        def make_val(nslots):
            def run(params, bufs, vplans):
                vl_sum = jnp.zeros(())
                for k in range(nslots):
                    def vstep(_, idx, _k=k):
                        batch = {kk: v[idx] for kk, v in bufs[_k].items()}
                        return None, loss_fn(params, batch)
                    _, vls = jax.lax.scan(vstep, None, vplans[k])
                    vl_sum = vl_sum + vls.sum()
                return vl_sum
            return jax.jit(run)

        train_fns = [make_train(len(c)) for c in chunks]
        val_fns = [make_val(len(c)) for c in vchunks]
        tbufs = [tuple(dev_buckets[tkeys[s]] for s in c) for c in chunks]
        vbufs = [tuple(dev_buckets[vkeys[s]] for s in c) for c in vchunks]
        tn = sum(int(p.shape[1]) for p in train_perms)
        vn = sum(int(v.shape[0]) for v in vplans_t)

        params = self.params
        # AOT-compile every chunk program concurrently (server-side XLA
        # compiles parallelize through the relay; lazily each would compile
        # serially inside epoch 0 — measured ~350 s for 4 programs on the
        # full WBe set).  Compiled executables land in the persistent
        # cache, so the jit calls below hit it.
        from fitsnap_tpu.parallel.fit import compile_concurrently
        lr0 = jnp.asarray(float(net.learning_rate), fdt)
        items = [(train_fns[ci],
                  (params, opt_state, lr0, tbufs[ci],
                   tuple(jnp.asarray(train_perms[s][0]) for s in c)))
                 for ci, c in enumerate(chunks)]
        items += [(val_fns[ci],
                   (params, vbufs[ci], tuple(vplans_t[s] for s in c)))
                  for ci, c in enumerate(vchunks)]
        compile_concurrently(items)
        sched = (float(net.learning_rate), np.inf, 0)
        best_val = np.inf
        best_params, best_opt = params, opt_state
        tls = np.zeros(E)
        vls = np.zeros(E)
        lrs = np.zeros(E)
        self.block_times = []
        for e in range(E):
            t0 = time.time()
            lr_dev = jnp.asarray(sched[0], fdt)
            tl_sum = 0.0
            for ci, c in enumerate(chunks):
                perms_e = tuple(jnp.asarray(train_perms[s][e]) for s in c)
                params, opt_state, ts = train_fns[ci](
                    params, opt_state, lr_dev, tbufs[ci], perms_e)
                tl_sum += float(ts)
            tl = tl_sum / max(tn, 1)
            if vkeys:
                vl_sum = 0.0
                for ci, c in enumerate(vchunks):
                    vplans_c = tuple(vplans_t[s] for s in c)
                    vl_sum += float(val_fns[ci](params, vbufs[ci], vplans_c))
                vl = vl_sum / max(vn, 1)
            else:
                vl = tl
            if vl <= best_val:
                # jax arrays are immutable: holding the reference IS the
                # checkpoint, no copy needed
                best_val, best_params, best_opt = vl, params, opt_state
            if sched_on:
                sched = _plateau_step_host(
                    sched, vl, factor=net.lr_plateau_factor,
                    patience=net.lr_plateau_patience,
                    threshold=net.lr_plateau_threshold, lr_min=net.lr_min)
            tls[e], vls[e], lrs[e] = tl, vl, sched[0]
            self.block_times.append((1, time.time() - t0))

        self.final_lr = float(sched[0])
        self.lr_history = lrs
        self._log_lr_reductions(net)
        self.history = [(e, float(tls[e]), float(vls[e])) for e in range(E)]
        self.params = best_params
        self.fit = None
        return self._finalize_fit(best_opt, net, nelem_net)

    # ------------- evaluation / errors -------------

    def evaluate_bucket(self, ds, chunk=32):
        """Predictions for every config in one bucket."""
        n = int(ds["nat"].shape[0])
        # ONE jitted program per bucket: scan over fixed-size index chunks,
        # gathers under jit (eager per-chunk gathers on device-resident
        # B/G each cost a compile/program-load through the remote relay)
        fwd = (self._forward_pas if self.pas
               else self._forward_pairwise if self.pairwise
               else self._forward_batch_cached if self.cached
               else self._forward_batch_otf if self.otf
               else self._forward_batch)
        keys = (self._BATCH_KEYS_PAS if self.pas
                else self._BATCH_KEYS_PW if self.pairwise
                else self._BATCH_KEYS_CACHED if self.cached
                else self._BATCH_KEYS_OTF if self.otf
                else self._BATCH_KEYS)
        C = -(-n // chunk)
        idxs = np.minimum(np.arange(C * chunk), n - 1) \
            .reshape(C, chunk).astype(np.int32)

        def run(params, idxs, bufs):
            def body(_, idx):
                return None, fwd(params, {k: v[idx]
                                          for k, v in bufs.items()})
            _, out = jax.lax.scan(body, None, idxs)
            return out

        if self._fwd_jit is None:
            self._fwd_jit = jax.jit(run)
        bufs = {k: jnp.asarray(ds[k]) for k in keys}
        out = self._fwd_jit(self.params, jnp.asarray(idxs), bufs)
        if self.pas:
            p = np.asarray(out).reshape((C * chunk,) + out.shape[2:])[:n]
            return p, None
        e, f = out
        e = np.asarray(e).reshape(C * chunk)[:n]
        f = np.asarray(f).reshape((C * chunk,) + f.shape[2:])[:n]
        return e, f

    def _error_analysis_pas(self):
        from pandas import DataFrame

        rows = {}
        for ds in self.buckets:
            pred, _ = self.evaluate_bucket(ds)
            t = np.asarray(ds["pas_target"])
            realm = np.asarray(ds["real"])
            for i, g in enumerate(ds["groups"]):
                label = "Testing" if ds["test"][i] else "Training"
                rows.setdefault((g, label), []).append(
                    (pred[i] - t[i])[realm[i]])
        table = []
        keys = sorted(rows) + [("*ALL", "Training"), ("*ALL", "Testing")]
        for g, label in keys:
            if g == "*ALL":
                res = np.concatenate(
                    [v for (gg, ll), vs in rows.items() if ll == label
                     for v in vs] or [np.zeros(0)])
            else:
                res = np.concatenate(rows[(g, label)])
            if res.size == 0:
                continue
            table.append({"Group": g, "Testing": label,
                          "ncount": int(res.size),
                          "mae": float(np.abs(res).mean()),
                          "rmse": float(np.sqrt((res ** 2).mean()))})
        self.errors = DataFrame(table).set_index(["Group", "Testing"])

    def _dump_details(self):
        """Per-config and per-atom prediction files (reference
        solver.py:210-298 NN dumps, consumed by tools/nn_tools.py)."""
        extras = self.config.sections["EXTRAS"]
        outfile = self.config.sections["OUTFILE"]
        fhc = open(outfile.perconfig_file, "w") if extras.dump_perconfig \
            else None
        fha = open(outfile.peratom_file, "w") if extras.dump_peratom \
            else None
        if fhc:
            fhc.write("Filename Group Natoms Energy_Truth Energy_Pred "
                      "Testing_Bool\n")
        if fha:
            fha.write("Filename Group AtomID Type Fx_Truth Fy_Truth "
                      "Fz_Truth Fx_Pred Fy_Pred Fz_Pred Testing_Bool\n")
        for ds in self.buckets:
            e_pred, f_pred = self.evaluate_bucket(ds)
            e_t = np.asarray(ds["e_target"])
            f_t = np.asarray(ds["f_target"])
            types = np.asarray(ds["types"])
            nat = ds["nat_host"]
            for i, g in enumerate(ds["groups"]):
                fn = ds["files"][i]
                tb = int(ds["test"][i])
                na = int(nat[i])
                if fhc:
                    fhc.write(f"{fn} {g} {na} {e_t[i]:.10e} "
                              f"{e_pred[i]:.10e} {tb}\n")
                if fha and f_pred is not None:
                    for k in range(na):
                        ft = f_t[i, k]
                        fp = f_pred[i, k]
                        fha.write(
                            f"{fn} {g} {k} {types[i, k] + 1} "
                            f"{ft[0]:.10e} {ft[1]:.10e} {ft[2]:.10e} "
                            f"{fp[0]:.10e} {fp[1]:.10e} {fp[2]:.10e} "
                            f"{tb}\n")
        if fhc:
            fhc.close()
        if fha:
            fha.close()

    def error_analysis(self, a=None, b=None, w=None, fs_dict=None):
        from pandas import DataFrame

        if self.params is None or self.buckets is None:
            self.errors = []
            return
        if self.pas:
            return self._error_analysis_pas()
        extras = self.config.sections["EXTRAS"]
        if extras.dump_perconfig or extras.dump_peratom:
            self._dump_details()
        rows_e, rows_f = {}, {}
        for ds in self.buckets:
            e_pred, f_pred = self.evaluate_bucket(ds)
            e_t = np.asarray(ds["e_target"])
            f_t = np.asarray(ds["f_target"])
            realm = np.asarray(ds["real"])
            groups = np.array(ds["groups"])
            test = ds["test"]
            for i, g in enumerate(groups):
                label = "Testing" if test[i] else "Training"
                rows_e.setdefault((g, label), []).append(
                    e_pred[i] - e_t[i])
                rows_f.setdefault((g, label), []).append(
                    (f_pred[i] - f_t[i])[realm[i]])
        table = []
        keys = sorted(rows_e) + [("*ALL", "Training"), ("*ALL", "Testing")]
        for g, label in keys:
            if g == "*ALL":
                e_res = np.concatenate(
                    [np.atleast_1d(v) for (gg, ll), vs in rows_e.items()
                     if ll == label for v in vs] or [np.zeros(0)])
                f_res = np.concatenate(
                    [v.reshape(-1) for (gg, ll), vs in rows_f.items()
                     if ll == label for v in vs] or [np.zeros(0)])
            else:
                e_res = np.array(rows_e[(g, label)])
                f_res = np.concatenate(
                    [v.reshape(-1) for v in rows_f[(g, label)]])
            if e_res.size == 0:
                continue
            table.append({
                "Group": g, "Testing": label,
                "ncount_E": int(e_res.size),
                "mae_E": float(np.abs(e_res).mean()),
                "rmse_E": float(np.sqrt((e_res ** 2).mean())),
                "ncount_F": int(f_res.size),
                "mae_F": float(np.abs(f_res).mean()) if f_res.size else 0.0,
                "rmse_F": float(np.sqrt((f_res ** 2).mean()))
                if f_res.size else 0.0,
            })
        self.errors = DataFrame(table).set_index(["Group", "Testing"])
