"""Stage-level timing of the cached analytic NN step on one bucket shape.

Times scan-NSTEP programs of increasing scope and prints XLA cost-analysis
flops/bytes for each, to locate the off-roofline stage.

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/nn_probe3.py [A K bsz]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NSTEP = 10


def main():
    from fitsnap_tpu.fitsnap import FitSnap
    from fitsnap_tpu.models.mlp import atom_energies, init_mlp
    from fitsnap_tpu.ops.snap import atom_descriptors_fast
    from fitsnap_tpu.utils.jaxsetup import setup_cache
    from benchmarks.nn_wbe import settings

    jax.config.update("jax_enable_x64", True)
    setup_cache()
    A, K, bsz = (int(x) for x in (sys.argv[1:4] or [64, 64, 64]))
    print(f"backend={jax.default_backend()} A={A} K={K} bsz={bsz}",
          flush=True)
    fs = FitSnap(settings(1, 16), arglist=["--overwrite"])
    calc = fs.calculator
    kit = calc.nn_analytic_fns()
    p = calc.params
    nd = calc.get_width()
    params = init_mlp([nd, 64, 64, 1], 2, jax.random.PRNGKey(0), jnp.float32)
    mean = jnp.zeros((nd,), jnp.float32)
    std = jnp.ones((nd,), jnp.float32)

    rng = np.random.default_rng(0)
    # buffer of NBUF configs; every scan step gathers a FRESH batch (as the
    # solver does) so XLA cannot hoist batch-dependent stages out of the
    # scan (a constant batch made earlier probes ~4x optimistic)
    NBUF = max(2 * bsz, 256)
    D = jnp.asarray(rng.uniform(-3, 3, (NBUF, A, K, 3)).astype(np.float32))
    J = jnp.asarray(rng.integers(0, A, (NBUF, A, K)), jnp.int32)
    M = jnp.asarray(rng.random((NBUF, A, K)) < 0.7)
    TT = jnp.asarray(rng.integers(0, 2, (NBUF, A)), jnp.int32)
    NAD = jnp.full((NBUF,), A, jnp.int32)
    REAL = jnp.ones((NBUF, A), jnp.float32)
    IDX = jnp.asarray(rng.integers(0, NBUF, (NSTEP, bsz)), jnp.int32)

    import optax
    opt = optax.adam(1e-4)

    def scanit(body_out):
        def run(params):
            def body(c, idx):
                b = dict(d0=D[idx], j0=J[idx], m0=M[idx], tt=TT[idx],
                         nad=NAD[idx], real=REAL[idx], idx=idx)
                return c + body_out(params, b), None
            out, _ = jax.lax.scan(body, jnp.zeros(()), IDX)
            return out
        return jax.jit(run)

    def chains_only(params):
        # monomial chains + wm contraction only (per-pair work)
        from fitsnap_tpu.ops.snap import _blocked_L, _ck_prologue
        def one(d, j, m, t):
            jel = t[j]
            prim = _ck_prologue(d, jel, m, t, p)
            eye = jnp.eye(3, dtype=d.dtype)
            tg = jnp.broadcast_to(eye[:, None, None, :], (3,) + d.shape)
            tans = jax.vmap(lambda tv: jax.jvp(
                lambda dd: _ck_prologue(dd, jel, m, t, p), (d,), (tv,))[1])(tg)
            parent, varidx, Lj, blocks, u_len = _blocked_L(p.plan, d.dtype)
            Mp = [jnp.ones_like(prim[0])]
            Mt = [jnp.zeros_like(tans[0])]
            for i in range(1, len(parent)):
                pa, vi = int(parent[i]), int(varidx[i])
                Mp.append(Mp[pa] * prim[vi])
                Mt.append(Mt[pa] * prim[vi][None] + Mp[pa][None] * tans[vi])
            M = jnp.stack(Mp, -1)
            Mtt = jnp.stack(Mt, -1)
            wm = jnp.einsum("ak,akm->am", prim[4], M)
            return wm.sum() + Mtt.sum()
        return jax.vmap(one)(d0, j0, m0, tt).sum()

    # precompute cached state (ut, B) for the whole buffer, as the solver
    UT0, B0 = jax.jit(jax.vmap(kit["utb"]))(D, J, M, TT, NAD)
    UT0, B0 = jnp.asarray(UT0), jnp.asarray(B0)

    def cached_fwd(params, b, idx_ut, idx_b):
        N = b["d0"].shape[0]
        x = ((idx_b - mean) / std).reshape(N * A, -1)
        ef = b["tt"].reshape(-1)
        rf = b["real"].reshape(-1)
        eat, vjp_fn = jax.vjp(
            lambda xx: atom_energies(params, xx, ef), x)
        e = (eat * rf).reshape(N, A).sum(1)
        dEdB = vjp_fn(rf)[0] / std
        vg = kit["dEdu_vg"](dEdB, idx_ut.reshape(N * A, -1))
        n_t = vg.shape[-1]
        vg = vg.reshape(N, A, n_t, n_t)
        grid = jax.vmap(kit["pair"])(b["d0"], b["j0"], b["m0"], b["tt"])
        g = jax.vmap(kit["force"])(vg, grid)
        oj = jax.nn.one_hot(b["j0"], A, dtype=jnp.float32)
        scat = jnp.einsum("nakm,nakc->nmc", oj, g)
        forces = -(scat - g.sum(axis=2))
        return e, forces

    def parts_only(params, b):
        grid = jax.vmap(kit["pair"])(b["d0"], b["j0"], b["m0"], b["tt"])
        return sum(x.sum() for x in grid)

    def zroute_only(params, b):
        # dEdu + vg from cached ut with a params-dependent dEdB surrogate
        x = ((B0[:bsz] - mean) / std).reshape(bsz * A, -1)
        dEdB = atom_energies(params, x, b["tt"].reshape(-1))[:, None] *             jnp.ones((1, x.shape[-1]), jnp.float32)
        vg = kit["dEdu_vg"](dEdB, UT0[:bsz].reshape(bsz * A, -1))
        return vg.sum()

    def fwd_only(params, b):
        x = ((B0[b["idx"]] - mean) / std).reshape(bsz * A, -1)
        return jnp.sum(atom_energies(params, x, b["tt"].reshape(-1))
                       * b["real"].reshape(-1))

    def full_step(params, b):
        e, f = cached_fwd(params, b, UT0[b["idx"]], B0[b["idx"]])
        return e.sum() + f.sum()

    def train_step(params, b):
        def loss(pp):
            e, f = cached_fwd(pp, b, UT0[b["idx"]], B0[b["idx"]])
            return jnp.sum((e / A) ** 2) + jnp.sum(f ** 2)
        l, gr = jax.value_and_grad(loss)(params)
        return l + sum(jnp.sum(w) + jnp.sum(b_) for w, b_ in gr)

    def bonly(params, b):
        def one(d, j, m, t, na):
            return atom_descriptors_fast(d, t[j], m, t, p).sum()
        return jax.vmap(one)(b["d0"], b["j0"], b["m0"], b["tt"],
                             b["nad"]).sum()

    for label, body in (("B-fwd", bonly), ("zroute", zroute_only),
                        ("parts", parts_only), ("fwd+mlp", fwd_only),
                        ("full-fwd", full_step), ("train", train_step)):
        fn = scanit(body)
        try:
            lo = fn.lower(params)
            ce = lo.compile()
            ca = ce.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            fl = float(ca.get("flops", 0)) / NSTEP
            by = float(ca.get("bytes accessed", 0)) / NSTEP
            r = fn(params)
            jax.block_until_ready(r)
            t0 = time.time()
            r = fn(params)
            jax.block_until_ready(r)
            dt = (time.time() - t0) / NSTEP
            print(f"{label:9s}: {dt*1e3:7.1f} ms/step  "
                  f"{fl/dt/1e12:6.2f} TFLOP/s ({fl/1e9:.2f} GF)  "
                  f"{by/dt/1e9:6.1f} GB/s ({by/2**30:.2f} GiB)", flush=True)
        except Exception as e:
            print(f"{label}: FAILED {e!r}", flush=True)


if __name__ == "__main__":
    main()
