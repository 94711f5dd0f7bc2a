"""Ablation probe for the WBe NN training step: where does the time go?

Times, per bucket shape of the full WBe OTF plan, jitted programs for
 (a) the CURRENT otf step: value_and_grad through on-device neighbor
     build + descriptors + MLP (what trains today),
 (b) neighbor build alone (the static recompute VERDICT r4 flags),
 (c) a CACHED-neighbor step: value_and_grad through descriptors + MLP
     from resident (disp, jidx, mask), forces by one-hot scatter of
     dE/ddisp — the candidate dgrad_mode=cached training step.

Synthetic positions (timing depends on static shapes only).

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/nn_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

# (a_pad, k_pad, S, nconfigs, bsz) — the BENCH_r04 WBe plan
SHAPES = [
    (512, 96, 27, 166, 4),
    (64, 64, 75, 1226, 64),
    (128, 32, 27, 461, 32),
    (256, 64, 45, 201, 11),
    (64, 64, 27, 4344, 64),
    (16, 96, 175, 7417, 253),
    (8, 192, 441, 11207, 253),
    (32, 384, 1089, 400, 30),
]


def main():
    from fitsnap_tpu.fitsnap import FitSnap
    from fitsnap_tpu.models.mlp import atom_energies, init_mlp
    from fitsnap_tpu.parallel.fit import device_neighbors
    from fitsnap_tpu.utils.jaxsetup import setup_cache
    from benchmarks.nn_wbe import settings

    jax.config.update("jax_enable_x64", True)
    setup_cache()
    print(f"backend={jax.default_backend()}", flush=True)
    fs = FitSnap(settings(1, 16), arglist=["--overwrite"])
    calc = fs.calculator
    desc = calc.nn_desc_fn()
    cutoff = float(calc.cutoff)
    nd = calc.get_width()
    key = jax.random.PRNGKey(0)
    params = init_mlp([nd, 64, 64, 1], 2, key, jnp.float32)
    mean = jnp.zeros((nd,), jnp.float32)
    std = jnp.ones((nd,), jnp.float32)

    def bench(fn, args, label, iters=10):
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / iters
        return dt

    tot = {"otf": 0.0, "neigh": 0.0, "cached": 0.0}
    for (A, K, S, n, bsz) in SHAPES:
        rng = np.random.default_rng(0)
        # box sized for realistic density (~0.06 atoms/A^3 - metals)
        L = max((A / 0.06) ** (1 / 3), cutoff * 1.05)
        pos = rng.uniform(0, L, (bsz, A, 3)).astype(np.float32)
        ph = jnp.asarray(pos)
        pl = jnp.zeros_like(ph)
        sv = np.zeros((S, 3), np.float32)
        # home image first; the rest far away (valid-masked out)
        sv[1:] = rng.uniform(2 * L, 4 * L, (S - 1, 3))
        sh = jnp.asarray(np.broadcast_to(sv, (bsz, S, 3)))
        sl = jnp.zeros_like(sh)
        tt = jnp.asarray(rng.integers(0, 2, (bsz, A)), jnp.int32)
        nad = jnp.full((bsz,), A, jnp.int32)
        real = jnp.ones((bsz, A), jnp.float32)

        def neigh_only(ph, pl, sh, sl, nad):
            return jax.vmap(lambda p, l, s, sl_, na: device_neighbors(
                p, l, s, sl_, na, cutoff, K))(ph, pl, sh, sl, nad)

        jn = jax.jit(neigh_only)
        d0, j0, m0 = jn(ph, pl, sh, sl, nad)
        d0, j0, m0 = (jnp.asarray(d0), jnp.asarray(j0), jnp.asarray(m0))

        def otf_step(params, ph, pl, sh, sl, tt, nad, real):
            def one(p, l, s, sl_, t, na, r):
                def etot(pp):
                    d, j, m = device_neighbors(pp, l, s, sl_, na, cutoff, K)
                    B = jax.checkpoint(lambda dd: desc(dd, j, m, t, na))(d)
                    x = (B - mean) / std
                    return jnp.sum(atom_energies(params, x, t) * r)
                e, g = jax.value_and_grad(etot)(p)
                return e, -g
            e, f = jax.vmap(one)(ph, pl, sh, sl, tt, nad, real)
            return e.sum() + f.sum()

        def cached_step(params, d, j, m, tt, nad, real):
            def one(dd, jj, mm, t, na, r):
                def etot(x_d):
                    B = jax.checkpoint(
                        lambda q: desc(q, jj, mm, t, na))(x_d)
                    x = (B - mean) / std
                    return jnp.sum(atom_energies(params, x, t) * r)
                e, g = jax.value_and_grad(etot)(dd)
                return e, g
            e, g = jax.vmap(one)(d, j, m, tt, nad, real)
            oj = jax.nn.one_hot(j, d.shape[1], dtype=d.dtype)
            scat = jnp.einsum("nakm,nakc->nmc", oj, g)
            forces = -(scat - g.sum(axis=2))
            return e.sum() + forces.sum()

        t_o = bench(jax.jit(otf_step), (params, ph, pl, sh, sl, tt, nad,
                                        real), "otf")
        t_n = bench(jn, (ph, pl, sh, sl, nad), "neigh")
        t_c = bench(jax.jit(cached_step), (params, d0, j0, m0, tt, nad,
                                           real), "cached")
        steps = -(-n // bsz)
        for k, v in (("otf", t_o), ("neigh", t_n), ("cached", t_c)):
            tot[k] += v * steps
        print(f"(A={A},K={K},S={S}) bsz={bsz} x{steps} steps: "
              f"otf {t_o*1e3:.1f}ms  neigh {t_n*1e3:.1f}ms  "
              f"cached {t_c*1e3:.1f}ms  (per-epoch: otf {t_o*steps:.2f}s "
              f"cached {t_c*steps:.2f}s)", flush=True)

    print(f"\nper-epoch totals: otf {tot['otf']:.1f}s  "
          f"neigh-only {tot['neigh']:.1f}s  cached {tot['cached']:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
