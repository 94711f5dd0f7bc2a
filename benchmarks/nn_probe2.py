"""Scan-based probe: cached-neighbor NN step cost WITHOUT dispatch overhead.

Times a lax.scan of NSTEP training steps in ONE dispatched program (how the
real epoch-block training runs), for the WBe bucket shapes, at 1x and 2x
the r04 batch sizes.  Also times forward-only (descriptor+MLP, no grad).

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/nn_probe2.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = [
    (512, 96, 166, 4),
    (64, 64, 5570, 64),     # merged view of the two (64,64) buckets
    (16, 96, 7417, 253),
    (8, 192, 11207, 253),
]
NSTEP = 10


def main():
    from fitsnap_tpu.fitsnap import FitSnap
    from fitsnap_tpu.models.mlp import atom_energies, init_mlp
    from fitsnap_tpu.utils.jaxsetup import setup_cache
    from benchmarks.nn_wbe import settings

    jax.config.update("jax_enable_x64", True)
    setup_cache()
    print(f"backend={jax.default_backend()}", flush=True)
    fs = FitSnap(settings(1, 16), arglist=["--overwrite"])
    calc = fs.calculator
    desc = calc.nn_desc_fn()
    nd = calc.get_width()
    key = jax.random.PRNGKey(0)
    params = init_mlp([nd, 64, 64, 1], 2, key, jnp.float32)
    mean = jnp.zeros((nd,), jnp.float32)
    std = jnp.ones((nd,), jnp.float32)

    import optax
    opt = optax.adam(1e-4)

    tot = {}
    for (A, K, n, bsz0) in SHAPES:
        for mult in (1, 2):
            bsz = bsz0 * mult
            rng = np.random.default_rng(0)
            d0 = jnp.asarray(
                rng.uniform(-3, 3, (bsz, A, K, 3)).astype(np.float32))
            j0 = jnp.asarray(rng.integers(0, A, (bsz, A, K)), jnp.int32)
            m0 = jnp.asarray(rng.random((bsz, A, K)) < 0.7)
            tt = jnp.asarray(rng.integers(0, 2, (bsz, A)), jnp.int32)
            nad = jnp.full((bsz,), A, jnp.int32)
            real = jnp.ones((bsz, A), jnp.float32)
            etgt = jnp.zeros((bsz,), jnp.float32)
            ftgt = jnp.zeros((bsz, A, 3), jnp.float32)

            def loss_fn(params, use_ckpt=True):
                def one(dd, jj, mm, t, na, r):
                    def etot(x_d):
                        f = lambda q: desc(q, jj, mm, t, na)
                        B = (jax.checkpoint(f)(x_d) if use_ckpt else f(x_d))
                        x = (B - mean) / std
                        return jnp.sum(atom_energies(params, x, t) * r)
                    e, g = jax.value_and_grad(etot)(dd)
                    return e, g
                e, g = jax.vmap(one)(d0, j0, m0, tt, nad, real)
                oj = jax.nn.one_hot(j0, A, dtype=d0.dtype)
                scat = jnp.einsum("nakm,nakc->nmc", oj, g)
                forces = -(scat - g.sum(axis=2))
                er = (e / A - etgt)
                fr = forces - ftgt
                return jnp.sum(er * er) + jnp.sum(fr * fr)

            def scan_steps(params, opt_state, use_ckpt=True):
                def body(c, _):
                    p, s = c
                    l, gr = jax.value_and_grad(
                        lambda pp: loss_fn(pp, use_ckpt))(p)
                    up, s = opt.update(gr, s)
                    return (optax.apply_updates(p, up), s), l
                (p, s), ls = jax.lax.scan(body, (params, opt_state), None,
                                          length=NSTEP)
                return ls.sum()

            def scan_fwd(params):
                def body(c, _):
                    def one(dd, jj, mm, t, na, r):
                        B = desc(dd, jj, mm, t, na)
                        x = (B - mean) / std
                        return jnp.sum(atom_energies(params, x, t) * r)
                    return c + jax.vmap(one)(d0, j0, m0, tt, nad,
                                             real).sum(), None
                out, _ = jax.lax.scan(body, jnp.zeros(()), None,
                                      length=NSTEP)
                return out

            opt_state = opt.init(params)
            res = {}
            variants = [
                ("step", jax.jit(lambda p, s: scan_steps(p, s, True))),
                ("fwd", jax.jit(scan_fwd))]
            if mult == 1:
                variants.insert(1, ("steppnc", jax.jit(
                    lambda p, s: scan_steps(p, s, False))))
            res["steppnc"] = 0.0
            for label, fn in variants:
                args = (params, opt_state) if label != "fwd" else (params,)
                r = fn(*args)
                jax.block_until_ready(r)
                t0 = time.time()
                r = fn(*args)
                jax.block_until_ready(r)
                res[label] = (time.time() - t0) / NSTEP
            steps = -(-n // bsz)
            tot.setdefault(mult, 0.0)
            tot[mult] += res["step"] * steps
            print(f"(A={A},K={K}) bsz={bsz}: step {res['step']*1e3:.1f}ms "
                  f"(no-ckpt {res['steppnc']*1e3:.1f}) "
                  f"fwd {res['fwd']*1e3:.1f}ms  x{steps} -> "
                  f"{res['step']*steps:.2f}s/epoch", flush=True)

    for mult, v in tot.items():
        print(f"\nper-epoch total (bsz x{mult}): {v:.1f}s", flush=True)


if __name__ == "__main__":
    main()
