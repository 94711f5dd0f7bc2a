"""Benchmark: Ta_Linear_JCP2014 full linear SNAP fit on one chip.

Runs the TPU-native path end-to-end: JSON scrape -> host neighbor packing ->
on-device descriptor + derivative rows -> sharded normal equations -> solve.
BASELINE.md target: full fit < 10 s on one TPU chip (the reference needs an
embedded-LAMMPS pass per config plus a host SVD).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = 10s-target / measured end-to-end seconds (>1 beats target).
"""

import json
import os
import sys
import time

import numpy as np
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    # f64 accumulation of the normal equations on device (rows stay f32)
    jax.config.update("jax_enable_x64", True)

    from fitsnap_tpu.fitsnap import FitSnap
    from fitsnap_tpu.parallel.fit import build_step_fn, make_mesh, pack_batch
    from fitsnap_tpu.utils.jaxsetup import setup_cache

    setup_cache()
    backend = jax.default_backend()
    dtype = np.float32 if backend == "tpu" else np.float64
    log(f"backend={backend} devices={jax.devices()} dtype={dtype.__name__}")

    example = "/root/reference/examples/Ta_Linear_JCP2014/Ta-example.in"
    t_start = time.time()
    fs = FitSnap(example, arglist=["--overwrite"])
    fs.scrape_configs()
    t_scrape = time.time() - t_start

    calc = fs.calculator
    t0 = time.time()
    packed, _ = calc.host_preprocess(fs.data)
    t_pre = time.time() - t0

    a_pad = max(8, -(-max(pc.natoms for pc in packed) // 8) * 8)
    k_pad = max(8, -(-max(pc.kcount for pc in packed) // 8) * 8)
    mesh = make_mesh()
    ndev = mesh.devices.size
    # chunk so the transient per-pair U tangents stay well under HBM
    csize = max(1, min(16, (1 << 28) // (a_pad * k_pad * 280 * 4 * 3)))
    per = ndev * csize
    chunks = -(-len(packed) // per)
    n_pad = chunks * per
    log(f"{len(packed)} configs -> ({chunks} chunks x {per}) "
        f"a_pad={a_pad} k_pad={k_pad}")

    t0 = time.time()
    batch = pack_batch(packed, a_pad, k_pad, n_pad, dtype, chunks=chunks)
    t_pack = time.time() - t0

    flags = {"energy": True, "force": True, "stress": True}
    step = build_step_fn(calc.params, calc.numtypes, flags, mesh,
                         refspec=calc.refspec)
    from fitsnap_tpu.parallel.fit import build_eval_fn
    evaluate = build_eval_fn(calc.params, calc.numtypes, flags, mesh,
                             refspec=calc.refspec)

    # one host->device transfer; steps run on resident data (the remote-TPU
    # relay makes implicit per-call numpy uploads dominate otherwise)
    from jax.sharding import NamedSharding, PartitionSpec as P
    t0 = time.time()
    dp = NamedSharding(mesh, P(None, "dp"))
    batch = tuple(jax.device_put(x, dp) for x in batch)
    jax.block_until_ready(batch)
    t_put = time.time() - t0

    t0 = time.time()
    out = step(batch)
    jax.block_until_ready(out)
    t_first = time.time() - t0

    from fitsnap_tpu.parallel.fit import NormalSolver
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        AtA, Atb, nrows = step(batch)
        solver = NormalSolver(np.asarray(AtA))
        coeff = solver.solve(np.asarray(Atb))
    t_step = (time.time() - t0) / reps

    coeff = np.asarray(coeff, np.float64)
    assert np.isfinite(coeff).all()
    # sanity: compare against the committed standard coefficients
    std_path = ("/root/reference/examples/Ta_Linear_JCP2014/"
                "20May21_Standard/Ta_pot.snapcoeff")
    vals = []
    with open(std_path) as f:
        for ln in f:
            ln = ln.strip()
            if ln and not ln.startswith("#") and "#" in ln:
                vals.append(float(ln.split()[0]))
    std = np.array(vals)
    # weighted normal-equation fit vs SVD: identical up to conditioning
    dcoeff = np.abs(coeff - std[1:] if len(std) == len(coeff) + 1 else
                    coeff - std).max()
    log(f"max|coeff - standard| = {dcoeff:.3e}")

    se, ne, sf, nf = [float(np.asarray(x))
                      for x in evaluate(jnp.asarray(coeff, dtype), batch)]
    mae_e, mae_f = se / ne, sf / nf
    # committed standard unweighted training MAEs (Ta_metrics.md)
    log(f"energy MAE {mae_e:.6f} (standard 0.112787)  "
        f"force MAE {mae_f:.6f} (standard 0.075758)")

    end_to_end = t_scrape + t_pre + t_pack + t_put + t_step
    rows_per_sec = nrows / t_step
    log(f"scrape {t_scrape:.2f}s  preprocess {t_pre:.2f}s  pack {t_pack:.2f}s"
        f"  device_put {t_put:.2f}s")
    log(f"first step (compile) {t_first:.2f}s  steady step {t_step:.3f}s")
    log(f"end-to-end (amortized) {end_to_end:.2f}s  rows/s {rows_per_sec:.0f}")

    print(json.dumps({
        "metric": "ta_linear_fit_seconds",
        "value": round(end_to_end, 4),
        "unit": "s",
        "vs_baseline": round(10.0 / end_to_end, 2),
    }))


if __name__ == "__main__":
    main()
