"""WBe_PRB2019 (25,422 configs / 1.77M rows) on one TPU chip.

BASELINE.md target: beat a 64-rank MPI CPU run of the reference.  The
reference computes descriptors with one embedded LAMMPS instance per config;
here the whole dataset streams through bucketed device steps accumulating
the normal equations.

Host->device traffic is the bottleneck through the remote TPU relay
(~1-2 MB/s), so the batch carries POSITIONS (hi/lo f32 pairs), not neighbor
tensors: neighbor lists are built on device (`device_neighbors`), cutting
the upload ~20x vs shipping (disp, jidx, mask).  Configs bucket by
(shift extent, natoms, kmax) and the buckets coalesce to at most 10 XLA
programs (`plan_pos_buckets`) so compile cost stays bounded.

Run: python benchmarks/wbe_tpu.py [max_configs]
"""

import sys
import time

import numpy as np


def run(limit=None, refine=False, mae=False, max_programs=10):
    """Run the WBe fit end-to-end; returns a result dict for bench.py."""
    import jax
    jax.config.update("jax_enable_x64", True)

    from fitsnap_tpu.fitsnap import FitSnap
    from fitsnap_tpu.parallel.fit import (NormalSolver, build_step_fn,
                                          make_mesh, pack_batch_pos,
                                          plan_pos_buckets)
    from fitsnap_tpu.utils.jaxsetup import setup_cache, warm_transfers

    setup_cache()
    warm_transfers()
    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    print(f"backend={jax.default_backend()} dtype={dtype.__name__}",
          flush=True)

    t_all = time.time()
    fs = FitSnap("/root/reference/examples/WBe_PRB2019/WBe-example.in",
                 arglist=["--overwrite"])
    fs.scrape_configs()
    data = fs.data[:limit] if limit else fs.data
    t_scrape = time.time() - t_all
    print(f"scraped {len(data)} configs in {t_scrape:.1f}s", flush=True)

    calc = fs.calculator
    t0 = time.time()
    packed = [calc._pack(d) for d in data]
    groups = plan_pos_buckets(packed, calc.cutoff, max_programs=max_programs)
    print(f"host plan {time.time()-t0:.1f}s; programs: "
          f"{[(g['a_pad'], g['k_pad'], len(g['s_table']), len(g['configs']))
              for g in groups]}", flush=True)

    mesh = make_mesh()
    ndev = mesh.devices.size
    flags = {"energy": True, "force": True, "stress": True}

    # device-resident f64 accumulator: nothing downloads until the end
    # (device->host is slow through the remote relay)
    acc = None
    acc_finish = None

    # pass 1: pack + (async) upload every bucket, building all programs.
    # Uploads pipeline through the relay while the host packs the next
    # bucket; nothing blocks here.
    t_pack = 0.0
    t0_all = time.time()
    progs = []      # (acc_step, batch, neighbors, label)
    for g in groups:
        a_pad, k_pad, s_table = g["a_pad"], g["k_pad"], g["s_table"]
        cfgs = g["configs"]
        S = len(s_table)
        # chunk so both the per-pair descriptor tangents and the neighbor
        # candidate tensor stay well under HBM
        csize = max(1, min(16,
                           (1 << 27) // (a_pad * max(k_pad, 96) * 570 * 12),
                           (1 << 28) // max(a_pad * S * a_pad * 16, 1)))
        per = ndev * csize
        C = -(-len(cfgs) // per)
        t0 = time.time()
        batch = pack_batch_pos(cfgs, a_pad, C * per, s_table, dtype,
                               chunks=C)
        t_pack += time.time() - t0
        neighbors = {"cutoff": calc.cutoff, "k_pad": k_pad}
        acc_step, init_fn, acc_finish = build_step_fn(
            calc.params, calc.numtypes, flags, mesh, refspec=calc.refspec,
            neighbors=neighbors, accumulate=True)
        if acc is None:
            acc = init_fn()
        batch = jax.device_put(batch)
        progs.append((acc_step, batch, neighbors,
                      f"({a_pad},{k_pad},S={S}) x{len(cfgs)} csize={csize}"))

    # pass 2+3: compile ALL bucket programs concurrently (server-side
    # compile parallelizes through the relay; serially these 8 programs
    # cost ~290 s, together ~1 program's wall time) and START EXECUTING
    # each one the moment its compile lands — device compute overlaps the
    # remaining compiles, so total ~= max(compile wall, compute wall).
    from fitsnap_tpu.parallel.fit import compile_futures
    t0_cc = time.time()
    futures = compile_futures(
        [(step, (acc, batch)) for step, batch, _, _ in progs]
        # the finish/split program compiles alongside the bucket programs
        # instead of lazily inside the end-of-run download
        + [(acc_finish._jitted, (acc,))])
    futures, _finish_future = futures[:-1], futures[-1]
    t_compile = 0.0
    t_compute = 0.0
    resident = []   # (batch, step_meta) for optional refine/mae passes
    pending = set(range(len(progs)))
    while pending:
        # pick a finished compile if any, else block on the earliest
        ready = [i for i in pending if futures[i].done()]
        i = ready[0] if ready else min(pending)
        cexe = futures[i].result()
        if not t_compile:
            t_compile = time.time() - t0_cc   # wall until first program ready
        pending.discard(i)
        step, batch, neighbors, label = progs[i]
        t0 = time.time()
        try:
            acc = cexe(acc, batch)
        except (TypeError, ValueError) as e:
            # AOT executables reject inputs whose layout/sharding differs
            # from what they were lowered with; the jit path recompiles for
            # the actual layout.  Loudly logged — a silent fallback would
            # absorb real device errors into the timing as a mystery
            # recompile (and genuine runtime faults now propagate).
            print(f"  program {label}: AOT input mismatch ({e!r}); "
                  "falling back to jit", flush=True)
            acc = step(acc, batch)
        jax.block_until_ready(acc)
        resident.append((batch, neighbors))
        dt = time.time() - t0
        t_compute += dt
        print(f"  program {label}: {dt:.2f}s", flush=True)

    t0 = time.time()
    AtA_sum, Atb_sum, nrows_total = acc_finish(acc)
    t_down = time.time() - t0
    t0 = time.time()
    solver = NormalSolver(AtA_sum)
    coeff = solver.solve(Atb_sum)
    t_solve = time.time() - t0
    assert np.isfinite(coeff).all()

    # OPTIONAL iterative refinement (--refine).  CAUTION: with residuals
    # computed from the same f32 rows, normal-equation refinement carries a
    # cond(A)^2 * u_f32 update error — measured on Ta it can move the fit
    # AWAY from the f64 solution (2.9e-5 -> 6.1e-4).  The default direct
    # f64-accumulated solve is the guarded configuration; this stays for
    # experimentation only.
    if refine:
        import jax.numpy as jnp
        from fitsnap_tpu.parallel.fit import build_residual_fn
        t0 = time.time()
        for _ in range(2):
            Atr = np.zeros_like(Atb_sum)
            for batch, neighbors in resident:
                residual = build_residual_fn(
                    calc.params, calc.numtypes, flags, mesh,
                    refspec=calc.refspec, neighbors=neighbors)
                Atr += np.asarray(
                    residual(jnp.asarray(coeff, dtype), batch), np.float64)
            coeff = coeff + solver.solve(Atr)
        print(f"refine (2 passes): {time.time()-t0:.1f}s", flush=True)
    total = time.time() - t_all
    print(f"rows {nrows_total:.0f}  pack {t_pack:.1f}s  compile "
          f"{t_compile:.1f}s (concurrent)  device compute {t_compute:.1f}s "
          f"({nrows_total/max(t_compute,1e-9):.0f} rows/s warm)",
          flush=True)
    print(f"download {t_down:.2f}s  solve {t_solve:.2f}s  "
          f"TOTAL end-to-end {total:.1f}s", flush=True)

    std_path = ("/root/reference/examples/WBe_PRB2019/20May21_Standard/"
                "WBe_pot.snapcoeff")
    vals = []
    with open(std_path) as f:
        for ln in f:
            ln = ln.strip()
            if ln and not ln.startswith("#") and "#" in ln:
                vals.append(float(ln.split()[0]))
    std = np.array(vals)
    if std.size == coeff.size + 2:
        # bzeroflag=1: the standard carries a zero offset row per type
        std = std.reshape(2, -1)[:, 1:].reshape(-1)
    dcoeff = None
    if std.shape == coeff.shape:
        dcoeff = float(np.abs(coeff - std).max())
        print(f"max|coeff - 20May21_Standard| = {dcoeff:.3e}", flush=True)

    if mae:
        import jax.numpy as jnp
        from fitsnap_tpu.parallel.fit import build_eval_fn
        t0 = time.time()
        se = ne = sf = nf = 0.0
        for batch, neighbors in resident:
            evaluate = build_eval_fn(calc.params, calc.numtypes, flags,
                                     mesh, refspec=calc.refspec,
                                     neighbors=neighbors)
            o = evaluate(jnp.asarray(coeff, dtype), batch)
            se += float(np.asarray(o[0]))
            ne += float(np.asarray(o[1]))
            sf += float(np.asarray(o[2]))
            nf += float(np.asarray(o[3]))
        # unweighted training MAEs in the reference's convention; compare
        # with the committed WBe_metrics.md "*Unweighted" rows
        print(f"energy MAE {se/ne:.6f}  force MAE {sf/nf:.6f}  "
              f"(eval {time.time()-t0:.1f}s)", flush=True)

    # roofline: XLA-estimated flops / bytes-accessed across all bucket
    # programs over the measured device-compute wall (v5e HBM peak ~819
    # GB/s; achieved GB/s is what "HBM-bound" claims answer to)
    flops = bytes_acc = 0.0
    try:
        for f in futures:
            ca = f.result().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops += float(ca.get("flops", 0.0))
            bytes_acc += float(ca.get("bytes accessed", 0.0))
        print(f"roofline: {flops / max(t_compute, 1e-9) / 1e12:.3f} TFLOP/s,"
              f" {bytes_acc / max(t_compute, 1e-9) / 1e9:.1f} GB/s achieved"
              " (v5e HBM peak ~819 GB/s)", flush=True)
    except Exception as e:   # noqa: BLE001 - diagnostic only
        print(f"cost_analysis unavailable: {e!r}", flush=True)
        flops = bytes_acc = 0.0

    return {
        "rows": float(nrows_total),
        "seconds": float(total),
        "compile_seconds": float(t_compile),
        "compute_seconds": float(t_compute),
        "rows_per_sec": float(nrows_total / max(t_compute, 1e-9)),
        "coeff_maxdiff": dcoeff,
        "step_gbps": (bytes_acc / max(t_compute, 1e-9) / 1e9
                      if bytes_acc else None),
        "step_tflops": (flops / max(t_compute, 1e-9) / 1e12
                        if flops else None),
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    run(limit=int(args[0]) if args else None,
        refine="--refine" in sys.argv, mae="--mae" in sys.argv)


if __name__ == "__main__":
    main()
