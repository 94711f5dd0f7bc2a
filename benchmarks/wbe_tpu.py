"""WBe_PRB2019 (25,422 configs) on one TPU chip.

BASELINE.md target: beat a 64-rank MPI CPU run of the reference.  The
reference computes descriptors with one embedded LAMMPS instance per config;
here the whole dataset streams through bucketed device steps accumulating
the normal equations.

One fixed-shape program per (a_pad, k_pad) bucket: each step call processes
a constant-size macro-batch (padded tail), so the program count — and the
per-program compile/warmup cost — is bounded by the bucket count, not the
dataset size.

Run: python benchmarks/wbe_tpu.py [max_configs]
"""

import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", True)

    from fitsnap_tpu.fitsnap import FitSnap
    from fitsnap_tpu.parallel.fit import (NormalSolver, build_step_fn,
                                          make_mesh, pack_batch)
    from fitsnap_tpu.utils.jaxsetup import setup_cache

    setup_cache()
    limit = int(sys.argv[1]) if len(sys.argv) > 1 else None
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
    packed, buckets = calc.host_preprocess(data)
    print(f"host preprocess {time.time()-t0:.1f}s; "
          f"buckets: {[(k, len(v)) for k, v in sorted(buckets.items())]}",
          flush=True)

    mesh = make_mesh()
    flags = {"energy": True, "force": True, "stress": True}
    step = build_step_fn(calc.params, calc.numtypes, flags, mesh,
                         refspec=calc.refspec)

    AtA_sum = None
    Atb_sum = None
    nrows_total = 0.0
    t_compute = 0.0
    for (a_pad, k_pad), idxs in sorted(buckets.items()):
        csize = max(1, min(16,
                           (1 << 27) // (a_pad * max(k_pad, 96) * 570 * 12)))
        per = mesh.devices.size * csize
        t0 = time.time()
        for lo in range(0, len(idxs), per):
            sel = [packed[i] for i in idxs[lo:lo + per]]
            batch = pack_batch(sel, a_pad, k_pad, per, dtype, chunks=1)
            AtA, Atb, nrows = step(batch)
            nrows_total += float(np.asarray(nrows))
            AtA_sum = AtA if AtA_sum is None else AtA_sum + AtA
            Atb_sum = Atb if Atb_sum is None else Atb_sum + Atb
        dt = time.time() - t0
        t_compute += dt
        print(f"  bucket ({a_pad},{k_pad}) x{len(idxs)} csize={csize}: "
              f"{dt:.2f}s", flush=True)

    t0 = time.time()
    solver = NormalSolver(AtA_sum)
    coeff = solver.solve(Atb_sum)
    t_solve = time.time() - t0
    assert np.isfinite(coeff).all()
    total = time.time() - t_all
    print(f"rows {nrows_total:.0f}  device compute+transfer {t_compute:.1f}s "
          f"({nrows_total/max(t_compute,1e-9):.0f} rows/s incl. compiles)",
          flush=True)
    print(f"solve {t_solve:.2f}s  TOTAL end-to-end {total:.1f}s", flush=True)


if __name__ == "__main__":
    main()
