"""Microbenchmark: SNAP normal-equation step throughput vs chunk size.

Times the WBe production kernel (positions path, device neighbors) on ONE
bucket shape with synthetic configs, sweeping the per-device chunk size, to
locate the throughput knee.  Prints configs/s and rows/s per setting.

Run: PYTHONPATH=. python benchmarks/kernel_probe.py [a_pad] [k_pad] [S_n]
"""

import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", True)

    from fitsnap_tpu.fitsnap import FitSnap
    from fitsnap_tpu.parallel.fit import (build_step_fn, make_mesh,
                                          pack_batch_pos)
    from fitsnap_tpu.utils.jaxsetup import setup_cache

    setup_cache()
    args = sys.argv[1:]
    a_pad = int(args[0]) if args else 64
    k_pad = int(args[1]) if len(args) > 1 else 64
    s_n = int(args[2]) if len(args) > 2 else 1   # shift extent per axis

    ex = "/root/reference/examples/WBe_PRB2019/WBe-example.in"
    fs = FitSnap(ex, arglist=["--overwrite"])
    fs.scrape_configs()
    fs.data = fs.data[:1]
    calc = fs.calculator
    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64

    rng = np.random.default_rng(0)
    na = a_pad
    # synthetic cubic configs at WBe-ish density
    L = (na / 0.06) ** (1 / 3)

    class PC:
        pass

    def mk():
        pc = PC()
        pc.natoms = na
        pc.cell = np.eye(3) * L
        pc.pos = rng.uniform(0, L, (na, 3))
        pc.types = rng.integers(0, 2, na).astype(np.int32)
        pc.data = {"Energy": 0.0, "Forces": np.zeros((na, 3)),
                   "eweight": 1.0, "fweight": 1.0, "vweight": 1.0}
        return pc

    from fitsnap_tpu.ops.neighbors import shift_table
    s_table = tuple(map(tuple, shift_table(np.array([s_n] * 3))))
    mesh = make_mesh()
    ndev = mesh.devices.size
    flags = {"energy": True, "force": True, "stress": True}
    nbr = {"cutoff": calc.cutoff, "k_pad": k_pad}
    rows_per_cfg = 1 + 3 * na + 6

    total = int(args[3]) if len(args) > 3 else 512
    for csize in (1, 2, 4, 8, 16, 32):
        per = ndev * csize
        C = max(2, total // per)
        cfgs = [mk() for _ in range(C * per)]
        try:
            batch = pack_batch_pos(cfgs, a_pad, C * per, s_table, dtype,
                                   chunks=C)
            step, init_fn, finish = build_step_fn(
                calc.params, calc.numtypes, flags, mesh, refspec=calc.refspec,
                neighbors=nbr, accumulate=True)
            acc = init_fn()
            batch = jax.device_put(batch)
            acc = step(acc, batch)          # compile + warm
            jax.block_until_ready(acc)
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                acc = step(acc, batch)
            jax.block_until_ready(acc)
            dt = (time.time() - t0) / reps
            n = C * per
            print(f"csize={csize:3d} chunks={C:3d} ({n} cfgs): "
                  f"{dt*1e3:8.1f} ms  {n/dt:8.0f} cfg/s  "
                  f"{n*rows_per_cfg/dt:9.0f} rows/s", flush=True)
        except Exception as e:
            print(f"csize={csize}: {type(e).__name__}: {e}", flush=True)
            break


if __name__ == "__main__":
    main()
