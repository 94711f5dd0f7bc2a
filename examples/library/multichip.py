"""Multi-chip fitting over a jax.sharding Mesh.

The reference scales out with MPI ranks + ScaLAPACK (`mpirun -np 64 python
-m fitsnap3 ...`); here the same scale-out is a device mesh: configs are
sharded over the 'dp' axis, each chip accumulates its shard's normal
equations inside one jitted scan, and a psum (induced by the output
sharding) reduces them across chips. The solve is replicated — it is tiny
(width x width) next to the descriptor work.

On a real TPU pod slice this script runs unchanged. Without one, set

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

to get a virtual 8-device mesh (exactly what tests/conftest.py does), which
validates the sharding end to end.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python multichip.py
"""

import argparse
import os

import numpy as np

EXAMPLES = os.environ.get("FITSNAP_EXAMPLES", "/root/reference/examples")

parser = argparse.ArgumentParser()
parser.add_argument("--data", default=f"{EXAMPLES}/Ta_Linear_JCP2014/JSON")
parser.add_argument("--groups", nargs="*",
                    default=["Displaced_A15", "Volume_BCC"])
parser.add_argument("--devices", type=int, default=None,
                    help="mesh size (default: all visible devices)")
cli = parser.parse_args()

import jax

from fitsnap_tpu.fitsnap import FitSnap
from fitsnap_tpu.parallel.fit import (NormalSolver, build_step_fn,
                                      make_mesh, pack_batch)

ndev = cli.devices or len(jax.devices())
print(f"devices: {jax.devices()} -> {ndev}-wide 'dp' mesh")

settings = {
    "BISPECTRUM": {
        "numTypes": 1, "twojmax": 6, "rcutfac": 4.67637, "rfac0": 0.99363,
        "rmin0": 0.0, "wj": 1.0, "radelem": 0.5, "type": "Ta",
        "bzeroflag": 0,
    },
    "CALCULATOR": {"calculator": "LAMMPSSNAP",
                   "energy": 1, "force": 1, "stress": 1},
    "SOLVER": {"solver": "SVD"},
    "SCRAPER": {"scraper": "JSON"},
    "PATH": {"dataPath": cli.data},
    "OUTFILE": {"metrics": "MC_metrics.md", "potential": "MC_pot"},
    "REFERENCE": {
        "units": "metal", "atom_style": "atomic",
        "pair_style": "hybrid/overlay zero 10.0 zbl 4.0 4.8",
        "pair_coeff1": "* * zero", "pair_coeff2": "* * zbl 73 73",
    },
    "GROUPS": {
        "group_sections": "name training_size testing_size "
                          "eweight fweight vweight",
        "group_types": "str float float float float float",
        **{g: "1.0 0.0 100 1 1e-8" for g in cli.groups},
    },
}

fs = FitSnap(settings, arglist=["--overwrite"])
fs.scrape_configs()
calc = fs.calculator
packed, _ = calc.host_preprocess(fs.data)

# pad atoms/neighbors to one static shape, shard chunks of `ndev` configs
a_pad = max(8, -(-max(pc.natoms for pc in packed) // 8) * 8)
k_pad = max(8, -(-max(pc.kcount for pc in packed) // 8) * 8)
chunks = -(-len(packed) // ndev)
batch = pack_batch(packed, a_pad, k_pad, chunks * ndev, np.float64,
                   chunks=chunks)

mesh = make_mesh(ndev)
flags = {"energy": True, "force": True, "stress": True}
step = build_step_fn(calc.params, calc.numtypes, flags, mesh,
                     refspec=calc.refspec)
AtA, Atb, nrows = step(batch)         # sharded scan + cross-chip psum
coeff = NormalSolver(AtA).solve(Atb)

# compare against the host single-device assembly + SVD
a, b, w, fs_dict = calc.process_configs(fs.data)
ref = np.linalg.lstsq(w[:, None] * a, w * b, rcond=1e-13)[0]
print(f"rows={int(np.asarray(nrows))}, width={a.shape[1]}")
print("max |sharded - host SVD| coefficient diff:",
      float(np.abs(coeff - ref).max()))

fs.solver.fit = np.asarray(coeff)
fs.solver.error_analysis(a, b, w, fs_dict)
fs.write_output()
print("written: MC_pot.snapcoeff / MC_pot.snapparam / MC_metrics.md")
