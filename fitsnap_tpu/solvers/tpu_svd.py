"""On-device linear solve (normal equations + equilibrated eigh).

Stands in for the reference's distributed ScaLAPACK solver
(`solvers/scalapack.py`): on TPU the assembled system solves via device
matmuls; the fully sharded multi-chip path (no materialized A) lives in
`fitsnap_tpu.parallel.fit`.
"""

import jax.numpy as jnp
import numpy as np

from fitsnap_tpu.solvers.solver import Solver
from fitsnap_tpu.parallel.fit import NormalSolver


class TpuSVD(Solver):
    def perform_fit(self, a=None, b=None, w=None, fs_dict=None,
                    trainall=False):
        import jax

        if fs_dict is not None and not trainall:
            training = np.array([not t for t in fs_dict["Testing"]])
        else:
            training = np.ones(a.shape[0], bool)
        wt = w[training]
        aw = wt[:, None] * a[training]
        bw = wt * b[training]

        ndev = len(jax.devices())
        if ndev > 1:
            # shard the row axis over the mesh: each chip holds and squares
            # rows/ndev; the replicated output sharding induces the psum
            # (the CLI analog of the reference's `mpirun -np N` + ScaLAPACK)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from fitsnap_tpu.parallel.fit import make_mesh

            pad = (-len(aw)) % ndev
            if pad:
                aw = np.concatenate([aw, np.zeros((pad,) + aw.shape[1:],
                                                  aw.dtype)])
                bw = np.concatenate([bw, np.zeros((pad,), bw.dtype)])
            mesh = make_mesh(ndev)
            rows = NamedSharding(mesh, P("dp"))
            repl = NamedSharding(mesh, P())
            aw = jax.device_put(aw, rows)
            bw = jax.device_put(bw, rows)
            normal = jax.jit(lambda A, c: (A.T @ A, A.T @ c),
                             out_shardings=(repl, repl))
            AtA, Atb = (np.asarray(x) for x in normal(aw, bw))
        else:
            aw, bw = jnp.asarray(aw), jnp.asarray(bw)
            AtA = np.asarray(aw.T @ aw)
            Atb = np.asarray(aw.T @ bw)
        self.fit = NormalSolver(AtA).solve(Atb)
        return self.fit
