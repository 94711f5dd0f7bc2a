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
        if fs_dict is not None and not trainall:
            training = np.array([not t for t in fs_dict["Testing"]])
        else:
            training = np.ones(a.shape[0], bool)
        wt = w[training]
        aw = jnp.asarray(wt[:, None] * a[training])
        bw = jnp.asarray(wt * b[training])
        AtA = np.asarray(aw.T @ aw)
        Atb = np.asarray(aw.T @ bw)
        self.fit = NormalSolver(AtA).solve(Atb)
        return self.fit
