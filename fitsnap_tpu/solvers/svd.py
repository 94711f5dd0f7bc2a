"""SVD (least-squares) solver, parity with reference `solvers/svd.py`.

Solves the weighted system with an SVD-based lstsq at singular-value cutoff
1e-13.  A device (TPU) path via normal equations is provided by
`fitsnap_tpu.parallel.fit` and used by the distributed fitting entry
point; this host path is the float64 parity oracle.
"""

import numpy as np

from fitsnap_tpu.solvers.solver import Solver


class TfSVD(Solver):
    """On-device dense lstsq (reference `solvers/tensorflowsvd.py:13-41`).

    The reference's TensorflowSVD exists to run the same weighted lstsq
    through an accelerator library (tf.linalg.lstsq) instead of scipy; the
    TPU-native equivalent is jnp.linalg.lstsq on the default backend.  It
    solves the fast-Cholesky normal-equation form like tf.linalg.lstsq's
    default (fast=True), which is also why the reference notes the
    transpose trick is redundant here.
    """

    def perform_fit(self, a=None, b=None, w=None, fs_dict=None,
                    trainall=False):
        import jax.numpy as jnp

        if fs_dict is not None and not trainall:
            training = np.array([not t for t in fs_dict["Testing"]])
        else:
            training = np.ones(a.shape[0], bool)
        wt = w[training]
        aw, bw = wt[:, None] * a[training], wt * b[training]
        # tf.linalg.lstsq(fast=True) == Cholesky on the normal equations;
        # form them in f64 regardless of the row dtype for TPU stability.
        ata = jnp.asarray(aw.T @ aw, jnp.float64)
        atb = jnp.asarray(aw.T @ bw, jnp.float64)
        self.fit = np.asarray(jnp.linalg.solve(ata, atb))
        return self.fit


class SVD(Solver):
    def perform_fit(self, a=None, b=None, w=None, fs_dict=None, trainall=False):
        if fs_dict is not None and not trainall:
            training = np.array([not t for t in fs_dict["Testing"]])
        else:
            training = np.ones(a.shape[0], bool)
        wt = w[training]
        aw, bw = wt[:, None] * a[training], wt * b[training]
        extras = self.config.sections.get("EXTRAS") if self.config else None
        if extras is not None and extras.apply_transpose:
            if np.linalg.cond(aw) ** 2 < 1 / np.finfo(aw.dtype).eps:
                bw = aw.T @ bw
                aw = aw.T @ aw
        self.fit, _, _, _ = np.linalg.lstsq(aw, bw, rcond=1.0e-13)
        return self.fit
