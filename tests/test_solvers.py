"""Unit tests for the Bayesian/sparse linear solvers on synthetic data.

Covers MERR's two samplers (BFGS optimize / adaptive-MCMC posterior sampling,
reference `solvers/merr.py` + `solvers/lreg.py:127`) and the shared
adaptive-Metropolis helper used by the MCMC solver (`solvers/mcmc.py`).
"""

from types import SimpleNamespace

import numpy as np
import pytest


def _synthetic(npt=200, nbas=5, noise=0.01, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(npt, nbas))
    x_true = np.arange(1, nbas + 1, dtype=float)
    b = a @ x_true + noise * rng.normal(size=npt)
    w = np.ones(npt)
    return a, b, w, x_true


def _solver_config(**kw):
    defaults = dict(cov_nugget=1e-8, merr_cfs="all", merr_mult=0,
                    merr_method="iid", merr_sampler="bfgs",
                    mcmc_num=4000, mcmc_gamma=0.1, mcmc_sigma=0.1, nsam=50)
    defaults.update(kw)
    sec = SimpleNamespace(**defaults)
    return SimpleNamespace(sections={"SOLVER": sec})


@pytest.mark.parametrize("method", ["iid", "abc", "full"])
def test_merr_bfgs_recovers_truth(method):
    from fitsnap_tpu.solvers.merr import MERR
    a, b, w, x_true = _synthetic()
    s = MERR("MERR", _solver_config(merr_method=method))
    fit = s.perform_fit(a=a, b=b, w=w, fs_dict=None)
    assert np.abs(fit - x_true).max() < 0.1
    assert s.cov.shape == (5, 5)


def test_merr_mcmc_sampler():
    from fitsnap_tpu.solvers.merr import MERR
    a, b, w, x_true = _synthetic()
    s = MERR("MERR", _solver_config(merr_sampler="mcmc", mcmc_num=3000))
    fit = s.perform_fit(a=a, b=b, w=w, fs_dict=None)
    # the MAP of the sampled embedded posterior should still sit near truth
    assert np.abs(fit - x_true).max() < 0.2
    assert s.fit_sam is not None and s.fit_sam.shape[1] == 5
    # posterior samples spread around the fit
    assert np.abs(s.fit_sam.mean(axis=0) - x_true).max() < 0.5


def test_merr_bad_sampler_raises():
    from fitsnap_tpu.solvers.merr import MERR
    a, b, w, _ = _synthetic(npt=30, nbas=3)
    s = MERR("MERR", _solver_config(merr_sampler="nuts"))
    with pytest.raises(ValueError, match="merr_sampler"):
        s.perform_fit(a=a, b=b, w=w, fs_dict=None)


def test_merr_zero_column_backfill():
    """All-zero A columns (blank2J masking) must come back as zero coeffs."""
    from fitsnap_tpu.solvers.merr import MERR
    a, b, w, x_true = _synthetic()
    a2 = np.insert(a, 2, 0.0, axis=1)
    s = MERR("MERR", _solver_config())
    fit = s.perform_fit(a=a2, b=b, w=w, fs_dict=None)
    assert fit[2] == 0.0
    assert np.abs(np.delete(fit, 2) - x_true).max() < 0.1


def test_mcmc_solver_recovers_truth():
    from fitsnap_tpu.solvers.linear import MCMC
    a, b, w, x_true = _synthetic()
    s = MCMC("MCMC", _solver_config(mcmc_num=3000))
    fit = s.perform_fit(a=a, b=b, w=w, fs_dict=None)
    assert np.abs(fit - x_true).max() < 0.1
    assert s.fit_sam.shape[1] == 5
    assert s.cov.shape == (5, 5)


def test_adaptive_metropolis_gaussian_moments():
    """The AM chain on a known Gaussian target reproduces its moments."""
    from fitsnap_tpu.solvers.linear import adaptive_metropolis
    mu = np.array([1.0, -2.0])
    prec = np.array([[4.0, 0.0], [0.0, 1.0]])

    def neg_logpost(x):
        d = x - mu
        return 0.5 * d @ prec @ d

    rng = np.random.default_rng(42)
    samples, cmode, pmode = adaptive_metropolis(
        neg_logpost, np.zeros(2), 20000, 0.5, rng=rng)
    tail = samples[10000:]
    assert np.abs(tail.mean(axis=0) - mu).max() < 0.15
    assert abs(tail[:, 0].var() - 0.25) < 0.1
    assert abs(tail[:, 1].var() - 1.0) < 0.3
    assert np.abs(cmode - mu).max() < 0.2


def test_tpusvd_sharded_rows_match_lstsq():
    """TPUSVD shards the materialized rows over all devices (the CLI analog
    of `mpirun -np N` + ScaLAPACK); the psum'd normal equations must
    reproduce the host lstsq fit, including with a row count that does not
    divide the mesh (zero-row padding)."""
    import jax

    from fitsnap_tpu.solvers.tpu_svd import TpuSVD

    assert len(jax.devices()) >= 8
    a, b, w, x_true = _synthetic(npt=203, nbas=7, noise=1e-3, seed=3)
    w[50:] = 2.0
    fs_dict = {"Testing": [i % 10 == 0 for i in range(len(b))]}
    s = TpuSVD("TPUSVD", _solver_config())
    fit = s.perform_fit(a, b, w, fs_dict)

    training = ~np.asarray(fs_dict["Testing"])
    aw = w[training, None] * a[training]
    bw = w[training] * b[training]
    ref, *_ = np.linalg.lstsq(aw, bw, rcond=1e-13)
    assert np.abs(fit - ref).max() < 1e-8


def test_tensorflowsvd_equiv_matches_lstsq():
    """TENSORFLOWSVD (reference `solvers/tensorflowsvd.py`) maps to the
    on-device jnp lstsq path; on a well-conditioned system it must agree
    with the host SVD fit, honoring weights and the train/test mask."""
    from fitsnap_tpu.solvers.svd import SVD, TfSVD

    a, b, w, x_true = _synthetic(npt=150, nbas=6, noise=1e-3, seed=7)
    w[40:] = 3.0
    fs_dict = {"Testing": [i % 7 == 0 for i in range(len(b))]}
    ref = SVD("SVD", None).perform_fit(a, b, w, fs_dict)
    fit = TfSVD("TENSORFLOWSVD", None).perform_fit(a, b, w, fs_dict)
    assert np.abs(fit - ref).max() < 1e-8
    assert np.abs(fit - x_true).max() < 0.05
