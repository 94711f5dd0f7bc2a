"""ACE kernel tests: spherical harmonics, rotation invariance, FD forces."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


class _Sec:
    b_basis = "native"
    ranks = [1, 2, 3, 4]
    nmax = [3, 2, 2, 1]
    lmax = [1, 2, 2, 2]
    lmin = [0, 1, 1, 1]
    numtypes = 1
    nmaxbase = 3
    rcutfac = [4.5]
    lmbda = [3.0]
    rcinner = [0.0]
    drcinner = [0.01]


@pytest.fixture(scope="module")
def plan():
    from fitsnap_tpu.ops.ace import build_ace_plan
    return build_ace_plan(_Sec())


def test_ylm_vs_scipy():
    from scipy.special import sph_harm_y
    from fitsnap_tpu.ops.ace import sph_harm

    rng = np.random.default_rng(0)
    v = rng.normal(size=(6, 3))
    v /= np.linalg.norm(v, axis=1)[:, None]
    yr, yi = sph_harm(jnp.asarray(v), 3)
    theta = np.arccos(v[:, 2])
    phi = np.arctan2(v[:, 1], v[:, 0])
    for l in range(4):
        for m in range(-l, l + 1):
            ref = sph_harm_y(l, m, theta, phi)
            mine = np.array(yr[l][:, m + l]) + 1j * np.array(yi[l][:, m + l])
            assert np.abs(ref - mine).max() < 1e-13


def test_rotation_invariance(plan):
    from scipy.spatial.transform import Rotation
    from fitsnap_tpu.ops.ace import ace_a_basis, ace_b_from_a

    rng = np.random.default_rng(1)
    K = 8
    disp = rng.normal(size=(2, K, 3)) * 1.5 + np.array([2.0, 0, 0])
    mask = np.ones((2, K), bool)
    jelem = np.zeros((2, K), int)

    def bvals(d):
        Ar, Ai = ace_a_basis(jnp.asarray(d), jnp.asarray(jelem),
                             jnp.asarray(mask),
                             jnp.zeros(d.shape[0], int), plan)
        return np.array(ace_b_from_a(Ar, Ai, plan))

    B1 = bvals(disp)
    R = Rotation.random(random_state=7).as_matrix()
    B2 = bvals(disp @ R.T)
    assert np.abs(B1 - B2).max() < 1e-12
    assert np.abs(B1).max() > 0.1  # not trivially zero


@pytest.mark.heavy
def test_jacobian_matches_autodiff(plan):
    from fitsnap_tpu.ops.ace import (ace_a_basis, ace_b_from_a,
                                     ace_descriptors_with_jacobian)

    rng = np.random.default_rng(2)
    A, K = 3, 6
    disp = rng.normal(size=(A, K, 3)) * 1.2 + np.array([2.2, 0, 0])
    mask = np.ones((A, K), bool)
    jelem = np.zeros((A, K), int)
    ielem = np.zeros((A,), int)

    B, G = ace_descriptors_with_jacobian(
        jnp.asarray(disp), jnp.asarray(jelem), jnp.asarray(mask),
        jnp.asarray(ielem), plan)

    def bfun(d):
        Ar, Ai = ace_a_basis(d, jnp.asarray(jelem), jnp.asarray(mask),
                             jnp.asarray(ielem), plan)
        return ace_b_from_a(Ar, Ai, plan)

    Gad = jax.jacrev(lambda d: bfun(d).sum(0))(jnp.asarray(disp))
    # G[a, l, k, c] is dB[a]/dD[a, k, c]; autodiff gives sum over atoms
    Gad = np.array(Gad)
    G = np.array(G)
    for a in range(A):
        assert np.abs(Gad[:, a] - G[a]).max() < 1e-10
    assert np.abs(np.array(B) - np.array(bfun(jnp.asarray(disp)))).max() \
        < 1e-12
