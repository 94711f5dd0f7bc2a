"""Unit tests for the CG tables and the Wigner-U recursion."""

import numpy as np
import jax.numpy as jnp

from fitsnap_tpu.ops.cg import b_triples, build_snap_plan, cg_block
from fitsnap_tpu.ops.snap import compute_ulist


def test_cg_normalization():
    for j1, j2 in [(2, 2), (3, 1), (4, 2), (6, 6), (5, 3), (1, 1)]:
        for j in range(abs(j1 - j2), j1 + j2 + 1, 2):
            blk = cg_block(j1, j2, j)
            for twom in range(-j, j + 1, 2):
                s = 0.0
                for m1i in range(j1 + 1):
                    bb2 = twom - (2 * m1i - j1)
                    m2i = (bb2 + j2) // 2
                    if 0 <= m2i <= j2 and (bb2 + j2) % 2 == 0:
                        s += blk[m1i, m2i] ** 2
                assert abs(s - 1.0) < 1e-12


def test_cg_known_values():
    assert abs(cg_block(1, 1, 0)[1, 0] - 1 / np.sqrt(2)) < 1e-14
    assert abs(cg_block(2, 2, 4)[2, 0] - 1 / np.sqrt(6)) < 1e-14


def test_b_triples_count():
    # twojmax=6 -> 30 bispectrum components (Ta examples; BASELINE.md)
    assert len(b_triples(6)) == 30
    assert len(b_triples(8)) == 55


def test_u_unitarity():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(5, 4))
    v /= np.sqrt((v ** 2).sum(1))[:, None]
    ar, ai, br, bi = (jnp.array(x) for x in v.T)
    u = compute_ulist(ar, ai, br, bi, 6)
    for j, (urj, uij) in enumerate(u):
        U = np.array(urj) + 1j * np.array(uij)
        for b in range(5):
            err = np.abs(U[b] @ U[b].conj().T - np.eye(j + 1)).max()
            assert err < 1e-12, (j, err)


def test_plan_shapes():
    plan = build_snap_plan(twojmax=6, nelements=1, bzeroflag=False)
    assert plan.nb_base == 30
    assert plan.u_len == 140
    assert plan.y_src.shape == (3, 30, 140)
    plan_q = build_snap_plan(twojmax=6, quadraticflag=True)
    assert plan_q.ncoeff == 30 + 30 * 31 // 2
    plan_chem = build_snap_plan(twojmax=6, nelements=2, chemflag=True)
    assert plan_chem.nb_base == 30 * 8
