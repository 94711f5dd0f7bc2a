"""Row-level parity vs the reference's committed LAMMPS-computed A matrix.

The Ta_Linear 20May21_Standard ships `Descriptors.npy` (the full design
matrix in grouped row layout: all energy rows, then force rows, then virial
rows).  These tests check our kernel's energy/force/virial rows for one
config against it at ~1e-12.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.util import TA_EXAMPLE, load_config_normalized

pytestmark = pytest.mark.skipif(not TA_EXAMPLE.exists(),
                                reason="reference examples not available")

RCUTFAC = 4.67637


@pytest.fixture(scope="module")
def ta_rows():
    from fitsnap_tpu.ops.neighbors import host_neighbors
    from fitsnap_tpu.ops.snap import SnapParams, descriptors_with_jacobian
    from fitsnap_tpu.ops.cg import build_snap_plan

    cfg = load_config_normalized(TA_EXAMPLE / "JSON/Displaced_A15/A15_1.json")
    pos, cell = cfg["Positions"], cfg["CellCols"]
    N = len(pos)
    disp, jidx, mask, kmax = host_neighbors(pos, cell, N, RCUTFAC)
    plan = build_snap_plan(twojmax=6, nelements=1, bzeroflag=False)
    p = SnapParams(plan=plan, rcutfac=RCUTFAC, rfac0=0.99363, rmin0=0.0,
                   switchflag=True, switchinnerflag=False,
                   wj=np.array([1.0]), radelem=np.array([0.5]))
    jelem = jnp.zeros(jidx.shape, int)
    ielem = jnp.zeros((N,), int)
    B, G = descriptors_with_jacobian(
        jnp.asarray(disp), jelem, jnp.asarray(mask), ielem, p)
    D = np.load(TA_EXAMPLE / "20May21_Standard/Descriptors.npy")
    return dict(B=np.array(B), G=np.array(G), disp=disp, jidx=jidx,
                mask=mask, cell=cell, N=N, D=D, kmax=kmax)


def test_energy_row(ta_rows):
    r = ta_rows
    erow = np.concatenate([[1.0], r["B"].sum(0) / r["N"]])
    cand = np.where(np.abs(r["D"][:, 0] - 1.0) < 1e-9)[0]
    dist = np.abs(r["D"][cand] - erow[None, :]).max(1)
    assert dist.min() < 1e-10


def test_force_and_virial_rows(ta_rows):
    r = ta_rows
    N, kmax = r["N"], r["kmax"]
    G, disp, jidx, mask = r["G"], r["disp"], r["jidx"], r["mask"]
    erow = np.concatenate([[1.0], r["B"].sum(0) / N])
    cand = np.where(np.abs(r["D"][:, 0] - 1.0) < 1e-9)[0]
    dist = np.abs(r["D"][cand] - erow[None, :]).max(1)
    base = cand[dist.argmin()]

    scat = np.zeros((G.shape[1], N, 3))
    for i in range(N):
        for k in range(kmax):
            if mask[i, k]:
                scat[:, jidx[i, k], :] += G[i, :, k, :]
    dsum = scat - G.sum(axis=2).transpose(1, 0, 2)
    mine = -dsum.transpose(1, 2, 0).reshape(3 * N, -1)
    fstart = 363 + base * 3 * 64       # grouped layout, A15 configs are N=64
    Fo = r["D"][fstart:fstart + 3 * N, 1:]
    assert np.abs(Fo - mine).max() < 1e-10

    vol = np.linalg.det(r["cell"])
    pairs = [(0, 0), (1, 1), (2, 2), (1, 2), (0, 2), (0, 1)]
    V = np.zeros((6, G.shape[1]))
    for vi, (a, b) in enumerate(pairs):
        V[vi] = -np.einsum("ik,iwk->w", disp[:, :, a] * mask, G[:, :, :, b])
    V = V * 1.6021765e6 / vol
    Vo = r["D"][363 + 12672 + base * 6: 363 + 12672 + base * 6 + 6, 1:]
    assert np.abs(Vo - V).max() / np.abs(Vo).max() < 1e-10


def test_descriptor_consistency(ta_rows):
    """Factorized-jacobian descriptors == direct contraction descriptors."""
    from fitsnap_tpu.ops.snap import SnapParams, atom_descriptors
    from fitsnap_tpu.ops.cg import build_snap_plan

    r = ta_rows
    plan = build_snap_plan(twojmax=6, nelements=1, bzeroflag=False)
    p = SnapParams(plan=plan, rcutfac=RCUTFAC, rfac0=0.99363, rmin0=0.0,
                   switchflag=True, switchinnerflag=False,
                   wj=np.array([1.0]), radelem=np.array([0.5]))
    jelem = jnp.zeros(r["jidx"].shape, int)
    ielem = jnp.zeros((r["N"],), int)
    B2 = np.array(atom_descriptors(jnp.asarray(r["disp"]), jelem,
                                   jnp.asarray(r["mask"]), ielem, p))
    assert np.abs(B2 - r["B"]).max() < 1e-11


@pytest.mark.heavy
def test_jacobian_vs_autodiff(ta_rows):
    """y-list analytic dB/dD == reverse-mode autodiff through the kernel."""
    import jax
    from fitsnap_tpu.ops.snap import SnapParams, atom_descriptors
    from fitsnap_tpu.ops.cg import build_snap_plan

    r = ta_rows
    plan = build_snap_plan(twojmax=6, nelements=1, bzeroflag=False)
    p = SnapParams(plan=plan, rcutfac=RCUTFAC, rfac0=0.99363, rmin0=0.0,
                   switchflag=True, switchinnerflag=False,
                   wj=np.array([1.0]), radelem=np.array([0.5]))
    n = 4  # subset of atoms for speed
    disp = jnp.asarray(r["disp"][:n])
    mask = jnp.asarray(r["mask"][:n])
    jelem = jnp.zeros(mask.shape, int)
    ielem = jnp.zeros((n,), int)
    Gad = jax.jacrev(
        lambda d: atom_descriptors(d, jelem, mask, ielem, p).sum(0))(disp)
    # dB_sum/dD[i,k,c]; our G[a,w,k,c] is dB[a]/dD[a,k,c]
    Gy = r["G"][:n]
    Gad = np.array(Gad)
    for a in range(n):
        assert np.abs(Gad[:, a] - Gy[a].transpose(0, 1, 2)).max() < 1e-10


@pytest.mark.heavy
def test_chemflag_jacobian_vs_autodiff():
    """Chem (EME) channel-paired y-list == reverse-mode autodiff."""
    import jax
    from fitsnap_tpu.ops.cg import build_snap_plan
    from fitsnap_tpu.ops.snap import (SnapParams, atom_descriptors,
                                      descriptors_with_jacobian)

    # twojmax 3 (odd triangle structure) keeps the jacrev compile small;
    # real-width chem physics is covered by the InP slow-tier golden
    plan = build_snap_plan(twojmax=3, nelements=2, chemflag=True,
                           bnormflag=True, bzeroflag=True, wselfallflag=True)
    p = SnapParams(plan=plan, rcutfac=4.6, rfac0=0.99, rmin0=0.0,
                   switchflag=True, switchinnerflag=False,
                   wj=np.array([1.0, 0.93]), radelem=np.array([0.5, 0.45]))
    rng = np.random.default_rng(3)
    A, K = 3, 6
    disp = jnp.asarray(rng.normal(size=(A, K, 3)) * 1.2 + np.array([2.0, 0, 0]))
    mask = jnp.ones((A, K), bool)
    jelem = jnp.asarray(rng.integers(0, 2, (A, K)))
    ielem = jnp.asarray(rng.integers(0, 2, (A,)))
    B, G = descriptors_with_jacobian(disp, jelem, mask, ielem, p)
    B2 = atom_descriptors(disp, jelem, mask, ielem, p)
    assert float(jnp.abs(B - B2).max()) < 1e-12
    Gad = np.asarray(jax.jacrev(
        lambda d: atom_descriptors(d, jelem, mask, ielem, p).sum(0))(disp))
    G = np.asarray(G)
    for a in range(A):
        assert np.abs(Gad[:, a] - G[a]).max() < 1e-12


def test_quadratic_chemflag_jacobian_vs_autodiff():
    """quadraticflag x chemflag: product-rule jacobian over the full
    chem-extended vector == reverse-mode autodiff.  (A combination the
    reference cannot run: its blank2J generation crashes on it.)"""
    import jax
    from fitsnap_tpu.ops.cg import build_snap_plan
    from fitsnap_tpu.ops.snap import (SnapParams, atom_descriptors,
                                      descriptors_with_jacobian)

    plan = build_snap_plan(twojmax=2, nelements=2, chemflag=True,
                           bzeroflag=True, quadraticflag=True)
    p = SnapParams(plan=plan, rcutfac=4.6, rfac0=0.99, rmin0=0.0,
                   switchflag=True, switchinnerflag=False,
                   wj=np.array([1.0, 0.93]), radelem=np.array([0.5, 0.45]))
    rng = np.random.default_rng(5)
    A, K = 3, 6
    disp = jnp.asarray(rng.normal(size=(A, K, 3)) * 1.2
                       + np.array([2.0, 0, 0]))
    mask = jnp.ones((A, K), bool)
    jelem = jnp.asarray(rng.integers(0, 2, (A, K)))
    ielem = jnp.asarray(rng.integers(0, 2, (A,)))
    B, G = descriptors_with_jacobian(disp, jelem, mask, ielem, p)
    W = plan.nb_base
    assert B.shape[1] == W + W * (W + 1) // 2 == plan.ncoeff
    B2 = atom_descriptors(disp, jelem, mask, ielem, p)
    assert float(jnp.abs(B - B2).max()) < 1e-12
    Gad = np.asarray(jax.jacrev(
        lambda d: atom_descriptors(d, jelem, mask, ielem, p).sum(0))(disp))
    G = np.asarray(G)
    for a in range(A):
        assert np.abs(Gad[:, a] - G[a]).max() < 1e-12
