"""Padded periodic neighbor construction (JAX) for triclinic cells.

Replaces the LAMMPS box/atom/neighbor machinery the reference drives per
config (`fitsnap3lib/calculators/lammps_base.py:145-236`).  Cells follow the
reference's normalization: lattice vectors are the COLUMNS of an
upper-triangular 3x3 matrix (QR-rotated at scrape time, `scrape.py:244`),
positions are row vectors wrapped into the cell.

The jittable builder takes a static integer shift table (periodic images) and
a static max-neighbor width K, producing fixed-shape displacement/index/mask
tensors that feed the SNAP/ACE kernels and the reference-potential kernels.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def required_shifts(cell: np.ndarray, cutoff: float) -> np.ndarray:
    """Host-side: integer image ranges (n1, n2, n3) needed to cover `cutoff`.

    cell: (3,3) with lattice vectors as columns. Returns (3,) ints.
    """
    cell = np.asarray(cell, dtype=np.float64)
    # perpendicular distance between periodic planes i: 1/|row_i of cell^-1|
    inv = np.linalg.inv(cell)
    widths = 1.0 / np.linalg.norm(inv, axis=1)
    return np.ceil(cutoff / widths - 1e-12).astype(np.int64)


def shift_table(nmax: np.ndarray) -> np.ndarray:
    """All integer shifts within per-axis bounds, (S, 3), (0,0,0) first."""
    r1 = np.arange(-nmax[0], nmax[0] + 1)
    r2 = np.arange(-nmax[1], nmax[1] + 1)
    r3 = np.arange(-nmax[2], nmax[2] + 1)
    grid = np.stack(np.meshgrid(r1, r2, r3, indexing="ij"), -1).reshape(-1, 3)
    # put the home cell first so the self-pair exclusion is cheap
    order = np.argsort((grid != 0).any(1), kind="stable")
    return grid[order].astype(np.int64)


def host_neighbors(pos, cell, natoms, cutoff, a_pad=None, k_pad=None):
    """Host-side padded neighbor list for one config.

    Cheap irregular work stays on CPU; the fixed-shape (A, K) tensors it
    produces feed the jitted descriptor kernels.  Returns
    (disp (A,K,3), jidx (A,K), mask (A,K), count) with A/K padded if given.

    Dispatches to the native C++ builder (`fitsnap_tpu/native`) when
    available — same image enumeration and slot ordering, without the
    O(A^2 * S) dense temporaries — and falls back to numpy below.
    """
    from fitsnap_tpu.native import host_neighbors_native
    out = host_neighbors_native(pos, cell, natoms, cutoff, a_pad, k_pad)
    if out is not None:
        return out
    pos = np.asarray(pos, np.float64)[:natoms]
    cell = np.asarray(cell, np.float64)
    shifts = shift_table(required_shifts(cell, cutoff))
    svec = shifts @ cell.T
    S = len(svec)
    d = pos[None, None, :, :] + svec[None, :, None, :] - pos[:, None, None, :]
    d2 = np.einsum("isjc,isjc->isj", d, d)
    d2[:, 0, :][np.eye(natoms, dtype=bool)] = np.inf
    hit = d2 < cutoff * cutoff                            # (A, S, A)
    counts = hit.sum(axis=(1, 2))
    kmax = int(counts.max()) if natoms else 0
    A = a_pad or natoms
    K = k_pad or kmax
    disp = np.zeros((A, K, 3))
    jidx = np.zeros((A, K), np.int32)
    mask = np.zeros((A, K), bool)
    ii, ss, jj = np.nonzero(hit)
    order = np.argsort(ii, kind="stable")
    ii, ss, jj = ii[order], ss[order], jj[order]
    slot = np.concatenate([np.arange(c) for c in counts]) if len(ii) else \
        np.zeros(0, int)
    disp[ii, slot] = d[ii, ss, jj]
    jidx[ii, slot] = jj
    mask[ii, slot] = True
    return disp, jidx, mask, kmax


def count_neighbors(pos, cell, natoms, cutoff) -> int:
    """Max neighbor count for one config (native C++ when available)."""
    from fitsnap_tpu.native import get_lib, _dptr
    lib = get_lib()
    if lib is None:
        return count_neighbors_np(pos, cell, natoms, cutoff)
    p = np.ascontiguousarray(np.asarray(pos, np.float64)[:natoms])
    c = np.ascontiguousarray(np.asarray(cell, np.float64))
    return lib.fs_neighbors(_dptr(p), _dptr(c), natoms, cutoff,
                            0, 0, None, None, None)


def count_neighbors_np(pos, cell, natoms, cutoff) -> int:
    """Host-side numpy preprocessing: max neighbor count for one config."""
    pos = np.asarray(pos, np.float64)[:natoms]
    cell = np.asarray(cell, np.float64)
    shifts = shift_table(required_shifts(cell, cutoff))
    svec = shifts @ cell.T                                   # (S, 3)
    # (i, s, j): pos[j] + svec[s] - pos[i]
    d = pos[None, None, :, :] + svec[None, :, None, :] - pos[:, None, None, :]
    d2 = np.einsum("isjc,isjc->isj", d, d)
    d2[:, 0, :][np.eye(natoms, dtype=bool)] = np.inf        # self in home cell
    counts = (d2 < cutoff * cutoff).sum(axis=(1, 2))
    return int(counts.max()) if natoms else 0


@partial(jax.jit, static_argnames=("k_max", "s_table"))
def build_neighbors(pos, cell, natoms, cutoff, k_max, s_table):
    """Fixed-shape neighbor list for one padded config.

    pos: (A, 3) padded positions (rows). cell: (3, 3) columns-as-vectors.
    natoms: scalar int. cutoff: scalar float (max interaction cutoff).
    k_max: static int. s_table: static tuple-of-tuples integer shifts (S, 3).

    Returns dict with disp (A, k_max, 3) = r_j - r_i, jidx (A, k_max) real
    neighbor atom index, mask (A, k_max) bool.
    """
    A = pos.shape[0]
    shifts = jnp.asarray(np.asarray(s_table, np.float64), pos.dtype)  # (S, 3)
    svec = shifts @ cell.T                                   # (S, 3)
    S = svec.shape[0]

    # candidate displacement (i, s*j): pos[j] + svec[s] - pos[i]
    cand = pos[None, :, :] + svec[:, None, :]                # (S, A, 3)
    diff = cand[None, :, :, :] - pos[:, None, None, :]       # (A, S, A, 3)
    d2 = jnp.sum(diff * diff, axis=-1)                       # (A, S, A)

    i_idx = jnp.arange(A)
    j_real = i_idx[None, None, :] < natoms
    i_real = (i_idx < natoms)[:, None, None]
    self_pair = (jnp.arange(S) == 0)[None, :, None] & (
        i_idx[:, None, None] == i_idx[None, None, :])
    valid = (d2 < cutoff * cutoff) & j_real & i_real & ~self_pair

    d2f = d2.reshape(A, S * A)
    validf = valid.reshape(A, S * A)
    # stable partition: valid entries first
    order = jnp.argsort(~validf, axis=1, stable=True)[:, :k_max]  # (A, K)
    mask = jnp.take_along_axis(validf, order, axis=1)
    difff = diff.reshape(A, S * A, 3)
    disp = jnp.take_along_axis(difff, order[..., None], axis=1)
    jidx = order % A
    return {"disp": disp, "jidx": jidx, "mask": mask}
