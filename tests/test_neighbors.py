"""Neighbor-list correctness: periodic images, triclinic cells."""

import numpy as np

from fitsnap_tpu.ops.neighbors import host_neighbors, required_shifts


def _brute_pairs(pos, cell, cutoff, nimg=3):
    """O(N^2 * images) reference pair enumeration."""
    N = len(pos)
    out = [[] for _ in range(N)]
    rng = range(-nimg, nimg + 1)
    for n1 in rng:
        for n2 in rng:
            for n3 in rng:
                sv = np.array([n1, n2, n3]) @ cell.T
                for i in range(N):
                    for j in range(N):
                        if n1 == n2 == n3 == 0 and i == j:
                            continue
                        d = pos[j] + sv - pos[i]
                        if d @ d < cutoff * cutoff:
                            out[i].append(tuple(np.round(d, 10)))
    return out


def test_host_neighbors_triclinic():
    rng = np.random.default_rng(3)
    cell = np.array([[6.0, 1.2, 0.7],
                     [0.0, 5.5, 0.9],
                     [0.0, 0.0, 6.3]])    # upper-tri, columns = vectors
    N = 12
    frac = rng.uniform(0, 1, (N, 3))
    pos = frac @ cell.T
    cutoff = 4.0
    disp, jidx, mask, kmax = host_neighbors(pos, cell, N, cutoff)
    ref = _brute_pairs(pos, cell, cutoff)
    for i in range(N):
        mine = {tuple(np.round(disp[i, k], 10)) for k in range(kmax)
                if mask[i, k]}
        assert mine == set(ref[i]), f"atom {i}"


def test_small_cell_many_images():
    """Cells smaller than the cutoff need multiple images of each atom."""
    cell = np.eye(3) * 2.0
    pos = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    cutoff = 4.5
    disp, jidx, mask, kmax = host_neighbors(pos, cell, 2, cutoff)
    counts = mask.sum(1)
    ref = _brute_pairs(pos, cell, cutoff, nimg=4)
    assert counts[0] == len(ref[0])
    assert counts[1] == len(ref[1])


def test_required_shifts():
    cell = np.eye(3) * 10.0
    assert (required_shifts(cell, 4.8) == [1, 1, 1]).all()
    assert (required_shifts(cell, 12.0) == [2, 2, 2]).all()
