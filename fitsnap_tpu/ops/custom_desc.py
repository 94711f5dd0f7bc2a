"""Custom pairwise descriptors: Bessel radial + Gaussian 3-body (JAX).

Formula parity with reference `lib/neural_networks/descriptors/bessel.py`
and `g3b.py` (the two use DIFFERENT cutoff functions):
  g_n(r)  = sqrt(2/c) sin(n pi r / c)/r * fc(r),          n = 1..num_radial
  fc(r)   = 1 (r < 3.5) else 0.5 + 0.5 cos(pi (r-3.5)/(c-3.5))
            (radial only: bessel.py:76-87, rmin = 3.5)
  d_m(ij) = sum_k exp(-eta (cos_jk - mu_m)^2) fc3(r_ik),
            fc3(r) = 0.5 + 0.5 cos(pi r / c)   (g3b.py cutoff_function,
            rmin = 0 — no flat inner region),
            cos_jk = u_ij . u_ik zeroed at k == j (the reference keeps the
            diagonal term with its cosine zeroed, g3b.py fill_diagonal_),
            mu = linspace(-1, 1, num_3body), eta = 4

These are computed INSIDE the model (reference `pairwise.py:88`), so forces
come from autodiff w.r.t. displacements.
"""

import jax.numpy as jnp

RMIN_CUT = 3.5
ETA = 4.0


def cutoff_function(r, c):
    # the reference leaves r > c unclamped (its neighbor list can't produce
    # such pairs); here the neighbor cutoff is max(custom, reference-pot)
    # so out-of-range pairs are possible and must contribute zero
    ramp = 0.5 + 0.5 * jnp.cos(jnp.pi * (r - RMIN_CUT) / (c - RMIN_CUT))
    return jnp.where(r >= c, 0.0, jnp.where(r > RMIN_CUT, ramp, 1.0))


def cutoff_function_3body(r, c):
    """The 3-body leg's cutoff (reference g3b.py:105: rmin = 0 cosine)."""
    return jnp.where(r >= c, 0.0, 0.5 + 0.5 * jnp.cos(jnp.pi * r / c))


def bessel_basis(r, fc, c, num_radial):
    """(..., num_radial) radial Bessel functions."""
    n = jnp.arange(1, num_radial + 1, dtype=r.dtype)
    rb = jnp.sqrt(2.0 / c) * jnp.sin((n * jnp.pi / c) * r[..., None]) \
        / r[..., None]
    return rb * fc[..., None]


def g3b_basis(diff_unit, fc, mask, num_3body):
    """Gaussian 3-body descriptors per pair.

    diff_unit: (A, K, 3) normalized displacements; fc: (A, K) cutoffs of the
    *k* legs; mask: (A, K).  For pair (i,j): sum over k of
    exp(-eta (cos_jk - mu)^2) fc_ik with cos_jj zeroed (reference g3b.py).
    """
    dtype = diff_unit.dtype
    mu = jnp.linspace(-1.0, 1.0, num_3body).astype(dtype)
    cosjk = jnp.einsum("...kc,...lc->...kl", diff_unit, diff_unit)
    K = diff_unit.shape[-2]
    eye = jnp.eye(K, dtype=dtype)
    # the reference zeroes the k == j dot product but KEEPS the term
    # (g3b.py fill_diagonal_(0)): the diagonal contributes
    # exp(-eta mu^2) fc_ij, a pure radial offset; matched bug-for-bug
    cosjk = cosjk * (1.0 - eye)
    gauss = jnp.exp(-ETA * (cosjk[..., None] - mu) ** 2)      # (.., K, K, M)
    wk = (fc * mask)[..., None, :, None]                      # over k axis
    return (gauss * wk).sum(axis=-2)                          # (.., K, M)


def pair_descriptors(disp, mask, cutoff, num_radial, num_3body):
    """Concatenated per-pair descriptors (A, K, num_radial + num_3body)."""
    dtype = disp.dtype
    safe = jnp.where(mask[..., None], disp,
                     jnp.array([2.0 * RMIN_CUT, 0.0, 0.0], dtype))
    r = jnp.sqrt(jnp.sum(safe * safe, -1))
    unit = safe / r[..., None]
    fc = cutoff_function(r, cutoff) * mask
    rbf = bessel_basis(r, fc, cutoff, num_radial)
    g3 = g3b_basis(unit, cutoff_function_3body(r, cutoff), mask, num_3body)
    return jnp.concatenate([rbf, g3], axis=-1) * mask[..., None]
