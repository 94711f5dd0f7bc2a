"""Per-atom MLP potential on descriptor inputs (JAX).

The reference's `FitTorch` (`lib/neural_networks/pytorch.py:51`): per-element
subnetworks over per-atom descriptors, total energy by summation, forces by
contracting dE/dB with the per-pair descriptor gradients (the dgrad tensor).
Here the model is a pure pytree of parameters; training uses optax and the
dgrad contraction is one einsum + one-hot scatter, all jittable.
"""

import pickle

import jax
import jax.numpy as jnp
import numpy as np


def init_mlp(layer_sizes, nelements, key, dtype=jnp.float32):
    """He-initialized per-element MLP stacks.

    params: list over layers of (W (nelem, nin, nout), b (nelem, nout)).
    A single shared network is just nelements=1 with all atoms mapped to
    element 0 (reference multi_element_option=1).
    """
    params = []
    nlayers = len(layer_sizes) - 1
    for i, (nin, nout) in enumerate(zip(layer_sizes[:-1], layer_sizes[1:])):
        key, k1 = jax.random.split(key)
        # zero-init the output layer: the model starts at exactly its bias
        # (set to the mean target by the solver), so early training isn't
        # spent cancelling a random per-atom offset
        if i == nlayers - 1:
            w = jnp.zeros((nelements, nin, nout), dtype)
        else:
            w = jax.random.normal(k1, (nelements, nin, nout), dtype) \
                * jnp.sqrt(2.0 / nin).astype(dtype)
        b = jnp.zeros((nelements, nout), dtype)
        params.append((w, b))
    return params


def atom_energies(params, x, elem):
    """Per-atom energies: x (..., A, nin), elem (..., A) -> (..., A)."""
    h = x
    n = len(params)
    for i, (w, b) in enumerate(params):
        we = w[elem]                       # (..., A, nin, nout)
        be = b[elem]
        h = jnp.einsum("...i,...io->...o", h, we) + be
        if i < n - 1:
            h = jax.nn.softplus(h)   # reference activation (pytorch.py:32)
    return h[..., 0]


def save_params(path, params, meta):
    flat = jax.tree.map(np.asarray, params)
    with open(path, "wb") as f:
        pickle.dump({"params": flat, "meta": meta}, f)


def load_params(path):
    with open(path, "rb") as f:
        d = pickle.load(f)
    return d["params"], d["meta"]
