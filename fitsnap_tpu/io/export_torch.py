"""Export trained JAX MLP potentials as LAMMPS ML-IAP torch modules.

Deployment parity with the reference (`lib/neural_networks/write.py`): the
saved `.pt` is a module whose `forward(elems, descriptors, beta, energy)`
fills per-atom energies and betas (dE/dB) for `pair_style mliap model
mliappy`.  Descriptor standardization is folded into the first linear layer
so LAMMPS can feed raw descriptors.
"""

import numpy as np

try:
    import torch

    class Elementwise(torch.nn.Module):
        """Per-element subnetwork dispatch (single subnet = shared net)."""

        def __init__(self, subnets):
            super().__init__()
            self.subnets = torch.nn.ModuleList(subnets)

        def forward(self, descriptors, elems):
            if len(self.subnets) == 1:
                return self.subnets[0](descriptors).flatten()
            out = torch.zeros(descriptors.shape[0], dtype=descriptors.dtype)
            for e, net in enumerate(self.subnets):
                m = elems == e
                if m.any():
                    out[m] = net(descriptors[m]).flatten()
            return out

    class MliapWrapper(torch.nn.Module):
        """LAMMPS mliappy-compatible wrapper (reference `write.py:17`)."""

        def __init__(self, model, n_descriptors, n_elements):
            super().__init__()
            self.model = model
            self.device = "cpu"
            self.dtype = torch.float64
            self.n_params = sum(p.nelement() for p in model.parameters())
            self.n_descriptors = n_descriptors
            self.n_elements = n_elements

        def forward(self, elems, descriptors, beta, energy):
            d = torch.from_numpy(descriptors).to(self.dtype) \
                .requires_grad_(True)
            el = torch.from_numpy(elems).to(torch.long)
            with torch.autograd.enable_grad():
                e_nn = self.model(d, el)
                beta_nn = torch.autograd.grad(e_nn.sum(), d)[0]
            beta[:] = beta_nn.detach().cpu().numpy().astype(np.float64)
            energy[:] = e_nn.detach().cpu().numpy().astype(np.float64)

except ModuleNotFoundError:  # torch optional: export-time dependency only
    Elementwise = MliapWrapper = None


def build_torch_model(params, mean, std):
    """JAX MLP params -> list of per-element torch Sequential nets."""
    import torch

    nelem = params[0][0].shape[0]
    nets = []
    for e in range(nelem):
        layers = []
        nlayers = len(params)
        for i, (w, b) in enumerate(params):
            wt = np.asarray(w[e], np.float64)        # (nin, nout)
            bt = np.asarray(b[e], np.float64)
            if i == 0:
                # fold standardization: x = (B - mean)/std
                # (B @ (W/std) + (b - mean @ (W/std)))
                wt = wt / np.asarray(std, np.float64)[:, None]
                bt = bt - np.asarray(mean, np.float64) @ wt
            lin = torch.nn.Linear(wt.shape[0], wt.shape[1]).double()
            with torch.no_grad():
                lin.weight.copy_(torch.from_numpy(wt.T))
                lin.bias.copy_(torch.from_numpy(bt))
            layers.append(lin)
            if i < nlayers - 1:
                layers.append(torch.nn.Softplus())
        nets.append(torch.nn.Sequential(*layers))
    return nets


def export_mliap(path, params, mean, std, n_elements):
    import torch

    nets = build_torch_model(params, mean, std)
    ndesc = params[0][0].shape[1]
    wrapper = MliapWrapper(Elementwise(nets), ndesc, n_elements)
    torch.save(wrapper, path)
    return wrapper
