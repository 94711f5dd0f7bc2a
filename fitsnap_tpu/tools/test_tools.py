"""Finite-difference force verification harness (reference
`fitsnap3lib/tools/test_tools.py`).

Displaces each coordinate of a chosen configuration by +-h, recomputes the
model energy through the whole pipeline, and compares -dE/dx against the
model force.  Works for the NN solver on SNAP or ACE descriptors.
"""

import numpy as np


class TestTools:
    def __init__(self, input_script_or_settings, arglist=None):
        from fitsnap_tpu.fitsnap import FitSnap

        self.fs = FitSnap(input_script_or_settings,
                          arglist=arglist or ["--overwrite"])

    def finite_difference(self, group, config_index=0, h=1e-5,
                          max_atoms=None, epochs=2):
        """Returns (mean_abs_err, max_abs_err, details) comparing model
        forces with central finite differences of the model energy."""
        import jax.numpy as jnp

        fs = self.fs
        fs.scrape_configs()
        data = [d for d in fs.data if d["Group"] == group]
        assert config_index < len(data), "config_index out of range"
        data = data[:max(6, config_index + 1)]
        net = fs.solver.net
        net.num_epochs = epochs
        net.manual_seed_flag = 1
        fs.solver.prepare_dataset(fs.calculator, data)
        fs.solver.perform_fit(calculator=fs.calculator, data=data)

        d = data[config_index]
        pos = np.asarray(d["Positions"], float)
        cell = np.asarray(d["Lattice"], float)
        types_str = d["AtomTypes"]
        e0, f0 = self._eval(pos, cell, types_str)
        errs = []
        details = []
        natoms = len(pos)
        atoms = range(natoms) if max_atoms is None \
            else range(min(max_atoms, natoms))
        for a in atoms:
            for c in range(3):
                pp = pos.copy()
                pp[a, c] += h
                ep, _ = self._eval(pp, cell, types_str)
                pm = pos.copy()
                pm[a, c] -= h
                em, _ = self._eval(pm, cell, types_str)
                fd = -(ep - em) / (2 * h)
                errs.append(abs(fd - f0[a, c]))
                details.append((a, c, fd, float(f0[a, c])))
        errs = np.asarray(errs)
        return float(errs.mean()), float(errs.max()), details

    def _eval(self, pos, cell, types_str):
        """Total model energy + forces for one configuration."""
        import jax.numpy as jnp

        from fitsnap_tpu.ops.neighbors import host_neighbors

        fs = self.fs
        sol = fs.solver
        calc = fs.calculator
        N = len(pos)
        types = np.array([calc.type_mapping[t] - 1 for t in types_str],
                         np.int32)
        disp, jidx, mask, kmax = host_neighbors(pos, cell, N, calc.cutoff)
        prep = calc.nn_prep_fn()
        B, G, re_, rf_ = prep(jnp.asarray(disp), jnp.asarray(jidx),
                              jnp.asarray(mask), jnp.asarray(types),
                              jnp.asarray(N))
        elem = types if sol.net.multi_element_option == 2 \
            else np.zeros_like(types)
        batch = {
            "B": B[None], "G": G[None],
            "types": jnp.asarray(elem)[None],
            "real": jnp.ones((1, N), bool),
            "nat": jnp.full((1,), N, jnp.int32),
            "jidx": jnp.asarray(jidx)[None],
        }
        e_per_atom, forces = sol._forward_batch(sol.params, batch)
        return float(e_per_atom[0]) * N, np.asarray(forces[0])
