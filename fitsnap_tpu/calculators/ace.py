"""Batched ACE linear-system builder (reference `calculators/lammps_pace.py`).

Same bucketed/jitted structure as the SNAP calculator; descriptor labels
already carry their central element (mu0), so no extra per-type column
blocking is needed — the width is simply the label count (+ per-type
constant columns when bzeroflag = 0).
"""

import jax
import jax.numpy as jnp
import numpy as np

from fitsnap_tpu.calculators.snap import (PackedConfig, _A_BUCKETS,
                                          _K_BUCKETS, _pad_to, TOBAR)
from fitsnap_tpu.ops.ace import (ace_atom_descriptors,
                                 ace_descriptors_with_jacobian,
                                 build_ace_plan)
from fitsnap_tpu.ops.neighbors import host_neighbors
from fitsnap_tpu.ops.refpot import parse_reference, reference_eav
from fitsnap_tpu.utils.jaxsetup import setup_cache


def _within_rcut(disp, jidx, types, plan):
    """Per-bond cutoff mask: |r_ij| < rcut[type_i, type_j]."""
    rcm = jnp.asarray(plan.rcut, disp.dtype)[types[:, None], types[jidx]]
    r2 = jnp.sum(disp * disp, -1)
    return r2 < rcm * rcm


class AceCalculator:
    def __init__(self, name, config):
        self.config = config
        self.name = name
        self.sec = config.sections["ACE"]
        setup_cache()
        self._fingerprint = None
        self._maybe_refresh()

    def _hyperparam_fingerprint(self):
        sec = self.sec
        return (sec.numtypes, tuple(sec.types), tuple(sec.ranks),
                tuple(sec.lmax), tuple(sec.nmax), int(sec.nmaxbase),
                tuple(sec.rcutfac), tuple(sec.lmbda), tuple(sec.rcinner),
                tuple(sec.drcinner), tuple(sec.lmin), bool(sec.bzeroflag),
                sec.b_basis, bool(sec.wigner_flag), tuple(sec.erefs),
                tuple(self.config.sections["REFERENCE"].lmp_pairdecl))

    def _maybe_refresh(self):
        """Rebuild the descriptor plan when section hyperparameters changed
        (library-mode loop_over_fits edits; SnapCalculator analog)."""
        fp = self._hyperparam_fingerprint()
        if fp == self._fingerprint:
            return
        self._fingerprint = fp
        sec = self.sec
        self.plan = build_ace_plan(sec)
        self.numtypes = sec.numtypes
        self.refspec = parse_reference(self.config.sections["REFERENCE"],
                                       sec.numtypes)
        self.cutoff = max(float(np.max(self.plan.rcut)),
                          self.refspec.max_cutoff)
        self.type_mapping = sec.type_mapping
        # publish label metadata to the section (reference `ace.py:100-127`)
        sec.ncoeff = self.plan.ncoeff
        sec.blist = [[i] + list(map(list, lab[1:4]))
                     for i, lab in enumerate(self.plan.labels)]
        sec.blank2J = np.ones(len(self.plan.labels) + (
            0 if sec.bzeroflag else sec.numtypes))
        self._jit_cache = {}

    def get_width(self):
        w = len(self.plan.labels)
        if not self.sec.bzeroflag:
            w += self.numtypes
        return w

    def nn_prep_fn(self):
        """Per-config (B, G, ref_e, ref_f) builder for the NN solver
        (ACE analog of SnapCalculator.nn_prep_fn; reference
        lammps_pace.py dgradflag=1 rows)."""
        plan = self.plan
        refspec = self.refspec

        def prep(disp, jidx, mask, types, natoms):
            A = disp.shape[0]
            dtp = disp.dtype
            smask = mask & _within_rcut(disp, jidx, types, plan)
            real = (jnp.arange(A) < natoms).astype(dtp)
            B, G = ace_descriptors_with_jacobian(disp, types[jidx], smask,
                                                 types, plan)
            B = B * real[:, None]
            G = G * real[:, None, None, None]
            re_, rf_, _ = reference_eav(disp, jidx, mask, types, natoms,
                                        refspec)
            return B, G, re_, rf_

        return prep

    def nn_desc_fn(self):
        """Per-config per-atom ACE descriptors only (PAS mode; reference
        lammps_pace.py:145-150 stores per-atom Chis truths)."""
        plan = self.plan

        def prep(disp, jidx, mask, types, natoms):
            A = disp.shape[0]
            dtp = disp.dtype
            smask = mask & _within_rcut(disp, jidx, types, plan)
            real = (jnp.arange(A) < natoms).astype(dtp)
            B = ace_atom_descriptors(disp, types[jidx], smask, types, plan)
            return B * real[:, None]

        return prep

    def _pack(self, data):
        types = np.array(
            [self.type_mapping[t] - 1 for t in data["AtomTypes"]], np.int32)
        return PackedConfig(
            pos=np.asarray(data["Positions"], np.float64),
            cell=np.asarray(data["Lattice"], np.float64),
            types=types, natoms=int(data["NumAtoms"]), data=data)

    def host_preprocess(self, data):
        self._maybe_refresh()
        packed = [self._pack(d) for d in data]
        buckets = {}
        for idx, pc in enumerate(packed):
            disp, jidx, mask, kmax = host_neighbors(
                pc.pos, pc.cell, pc.natoms, self.cutoff)
            pc.disp, pc.jidx, pc.mask, pc.kcount = disp, jidx, mask, kmax
            key = (_pad_to(pc.natoms, _A_BUCKETS), _pad_to(kmax, _K_BUCKETS))
            buckets.setdefault(key, []).append(idx)
        return packed, buckets

    def _rows_fn(self, a_pad, k_pad, dtype):
        key = (a_pad, k_pad, dtype)
        if key in self._jit_cache:
            return self._jit_cache[key]
        plan = self.plan
        refspec = self.refspec

        def one_config(disp, jidx, mask, types, natoms, cell, spins):
            A = disp.shape[0]
            dtp = disp.dtype
            smask = mask & _within_rcut(disp, jidx, types, plan)
            jelem = types[jidx]
            real = (jnp.arange(A) < natoms).astype(dtp)
            B, G = ace_descriptors_with_jacobian(disp, jelem, smask,
                                                 types, plan)
            B = B * real[:, None]
            G = G * real[:, None, None, None]
            e_cols = B.sum(0)
            W = e_cols.shape[0]
            oj = jax.nn.one_hot(jidx, A, dtype=dtp)
            scat = jnp.einsum("ikn,iwkc->nwc", oj, G)
            rowsum = G.sum(axis=2)
            force_rows = -(scat - rowsum).transpose(0, 2, 1)
            vol = cell[0, 0] * cell[1, 1] * cell[2, 2]
            pa = jnp.array([0, 1, 2, 1, 0, 0])
            pb = jnp.array([0, 1, 2, 2, 2, 1])
            dm = disp * smask[..., None].astype(dtp)
            vir = -jnp.einsum("ikx,iwky->xyw", dm, G).reshape(3, 3, W)
            virial_rows = vir[pa, pb] * (TOBAR / vol)
            re, rf, rv = reference_eav(disp, jidx, mask, types, natoms,
                                       refspec, spins=spins)
            return {"e_cols": e_cols, "force_rows": force_rows,
                    "virial_rows": virial_rows,
                    "ref_e": re, "ref_f": rf, "ref_v": rv * (TOBAR / vol)}

        fn = jax.jit(jax.vmap(one_config))
        self._jit_cache[key] = fn
        return fn

    def process_configs(self, data, dtype=np.float64):
        calc = self.config.sections["CALCULATOR"]
        sec = self.sec
        packed, buckets = self.host_preprocess(data)
        results = [None] * len(packed)
        width0 = len(self.plan.labels)
        for (a_pad, k_pad), idxs in buckets.items():
            fn = self._rows_fn(a_pad, k_pad, jnp.dtype(dtype))
            g_bytes = a_pad * k_pad * width0 * 3 * 8
            chunk = int(min(32, max(1, 1024 // a_pad),
                            max(1, (1 << 30) // (4 * g_bytes)), len(idxs)))
            for c0 in range(0, len(idxs), chunk):
                ids = idxs[c0:c0 + chunk]
                disp = np.zeros((chunk, a_pad, k_pad, 3), dtype)
                jidx = np.zeros((chunk, a_pad, k_pad), np.int32)
                mask = np.zeros((chunk, a_pad, k_pad), bool)
                cell = np.eye(3, dtype=dtype)[None].repeat(chunk, 0)
                types = np.zeros((chunk, a_pad), np.int32)
                nat = np.zeros((chunk,), np.int32)
                spins = np.zeros((chunk, a_pad, 3), dtype)
                for j, i in enumerate(ids):
                    pc = packed[i]
                    na, kc = pc.natoms, pc.kcount
                    disp[j, :na, :kc] = pc.disp[:, :kc]
                    jidx[j, :na, :kc] = pc.jidx[:, :kc]
                    mask[j, :na, :kc] = pc.mask[:, :kc]
                    cell[j] = pc.cell
                    types[j, :na] = pc.types
                    nat[j] = na
                out = jax.tree.map(np.asarray,
                                   fn(disp, jidx, mask, types, nat, cell,
                                      spins))
                for j, i in enumerate(ids):
                    results[i] = {k: v[j] for k, v in out.items()}
        return self._assemble(packed, results, dtype)

    def _assemble(self, packed, results, dtype):
        calc = self.config.sections["CALCULATOR"]
        sec = self.sec
        width = self.get_width()
        total = 0
        for pc in packed:
            total += ((1 if calc.energy else 0)
                      + (3 * pc.natoms if calc.force else 0)
                      + (6 if calc.stress else 0))
        a = np.zeros((total, width), dtype)
        b = np.zeros((total,), dtype)
        w = np.zeros((total,), dtype)
        fs = {"Groups": [], "Configs": [], "Row_Type": [], "Atom_I": [],
              "Atom_Type": [], "Testing": []}

        def expand(block, counts_frac=None):
            if sec.bzeroflag:
                return block
            shp = block.shape[:-1]
            lead = np.zeros(shp + (self.numtypes,), dtype)
            if counts_frac is not None:
                lead = lead + counts_frac
            return np.concatenate([lead, block], axis=-1)

        row = 0
        for pc, res in zip(packed, results):
            d = pc.data
            na = pc.natoms
            nr = 0
            if calc.energy:
                counts = np.bincount(pc.types, minlength=self.numtypes) / na
                a[row] = expand(res["e_cols"] / na, counts)
                b[row] = (d["Energy"] - res["ref_e"]) / na
                w[row] = d.get("eweight", 1.0)
                fs["Row_Type"].append("Energy")
                fs["Atom_I"].append(0)
                fs["Atom_Type"].append(0)
                row += 1
                nr += 1
            if calc.force:
                fr = expand(res["force_rows"][:na].reshape(3 * na, -1))
                a[row:row + 3 * na] = fr
                b[row:row + 3 * na] = (np.asarray(d["Forces"], dtype).ravel()
                                       - res["ref_f"][:na].ravel())
                w[row:row + 3 * na] = d.get("fweight", 1.0)
                fs["Row_Type"] += ["Force"] * (3 * na)
                fs["Atom_I"] += [i // 3 for i in range(3 * na)]
                fs["Atom_Type"] += [int(t) + 1 for t in pc.types
                                    for _ in range(3)]
                row += 3 * na
                nr += 3 * na
            if calc.stress:
                a[row:row + 6] = expand(res["virial_rows"])
                st = np.asarray(d["Stress"], dtype)
                b[row:row + 6] = st[[0, 1, 2, 1, 0, 0],
                                    [0, 1, 2, 2, 2, 1]] - res["ref_v"]
                w[row:row + 6] = d.get("vweight", 1.0)
                fs["Row_Type"] += ["Stress"] * 6
                fs["Atom_I"] += [0] * 6
                fs["Atom_Type"] += [0] * 6
                row += 6
                nr += 6
            fs["Groups"] += [d["Group"]] * nr
            fs["Configs"] += [d["File"]] * nr
            fs["Testing"] += [bool(d["test_bool"])] * nr
        return a, b, w, fs
