"""Batched SNAP linear-system builder.

Replaces the reference's hot loop (one fresh LAMMPS instance per config,
`fitsnap3lib/fitsnap.py:171` -> `calculators/lammps_base.py:52`) with bucketed,
jitted, vmapped kernel calls: neighbor lists are built host-side (cheap,
irregular), configs are padded to (A, K) shapes and grouped into coarse shape
buckets to bound XLA recompiles, and each bucket is processed by one compiled
function producing energy/force/virial rows plus reference-potential
subtractions.

Derivatives use the factorized scheme in
`fitsnap_tpu.ops.snap.descriptors_with_jacobian` (3 forward tangents + small
per-atom jacobian + batched contraction) rather than wide reverse-mode.

Row semantics match `calculators/lammps_snap.py:391-556` (validated against
the committed `20May21_Standard/Descriptors.npy` oracle to ~1e-13):
  energy row  = sum_i onehot(type_i) (x) desc_i / natoms   (x blank2J)
  force rows  = -d(sum_i desc_i)/dx_(n,c)                  (x blank2J)
  virial rows = -sum_pairs D_a dDesc/dD_b * 1.6021765e6 / vol
  b           = truth - reference potential value
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from fitsnap_tpu.ops.neighbors import host_neighbors
from fitsnap_tpu.utils.jaxsetup import setup_cache
from fitsnap_tpu.ops.refpot import parse_reference, reference_eav
from fitsnap_tpu.ops.snap import descriptors_with_jacobian, make_params

TOBAR = 1.6021765e6

_A_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024)
_K_BUCKETS = (16, 32, 48, 64, 96, 128, 192, 256, 384, 512)


def _pad_to(x, buckets):
    for b in buckets:
        if x <= b:
            return b
    return ((int(x) + 127) // 128) * 128


def coalesce_shape_buckets(buckets, max_programs=None):
    """Merge (a_pad, k_pad) shape buckets into <= max_programs covering
    shapes, greedily picking the merge that adds the least padded work
    (n * a_pad * k_pad proxy).

    Every distinct shape is a separate XLA program; through the remote-TPU
    relay each program costs seconds of compile or persistent-cache load,
    which dominates small fits.  Default cap from FITSNAP_TPU_NN_PROGRAMS
    (4).  Returns the same {(a_pad, k_pad): [config indices]} mapping.
    """
    import os
    if max_programs is None:
        max_programs = int(os.environ.get("FITSNAP_TPU_NN_PROGRAMS", "4"))
    items = [{"a": a, "k": k, "idxs": list(v)}
             for (a, k), v in sorted(buckets.items())]

    def cost(it, a=None, k=None):
        return len(it["idxs"]) * (a or it["a"]) * (k or it["k"])

    while len(items) > max_programs:
        best = None
        for i, s in enumerate(items):
            for j, d in enumerate(items):
                if i == j:
                    continue
                a, k = max(s["a"], d["a"]), max(s["k"], d["k"])
                added = cost(s, a, k) + cost(d, a, k) - cost(s) - cost(d)
                if best is None or added < best[0]:
                    best = (added, i, j, a, k)
        _, i, j, a, k = best
        items[j] = {"a": a, "k": k, "idxs": items[j]["idxs"] + items[i]["idxs"]}
        del items[i]
    return {(it["a"], it["k"]): it["idxs"] for it in items}


@dataclass
class PackedConfig:
    pos: np.ndarray
    cell: np.ndarray
    types: np.ndarray       # 0-based ints
    natoms: int
    data: dict
    disp: np.ndarray = None
    jidx: np.ndarray = None
    mask: np.ndarray = None
    kcount: int = 0
    spins: np.ndarray = None   # (natoms, 3) unit vectors, or None
    charges: np.ndarray = None  # (natoms,) per-atom charges, or None


class SnapCalculator:
    """Builds the weighted linear system from scraped config dicts."""

    def __init__(self, name, config):
        self.config = config
        self.name = name
        sec = config.sections["BISPECTRUM"]
        self.sec = sec
        self.type_mapping = sec.type_mapping
        setup_cache()
        self._fingerprint = None
        self._maybe_refresh()

    def _hyperparam_fingerprint(self):
        sec = self.sec

        def t(x):
            return tuple(np.ravel(np.asarray(x, float))) \
                if x is not None else None

        return (tuple(int(v) for v in np.atleast_1d(sec.twojmax)),
                sec.numtypes, t(sec.wj), t(sec.radelem), float(sec.rcutfac),
                float(sec.rfac0), float(sec.rmin0), bool(sec.chemflag),
                bool(sec.bnormflag), bool(sec.bzeroflag),
                bool(sec.wselfallflag), bool(sec.quadraticflag),
                bool(sec.switchflag), bool(sec.switchinnerflag),
                getattr(sec, "sinner", None), getattr(sec, "dinner", None),
                tuple(self.config.sections["REFERENCE"].lmp_pairdecl))

    def _maybe_refresh(self):
        """Rebuild the kernel plan when section hyperparameters changed.

        Library-mode hyperparameter loops mutate `config.sections
        ['BISPECTRUM']` between fits (reference
        `examples/library/loop_over_fits/example1.py`); the reference
        rebuilds its LAMMPS compute per config, so edits take effect on the
        next `process_configs` — mirrored here by fingerprinting."""
        fp = self._hyperparam_fingerprint()
        if fp == self._fingerprint:
            return
        self._fingerprint = fp
        sec = self.sec
        self.params = make_params(sec)
        self.numtypes = sec.numtypes
        radelem = np.array([float(x) for x in sec.radelem])
        self.snap_cutoff = float(2.0 * radelem.max() * sec.rcutfac)
        self.refspec = parse_reference(self.config.sections["REFERENCE"],
                                       sec.numtypes)
        self.cutoff = max(self.snap_cutoff, self.refspec.max_cutoff)
        self._jit_cache = {}

    def get_width(self):
        sec = self.sec
        if self.config.sections["CALCULATOR"].nonlinear:
            return sec.ncoeff
        w = sec.ncoeff * sec.numtypes
        if not sec.bzeroflag:
            w += sec.numtypes
        return w

    def nn_prep_fn(self):
        """Per-config (B, G, ref_e, ref_f) builder for the NN solver.

        Returns per-atom descriptors, the per-pair descriptor jacobian
        (the reference's dgradflag=1 rows, lammps_snap.py:112-222), and the
        reference-potential energy/forces to subtract from truths.
        """
        from fitsnap_tpu.ops.snap import descriptors_with_jacobian

        params = self.params
        refspec = self.refspec

        def prep(disp, jidx, mask, types, natoms):
            A = disp.shape[0]
            dtp = disp.dtype
            radelem = jnp.asarray(params.radelem, dtp)
            rcutij = (radelem[types][:, None] + radelem[types[jidx]]) \
                * params.rcutfac
            r2 = jnp.sum(disp * disp, -1)
            smask = mask & (r2 < rcutij * rcutij)
            real = (jnp.arange(A) < natoms).astype(dtp)
            B, G = descriptors_with_jacobian(disp, types[jidx], smask,
                                             types, params)
            B = B * real[:, None]
            G = G * real[:, None, None, None]
            re_, rf_, _ = reference_eav(disp, jidx, mask, types, natoms,
                                        refspec)
            return B, G, re_, rf_

        return prep

    def nn_desc_fn(self):
        """Per-config per-atom descriptors only (OTF/cached NN training and
        PAS mode; reference calculator.py:103-108).  Uses the monomial-path
        kernel (`atom_descriptors_fast`): forward and autodiff backward are
        MXU-shaped, ~5x faster than the triangular recursion inside a
        training step."""
        from fitsnap_tpu.ops.snap import atom_descriptors_fast

        params = self.params

        def prep(disp, jidx, mask, types, natoms):
            A = disp.shape[0]
            dtp = disp.dtype
            radelem = jnp.asarray(params.radelem, dtp)
            rcutij = (radelem[types][:, None] + radelem[types[jidx]]) \
                * params.rcutfac
            r2 = jnp.sum(disp * disp, -1)
            smask = mask & (r2 < rcutij * rcutij)
            real = (jnp.arange(A) < natoms).astype(dtp)
            B = atom_descriptors_fast(disp, types[jidx], smask, types,
                                      params)
            return B * real[:, None]

        return prep

    def nn_analytic_fns(self):
        """Closure kit for the cached analytic-force NN training step, or
        None when this descriptor config isn't covered (chem/quadratic
        fall back to the autodiff OTF path).

        Keys (see `ops/snap.py` nn_* for the math):
          utb(disp, jidx, mask, types, natoms) -> (ut (A,2U), B (A,W)):
              the cacheable per-atom state (computed once per dataset)
          dEdu_vg(dEdB, ut) -> vg: per-ATOM cotangent onto the pair grid
              (flattened atom axis across the minibatch)
          pair(disp, jidx, mask, types) -> per-config pair-grid tensors
          force(vg, grid) -> dE/ddisp (A, K, 3) of one config
        """
        plan = self.params.plan
        if plan.chemflag or plan.quadraticflag:
            return None
        from fitsnap_tpu.ops.snap import (nn_dEdu, nn_grid_pair,
                                          nn_pair_force, nn_ut_b, nn_vg)

        params = self.params

        def _smask(disp, jidx, mask, types):
            radelem = jnp.asarray(params.radelem, disp.dtype)
            rcutij = (radelem[types][:, None] + radelem[types[jidx]]) \
                * params.rcutfac
            r2 = jnp.sum(disp * disp, -1)
            return mask & (r2 < rcutij * rcutij)

        def utb_fn(disp, jidx, mask, types, natoms):
            A = disp.shape[0]
            real = (jnp.arange(A) < natoms).astype(disp.dtype)
            sm = _smask(disp, jidx, mask, types)
            ut, B = nn_ut_b(disp, types[jidx], sm, types, params)
            return ut, B * real[:, None]

        def dEdu_vg_fn(dEdB, ut):
            return nn_vg(nn_dEdu(dEdB, ut, params), params)

        def pair_fn(disp, jidx, mask, types):
            sm = _smask(disp, jidx, mask, types)
            return nn_grid_pair(disp, types[jidx], sm, types, params)

        return {"utb": utb_fn, "dEdu_vg": dEdu_vg_fn, "pair": pair_fn,
                "force": nn_pair_force}

    # ---------------- packing ----------------

    def _pack(self, data: dict) -> PackedConfig:
        types = np.array(
            [self.type_mapping[t] - 1 for t in data["AtomTypes"]], np.int32)
        spins = None
        if "Spins" in data and self.refspec.spin is not None:
            sp = np.asarray(data["Spins"], np.float64)
            vec = sp[:, 1:4]
            spins = vec / np.linalg.norm(vec, axis=1)[:, None]
        charges = None
        if self.refspec.coul is not None:
            if "Charges" not in data:
                raise ValueError(
                    "REFERENCE pair_style coul/cut needs per-atom charges "
                    f"(atom_style charge), but config {data.get('File')} "
                    "has no 'Charges' key")
            charges = np.asarray(data["Charges"], np.float64).reshape(-1)
        return PackedConfig(
            pos=np.asarray(data["Positions"], np.float64),
            cell=np.asarray(data["Lattice"], np.float64),
            types=types,
            natoms=int(data["NumAtoms"]),
            data=data,
            spins=spins,
            charges=charges,
        )

    def host_preprocess(self, data: list):
        """Pack configs and build host-side neighbor lists + shape buckets."""
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

    # ---------------- device function ----------------

    def _rows_fn(self, a_pad, k_pad, dtype):
        key = (a_pad, k_pad, dtype)
        if key in self._jit_cache:
            return self._jit_cache[key]

        params = self.params
        refspec = self.refspec
        numtypes = self.numtypes

        def one_config(disp, jidx, mask, types, natoms, cell, spins,
                       charges):
            A = disp.shape[0]
            dtp = disp.dtype
            radelem = jnp.asarray(params.radelem, dtp)
            rcutij = (radelem[types][:, None] + radelem[types[jidx]]) \
                * params.rcutfac
            r2 = jnp.sum(disp * disp, -1)
            smask = mask & (r2 < rcutij * rcutij)
            jelem = types[jidx]
            real = (jnp.arange(A) < natoms).astype(dtp)

            B, G = descriptors_with_jacobian(disp, jelem, smask, types, params)
            B = B * real[:, None]
            G = G * real[:, None, None, None]          # (A, W0, K, 3)

            oh = jax.nn.one_hot(types, numtypes, dtype=dtp) * real[:, None]
            e_cols = (oh.T @ B).reshape(-1)            # (numtypes * next,)

            # type-blocked per-pair gradients, then neighbor-scatter via
            # one-hot matmul (XLA scatter is slow; a dense dot is MXU-shaped)
            GT = jnp.einsum("at,awkc->takwc", oh, G)   # (T, A, K, W0, 3)
            W = numtypes * G.shape[1]
            oj = jax.nn.one_hot(jidx, A, dtype=dtp)    # (A, K, A)
            scat = jnp.einsum("ikn,tikwc->ntwc", oj, GT).reshape(A, W, 3)
            rowsum = GT.sum(axis=2).transpose(1, 0, 2, 3).reshape(A, W, 3)
            force_rows = -(scat - rowsum).transpose(0, 2, 1)   # (A, 3, W)

            vol = cell[0, 0] * cell[1, 1] * cell[2, 2]
            pa = jnp.array([0, 1, 2, 1, 0, 0])
            pb = jnp.array([0, 1, 2, 2, 2, 1])
            dm = disp * smask[..., None].astype(dtp)
            vir = -jnp.einsum("ikx,tikwy->xytw", dm, GT).reshape(3, 3, W)
            virial_rows = vir[pa, pb] * (TOBAR / vol)          # (6, W)

            re, rf, rv = reference_eav(disp, jidx, mask, types, natoms,
                                       refspec, spins=spins,
                                       charges=charges)
            return {"e_cols": e_cols, "force_rows": force_rows,
                    "virial_rows": virial_rows,
                    "ref_e": re, "ref_f": rf, "ref_v": rv * (TOBAR / vol)}

        fn = jax.jit(jax.vmap(one_config))
        self._jit_cache[key] = fn
        return fn

    def process_single(self, data, dtype=np.float64):
        """Per-config rows (a, b, w) for library mode
        (reference `lammps_base.py:101` / `lammps_snap.py:224`)."""
        a, b, w, _ = self.process_configs([data], dtype)
        return a, b, w

    # ---------------- assembly ----------------

    def process_configs(self, data: list, dtype=np.float64):
        """Compute the full linear system.

        Returns (a, b, w, fs_dict) where fs_dict carries the per-row
        bookkeeping lists the reference keeps in `pt.fitsnap_dict`.
        """
        calc = self.config.sections["CALCULATOR"]
        sec = self.sec
        packed, buckets = self.host_preprocess(data)

        results = [None] * len(packed)
        for (a_pad, k_pad), idxs in buckets.items():
            fn = self._rows_fn(a_pad, k_pad, jnp.dtype(dtype))
            # fixed chunk size per bucket shape: the tail chunk is padded with
            # empty configs so each bucket compiles exactly once; budget the
            # chunk by the dominant G tensor (A*K*width*3 per config)
            width = self.sec.ncoeff
            g_bytes = a_pad * k_pad * width * 3 * 8
            chunk = int(min(32, max(1, 1024 // a_pad),
                            max(1, (1 << 30) // (4 * g_bytes)), len(idxs)))
            for c0 in range(0, len(idxs), chunk):
                ids = idxs[c0:c0 + chunk]
                n = len(ids)
                disp = np.zeros((chunk, a_pad, k_pad, 3), dtype)
                jidx = np.zeros((chunk, a_pad, k_pad), np.int32)
                mask = np.zeros((chunk, a_pad, k_pad), bool)
                cell = np.eye(3, dtype=dtype)[None].repeat(chunk, 0)
                types = np.zeros((chunk, a_pad), np.int32)
                nat = np.zeros((chunk,), np.int32)
                spins = np.zeros((chunk, a_pad, 3), dtype)
                charges = np.zeros((chunk, a_pad), dtype)
                for j, i in enumerate(ids):
                    pc = packed[i]
                    na, kc = pc.natoms, pc.kcount
                    disp[j, :na, :kc] = pc.disp[:, :kc]
                    jidx[j, :na, :kc] = pc.jidx[:, :kc]
                    mask[j, :na, :kc] = pc.mask[:, :kc]
                    cell[j] = pc.cell
                    types[j, :na] = pc.types
                    nat[j] = na
                    if pc.spins is not None:
                        spins[j, :na] = pc.spins
                    if pc.charges is not None:
                        charges[j, :na] = pc.charges
                out = jax.tree.map(np.asarray,
                                   fn(disp, jidx, mask, types, nat, cell,
                                      spins, charges))
                for j, i in enumerate(ids):
                    results[i] = {k: v[j] for k, v in out.items()}

        return self._assemble(packed, results, dtype)

    def _assemble(self, packed, results, dtype):
        calc = self.config.sections["CALCULATOR"]
        sec = self.sec
        width = self.get_width()
        blank2j = np.asarray(sec.blank2J, dtype)
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
            """(..., raw_width) -> (..., width): insert per-type leading
            column when bzeroflag=0, apply blank2J (`lammps_snap.py:455`)."""
            if sec.bzeroflag:
                return block * blank2j
            shp = block.shape[:-1]
            blk = block.reshape(shp + (self.numtypes, sec.ncoeff))
            lead = np.zeros(shp + (self.numtypes, 1), dtype)
            if counts_frac is not None:
                lead = lead + counts_frac[..., None]
            out = np.concatenate([lead, blk], axis=-1)
            return out.reshape(shp + (width,)) * blank2j

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
