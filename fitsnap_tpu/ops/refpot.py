"""Reference (subtracted) potentials in JAX: `zero`, `zbl`, `hybrid/overlay`.

The reference drives LAMMPS pair styles per config and subtracts the
resulting energy/forces/stress from the training truths
(`fitsnap3lib/calculators/lammps_snap.py:470-540`).  Here the same physics is
a pure JAX function of the padded neighbor tensors; forces and virials come
from autodiff, so they are exactly consistent with the energy.

ZBL follows LAMMPS `pair_style zbl` (metal units): universal screening
function plus a C1-smooth switching polynomial between the inner and outer
cutoffs, with the constant shift sw5 making E(outer) = 0.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# LAMMPS pair_zbl constants (metal units)
_PZBL = 0.23
_A0 = 0.46850
_C = np.array([0.02817, 0.28022, 0.50986, 0.18175])
_D = np.array([0.20162, 0.40290, 0.94229, 3.19980])
_QQR2E = 14.399645  # eV*A


def _e_zbl_np(r, zi, zj):
    a = _A0 / (zi ** _PZBL + zj ** _PZBL)
    pre = _QQR2E * zi * zj
    x = r / a
    phi = (_C * np.exp(-_D * x)).sum()
    return pre / r * phi


def _de_zbl_np(r, zi, zj):
    a = _A0 / (zi ** _PZBL + zj ** _PZBL)
    pre = _QQR2E * zi * zj
    x = r / a
    phi = (_C * np.exp(-_D * x)).sum()
    dphi = (-(_C * _D) * np.exp(-_D * x)).sum() / a
    return -pre / r ** 2 * phi + pre / r * dphi


def _d2e_zbl_np(r, zi, zj):
    a = _A0 / (zi ** _PZBL + zj ** _PZBL)
    pre = _QQR2E * zi * zj
    x = r / a
    phi = (_C * np.exp(-_D * x)).sum()
    dphi = (-(_C * _D) * np.exp(-_D * x)).sum() / a
    d2phi = ((_C * _D * _D) * np.exp(-_D * x)).sum() / a ** 2
    return 2 * pre / r ** 3 * phi - 2 * pre / r ** 2 * dphi + pre / r * d2phi


@dataclass(frozen=True)
class ZblParams:
    """Per-type-pair ZBL tables (ntypes, ntypes)."""
    cut_inner: float
    cut_outer: float
    zi: np.ndarray
    zj: np.ndarray
    sw3: np.ndarray
    sw4: np.ndarray
    sw5: np.ndarray
    active: np.ndarray  # bool mask of coeff'd type pairs


def build_zbl(cut_inner, cut_outer, pair_z, ntypes):
    """pair_z: dict {(ti, tj) 0-based: (Zi, Zj)}; wildcarded pairs expanded."""
    zi = np.zeros((ntypes, ntypes))
    zj = np.zeros((ntypes, ntypes))
    active = np.zeros((ntypes, ntypes), bool)
    for (ti, tj), (a, b) in pair_z.items():
        zi[ti, tj] = zi[tj, ti] = a
        zj[ti, tj] = zj[tj, ti] = b
        active[ti, tj] = active[tj, ti] = True
    sw3 = np.zeros((ntypes, ntypes))
    sw4 = np.zeros((ntypes, ntypes))
    sw5 = np.zeros((ntypes, ntypes))
    tc = cut_outer - cut_inner
    for ti in range(ntypes):
        for tj in range(ntypes):
            if not active[ti, tj]:
                continue
            fc = _e_zbl_np(cut_outer, zi[ti, tj], zj[ti, tj])
            fcp = _de_zbl_np(cut_outer, zi[ti, tj], zj[ti, tj])
            fcpp = _d2e_zbl_np(cut_outer, zi[ti, tj], zj[ti, tj])
            swa = (-3.0 * fcp + tc * fcpp) / tc ** 2
            swb = (2.0 * fcp - tc * fcpp) / tc ** 3
            sw3[ti, tj] = swa / 3.0
            sw4[ti, tj] = swb / 4.0
            sw5[ti, tj] = -fc - sw3[ti, tj] * tc ** 3 - sw4[ti, tj] * tc ** 4
    return ZblParams(cut_inner, cut_outer, zi, zj, sw3, sw4, sw5, active)


def zbl_pair_energy(r, ti, tj, p: ZblParams):
    """Smooth-switched ZBL pair energy (elementwise over padded pairs)."""
    dtype = r.dtype
    zi = jnp.asarray(p.zi, dtype)[ti, tj]
    zj = jnp.asarray(p.zj, dtype)[ti, tj]
    a = _A0 / (zi ** _PZBL + zj ** _PZBL)
    pre = _QQR2E * zi * zj
    x = r / a
    c = jnp.asarray(_C, dtype)
    d = jnp.asarray(_D, dtype)
    phi = jnp.sum(c * jnp.exp(-d * x[..., None]), axis=-1)
    e = pre / r * phi
    e = e + jnp.asarray(p.sw5, dtype)[ti, tj]
    t = r - p.cut_inner
    esw = t * t * t * (jnp.asarray(p.sw3, dtype)[ti, tj]
                       + jnp.asarray(p.sw4, dtype)[ti, tj] * t)
    e = e + jnp.where(r > p.cut_inner, esw, 0.0)
    e = jnp.where((r < p.cut_outer) & jnp.asarray(p.active)[ti, tj], e, 0.0)
    return e


@dataclass(frozen=True)
class SpinExchangeParams:
    """LAMMPS `pair_style spin/exchange/biquadratic` (Bethe-Slater radial
    profiles).  Calibrated against the reference's Fe Truth-Ref oracle:
    E = -1/2 sum_pairs [ J(r)(s_i.s_j - 1) + K(r)((s_i.s_j)^2 - 1) ]
    with unit spin vectors and offset enabled."""
    rc: float
    aj: float
    gj: float
    dj: float
    ak: float
    gk: float
    dk: float
    offset: bool = True


@dataclass(frozen=True)
class CoulCutParams:
    """LAMMPS `pair_style coul/cut <rc>`: bare (unshifted) Coulomb between
    per-atom charges inside the cutoff, E = qqr2e * qi * qj / r.  Needs
    `atom_style charge` data (per-atom `Charges`, the key the reference
    feeds to LAMMPS at `calculators/lammps_base.py:225-229`)."""
    rc: float


@dataclass(frozen=True)
class RefSpec:
    """Parsed REFERENCE section: list of active pair potentials."""
    zbl: ZblParams = None
    spin: SpinExchangeParams = None
    coul: CoulCutParams = None
    max_cutoff: float = 0.0


def parse_reference(section, ntypes) -> RefSpec:
    """Parse `pair_style` / `pair_coeff` declarations (reference section
    forwards them verbatim to LAMMPS; we interpret the supported subset)."""
    decls = section.lmp_pairdecl
    style_line = decls[0].split()
    assert style_line[0] == "pair_style"
    styles = {}
    toks = style_line[1:]
    if toks[0] == "hybrid/overlay":
        i = 1
        while i < len(toks):
            name = toks[i]
            args = []
            i += 1
            while i < len(toks):
                try:
                    args.append(float(toks[i]))
                    i += 1
                except ValueError:
                    break
            styles[name] = args
    else:
        name = toks[0]
        styles[name] = [float(x) for x in toks[1:] if _is_num(x)]

    for name in styles:
        if name not in ("zero", "zbl", "spin/exchange/biquadratic",
                        "coul/cut"):
            raise NotImplementedError(f"reference pair style '{name}' not supported")

    zbl_pairs = {}
    spin = None
    for line in decls[1:]:
        toks = line.split()
        assert toks[0] == "pair_coeff"
        ti_s, tj_s = toks[1], toks[2]
        rest = toks[3:]
        # hybrid: next token names the sub-style
        style = rest[0] if rest and not _is_num(rest[0]) else None
        args = rest[1:] if style else rest
        if style == "zbl" or (style is None and "zbl" in styles
                              and len(styles) == 1):
            t_is = range(ntypes) if ti_s == "*" else [int(ti_s) - 1]
            t_js = range(ntypes) if tj_s == "*" else [int(tj_s) - 1]
            for a in t_is:
                for b in t_js:
                    zbl_pairs[(a, b)] = (float(args[0]), float(args[1]))
        elif style == "spin/exchange/biquadratic":
            # biquadratic <rc> aJ gJ dJ aK gK dK [offset yes|no]
            assert args[0] == "biquadratic"
            vals = args[1:8]
            offset = True
            if "offset" in args:
                offset = args[args.index("offset") + 1].lower() in (
                    "yes", "true", "1")
            spin = SpinExchangeParams(
                rc=float(vals[0]), aj=float(vals[1]), gj=float(vals[2]),
                dj=float(vals[3]), ak=float(vals[4]), gk=float(vals[5]),
                dk=float(vals[6]), offset=offset)

    zbl = None
    coul = None
    max_cut = 0.0
    if "zbl" in styles:
        cut_inner, cut_outer = styles["zbl"][0], styles["zbl"][1]
        zbl = build_zbl(cut_inner, cut_outer, zbl_pairs, ntypes)
        max_cut = max(max_cut, cut_outer)
    if "coul/cut" in styles:
        coul = CoulCutParams(rc=float(styles["coul/cut"][0]))
        max_cut = max(max_cut, coul.rc)
    if spin is not None:
        max_cut = max(max_cut, spin.rc)
    return RefSpec(zbl=zbl, spin=spin, coul=coul, max_cutoff=max_cut)


def _is_num(s):
    try:
        float(s)
        return True
    except ValueError:
        return False


def _bethe_slater(r, a, g, d):
    x2 = (r / d) ** 2
    return 4.0 * a * x2 * (1.0 - g * x2) * jnp.exp(-x2)


def reference_eav(disp, jidx, mask, types, natoms, spec: RefSpec,
                  spins=None, charges=None):
    """Reference-potential (energy, forces (A,3), virial (6,) in eV units).

    disp: (A, K, 3) r_j - r_i over the directed padded neighbor list; each
    physical pair appears twice, so pair sums carry a 0.5 factor.
    spins: optional (A, 3) unit spin vectors for the spin/exchange pair
    style (magnetic moments are frame-fixed; forces come from dJ/dr only).
    charges: optional (A,) per-atom charges for coul/cut.
    Virial components ordered (xx, yy, zz, yz, xz, xy), W_ab = -0.5 sum
    D_a dE/dD_b matching the sign convention validated against the oracle.
    """
    A = disp.shape[0]
    if spec.zbl is None and spec.spin is None and spec.coul is None:
        z = jnp.zeros((), disp.dtype)
        return z, jnp.zeros((A, 3), disp.dtype), jnp.zeros((6,), disp.dtype)
    if spec.coul is not None and charges is None:
        raise ValueError(
            "REFERENCE pair_style coul/cut needs per-atom charges: the "
            "training data has no 'Charges' key (atom_style charge)")

    ti = jnp.broadcast_to(types[:, None], jidx.shape)
    tj = types[jidx]

    def part_energies(d):
        safe = jnp.where(mask[..., None], d, jnp.array([1.0, 0.0, 0.0], d.dtype))
        r = jnp.sqrt(jnp.sum(safe * safe, -1))
        e_v = jnp.zeros_like(r)     # styles that tally virial
        e_nv = jnp.zeros_like(r)    # spin styles: energy+force, NO virial
        if spec.zbl is not None:
            e_v = e_v + zbl_pair_energy(r, ti, tj, spec.zbl)
        if spec.coul is not None:
            qq = charges[:, None] * charges[jidx]
            ec = _QQR2E * qq / r
            e_v = e_v + jnp.where(r < spec.coul.rc, ec, 0.0)
        if spec.spin is not None and spins is not None:
            sp = spec.spin
            dots = jnp.einsum("ac,akc->ak", spins, spins[jidx])
            off = 1.0 if sp.offset else 0.0
            es = -(_bethe_slater(r, sp.aj, sp.gj, sp.dj) * (dots - off)
                   + _bethe_slater(r, sp.ak, sp.gk, sp.dk)
                   * (dots ** 2 - off))
            e_nv = e_nv + jnp.where(r < sp.rc, es, 0.0)
        e_v = jnp.where(mask, e_v, 0.0)
        e_nv = jnp.where(mask, e_nv, 0.0)
        return 0.5 * jnp.sum(e_v), 0.5 * jnp.sum(e_nv)

    (e_v, e_nv), vjp = jax.vjp(part_energies, disp)
    g_vir, = vjp((jnp.ones((), disp.dtype), jnp.zeros((), disp.dtype)))
    energy = e_v + e_nv
    # dE/dx_n = scatter_j(g) - rowsum_i(g);  F = -dE/dx
    # (one-hot matmul instead of scatter: see calculators/snap.py)
    # LAMMPS magnetic pair styles contribute ENERGY ONLY here: grid-searching
    # the force coefficients against the Fe Truth-Ref oracle pins the spin
    # mechanical force AND virial to exactly zero (match 8e-15), so forces
    # and virial both come from the non-spin terms.
    oj = jax.nn.one_hot(jidx, A, dtype=disp.dtype)
    scat = jnp.einsum("ikn,ikc->nc", oj, g_vir)
    forces = -(scat - g_vir.sum(axis=1))
    pairs_a = jnp.array([0, 1, 2, 1, 0, 0])
    pairs_b = jnp.array([0, 1, 2, 2, 2, 1])
    virial = -jnp.einsum("ika,ikb->ab",
                         disp * mask[..., None].astype(disp.dtype), g_vir)
    virial6 = virial[pairs_a, pairs_b]
    return energy, forces, virial6
