"""ACE (Atomic Cluster Expansion) descriptors in JAX.

Replaces the reference's `compute pace` (C++ ML-PACE driven via LAMMPS) +
`lib/sym_ACE` coupling generator with a self-contained implementation:

  - host-side plan: rotation-invariant product-basis labels
    (mu0, mu_vec, n_vec, l_vec, L_vec) with LEFT-fold angular coupling
    (L1 = l1 x l2, L2 = L1 x l3, ..., final scalar contraction), and their
    generalized coupling coefficients from Clebsch-Gordan products;
  - jittable kernel: ChebExpCos radial basis, complex spherical harmonics,
    per-element A-basis accumulation, multilinear product contraction.

Parity status: the evaluation pipeline is internally consistent with the
`.yace` potential this framework writes (ctilde tables come from the same
plan).  This module's native LEFT-fold basis spans the same invariant space
as the reference's permutation-adapted selection with a different basis;
exact label/ctilde parity with the reference (both the minsub and
pa_tabulated bases) is provided by `ops/ace_ref_basis.py` and verified in
`tests/test_ace_ref_basis.py` (68/68 Ta, 173/173x2 InP labels) — see
docs/COMPONENTS.md §2.7.
"""

import itertools
import os
from dataclasses import dataclass, field
from functools import lru_cache
from math import sqrt

import jax
import jax.numpy as jnp
import numpy as np

from fitsnap_tpu.ops.cg import cg_block


# ---------------------------------------------------------------------------
# host-side: labels and couplings
# ---------------------------------------------------------------------------

def _cg(l1, m1, l2, m2, L, M):
    """<l1 m1 l2 m2 | L M> from the 2j-integer cg_block tables."""
    if m1 + m2 != M:
        return 0.0
    blk = cg_block(2 * l1, 2 * l2, 2 * L)
    return float(blk[m1 + l1, m2 + l2])


def coupling_terms(lvec, Lvec):
    """All (m-vector, coefficient) pairs coupling Ylm products to a scalar.

    Left-fold scheme: (((l1 l2) L1 l3) L2 ... l_{r-1}) L_{r-2}, then the
    final CG with l_r couples to (0, 0), requiring L_{r-2} == l_r.
    """
    r = len(lvec)
    if r == 1:
        assert lvec[0] == 0
        return {(0,): 1.0}
    if r == 2:
        l = lvec[0]
        assert lvec[1] == l
        out = {}
        for m in range(-l, l + 1):
            out[(m, -m)] = (-1.0) ** (l - m) / sqrt(2 * l + 1)
        return out

    inter = list(Lvec)
    assert len(inter) == r - 2
    terms = {}

    def recurse(slot, mprefix, Lcur, Mcur, coef):
        if slot == r - 1:
            # final scalar contraction with l_r: <L M l_r m | 0 0>
            l_last = lvec[-1]
            if Lcur != l_last:
                return
            m_last = -Mcur
            if abs(m_last) > l_last:
                return
            c = ((-1.0) ** (l_last - Mcur)) / sqrt(2 * l_last + 1)
            key = mprefix + (m_last,)
            terms[key] = terms.get(key, 0.0) + coef * c
            return
        l_next = lvec[slot]
        L_next = inter[slot - 1]
        for m in range(-l_next, l_next + 1):
            M2 = Mcur + m
            if abs(M2) > L_next:
                continue
            c = _cg(Lcur, Mcur, l_next, m, L_next, M2)
            if c != 0.0:
                recurse(slot + 1, mprefix + (m,), L_next, M2, coef * c)

    l1, l2 = lvec[0], lvec[1]
    L1 = inter[0] if r > 2 else lvec[-1]
    for m1 in range(-l1, l1 + 1):
        for m2 in range(-l2, l2 + 1):
            M = m1 + m2
            if abs(M) > L1:
                continue
            c = _cg(l1, m1, l2, m2, L1, M)
            if c != 0.0:
                recurse(2, (m1, m2), L1, M, c)
    # drop numerically-zero sets
    return {k: v for k, v in terms.items() if abs(v) > 1e-14}


def _scalar_cg_sign(L, M, l, m):
    return (-1.0) ** (l - m) / sqrt(2 * l + 1) if (M + m) == 0 else 0.0


def generate_labels(ranks, nmax, lmax, numtypes, lmin=None):
    """Enumerate (mu0, mus, ns, ls, Ls) labels.

    Per rank r: (mu, n, l) slot triples from combinations_with_replacement
    (permutation-invariant ordering), l in [lmin_r..lmax_r] for r >= 2
    (rank 1 is l = 0), sum(l) even, all triangle-valid intermediate L-paths.
    """
    lmin = lmin or [0] * len(ranks)
    if len(lmin) == 1:
        lmin = list(lmin) * len(ranks)
    assert len(lmin) == len(ranks) == len(nmax) == len(lmax), \
        "per-rank hyperparameter lists must have equal length"
    labels = []
    for mu0 in range(numtypes):
        for rank, nmx, lmx, lmn in zip(ranks, nmax, lmax, lmin):
            if rank == 1:
                for mu in range(numtypes):
                    for n in range(1, nmx + 1):
                        labels.append((mu0, (mu,), (n,), (0,), ()))
                continue
            lrange = range(lmn, lmx + 1) if rank > 1 else [0]
            slots = [(mu, n, l)
                     for mu in range(numtypes)
                     for n in range(1, nmx + 1)
                     for l in lrange]
            for combo in itertools.combinations_with_replacement(slots, rank):
                ls = tuple(s[2] for s in combo)
                if sum(ls) % 2 != 0:
                    continue
                mus = tuple(s[0] for s in combo)
                ns = tuple(s[1] for s in combo)
                # enumerate valid intermediate L paths (left fold)
                def lpaths(Lcur, idx, path):
                    if idx == rank - 1:
                        if Lcur == ls[-1]:
                            yield path
                        return
                    for L in range(abs(Lcur - ls[idx]), Lcur + ls[idx] + 1):
                        yield from lpaths(L, idx + 1, path + (L,))
                if rank == 2:
                    if ls[0] == ls[1]:
                        labels.append((mu0, mus, ns, ls, ()))
                    continue
                for Ls in lpaths(ls[0], 1, ()):
                    # skip odd-parity intermediates relative to coupling
                    labels.append((mu0, mus, ns, ls, Ls[1:] if False else Ls))
    # dedupe
    seen = set()
    out = []
    for lab in labels:
        if lab not in seen:
            seen.add(lab)
            out.append(lab)
    return out


@dataclass
class AcePlan:
    """Static parameterization of the ACE kernel."""
    numtypes: int
    nradbase: int
    nmax_per_l: dict            # l -> max n used
    lmax: int
    rcut: np.ndarray = None      # (numtypes, numtypes) per-bond cutoffs
    lmbda: np.ndarray = None     # (numtypes, numtypes) ChebExpCos lambda
    rcinner: np.ndarray = None   # (numtypes, numtypes) inner cutoff
    drcinner: np.ndarray = None  # (numtypes, numtypes) inner cutoff width
    labels: list = field(default_factory=list)
    # A-basis layout: flat index over (mu, n, l, m)
    a_index: dict = None        # (mu, n, l, m) -> idx
    nA: int = 0
    # term tables
    t_fact: np.ndarray = None   # (nterms, R) int32 indices into A (+1 dummy)
    t_coef: np.ndarray = None   # (nterms,)
    t_label: np.ndarray = None  # (nterms,)
    t_mu0: np.ndarray = None    # (nlabels,) central element of each label
    rank_max: int = 0
    mmat: np.ndarray = None     # (nterms, nlabels) dense agg matrix
    # Conventions default to ML-PACE's (determined against the Ta_PACE
    # standard: rank-1 betas to 0.05%, higher-rank ratios = (4pi)^(rank/2)):
    # radial 'pace_px' = g_1 = env, g_n = (1 - T_{n-1}(x))/2 * env with the
    # increasing exp-scaled x; ylm '4pi' = sqrt(4 pi) * orthonormal Ylm
    # (Y00 = 1).  'v0'/'std' are this framework's original conventions.
    radial: str = "pace_px"     # ChebExpCos convention variant
    ylm: str = "4pi"            # '4pi' | 'std' | 'racah'
    # ML-PACE evaluates radials from cubic Hermite spline lookup tables
    # (deltaSplineBins in the .yace, default 0.001), not the analytic
    # functions; setting this emulates that (including its O(delta^4)
    # interpolation error) for beta-level parity with LAMMPS-made fits.
    spline_delta: float = None

    @property
    def ncoeff(self):
        return len(self.labels) // self.numtypes


def _bond_matrix(vals, numtypes):
    """Per-bond parameter matrix from 1, numtypes^2 values, or a matrix.

    The reference orders bond values as itertools.product(types, types)
    (calculator_sections/ace.py rcutfac/lambda/rcinner/drcinner lists)."""
    a = np.asarray(vals, float).reshape(-1)
    if a.size == 1:
        return np.full((numtypes, numtypes), float(a[0]))
    if a.size == numtypes * numtypes:
        return a.reshape(numtypes, numtypes)
    raise ValueError(
        f"expected 1 or {numtypes * numtypes} bond values, got {a.size}")


def _pack_plan(labels, terms_per_label, numtypes, nradbase, lmax,
               rcut, lmbda, rcinner, drcinner) -> AcePlan:
    """Assemble an AcePlan from labels + per-label {m-vector: ctilde} maps.

    Rank-1 slots use the ML-PACE convention: the descriptor is the plain
    radial-base sum sum_j g_n(r_j) with NO Y00 factor (that is why .yace
    files carry nradbasemax >= nradmax and rank-1 ns beyond nradmax).
    Those factors are keyed (mu, n, -1, 0) in the A-index and evaluated
    without a spherical harmonic.
    """
    used = {}
    for (mu0, mus, ns, ls, Ls) in labels:
        rank = len(mus)
        for mu, n, l in zip(mus, ns, ls):
            key_l = -1 if rank == 1 else l
            used[(mu, n, key_l)] = True
    a_index = {}
    idx = 1                       # 0 is the dummy "one" slot
    for (mu, n, l) in sorted(used):
        for m in ([0] if l < 0 else range(-l, l + 1)):
            a_index[(mu, n, l, m)] = idx
            idx += 1
    nA = idx

    rank_max = max(len(lab[1]) for lab in labels)
    t_fact, t_coef, t_label = [], [], []
    for li, (mu0, mus, ns, ls, Ls) in enumerate(labels):
        rank = len(mus)
        for mvec, c in terms_per_label[li].items():
            fact = [a_index[(mu, n, -1 if rank == 1 else l, m)]
                    for mu, n, l, m in zip(mus, ns, ls, mvec)]
            fact += [0] * (rank_max - len(fact))
            t_fact.append(fact)
            t_coef.append(c)
            t_label.append(li)

    nterms = len(t_fact)
    nlabels = len(labels)
    mmat = np.zeros((nterms, nlabels))
    for k, (li, c) in enumerate(zip(t_label, t_coef)):
        mmat[k, li] = c

    nmax_per_l = {}
    for (mu, n, l) in used:
        nmax_per_l[l] = max(nmax_per_l.get(l, 0), n)

    return AcePlan(
        numtypes=numtypes,
        nradbase=nradbase,
        nmax_per_l=nmax_per_l,
        lmax=lmax,
        rcut=_bond_matrix(rcut, numtypes),
        lmbda=_bond_matrix(lmbda, numtypes),
        rcinner=_bond_matrix(rcinner, numtypes),
        drcinner=_bond_matrix(drcinner, numtypes),
        labels=labels,
        a_index=a_index,
        nA=nA,
        t_fact=np.asarray(t_fact, np.int32),
        t_coef=np.asarray(t_coef),
        t_label=np.asarray(t_label, np.int32),
        t_mu0=np.asarray([lab[0] for lab in labels], np.int32),
        rank_max=rank_max,
        mmat=mmat,
        spline_delta=(float(os.environ["FITSNAP_TPU_ACE_SPLINE"])
                      if os.environ.get("FITSNAP_TPU_ACE_SPLINE")
                      else None),
    )


def build_ace_plan(section) -> AcePlan:
    ranks = section.ranks
    nmax = section.nmax
    lmax_list = section.lmax
    lmin = section.lmin
    numtypes = section.numtypes
    basis = getattr(section, "b_basis", "native")
    if basis in ("minsub", "pa_tabulated"):
        from fitsnap_tpu.ops.ace_ref_basis import reference_labels_and_terms
        labels, terms = reference_labels_and_terms(section)
    else:
        labels = generate_labels(ranks, nmax, lmax_list, numtypes, lmin)
        terms = [coupling_terms(lab[3], lab[4]) for lab in labels]
    return _pack_plan(
        labels, terms, numtypes,
        nradbase=max(section.nmaxbase, max(nmax)),
        lmax=max(lmax_list),
        rcut=section.rcutfac,
        lmbda=section.lmbda,
        rcinner=section.rcinner,
        drcinner=section.drcinner,
    )


def plan_terms(plan: AcePlan):
    """Per-label {m-vector: ctilde} maps recovered from the packed term
    tables (inverse of _pack_plan; used by the .yace writer)."""
    inv = {v: k for k, v in plan.a_index.items()}
    terms = [dict() for _ in plan.labels]
    for fact, coef, li in zip(plan.t_fact, plan.t_coef, plan.t_label):
        rank = len(plan.labels[li][1])
        mvec = tuple(int(inv[int(f)][3]) for f in fact[:rank])
        terms[li][mvec] = terms[li].get(mvec, 0.0) + float(coef)
    return terms


def plan_from_yace(path) -> AcePlan:
    """Build an evaluation plan from an ML-PACE ctilde potential
    (`coupling_coefficients.yace` or a fitted `.yace`).

    Covers the reference's `manuallabs`-style workflows and provides an
    exact-basis oracle: descriptors evaluated with a plan loaded from the
    reference's own coupling file must reproduce `compute pace` outputs
    (reference lammps_pace.py:71-84 consumes the same file).
    """
    import re

    import yaml

    with open(path) as f:
        txt = f.read()
    # bond keys are flow-style lists ([0, 0]:) — unhashable for safe_load
    txt = re.sub(r"^(\s+)(\[[\d,\s]+\]):", r'\1"\2":', txt, flags=re.M)
    doc = yaml.safe_load(txt)
    elements = doc["elements"]
    numtypes = len(elements)
    bond = next(iter(doc["bonds"].values()))
    # validate EVERY bond block, not just the first: a multi-element .yace
    # with per-bond differing nradbase or non-identity radcoefficients must
    # not load silently with the wrong radial basis
    for key, b in doc["bonds"].items():
        assert int(b["nradbasemax"]) == int(bond["nradbasemax"]), (
            f"bond {key}: nradbasemax {b['nradbasemax']} differs from "
            f"{bond['nradbasemax']} (per-bond radial sizes unsupported)")
        crad = np.asarray(b["radcoefficients"], float)
        eye = np.zeros_like(crad)
        for n in range(crad.shape[0]):
            eye[n, :, n] = 1.0
        assert np.allclose(crad, eye), (
            f"bond {key}: only identity radcoefficients (R_nl = g_n) "
            "are supported")
    nt = numtypes
    rc = np.zeros((nt, nt))
    lam = np.zeros((nt, nt))
    rc_in = np.zeros((nt, nt))
    d_in = np.full((nt, nt), 0.01)
    for key, b in doc["bonds"].items():
        i, j = (int(x) for x in re.findall(r"\d+", str(key)))
        rc[i, j] = float(b["rcut"])
        lam[i, j] = float(b["radparameters"][0])
        rc_in[i, j] = float(b.get("rcut_in", 0.0) or 0.0)
        d_in[i, j] = float(b.get("dcut_in", 0.01) or 0.01)
    labels = []
    terms = []
    lmax = 0
    for mu0 in sorted(doc["functions"]):
        for fn in doc["functions"][mu0]:
            rank = int(fn["rank"])
            mus = tuple(int(x) for x in fn["mus"])
            ns = tuple(int(x) for x in fn["ns"])
            ls = tuple(int(x) for x in fn["ls"])
            lmax = max(lmax, max(ls))
            ms = [int(x) for x in fn["ms_combs"]]
            cts = [float(x) for x in fn["ctildes"]]
            tmap = {}
            for k, c in enumerate(cts):
                mvec = tuple(ms[k * rank:(k + 1) * rank])
                tmap[mvec] = tmap.get(mvec, 0.0) + c
            labels.append((int(mu0), mus, ns, ls, ()))
            terms.append(tmap)
    return _pack_plan(
        labels, terms, numtypes,
        nradbase=int(bond["nradbasemax"]),
        lmax=lmax,
        rcut=rc,
        lmbda=lam,
        rcinner=rc_in,
        drcinner=d_in,
    )


# ---------------------------------------------------------------------------
# jittable kernel
# ---------------------------------------------------------------------------

def chebexpcos_basis(r, rcut, lmbda, nradbase, variant="v0"):
    """ChebExpCos radial functions g_k(r), k = 1..nradbase.

    Exponentially-scaled Chebyshev polynomials under a cosine cutoff
    (Drautz-2019 Eq. 24).  `variant` selects the exact convention:
      v0: x = 1 - 2 (e^{lambda(1 - r/rc)} - 1)/(e^lambda - 1),
          g_k = T_{k-1}(x) * 0.5 (1 + cos(pi r/rc))
      pace_x: x = 1 - 2 (e^{lambda r/rc} - 1)/(e^lambda - 1) (ML-PACE
          ace_radial scaled distance), same g stack
      v0_t1 / pace_x_t1: same x, g_k = T_k(x) (skip the constant T_0)
    """
    dtype = r.dtype
    rcut = jnp.broadcast_to(jnp.asarray(rcut, dtype), r.shape)
    lmbda = jnp.broadcast_to(jnp.asarray(lmbda, dtype), r.shape)
    x0 = jnp.clip(r / rcut, 0.0, 1.0)
    den = jnp.exp(lmbda) - 1.0
    if variant.startswith("pace_x"):
        x = 1.0 - 2.0 * (jnp.exp(lmbda * x0) - 1.0) / den
    else:
        x = 1.0 - 2.0 * (jnp.exp(lmbda * (1.0 - x0)) - 1.0) / den
    x = jnp.clip(x, -1.0, 1.0)
    cz = 0.5 * (1.0 + jnp.cos(jnp.pi * x0))
    nto = nradbase + 1
    cheb = [jnp.ones_like(x), x]
    for _ in range(2, nto):
        cheb.append(2.0 * x * cheb[-1] - cheb[-2])
    if variant.startswith("pace"):
        # ML-PACE ace_radial.cpp radbase:
        # g_1 = env, g_n = 0.5 (1 - T_{n-1}(x)) env for n >= 2;
        # pace_mx: x = 2(e^{-lam r/rc} - e^{-lam})/(1 - e^{-lam}) - 1
        # (decreasing 1 -> -1, = -x_v0); pace_px: increasing x_v0
        xs = x if variant == "pace_px" else -x
        chs = [jnp.ones_like(xs), xs]
        for _ in range(2, nto):
            chs.append(2.0 * xs * chs[-1] - chs[-2])
        cols = [jnp.ones_like(xs)]
        for n in range(2, nradbase + 1):
            cols.append(0.5 * (1.0 - chs[n - 1]))
        g = jnp.stack(cols, axis=-1) * cz[..., None]
    elif variant.endswith("_t1"):
        g = jnp.stack(cheb[1:nradbase + 1], axis=-1) * cz[..., None]
    else:
        g = jnp.stack(cheb[:nradbase], axis=-1) * cz[..., None]
    return jnp.where(r[..., None] < rcut[..., None], g, 0.0)


@lru_cache(maxsize=None)
def _hermite_radial_table(rcut, lmbda, nradbase, variant, delta):
    """Cubic-Hermite spline coefficients of the radial basis (host-side).

    Emulates ML-PACE's SplineInterpolator: node values and analytic
    derivatives at spacing `delta`, evaluated per bin as a cubic in
    t = r/delta - n.  Returns (nlut, nradbase, 4) float64 [c0, c1, c2, c3].
    """
    import jax

    nlut = int(np.ceil(rcut / delta)) + 1
    rs = np.arange(nlut + 1) * delta

    def f(rr):
        return chebexpcos_basis(jnp.asarray(rr, jnp.float64),
                                rcut, lmbda, nradbase, variant)

    with jax.ensure_compile_time_eval():
        vals = np.asarray(f(rs))
        dvals = np.asarray(jax.vmap(
            lambda rr: jax.jvp(f, (rr,), (jnp.ones((), jnp.float64),))[1])(
                jnp.asarray(rs, jnp.float64)))
    f0, f1 = vals[:-1], vals[1:]
    d0, d1 = dvals[:-1] * delta, dvals[1:] * delta
    c0 = f0
    c1 = d0
    c2 = -3.0 * f0 - 2.0 * d0 + 3.0 * f1 - d1
    c3 = 2.0 * f0 + d0 - 2.0 * f1 + d1
    return np.stack([c0, c1, c2, c3], axis=-1)


def spline_radial_basis(r, rcuts, lmbdas, bond_idx, nradbase, variant,
                        delta):
    """Spline-table evaluation of g_k(r) with per-bond tables.

    r, bond_idx: (A, K); rcuts/lmbdas: flat per-bond float lists (host).
    """
    dtype = r.dtype
    tables = []
    nlut_max = 0
    for rc, lam in zip(rcuts, lmbdas):
        t = _hermite_radial_table(float(rc), float(lam), nradbase, variant,
                                  float(delta))
        nlut_max = max(nlut_max, t.shape[0])
        tables.append(t)
    T = np.zeros((len(tables), nlut_max) + tables[0].shape[1:])
    for i, t in enumerate(tables):
        T[i, :t.shape[0]] = t
    Tj = jnp.asarray(T, dtype)
    x = r / delta
    n = jnp.clip(jnp.floor(x), 0, nlut_max - 1)
    t = x - n
    c = Tj[bond_idx, n.astype(jnp.int32)]          # (A, K, nradbase, 4)
    tt = t[..., None]
    g = ((c[..., 3] * tt + c[..., 2]) * tt + c[..., 1]) * tt + c[..., 0]
    rcm = jnp.asarray(np.asarray(rcuts), dtype)[bond_idx]
    return jnp.where(r[..., None] < rcm[..., None], g, 0.0)


def _alp_coeffs(lmax):
    """Associated-Legendre recursion coefficients (host)."""
    import math
    coeffs = {}
    for l in range(lmax + 1):
        for m in range(l + 1):
            # normalization for complex Ylm
            nrm = math.sqrt((2 * l + 1) / (4 * math.pi)
                            * math.factorial(l - m) / math.factorial(l + m))
            coeffs[(l, m)] = nrm
    return coeffs


def sph_harm(disp_unit, lmax):
    """Complex spherical harmonics Y_lm for l<=lmax, m=-l..l.

    Returns (yr, yi) lists indexed [l][..., 2l+1] (m = -l..l).
    Built from the standard associated-Legendre recursions (P_ll, P_l+1,l,
    two-term upward recursion) — static unroll, no data-dependent control.
    """
    import math
    x, y, z = disp_unit[..., 0], disp_unit[..., 1], disp_unit[..., 2]
    # cos(theta) = z; e^{i phi} sin(theta) = (x + i y)
    P = {}
    P[(0, 0)] = jnp.ones_like(z)
    for m in range(1, lmax + 1):
        # P_mm(cos t) = (2m-1)!! (-1)^m sin^m t; fold sin^m into (x+iy)^m
        P[(m, m)] = P[(m - 1, m - 1)] * (2 * m - 1)
    for m in range(0, lmax):
        P[(m + 1, m)] = z * (2 * m + 1) * P[(m, m)]
    for m in range(0, lmax + 1):
        for l in range(m + 2, lmax + 1):
            P[(l, m)] = ((2 * l - 1) * z * P[(l - 1, m)]
                         - (l + m - 1) * P[(l - 2, m)]) / (l - m)
    # (x + i y)^m carries the sin^m(theta) e^{i m phi} factor (P above are
    # the sin^m-reduced associated Legendre polynomials)
    expr = [jnp.ones_like(z)]
    expi = [jnp.zeros_like(z)]
    for m in range(1, lmax + 1):
        pr, pi = expr[-1], expi[-1]
        expr.append(pr * x - pi * y)
        expi.append(pr * y + pi * x)

    out_r, out_i = [], []
    for l in range(lmax + 1):
        rs, iss = [], []
        for m in range(0, l + 1):
            nrm = math.sqrt((2 * l + 1) / (4 * math.pi)
                            * math.factorial(l - m) / math.factorial(l + m))
            sign = (-1.0) ** m
            yr = sign * nrm * P[(l, m)] * expr[m]
            yi = sign * nrm * P[(l, m)] * expi[m]
            rs.append(yr)
            iss.append(yi)
        full_r, full_i = [], []
        for m in range(-l, 0):
            # Y_{l,-m} = (-1)^m conj(Y_lm)
            s = (-1.0) ** m
            full_r.append(s * rs[-m])
            full_i.append(-s * iss[-m])
        full_r += rs
        full_i += iss
        out_r.append(jnp.stack(full_r, -1))
        out_i.append(jnp.stack(full_i, -1))
    return out_r, out_i


def ace_atom_descriptors(disp, jelem, mask, ielem, plan: AcePlan):
    """Per-atom ACE descriptors B (A_atoms, nlabels_per_mu0-resolved).

    Returns (A_atoms, nlabels) where each label is only 'live' for atoms
    whose element equals the label's mu0 (others read zero via masking in
    the calculator's one-hot aggregation).
    """
    ar, ai = ace_a_basis(disp, jelem, mask, ielem, plan)
    return ace_b_from_a(ar, ai, plan)


def ace_pair_phi(disp, jelem, mask, ielem, plan: AcePlan):
    """Per-pair basis contributions phi (A_atoms, K, nA) complex pair.

    Column layout matches `plan.a_index` (index 0 is a constant ZERO slot
    here; the A-basis adds the constant 1 after the neighbor sum).
    Radial parameters (rcut, lambda, inner cutoff) are per-bond
    (central element x neighbor element), as in ML-PACE bonds blocks.
    """
    dtype = disp.dtype
    safe = jnp.where(mask[..., None], disp, jnp.array([1.0, 0.0, 0.0], dtype))
    r = jnp.sqrt(jnp.sum(safe * safe, -1))
    unit = safe / r[..., None]
    rcm = jnp.asarray(plan.rcut, dtype)[ielem[:, None], jelem]     # (A, K)
    lamm = jnp.asarray(plan.lmbda, dtype)[ielem[:, None], jelem]
    if plan.spline_delta:
        nt = plan.numtypes
        bond_idx = ielem[:, None] * nt + jelem                     # (A, K)
        rcuts = np.asarray(plan.rcut, float).reshape(-1)
        lams = np.asarray(plan.lmbda, float).reshape(-1)
        g = spline_radial_basis(r, tuple(rcuts), tuple(lams), bond_idx,
                                plan.nradbase, plan.radial,
                                plan.spline_delta)
    else:
        g = chebexpcos_basis(r, rcm, lamm, plan.nradbase, plan.radial)
    rin = jnp.asarray(plan.rcinner, dtype)[ielem[:, None], jelem]
    if np.any(np.asarray(plan.rcinner) > 0.0):
        # ML-PACE distance-type inner cutoff: functions ramp to zero
        # inside [rcut_in - dcut_in, rcut_in]
        din = jnp.asarray(plan.drcinner, dtype)[ielem[:, None], jelem]
        t = jnp.clip((r - (rin - din)) / jnp.maximum(din, 1e-12), 0.0, 1.0)
        fin = 0.5 * (1.0 - jnp.cos(jnp.pi * t))
        g = g * fin[..., None]
    g = g * mask[..., None]
    yr, yi = sph_harm(unit, plan.lmax)
    if plan.ylm == "racah":
        # Racah-normalized C_lm = sqrt(4 pi / (2l+1)) Y_lm
        import math
        yr = [y * math.sqrt(4.0 * math.pi / (2 * l + 1))
              for l, y in enumerate(yr)]
        yi = [y * math.sqrt(4.0 * math.pi / (2 * l + 1))
              for l, y in enumerate(yi)]
    elif plan.ylm == "4pi":
        # ML-PACE normalization: Yhat_lm = sqrt(4 pi) Y_lm (Y00 = 1)
        import math
        s = math.sqrt(4.0 * math.pi)
        yr = [y * s for y in yr]
        yi = [y * s for y in yi]

    nchem = plan.numtypes
    chan = jax.nn.one_hot(jelem, nchem, dtype=dtype)       # (A, K, nchem)
    cols_r = [jnp.zeros(r.shape, dtype)]                   # dummy slot 0
    cols_i = [jnp.zeros(r.shape, dtype)]
    items = sorted({(mu, n, l) for (mu, n, l, m) in plan.a_index})
    for (mu, n, l) in items:
        base = g[..., n - 1] * chan[..., mu]               # (A, K)
        if l < 0:
            # rank-1 radial-base slot: plain g_n, no spherical harmonic
            # (ML-PACE rank-1 convention)
            cols_r.append(base)
            cols_i.append(jnp.zeros(r.shape, dtype))
            continue
        for m in range(-l, l + 1):
            cols_r.append(base * yr[l][..., m + l])
            cols_i.append(base * yi[l][..., m + l])
    return jnp.stack(cols_r, -1), jnp.stack(cols_i, -1)


def ace_a_basis(disp, jelem, mask, ielem, plan: AcePlan):
    """A-basis: (A_atoms, nA) complex pair (index 0 is the constant 1)."""
    phr, phi = ace_pair_phi(disp, jelem, mask, ielem, plan)
    A_r = phr.sum(axis=-2)
    A_i = phi.sum(axis=-2)
    A_r = A_r.at[..., 0].set(1.0)
    return A_r, A_i


def ace_descriptors_with_jacobian(disp, jelem, mask, ielem, plan: AcePlan):
    """Per-atom ACE descriptors and per-pair gradients.

    Returns (B (A, nl), dBdD (A, nl, K, 3)); same contract as the SNAP
    kernel's `descriptors_with_jacobian`.
    """
    f = lambda d: ace_pair_phi(d, jelem, mask, ielem, plan)
    phr, phi = f(disp)
    eye = jnp.eye(3, dtype=disp.dtype)
    tangents = jnp.broadcast_to(eye[:, None, None, :], (3,) + disp.shape)
    J = jax.vmap(lambda t: jax.jvp(f, (disp,), (t,))[1])(tangents)
    Jr, Ji = J                                             # (3, A, K, nA)
    A_r = phr.sum(axis=-2).at[..., 0].set(1.0)
    A_i = phi.sum(axis=-2)
    B, dBdA = ace_b_and_dbda(A_r, A_i, plan)               # (A,nl),(A,nl,2nA)
    nA = plan.nA
    Jp = jnp.concatenate([Jr, Ji], -1)                     # (3, A, K, 2nA)
    dBdD = jnp.einsum("alp,cakp->alkc", dBdA, Jp)
    # a label belongs to its central element mu0
    live = (jnp.asarray(plan.t_mu0)[None, :] == ielem[:, None])
    B = B * live
    dBdD = dBdD * live[:, :, None, None]
    return B, dBdD


def ace_b_from_a(A_r, A_i, plan: AcePlan):
    """Multilinear product contraction: A -> B (A_atoms, nlabels), real."""
    dtype = A_r.dtype
    fact = jnp.asarray(plan.t_fact)                        # (nterms, R)
    pr = A_r[..., fact]                                    # (A, nterms, R)
    pi = A_i[..., fact]
    cr = pr[..., 0]
    ci = pi[..., 0]
    for rr in range(1, plan.rank_max):
        nr = cr * pr[..., rr] - ci * pi[..., rr]
        ni = cr * pi[..., rr] + ci * pr[..., rr]
        cr, ci = nr, ni
    mm = jnp.asarray(plan.mmat, dtype)
    return cr @ mm                                         # imaginary sums ~0


def ace_b_and_dbda(A_r, A_i, plan: AcePlan):
    """B and its analytic jacobian dB/dA via leave-one-out products.

    Returns (B (A, nlabels), dBdA (A, nlabels, 2*nA)) with the real/imag A
    layout [Ar | Ai].  Prefix/suffix complex products give the per-slot
    cofactors; aggregation into (label, A-index) buckets is a segment-sum
    with static sorted-by-label ids.
    """
    dtype = A_r.dtype
    nbatch = A_r.shape[:-1]
    fact = jnp.asarray(plan.t_fact)                        # (T, R)
    R = plan.rank_max
    T = fact.shape[0]
    nA = plan.nA
    nl = len(plan.labels)
    pr = A_r[..., fact]
    pi = A_i[..., fact]
    # prefix[..., r] = prod_{r'<r}, suffix[..., r] = prod_{r'>r}
    pre_r = [jnp.ones(nbatch + (T,), dtype)]
    pre_i = [jnp.zeros(nbatch + (T,), dtype)]
    for rr in range(1, R):
        ar, ai = pre_r[-1], pre_i[-1]
        pre_r.append(ar * pr[..., rr - 1] - ai * pi[..., rr - 1])
        pre_i.append(ar * pi[..., rr - 1] + ai * pr[..., rr - 1])
    suf_r = [jnp.ones(nbatch + (T,), dtype)]
    suf_i = [jnp.zeros(nbatch + (T,), dtype)]
    for rr in range(R - 2, -1, -1):
        ar, ai = suf_r[0], suf_i[0]
        suf_r.insert(0, ar * pr[..., rr + 1] - ai * pi[..., rr + 1])
        suf_i.insert(0, ar * pi[..., rr + 1] + ai * pr[..., rr + 1])
    B_r = pre_r[-1] * pr[..., R - 1] - pre_i[-1] * pi[..., R - 1]
    mm = jnp.asarray(plan.mmat, dtype)
    B = B_r @ mm

    # cofactor per slot: dprod/dA[f_{t,r}] = prefix * suffix (complex)
    coef = jnp.asarray(plan.t_coef, dtype)
    lbl = jnp.asarray(plan.t_label.astype(np.int64))
    seg = (lbl[:, None] * nA + fact).reshape(-1)           # (T*R,)
    out_shape = nbatch + (nl * nA,)
    loo_r = jnp.stack([coef * (pre_r[rr] * suf_r[rr] - pre_i[rr] * suf_i[rr])
                       for rr in range(R)], -1)            # (.., T, R)
    loo_i = jnp.stack([coef * (pre_r[rr] * suf_i[rr] + pre_i[rr] * suf_r[rr])
                       for rr in range(R)], -1)
    flat_r = loo_r.reshape(nbatch + (T * R,))
    flat_i = loo_i.reshape(nbatch + (T * R,))
    # d Re[c * prod] / dA_r = Re[cofactor], / dA_i = -Im[cofactor]
    dBdAr = jax.vmap(lambda v: jax.ops.segment_sum(v, seg, nl * nA))(
        flat_r.reshape((-1, T * R))).reshape(out_shape)
    dBdAi = jax.vmap(lambda v: jax.ops.segment_sum(v, seg, nl * nA))(
        (-flat_i).reshape((-1, T * R))).reshape(out_shape)
    dBdA = jnp.concatenate(
        [dBdAr.reshape(nbatch + (nl, nA)),
         dBdAi.reshape(nbatch + (nl, nA))], -1)
    return B, dBdA
