"""Reference-basis ACE generation parity vs the committed standard.

The Ta_PACE standard ships the exact ctilde function table FitSNAP fed to
LAMMPS (`17Oct22_Standard/coupling_coefficients.yace`).  These tests assert
our native generator (`ops/ace_ref_basis.py`) reproduces it exactly: label
set, label order, and every coupling coefficient.
"""

import re

import numpy as np
import pytest

from tests.util import REFERENCE

STD = REFERENCE / "examples/Ta_PACE/17Oct22_Standard"

pytestmark = pytest.mark.skipif(not STD.exists(),
                                reason="reference standard not available")


def _std_functions():
    import yaml

    txt = (STD / "coupling_coefficients.yace").read_text()
    txt = re.sub(r"^(\s+)(\[[\d,\s]+\]):", r'\1"\2":', txt, flags=re.M)
    return yaml.safe_load(txt)["functions"][0]


class _Sec:
    numtypes = 1
    ranks = [1, 2, 3, 4, 5, 6]
    lmax = [1, 2, 2, 2, 1, 1]
    nmax = [22, 2, 2, 2, 1, 1]
    lmin = [1, 1, 1, 1, 1, 1]
    b_basis = "minsub"


def test_label_set_and_order_matches_standard():
    from fitsnap_tpu.ops.ace_ref_basis import reference_labels_and_terms

    std = _std_functions()
    labels, _ = reference_labels_and_terms(_Sec())
    assert len(labels) == len(std) == 68
    for i, f in enumerate(std):
        mu0, mus, ns, ls, Ls = labels[i]
        assert (list(mus), list(ns), list(ls)) == \
            (f["mus"], f["ns"], f["ls"]), f"label {i}"


def test_ctilde_tables_match_standard():
    from fitsnap_tpu.ops.ace_ref_basis import reference_labels_and_terms

    std = _std_functions()
    _, terms = reference_labels_and_terms(_Sec())
    for i, f in enumerate(std):
        r = f["rank"]
        ms = [int(x) for x in f["ms_combs"]]
        cts = [float(x) for x in f["ctildes"]]
        smap = {tuple(ms[k * r:(k + 1) * r]): cts[k]
                for k in range(len(cts))}
        omap = terms[i]
        keys = set(smap) | set(omap)
        diff = max(abs(smap.get(k, 0.0) - omap.get(k, 0.0)) for k in keys)
        assert diff < 1e-12, f"function {i}: ctilde diff {diff}"


INP_STD = REFERENCE / "examples/InP_PACE/ref19Sep2023"


@pytest.mark.skipif(not INP_STD.exists(),
                    reason="InP_PACE standard not available")
def test_inp_pa_tabulated_labels_and_ctildes():
    """2-element pa_tabulated basis vs the InP_PACE standard: 173 labels
    per central element in reference order, exact coupling tables."""
    import yaml

    from fitsnap_tpu.ops.ace_ref_basis import reference_labels_and_terms

    txt = (INP_STD / "coupling_coefficients.yace").read_text()
    txt = re.sub(r"^(\s+)(\[[\d,\s]+\]):", r'\1"\2":', txt, flags=re.M)
    doc = yaml.safe_load(txt)

    class Sec:
        numtypes = 2
        ranks = [1, 2, 3, 4]
        lmax = [1, 2, 2, 1]
        nmax = [22, 3, 2, 1]
        lmin = [0, 0, 1, 1]
        b_basis = "pa_tabulated"

    labels, terms = reference_labels_and_terms(Sec())
    offset = 0
    for mu0 in (0, 1):
        std = doc["functions"][mu0]
        ours = [lab for lab in labels if lab[0] == mu0]
        assert len(ours) == len(std) == 173
        for i, f in enumerate(std):
            _, mus, ns, ls, _ = ours[i]
            assert (list(mus), list(ns), list(ls)) == \
                (f["mus"], f["ns"], f["ls"]), f"mu0={mu0} label {i}"
            r = f["rank"]
            ms = [int(x) for x in f["ms_combs"]]
            cts = [float(x) for x in f["ctildes"]]
            smap = {tuple(ms[k * r:(k + 1) * r]): cts[k]
                    for k in range(len(cts))}
            omap = terms[offset + i]
            keys = set(smap) | set(omap)
            diff = max(abs(smap.get(k, 0.0) - omap.get(k, 0.0))
                       for k in keys)
            assert diff < 1e-12, f"mu0={mu0} fn {i}: diff {diff}"
        offset += len(std)


def test_wigner_3j_orthogonality():
    from fitsnap_tpu.ops.ace_ref_basis import wigner_3j

    # sum_m3 (2 l3 + 1) 3j(l1 m1 l2 m2 l3 m3)^2 over l3 = 1
    l1, l2 = 2, 3
    for m1 in range(-l1, l1 + 1):
        for m2 in range(-l2, l2 + 1):
            total = sum((2 * l3 + 1) * wigner_3j(l1, m1, l2, m2,
                                                 l3, -(m1 + m2)) ** 2
                        for l3 in range(abs(l1 - l2), l1 + l2 + 1))
            assert abs(total - 1.0) < 1e-12


def _read_acecoeff(path):
    vals = []
    for ln in path.read_text().splitlines():
        s = ln.strip()
        if not s or s.startswith("#"):
            continue
        p = s.split()
        if len(p) >= 2 and p[0].isdigit() and p[1].isdigit():
            continue
        try:
            vals.append(float(p[0]))
        except ValueError:
            pass
    return np.asarray(vals)


@pytest.mark.heavy
def test_ta_pace_golden_fit(tmp_path, monkeypatch):
    """End-to-end Ta_PACE golden fit vs the committed standard.

    The reference CI asserts <0.1% coefficient parity
    (`tests/example_checker.py:74`) — but that oracle certifies
    implementation bit-similarity, not correctness: the weighted design
    matrix has cond ~1e16 (smin at the f64 noise floor), and refitting
    after a 1e-10 RELATIVE perturbation of A changes betas by ~700%.
    Reproducing it across CI platforms is only possible because both runs
    call the same C++ ML-PACE binary.  For an independent implementation
    the defensible oracles are:

      1. fit-quality parity: unweighted E/F MAE vs the standard's
         committed `Ta_metrics.md` (0.0383091 / 0.169269);
      2. betas within 1% (ours land at 0.55% max / 0.022% median — three
         orders below the 1e-10-noise sensitivity);
      3. the beta deviation lies entirely in the near-null subspace
         (right singular directions with sigma <= 1e-8 * smax), i.e. in
         directions the training data does not determine.
    """
    monkeypatch.chdir(tmp_path)
    from fitsnap_tpu.fitsnap import FitSnap

    infile = tmp_path / "Ta.in"
    txt = (REFERENCE / "examples/Ta_PACE/Ta.in").read_text()
    txt = txt.replace("dataPath = ../Ta_Linear_JCP2014/JSON",
                      f"dataPath = {REFERENCE}/examples/Ta_Linear_JCP2014/JSON")
    infile.write_text(txt)
    fs = FitSnap(str(infile), arglist=["--overwrite"])
    fs.scrape_configs()
    fs.process_configs()
    fs.perform_fit()
    fit = np.asarray(fs.solver.fit)
    std = _read_acecoeff(STD / "Ta_pot.acecoeff")
    assert fit.shape == std.shape

    # (1) fit-quality parity vs the committed metrics table
    err = fs.solver.errors
    e_mae = float(err.loc[("*ALL", "Unweighted", "Training", "Energy"),
                          "mae"])
    f_mae = float(err.loc[("*ALL", "Unweighted", "Training", "Force"),
                          "mae"])
    assert abs(e_mae - 0.0383091) < 5e-5, e_mae
    assert abs(f_mae - 0.169269) < 5e-4, f_mae

    # (2) coefficient closeness
    rel = np.abs(fit - std) / np.maximum(np.abs(std), 1e-10)
    assert rel.max() < 1e-2, f"max rel diff {rel.max():.4%}"

    # (3) the deviation is confined to the near-null subspace
    aw = fs.w[:, None] * fs.a
    _, S, Vt = np.linalg.svd(aw, full_matrices=False)
    small = S <= 1e-8 * S[0]
    assert small.sum() >= 1
    delta = fit - std
    frac = np.linalg.norm(Vt[small] @ delta) / np.linalg.norm(delta)
    assert frac > 0.99, f"only {frac:.3f} of the deviation is null-space"


def _run_pace_variant(tmp_path, example):
    from fitsnap_tpu.fitsnap import FitSnap

    txt = (REFERENCE / f"examples/{example}/Ta.in").read_text()
    txt = txt.replace("dataPath = ../Ta_Linear_JCP2014/JSON",
                      f"dataPath = {REFERENCE}/examples/Ta_Linear_JCP2014/JSON")
    infile = tmp_path / "Ta.in"
    infile.write_text(txt)
    fs = FitSnap(str(infile), arglist=["--overwrite"])
    fs.scrape_configs()
    fs.process_configs()
    fs.perform_fit()
    return fs


def _all_metrics(fs):
    err = fs.solver.errors
    return {k: float(err.loc[("*ALL", "Unweighted", "Training", k), "mae"])
            for k in ("Energy", "Force")}


@pytest.mark.slow
def test_ta_pace_ridge_acceptance(tmp_path, monkeypatch):
    """Ta_PACE_RIDGE acceptance (SURVEY §7.8) vs `30Mar23_RIDGE`.

    NOTE the committed standard predates a sym_ACE change in the
    reference: its rank-4 label carries intermediates L=(2,2) while the
    reference's CURRENT `pa_labels_raw(4, 1, 1, 1, lmin=1)` emits L=(0,0)
    (verified by running it) — which is what this repo generates, matching
    the current code 140/141 labels exactly.  The defensible oracle is
    therefore fit quality vs the standard's committed metrics table, not
    coefficient identity.
    """
    monkeypatch.chdir(tmp_path)
    fs = _run_pace_variant(tmp_path, "Ta_PACE_RIDGE")
    assert len(np.asarray(fs.solver.fit)) == 142
    m = _all_metrics(fs)
    assert abs(m["Energy"] - 0.0549201) < 5e-4, m
    assert abs(m["Force"] - 0.0664154) < 5e-4, m


@pytest.mark.slow
def test_ta_pace_ard_acceptance(tmp_path, monkeypatch):
    """Ta_PACE_ARD acceptance vs `29Mar23_ARD` metrics.

    ARD's sparse support depends on the pruning schedule; this repo's own
    sequential-SBL implementation selects a different (comparable-quality)
    support than sklearn's ARDRegression, so the oracle is fit quality
    within 10% of the standard's committed MAEs.
    """
    monkeypatch.chdir(tmp_path)
    fs = _run_pace_variant(tmp_path, "Ta_PACE_ARD")
    fit = np.asarray(fs.solver.fit)
    assert len(fit) == 142
    assert 20 < (np.abs(fit) > 1e-12).sum() < 142   # genuinely sparse
    m = _all_metrics(fs)
    assert abs(m["Energy"] - 0.0292314) / 0.0292314 < 0.10, m
    assert abs(m["Force"] - 0.0598852) / 0.0598852 < 0.10, m


# ---------------------------------------------------------------------------
# rank 7/8 coupling trees
#
# The reference's own rank-8 tree code crashes on an undefined variable
# (lib/sym_ACE/wigner_couple.py rank_8_tree uses M6 before assignment), so
# there is no output oracle for these ranks.  The mathematical ground truth
# is used instead: a valid scalar (L_R=0) coupling makes the contraction
#   B = sum_m c_m * prod_i A_{l_i m_i},   A_{lm} = sum_j Y_lm(r_j)
# exactly invariant under global rotations of the point set, and couplings
# with different intermediate-L tuples are mutually orthogonal.  The harness
# itself is validated at rank 6, whose couplings ARE parity-checked against
# the shipped .yace standard above.
# ---------------------------------------------------------------------------

def _A_moments(lset, vecs):
    """{l: {m: sum_j Y_lm(r_j)}} with scipy's Y_lm convention."""
    from scipy.special import sph_harm_y

    r = np.linalg.norm(vecs, axis=1)
    theta = np.arccos(vecs[:, 2] / r)
    phi = np.arctan2(vecs[:, 1], vecs[:, 0])
    return {l: {m: complex(sph_harm_y(l, m, theta, phi).sum())
                for m in range(-l, l + 1)} for l in lset}


def _contract(l, terms, vecs):
    A = _A_moments(set(l), vecs)
    tot = 0.0 + 0.0j
    for mvec, c in terms.items():
        prod = c
        for li, mi in zip(l, mvec):
            prod *= A[li][mi]
        tot += prod
    return tot


@pytest.mark.parametrize("l", [
    (1, 1, 1, 1, 1, 1),          # rank-6 harness check (yace-validated rank)
    (1, 1, 1, 1, 1, 1, 2),       # rank 7 (sum(l) even, as the label
    (1, 1, 1, 2, 2, 1, 2),       # rank 7, mixed    generator's parity filter)
    (1, 1, 1, 1, 1, 1, 1, 1),    # rank 8, uniform
    (1, 2, 1, 1, 2, 1, 2, 2),    # rank 8, mixed
])
def test_high_rank_coupling_rotational_invariance(l):
    from scipy.spatial.transform import Rotation

    from fitsnap_tpu.ops.ace_ref_basis import tree_coupling, tree_l_inters

    rng = np.random.default_rng(len(l) * 1000 + sum(l))
    vecs = rng.normal(size=(6, 3))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    inters = tree_l_inters(list(l), L_R=0)
    assert inters, f"no valid intermediates for l={l}"
    checked = 0
    for inter in inters:
        if checked >= 4:
            break
        terms = tree_coupling(list(l), inter)
        if not terms:
            continue
        b0 = _contract(l, terms, vecs)
        if abs(b0) < 1e-10:
            # couplings antisymmetric under a same-l pair swap contract to
            # an identically-zero B on symmetric A-products — skip those
            continue
        checked += 1
        for seed in (1, 2):
            R = Rotation.random(random_state=seed).as_matrix()
            b1 = _contract(l, terms, vecs @ R.T)
            assert abs(b1 - b0) < 1e-9 * max(1.0, abs(b0)), \
                f"l={l} inter={inter}: {b0} -> {b1}"
    assert checked >= 2


@pytest.mark.parametrize("l", [
    (1, 1, 1, 1, 1, 1),
    (1, 1, 1, 1, 1, 1, 1),
    (1, 1, 1, 1, 1, 1, 1, 1),
])
def test_high_rank_coupling_orthogonality(l):
    """Couplings with distinct intermediate-L tuples are orthogonal vectors
    in m-space — the defining property of the recoupling-tree basis."""
    from fitsnap_tpu.ops.ace_ref_basis import tree_coupling, tree_l_inters

    inters = [i for i in tree_l_inters(list(l), L_R=0)]
    tables = [(i, tree_coupling(list(l), i)) for i in inters]
    tables = [(i, t) for i, t in tables if t]
    assert len(tables) >= 2
    for a in range(len(tables)):
        ia, ta = tables[a]
        na = sum(v * v for v in ta.values())
        assert na > 1e-12
        for b in range(a + 1, len(tables)):
            ib, tb = tables[b]
            dot = sum(ta[k] * tb.get(k, 0.0) for k in ta)
            nb = sum(v * v for v in tb.values())
            assert abs(dot) < 1e-10 * (na * nb) ** 0.5, \
                f"l={l}: inters {ia} and {ib} not orthogonal ({dot})"


def test_rank7_rank8_minsub_labels_flow():
    """pa_labels (minsub) produces labels at ranks 7-8 and every label's
    coupling table is non-empty — the generator surface the reference
    advertises (ACE section accepts ranks to 8) but cannot deliver."""
    from fitsnap_tpu.ops.ace_ref_basis import pa_labels, tree_coupling

    for rank, lmax in ((7, 2), (8, 1)):   # rank-7 all-ones is parity-odd
        labs = pa_labels(rank, nmax=1, lmax=lmax, mumax=1, lmin=1)
        assert labs, f"no rank-{rank} labels"
        for mus, ns, ls, Ls in labs[:3]:
            assert len(ls) == rank and len(Ls) == {7: 5, 8: 6}[rank]
            assert tree_coupling(list(ls), tuple(Ls))


def test_plan_from_yace_roundtrip():
    from fitsnap_tpu.ops.ace import plan_from_yace, plan_terms

    plan = plan_from_yace(str(STD / "coupling_coefficients.yace"))
    assert len(plan.labels) == 68
    std = _std_functions()
    terms = plan_terms(plan)
    for i, f in enumerate(std):
        r = f["rank"]
        ms = [int(x) for x in f["ms_combs"]]
        cts = [float(x) for x in f["ctildes"]]
        smap = {tuple(ms[k * r:(k + 1) * r]): cts[k]
                for k in range(len(cts))}
        keys = set(smap) | set(terms[i])
        diff = max(abs(smap.get(k, 0.0) - terms[i].get(k, 0.0))
                   for k in keys)
        assert diff < 1e-12
