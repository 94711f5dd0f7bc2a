"""Reference-potential (ZBL) tests: formula values, FD force consistency,
and truth parity against the committed `Truth-Ref.npy`."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fitsnap_tpu.ops.refpot import (_e_zbl_np, build_zbl, parse_reference,
                                    reference_eav, zbl_pair_energy)
from tests.util import TA_EXAMPLE


def test_zbl_switching_boundary():
    """Energy and first derivative vanish at the outer cutoff."""
    p = build_zbl(4.0, 4.8, {(0, 0): (73.0, 73.0)}, 1)
    r = jnp.array([4.8 - 1e-9])
    ti = tj = jnp.array([0])
    e = zbl_pair_energy(r, ti, tj, p)
    assert abs(float(e[0])) < 1e-10
    g = jax.grad(lambda rr: zbl_pair_energy(rr, ti, tj, p).sum())(r)
    assert abs(float(g[0])) < 1e-6


def test_zbl_continuity_at_inner():
    p = build_zbl(4.0, 4.8, {(0, 0): (73.0, 73.0)}, 1)
    ti = tj = jnp.array([0])
    lo = float(zbl_pair_energy(jnp.array([4.0 - 1e-10]), ti, tj, p)[0])
    hi = float(zbl_pair_energy(jnp.array([4.0 + 1e-10]), ti, tj, p)[0])
    assert abs(lo - hi) < 1e-8


def test_zbl_short_range_value():
    """At short range the bare screened-Coulomb dominates (sw5 is a small
    constant shift)."""
    p = build_zbl(4.0, 4.8, {(0, 0): (73.0, 73.0)}, 1)
    ti = tj = jnp.array([0])
    e = float(zbl_pair_energy(jnp.array([1.5]), ti, tj, p)[0])
    bare = _e_zbl_np(1.5, 73.0, 73.0)
    assert abs(e - (bare + p.sw5[0, 0])) < 1e-12


def test_force_is_energy_gradient():
    """reference_eav forces match finite differences of the energy."""

    class Sec:
        lmp_pairdecl = ["pair_style zbl 2.0 4.8", "pair_coeff * * 73 73"]

    spec = parse_reference(Sec(), 1)
    rng = np.random.default_rng(0)
    N, K = 5, 4
    pos = rng.uniform(0, 6, (N, 3))

    def build(pos):
        disp = np.zeros((N, K, 3))
        jidx = np.zeros((N, K), np.int32)
        mask = np.zeros((N, K), bool)
        for i in range(N):
            k = 0
            for j in range(N):
                if i != j and k < K:
                    disp[i, k] = pos[j] - pos[i]
                    jidx[i, k] = j
                    mask[i, k] = True
                    k += 1
        return jnp.asarray(disp), jnp.asarray(jidx), jnp.asarray(mask)

    types = jnp.zeros((N,), int)
    disp, jidx, mask = build(pos)
    e0, f, _ = reference_eav(disp, jidx, mask, types, N, spec)
    h = 1e-6
    for a in [0, 2]:
        for c in range(3):
            pp = pos.copy()
            pp[a, c] += h
            ep, _, _ = reference_eav(*build(pp), types, N, spec)
            pm = pos.copy()
            pm[a, c] -= h
            em, _, _ = reference_eav(*build(pm), types, N, spec)
            fd = -(float(ep) - float(em)) / (2 * h)
            assert abs(fd - float(f[a, c])) < 1e-5


@pytest.mark.skipif(not TA_EXAMPLE.exists(), reason="no reference examples")
def test_truth_parity_one_config():
    """b = (E_truth - E_zbl)/N for one Ta config matches Truth-Ref.npy."""
    import json
    from fitsnap_tpu.ops.neighbors import host_neighbors
    from tests.util import load_config_normalized

    cfg = load_config_normalized(TA_EXAMPLE / "JSON/Displaced_A15/A15_1.json")
    with open(TA_EXAMPLE / "JSON/Displaced_A15/A15_1.json") as f:
        f.readline()
        raw = json.loads(f.read())["Dataset"]["Data"][0]

    class Sec:
        lmp_pairdecl = ["pair_style hybrid/overlay zero 10.0 zbl 4.0 4.8",
                        "pair_coeff * * zero", "pair_coeff * * zbl 73 73"]

    spec = parse_reference(Sec(), 1)
    pos, cell = cfg["Positions"], cfg["CellCols"]
    N = len(pos)
    disp, jidx, mask, _ = host_neighbors(pos, cell, N, 4.8)
    types = jnp.zeros((N,), int)
    e, _, _ = reference_eav(jnp.asarray(disp), jnp.asarray(jidx),
                            jnp.asarray(mask), types, N, spec)
    b_mine = (raw["Energy"] - float(e)) / N
    T = np.load(TA_EXAMPLE / "20May21_Standard/Truth-Ref.npy")
    # energy truths are the first 363 rows (grouped layout)
    assert np.abs(T[:363] - b_mine).min() < 1e-10


def test_coul_cut_energy_forces_and_charge_plumbing():
    """`pair_style coul/cut` (reference feeds per-atom Charges to LAMMPS,
    `calculators/lammps_base.py:225-229`): bare Coulomb inside rc, forces
    from autodiff match the analytic pair force, and a missing Charges key
    errors loudly instead of silently dropping the data."""
    from fitsnap_tpu.ops.refpot import _QQR2E

    class Sec:
        lmp_pairdecl = ["pair_style coul/cut 5.0"]

    spec = parse_reference(Sec(), 1)
    assert spec.coul is not None and spec.coul.rc == 5.0
    # two atoms, one directed pair each way
    r = 2.5
    disp = jnp.asarray([[[r, 0.0, 0.0]], [[-r, 0.0, 0.0]]])
    jidx = jnp.asarray([[1], [0]])
    mask = jnp.ones((2, 1), bool)
    types = jnp.zeros((2,), int)
    q = jnp.asarray([0.8, -0.5])
    e, f, _ = reference_eav(disp, jidx, mask, types, 2, spec, charges=q)
    assert abs(float(e) - _QQR2E * 0.8 * (-0.5) / r) < 1e-12
    # attractive: force on atom 0 points toward atom 1 (+x)
    fx = _QQR2E * 0.8 * 0.5 / r ** 2
    np.testing.assert_allclose(np.asarray(f),
                               [[fx, 0, 0], [-fx, 0, 0]], atol=1e-12)
    # outside the cutoff: zero
    disp6 = disp * (6.0 / r)
    e6, _, _ = reference_eav(disp6, jidx, mask, types, 2, spec, charges=q)
    assert float(e6) == 0.0
    # loud failure without charges
    with pytest.raises(ValueError, match="[Cc]harge"):
        reference_eav(disp, jidx, mask, types, 2, spec)


def test_coul_cut_pack_requires_charges():
    """The SNAP calculator pack step raises on missing Charges when the
    REFERENCE section declares coul/cut."""
    if not TA_EXAMPLE.exists():
        pytest.skip("no reference examples")
    from fitsnap_tpu.calculators.snap import SnapCalculator
    from fitsnap_tpu.config import Config
    cfg = Config(str(TA_EXAMPLE / "Ta-example.in"), arglist=["--overwrite"])
    ref = cfg.sections["REFERENCE"]
    ref.lmp_pairdecl = ["pair_style coul/cut 5.0"]
    calc = SnapCalculator("SNAP", cfg)
    data = {"Positions": np.zeros((2, 3)), "Lattice": np.eye(3) * 10,
            "AtomTypes": ["Ta", "Ta"], "NumAtoms": 2, "File": "t"}
    with pytest.raises(ValueError, match="Charges"):
        calc._pack(data)
    data["Charges"] = np.array([[0.1], [-0.1]])
    pc = calc._pack(data)
    np.testing.assert_allclose(pc.charges, [0.1, -0.1])
