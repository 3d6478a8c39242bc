"""Blocked-Kronecker joint operator == sorted COO/ELL operator, exactly.

The blocked-Kron matvec (models/joint_kron.py) is the TPU-native
superc/nonsu2 Hamiltonian; its dense matrix, conjugated by the
sorted<->blocked permutation, must reproduce build_joint_sector_op's dense
matrix for every term class: pairing (Δ bath, deltasc, anomalous Hloc,
pair field), spin-flips (SOC blocks, in-plane fields, u-hybridization),
Jx/Jp, replica Nambu baths, phonons, sundry operators."""
import numpy as np
import jax.numpy as jnp
import pytest

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.models.joint import build_joint_sector_op
from edipack_tpu.models.joint_kron import build_joint_kron_op
from edipack_tpu.sectors import SectorTable
from edipack_tpu.umatrix import build_umatrix


def _hloc(cfg, soc=False):
    rng = np.random.default_rng(11)
    h = np.zeros((cfg.nspin, cfg.nspin, cfg.norb, cfg.norb), complex)
    m = rng.normal(size=(cfg.norb, cfg.norb))
    for s in range(cfg.nspin):
        h[s, s] = (m + m.T) / 2
    if soc and cfg.nspin == 2:
        b = 0.1 * rng.normal(size=(cfg.norb, cfg.norb)) \
            + 0.1j * rng.normal(size=(cfg.norb, cfg.norb))
        h[0, 1] = b
        h[1, 0] = b.conj().T
    return h


def _compare(cfg, qn, hloc=None, hloc_anomalous=None):
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    table = SectorTable(cfg)
    sec = table.by_qn(qn)
    if hloc is None:
        hloc = _hloc(cfg, soc=(cfg.ed_mode == "nonsu2"))
    ref = build_joint_sector_op(cfg, sec, hloc, um, bath,
                                hloc_anomalous=hloc_anomalous)
    dense_ref = np.asarray(ref.to_dense())
    kr = build_joint_kron_op(cfg, sec, hloc, um, bath,
                             hloc_anomalous=hloc_anomalous)
    dense_blk = kr.to_dense()
    # conjugate by the sorted<->blocked permutation
    order = np.asarray(kr._order)
    P = np.zeros((kr.dim_el, kr.dim_el))
    P[np.arange(kr.dim_el), order] = 1.0   # sorted <- blocked
    dp = kr.dim_ph
    Pfull = np.kron(np.eye(dp), P)
    dev = np.abs(Pfull @ dense_blk @ Pfull.T - dense_ref).max()
    assert dev < 1e-10, dev
    # layout round-trip
    rng = np.random.default_rng(0)
    v = rng.normal(size=kr.dim) + 1j * rng.normal(size=kr.dim)
    vi = kr.to_internal_flat(jnp.asarray(v))
    back = np.asarray(kr.from_internal_flat(vi))
    np.testing.assert_allclose(back, v, atol=1e-12)
    return kr


def test_superc_pairing_and_jxjp():
    cfg = default_config(norb=2, nbath=2, nspin=1, ed_mode="superc",
                         uloc=[-1.3, -1.1], ust=0.4, jh=0.2, jx=0.15,
                         jp=0.12, deltasc=0.1, xmu=0.2,
                         pair_field=[0.05, 0.03])
    _compare(cfg, ("sz", 0))
    _compare(cfg, ("sz", -1))
    _compare(cfg, ("sz", 2))


def test_superc_anomalous_hloc_and_hybrid_bath():
    cfg = default_config(norb=2, nbath=3, nspin=1, ed_mode="superc",
                         bath_type="hybrid", uloc=[-1.0, -0.8],
                         deltasc=0.07, xmu=-0.1)
    ha = np.array([[0.08, 0.03], [0.03, -0.05]], complex)
    _compare(cfg, ("sz", 1), hloc_anomalous=ha)


def test_superc_replica_nambu():
    from edipack_tpu.bath.user import ed_set_hreplica, clear_global_basis
    cfg = default_config(norb=1, nbath=2, nspin=1, ed_mode="superc",
                         bath_type="replica", uloc=[-1.5], deltasc=0.0)
    # Nambu basis: identity (levels) + tau_x (pairing)
    ops = np.zeros((2, 2, 2, 1, 1), complex)
    ops[0, 0, 0] = 1.0
    ops[0, 1, 1] = -1.0
    ops[1, 0, 1] = 1.0
    ops[1, 1, 0] = 1.0
    lam = np.array([[0.5, 0.2], [-0.4, 0.3]])
    basis = ed_set_hreplica(ops, lam)
    try:
        um = build_umatrix(cfg)
        bath = init_bath(cfg, basis=basis)
        table = SectorTable(cfg)
        sec = table.by_qn(("sz", 0))
        hloc = np.zeros((1, 1, 1, 1))
        ref = np.asarray(build_joint_sector_op(cfg, sec, hloc, um,
                                               bath).to_dense())
        kr = build_joint_kron_op(cfg, sec, hloc, um, bath)
        order = np.asarray(kr._order)
        P = np.zeros((kr.dim_el, kr.dim_el))
        P[np.arange(kr.dim_el), order] = 1.0
        dev = np.abs(P @ kr.to_dense() @ P.T - ref).max()
        assert dev < 1e-10, dev
    finally:
        clear_global_basis()


def test_nonsu2_soc_fields_uhyb():
    cfg = default_config(norb=2, nbath=2, nspin=2, ed_mode="nonsu2",
                         uloc=[1.6, 1.4], ust=0.6, jh=0.25, jx=0.25, jp=0.25,
                         spin_field_x=[0.11, 0.07], spin_field_y=[0.05, 0.0],
                         spin_field_z=[0.04, -0.03], xmu=0.3)
    _compare(cfg, ("nt", 4))
    _compare(cfg, ("nt", 3))


def test_nonsu2_exc_field_and_sundry():
    from edipack_tpu.umatrix import make_term
    cfg = default_config(norb=2, nbath=1, nspin=2, ed_mode="nonsu2",
                         uloc=[1.0, 1.0], exc_field=[0.06, 0.04, 0.03, 0.02])
    um = build_umatrix(cfg, runtime_terms=[
        make_term(1, "u", 2, "d", 1, "u", 2, "d", 0.3),
        make_term(1, "u", 2, "d", 2, "u", 1, "d", 0.15),
    ])
    bath = init_bath(cfg)
    table = SectorTable(cfg)
    sec = table.by_qn(("nt", 3))
    hloc = _hloc(cfg, soc=True)
    ref = np.asarray(build_joint_sector_op(cfg, sec, hloc, um,
                                           bath).to_dense())
    kr = build_joint_kron_op(cfg, sec, hloc, um, bath)
    order = np.asarray(kr._order)
    P = np.zeros((kr.dim_el, kr.dim_el))
    P[np.arange(kr.dim_el), order] = 1.0
    dev = np.abs(P @ kr.to_dense() @ P.T - ref).max()
    assert dev < 1e-10, dev


def test_superc_phonons():
    cfg = default_config(norb=2, nbath=1, nspin=1, ed_mode="superc",
                         uloc=[-1.2, -1.0], deltasc=0.09, nph=2,
                         g_ph=[0.25, 0.2], w0_ph=0.6)
    _compare(cfg, ("sz", 0))


@pytest.mark.parametrize("mode,kw", [
    ("superc", dict(nspin=1, uloc=[-1.4, -1.1], ust=0.3, deltasc=0.1,
                    xmu=0.2)),
    ("nonsu2", dict(nspin=2, uloc=[1.5, 1.3], ust=0.5, jh=0.2, jx=0.2,
                    jp=0.2, spin_field_x=[0.1, 0.05], xmu=0.4)),
])
def test_solve_with_blocked_kron_matches_ell(mode, kw):
    """Full solve through the blocked-Kron matvec == padded-ELL solve."""
    from edipack_tpu.solver.core import solve_impurity
    base = dict(norb=2, nbath=2, ed_mode=mode, beta=50.0, lmats=12,
                ed_verbose=0, lanc_dim_threshold=32, **kw)
    hloc = _hloc(default_config(**base), soc=(mode == "nonsu2"))
    res = {}
    for jk in ("never", "always"):
        cfg = default_config(**base, ed_joint_kron=jk)
        um = build_umatrix(cfg)
        bath = init_bath(cfg)
        res[jk] = solve_impurity(cfg, hloc, um, bath)
    a, b = res["never"], res["always"]
    assert abs(a.e0 - b.e0) < 1e-9, (a.e0, b.e0)
    np.testing.assert_allclose(np.asarray(a.dens), np.asarray(b.dens),
                               atol=1e-8)
    z = 1j * (2 * np.arange(12) + 1) * np.pi / 50.0
    np.testing.assert_allclose(np.asarray(a.get_gimp(z)),
                               np.asarray(b.get_gimp(z)), atol=1e-7)
    if mode == "superc":
        np.testing.assert_allclose(np.asarray(a.get_gimp(z, typ="a")),
                                   np.asarray(b.get_gimp(z, typ="a")),
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(a.phisc), np.asarray(b.phisc),
                                   atol=1e-8)
