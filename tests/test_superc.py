"""superc (Sz-sector) mode: Hamiltonian parity vs the joint-convention oracle,
zero-pairing reduction to the normal mode, anomalous GF vs exact Lehmann."""
import numpy as np
import pytest

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.models.joint import build_joint_sector_op
from edipack_tpu.sectors import SectorTable
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.umatrix import build_umatrix

from oracle import FockOracle, oracle_superc_hamiltonian


def _sector_parity(cfg, hloc, um, bath, hloc_anomalous=None, atol=1e-10):
    table = SectorTable(cfg)
    ns = table.dims.ns
    orc = FockOracle(ns, convention="joint")
    href = oracle_superc_hamiltonian(orc, cfg, hloc, um, bath,
                                     hloc_anomalous=hloc_anomalous)
    for sec in table:
        if sec.dim == 0:
            continue
        idx = orc.sector_indices_sz(sec.qn[1])
        h_or = orc.project(href, idx)
        op = build_joint_sector_op(cfg, sec, hloc, um, bath,
                                   hloc_anomalous=hloc_anomalous)
        h_eng = op.to_dense()
        assert h_eng.shape == h_or.shape, sec.qn
        assert np.allclose(h_eng, h_eng.conj().T, atol=atol), \
            f"not hermitian {sec.qn}"
        assert np.allclose(h_eng, h_or, atol=atol), \
            f"sector {sec.qn}: dev {np.abs(h_eng - h_or).max()}"


def test_superc_hamiltonian_vs_oracle():
    cfg = default_config(norb=1, nbath=2, nspin=1, ed_mode="superc",
                         uloc=[2.0], xmu=0.2, deltasc=0.3)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    bath.d[0, 0] = [0.25, -0.15]
    hloc = np.zeros((1, 1, 1, 1))
    _sector_parity(cfg, hloc, um, bath)


def test_superc_two_orbital_with_pairfield():
    cfg = default_config(norb=2, nbath=1, nspin=1, ed_mode="superc",
                         bath_type="hybrid", uloc=[1.5, 1.0], ust=0.6, jh=0.1,
                         jx=0.1, jp=0.1, xmu=0.3, pair_field=[0.12, 0.07])
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    bath.d[0, 0] = [0.2]
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.array([[0.15, 0.08], [0.08, -0.15]])
    _sector_parity(cfg, hloc, um, bath)


def test_superc_zero_pairing_reduces_to_normal():
    """With d=0 the superc solver must reproduce the normal-mode physics."""
    base = dict(norb=1, nbath=2, nspin=1, uloc=[1.9], xmu=0.23, beta=80.0,
                lmats=48)
    cfg_n = default_config(**base)
    um = build_umatrix(cfg_n)
    bath_n = init_bath(cfg_n)
    hloc = np.zeros((1, 1, 1, 1))
    res_n = solve_impurity(cfg_n, hloc, um, bath_n)

    cfg_s = default_config(ed_mode="superc", deltasc=0.0, **base)
    um_s = build_umatrix(cfg_s)
    bath_s = init_bath(cfg_s)
    bath_s.d[:] = 0.0
    res_s = solve_impurity(cfg_s, hloc, um_s, bath_s)

    assert abs(res_n.e0 - res_s.e0) < 1e-9
    assert np.allclose(res_n.dens, res_s.dens, atol=1e-7)
    assert np.allclose(res_n.docc, res_s.docc, atol=1e-7)
    z = 1j * (2 * np.arange(48) + 1) * np.pi / cfg_n.beta
    g_n = res_n.get_gimp(z)[0, 0, 0, 0]
    g_s = res_s.get_gimp(z)[0, 0, 0, 0]
    assert np.allclose(g_n, g_s, atol=1e-7), np.abs(g_n - g_s).max()
    f_s = res_s.get_gimp(z, typ="a")[0, 0, 0, 0]
    assert np.max(np.abs(f_s)) < 1e-8
    # phi order parameter vanishes
    assert np.max(res_s.obs.phisc) < 1e-8


def test_superc_anomalous_gf_exact():
    """G and F against exact Lehmann sums in the full Fock space."""
    cfg = default_config(norb=1, nbath=1, nspin=1, ed_mode="superc",
                         uloc=[1.2], xmu=0.1, beta=60.0, lmats=48)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    bath.d[0, 0] = [0.35]
    hloc = np.zeros((1, 1, 1, 1))
    res = solve_impurity(cfg, hloc, um, bath)

    orc = FockOracle(2, convention="joint")
    href = oracle_superc_hamiltonian(orc, cfg, hloc, um, bath)
    evals, evecs = np.linalg.eigh(href.toarray())
    e0 = evals[0]
    assert abs(res.e0 - e0) < 1e-10
    psi = evecs[:, 0]
    z = 1j * (2 * np.arange(48) + 1) * np.pi / cfg.beta
    cu = orc.c(0, 0).toarray()
    cd = orc.c(0, 1).toarray()
    a_p = evecs.conj().T @ (cu.conj().T @ psi)   # <n|c†_up|0>
    a_h = evecs.conj().T @ (cu @ psi)            # <n|c_up|0>
    de = evals - e0
    g_exact = (np.abs(a_p) ** 2 / (z[:, None] - de[None, :])).sum(1) \
        + (np.abs(a_h) ** 2 / (z[:, None] + de[None, :])).sum(1)
    g_eng = res.get_gimp(z)[0, 0, 0, 0]
    assert np.allclose(g_eng, g_exact, atol=1e-8), np.abs(g_eng - g_exact).max()

    # F(z) = <<c_up; c_dw>>: Sum_n <0|c_up|n><n|c_dw|0>/(z-dE)
    #                       + <0|c_dw|n><n|c_up|0>/(z+dE)
    b_p = evecs.conj().T @ (cd @ psi)            # <n|c_dw|0>
    amp1 = (evecs.conj().T @ (cu @ psi))         # not needed; build directly
    f_exact = ((psi.conj() @ cu @ evecs) * (evecs.conj().T @ (cd @ psi))
               / (z[:, None] - de[None, :])).sum(1) \
        + ((psi.conj() @ cd @ evecs) * (evecs.conj().T @ (cu @ psi))
           / (z[:, None] + de[None, :])).sum(1)
    f_eng = res.get_gimp(z, typ="a")[0, 0, 0, 0]
    assert np.allclose(f_eng, f_exact, atol=1e-8), np.abs(f_eng - f_exact).max()

    # order parameter phi = <c_up c_dw>... engine convention |<c_bup c_adw>|
    phi_exact = psi.conj() @ (cu @ (cd @ psi))
    assert abs(res.obs.phisc[0, 0] - abs(phi_exact)) < 1e-8


def test_superc_replica_bath_vs_oracle():
    from edipack_tpu.bath.replica import make_basis
    from oracle import oracle_superc_replica_bath

    norb, nbath = 1, 2
    cfg = default_config(norb=norb, nbath=nbath, nspin=1, ed_mode="superc",
                         bath_type="replica", uloc=[1.2], xmu=0.1)
    # Nambu basis ops: identity tau3-like level + pairing tau1
    o1 = np.zeros((2, 2, 1, 1), complex)
    o1[0, 0, 0, 0] = 1.0
    o1[1, 1, 0, 0] = -1.0     # h, -h^T structure
    o2 = np.zeros((2, 2, 1, 1), complex)
    o2[0, 1, 0, 0] = 1.0
    o2[1, 0, 0, 0] = 1.0      # pairing
    basis = make_basis(np.stack([o1, o2]),
                       np.array([[0.5, 0.3], [-0.4, 0.25]]))
    um = build_umatrix(cfg)
    bath = init_bath(cfg, basis=basis)
    hloc = np.zeros((1, 1, 1, 1))

    table = SectorTable(cfg)
    ns = table.dims.ns
    orc = FockOracle(ns, convention="joint")
    # full oracle: impurity+interaction+hyb from the normal/hybrid superc
    # oracle with bath levels zeroed, plus the replica-specific bath terms
    import copy
    bath_nb = copy.deepcopy(bath)
    href = oracle_superc_hamiltonian(orc, cfg, hloc, um, _strip_bath(bath_nb)) \
        + oracle_superc_replica_bath(orc, cfg, bath)
    for sec in table:
        if sec.dim == 0:
            continue
        idx = orc.sector_indices_sz(sec.qn[1])
        h_or = orc.project(href, idx)
        op = build_joint_sector_op(cfg, sec, hloc, um, bath)
        h_eng = op.to_dense()
        assert np.allclose(h_eng, h_eng.conj().T, atol=1e-10), sec.qn
        assert np.allclose(h_eng, h_or, atol=1e-10), \
            f"sector {sec.qn}: dev {np.abs(h_eng - h_or).max()}"


class _BathView:
    """Bath stand-in with zeroed level/pairing terms but intact hybridization
    (so the oracle adds only hyb; replica terms come from the dedicated fn)."""
    def __init__(self, b):
        self._b = b
        self.cfg = b.cfg
        self.is_replica = False
        self.d = None
        self.u = None

def _strip_bath(b):
    import numpy as np
    from edipack_tpu.bath import dmft_bath as dbm
    view = _BathView(b)
    # bath_levels -> zeros ; bath_hyb -> real hyb
    view_e = np.zeros((2, b.cfg.norb, b.cfg.nbath))
    hyb = dbm.bath_hyb(b)
    class _V:
        cfg = b.cfg
        is_replica = False
        d = None
        u = None
        e = view_e
        v = np.broadcast_to(hyb, (b.cfg.nspin, b.cfg.norb, b.cfg.nbath)).copy()
    return _V()
