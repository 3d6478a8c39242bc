"""nonsu2 (N-sector) mode: H parity vs joint oracle, spin-diagonal reduction
to the normal mode, GF with spin-orbit-like mixing vs exact Lehmann."""
import numpy as np
import pytest

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.models.joint import build_joint_sector_op
from edipack_tpu.sectors import SectorTable
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.umatrix import build_umatrix

from oracle import FockOracle, oracle_nonsu2_hamiltonian


def _sector_parity(cfg, hloc, um, bath, atol=1e-10):
    table = SectorTable(cfg)
    ns = table.dims.ns
    orc = FockOracle(ns, convention="joint")
    href = oracle_nonsu2_hamiltonian(orc, cfg, hloc, um, bath)
    for sec in table:
        if sec.dim == 0:
            continue
        idx = orc.sector_indices_n(sec.qn[1])
        h_or = orc.project(href, idx)
        op = build_joint_sector_op(cfg, sec, hloc, um, bath)
        h_eng = op.to_dense()
        assert np.allclose(h_eng, h_eng.conj().T, atol=atol), sec.qn
        assert np.allclose(h_eng, h_or, atol=atol), \
            f"sector {sec.qn}: dev {np.abs(h_eng - h_or).max()}"


def test_nonsu2_hamiltonian_vs_oracle():
    cfg = default_config(norb=1, nbath=2, nspin=2, ed_mode="nonsu2",
                         uloc=[1.8], xmu=0.15, spin_field_x=[0.2],
                         spin_field_y=[0.1], spin_field_z=[0.05])
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    bath.u[0, 0] = [0.3, 0.22]
    bath.u[1, 0] = [0.3, 0.22]
    hloc = np.zeros((2, 2, 1, 1), complex)
    hloc[0, 0, 0, 0] = 0.1
    hloc[1, 1, 0, 0] = -0.1
    hloc[0, 1, 0, 0] = 0.12 - 0.07j
    hloc[1, 0, 0, 0] = 0.12 + 0.07j
    _sector_parity(cfg, hloc, um, bath)


def test_nonsu2_two_orbital_soc():
    cfg = default_config(norb=2, nbath=1, nspin=2, ed_mode="nonsu2",
                         uloc=[1.0, 1.0], ust=0.5, jh=0.1, jx=0.1, jp=0.1,
                         xmu=0.2)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    bath.u[:, :, :] = 0.15
    hloc = np.zeros((2, 2, 2, 2), complex)
    lam = 0.2  # SOC-like spin-orbital mixing
    hloc[0, 0] = np.array([[0.1, 0.03], [0.03, -0.1]])
    hloc[1, 1] = np.array([[0.1, 0.03], [0.03, -0.1]])
    hloc[0, 1] = lam * np.array([[0, 1 - 1j], [-1 - 1j, 0]]) / 2
    hloc[1, 0] = hloc[0, 1].conj().transpose(1, 0)
    _sector_parity(cfg, hloc, um, bath)


def test_nonsu2_spin_diagonal_reduces_to_normal():
    base = dict(norb=1, nbath=2, uloc=[2.1], xmu=0.31, beta=90.0, lmats=40)
    cfg_n = default_config(nspin=2, **base)
    um = build_umatrix(cfg_n)
    bath_n = init_bath(cfg_n)
    hloc = np.zeros((2, 2, 1, 1))
    res_n = solve_impurity(cfg_n, hloc, um, bath_n)

    cfg_x = default_config(nspin=2, ed_mode="nonsu2", **base)
    um_x = build_umatrix(cfg_x)
    bath_x = init_bath(cfg_x)
    bath_x.u[:] = 0.0
    res_x = solve_impurity(cfg_x, hloc, um_x, bath_x)

    assert abs(res_n.e0 - res_x.e0) < 1e-9
    assert np.allclose(res_n.dens, res_x.dens, atol=1e-7)
    assert np.allclose(res_n.docc, res_x.docc, atol=1e-7)
    z = 1j * (2 * np.arange(40) + 1) * np.pi / cfg_n.beta
    g_n = res_n.get_gimp(z)
    g_x = res_x.get_gimp(z)
    assert np.allclose(g_n[0, 0, 0, 0], g_x[0, 0, 0, 0], atol=1e-7)
    assert np.allclose(g_n[1, 1, 0, 0], g_x[1, 1, 0, 0], atol=1e-7)
    assert np.max(np.abs(g_x[0, 1])) < 1e-8  # no spin mixing


def test_nonsu2_gf_exact_with_mixing():
    cfg = default_config(norb=1, nbath=1, nspin=2, ed_mode="nonsu2",
                         uloc=[1.4], xmu=0.12, beta=70.0, lmats=40,
                         spin_field_x=[0.25])
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    bath.u[:, 0] = 0.2
    hloc = np.zeros((2, 2, 1, 1), complex)
    res = solve_impurity(cfg, hloc, um, bath)

    orc = FockOracle(2, convention="joint")
    href = oracle_nonsu2_hamiltonian(orc, cfg, hloc, um, bath)
    evals, evecs = np.linalg.eigh(href.toarray())
    e0 = evals[0]
    assert abs(res.e0 - e0) < 1e-10
    psi = evecs[:, 0]
    z = 1j * (2 * np.arange(40) + 1) * np.pi / cfg.beta
    de = evals - e0
    g_eng = res.get_gimp(z)
    for s1 in range(2):
        for s2 in range(2):
            c1 = orc.c(0, s1).toarray()
            c2 = orc.c(0, s2).toarray()
            g_exact = ((psi.conj() @ c1 @ evecs) * (evecs.conj().T @ (c2.conj().T @ psi))
                       / (z[:, None] - de[None, :])).sum(1) \
                + ((psi.conj() @ c2.conj().T @ evecs) * (evecs.conj().T @ (c1 @ psi))
                   / (z[:, None] + de[None, :])).sum(1)
            assert np.allclose(g_eng[s1, s2, 0, 0], g_exact, atol=1e-8), \
                (s1, s2, np.abs(g_eng[s1, s2, 0, 0] - g_exact).max())


def test_nonsu2_inplane_magnetization_and_rdm():
    cfg = default_config(norb=1, nbath=1, nspin=2, ed_mode="nonsu2",
                         uloc=[1.0], xmu=0.05, spin_field_x=[0.3],
                         spin_field_y=[0.2], rdm_flag=True)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    bath.u[:] = 0.1
    hloc = np.zeros((2, 2, 1, 1), complex)
    res = solve_impurity(cfg, hloc, um, bath)

    from oracle import FockOracle, oracle_nonsu2_hamiltonian
    orc = FockOracle(2, convention="joint")
    h = oracle_nonsu2_hamiltonian(orc, cfg, hloc, um, bath)
    evals, evecs = np.linalg.eigh(h.toarray())
    deg = np.nonzero(evals - evals[0] <= 1e-9)[0]
    sud_op = (orc.cdg(0, 0) @ orc.c(0, 1)).toarray()
    mx = my = 0.0
    for g in deg:
        psi = evecs[:, g]
        sud = psi.conj() @ (sud_op @ psi)
        mx += 2 * np.real(sud) / len(deg)
        my += 2 * np.imag(sud) / len(deg)
    assert abs(res.mag[0][0] - mx) < 1e-8, (res.mag[0][0], mx)
    assert abs(abs(res.mag[1][0]) - abs(my)) < 1e-8, (res.mag[1][0], my)

    # joint RDM invariants
    rho = res.get_rdm()
    assert np.allclose(rho, rho.conj().T, atol=1e-10)
    assert abs(np.trace(rho).real - 1.0) < 1e-10
    assert np.all(np.linalg.eigvalsh(rho) > -1e-12)
    # diagonal consistency with densities
    nup_rdm = sum(rho[i, i].real for i in range(4) if i & 1)
    assert abs(nup_rdm - res.obs.dens_up[0]) < 1e-8


def test_superc_rdm_pair_coherence():
    """Superc RDM: the |00>-|ud> off-diagonal equals the on-impurity pair
    amplitude (with the bath traced out)."""
    cfg = default_config(norb=1, nbath=1, nspin=1, ed_mode="superc",
                         uloc=[-1.0], xmu=0.0, rdm_flag=True, deltasc=0.3)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    bath.d[0, 0] = [0.4]
    hloc = np.zeros((1, 1, 1, 1))
    res = solve_impurity(cfg, hloc, um, bath)
    rho = res.get_rdm()
    assert np.allclose(rho, rho.conj().T, atol=1e-10)
    assert abs(np.trace(rho).real - 1.0) < 1e-10
    # |0><ud| coherence: index 0 = empty, index 3 = up+dw occupied
    coher = rho[0, 3]
    assert abs(coher) > 1e-3   # pairing induces particle-number coherence
    # oracle check via isometry embedding |I,b> = ordered creation ops |0>
    from oracle import FockOracle, oracle_superc_hamiltonian
    orc = FockOracle(2, convention="joint")
    h = oracle_superc_hamiltonian(orc, cfg, hloc, um, bath)
    evals, evecs = np.linalg.eigh(h.toarray())
    deg = np.nonzero(evals - evals[0] <= 1e-9)[0]
    # build embedding vectors: imp levels {0 (up), ns+0 (dw)}, bath {1, ns+1}
    ns = 2
    def embed(iu, idn, bu, bd):
        ops = []
        # imp ops first (up then dw), then bath ops (up then dw)
        if iu: ops.append(("cdg", 0, 0))
        if idn: ops.append(("cdg", 0, 1))
        if bu: ops.append(("cdg", 1, 0))
        if bd: ops.append(("cdg", 1, 1))
        vac = np.zeros(orc.dim); vac[0] = 1.0
        m = orc.opstring(list(reversed(ops)))  # rightmost applies first
        return m @ vac
    rho_or = np.zeros((4, 4), complex)
    for g in deg:
        psi = evecs[:, g]
        for I, (iu, idn) in enumerate([(0, 0), (1, 0), (0, 1), (1, 1)]):
            for J, (ju, jd) in enumerate([(0, 0), (1, 0), (0, 1), (1, 1)]):
                for bu in (0, 1):
                    for bd in (0, 1):
                        vi = embed(iu, idn, bu, bd)
                        vj = embed(ju, jd, bu, bd)
                        rho_or[I, J] += (vi @ psi) * np.conj(vj @ psi) / len(deg)
    # note rho index convention: I = iu + 2*id
    assert np.allclose(rho, rho_or.conj() if False else rho_or, atol=1e-9), \
        np.abs(rho - rho_or).max()
