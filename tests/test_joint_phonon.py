"""Joint-mode (superc/nonsu2) phonon completeness vs brute-force oracle.

Reference parity: D(z) phonon propagator channel (ED_SUPERC/ED_GF_SUPERC
.f90:112-119,366-419 and get_impD_nonsu2), X_ph/X2_ph/Eph/Eeph and 3^Norb
configuration probabilities (ED_OBSERVABLES_SUPERC.f90:111,179,462,809),
anomalous-Hloc eknot (:595-627).
"""
import numpy as np

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.umatrix import build_umatrix

from oracle import FockOracle, oracle_superc_hamiltonian, \
    oracle_nonsu2_hamiltonian


def _phonon_full(h_el, cfg):
    """H_full = I_ph ⊗ ... with engine layout (p outer, el inner):
    kron(ph_op, el_op)."""
    nphp = cfg.nph + 1
    nb = np.zeros((nphp, nphp))
    nb[np.arange(nphp), np.arange(nphp)] = np.arange(nphp)
    x = np.zeros((nphp, nphp))
    sq = np.sqrt(np.arange(1, nphp))
    x[np.arange(1, nphp), np.arange(cfg.nph)] = sq
    x[np.arange(cfg.nph), np.arange(1, nphp)] = sq
    return nb, x


def _dimp_exact(z, evals, evecs, psi0, e0, xfull, beta):
    """Reference get_impD formula at T=0 (ED_GF_NORMAL.f90:611-690 shape):
    Matsubara-axis D(iν) = -Σ_{de>0} w (1-e^{-β de}) 2 de/(ν² + de²)."""
    amps = evecs.conj().T @ (xfull @ psi0)
    w = np.abs(amps) ** 2
    de = evals - e0
    out = np.zeros(len(z), complex)
    for peso, d in zip(w, de):
        if abs(beta * d) < 1e-8:
            continue
        if d > 0:
            f = peso * (1.0 - np.exp(-beta * d))
            out -= f * 2 * d / (np.imag(z) ** 2 + d ** 2)
    return out


def test_superc_phonon_dimp_and_observables():
    cfg = default_config(norb=1, nbath=2, nspin=1, ed_mode="superc",
                         uloc=[-1.5], deltasc=0.12, xmu=0.1, beta=80.0,
                         nph=3, g_ph=[0.3], w0_ph=0.7,
                         lanc_dim_threshold=16)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    res = solve_impurity(cfg, hloc, um, bath)

    ns = 3
    orc = FockOracle(ns, convention="joint")
    h_el = oracle_superc_hamiltonian(orc, cfg, hloc, um, bath).toarray()
    nb, x = _phonon_full(h_el, cfg)
    g_imp = cfg.g_ph[0] * (orc.n(0, 0) + orc.n(0, 1)).toarray()
    dim_el = h_el.shape[0]
    h_full = (np.kron(np.eye(cfg.nph + 1), h_el)
              + cfg.w0_ph * np.kron(nb, np.eye(dim_el))
              + np.kron(x, g_imp))
    evals, evecs = np.linalg.eigh(h_full)
    e0 = evals[0]
    assert abs(res.e0 - e0) < 1e-8, (res.e0, e0)
    psi0 = evecs[:, 0]

    # D(iν) against the Lehmann oracle
    z = 1j * 2 * np.arange(8) * np.pi / cfg.beta
    d_eng = res.get_dimp(z)
    xfull = np.kron(x, np.eye(dim_el))
    d_ex = _dimp_exact(z, evals, evecs, psi0, e0, xfull, cfg.beta)
    # skip the nu=0 point (elastic-term conventions differ at T=0 limit)
    assert np.allclose(d_eng[1:], d_ex[1:], atol=1e-7), \
        np.abs(d_eng[1:] - d_ex[1:]).max()

    # phonon observables
    obs = res.obs
    assert abs(obs.ph_x - psi0 @ (xfull @ psi0)) < 1e-8
    assert abs(obs.ph_x2 - psi0 @ (xfull @ xfull @ psi0)) < 1e-8
    nfull = np.kron(nb, np.eye(dim_el))
    assert abs(obs.eph - cfg.w0_ph * psi0 @ (nfull @ psi0)) < 1e-8
    eeph_ex = psi0 @ (np.kron(x, g_imp) @ psi0)
    assert abs(obs.eeph - eeph_ex) < 1e-8
    # 3^Norb configuration probabilities: norb=1 -> P(empty/single/double)
    n_up0 = np.kron(np.eye(cfg.nph + 1), orc.n(0, 0).toarray())
    n_dw0 = np.kron(np.eye(cfg.nph + 1), orc.n(0, 1).toarray())
    cls = np.round(np.diag(n_up0) + np.diag(n_dw0)).astype(int)
    p_ex = np.zeros(3)
    np.add.at(p_ex, cls, np.abs(psi0) ** 2)
    assert np.allclose(obs.prob, p_ex, atol=1e-8)


def test_superc_anomalous_hloc_eknot():
    cfg = default_config(norb=1, nbath=2, nspin=1, ed_mode="superc",
                         uloc=[-1.2], deltasc=0.0, xmu=0.15, beta=100.0,
                         lanc_dim_threshold=16)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.array([[[[0.2]]]])
    ha = np.array([[0.17]], complex)
    res = solve_impurity(cfg, hloc, um, bath, hloc_anomalous=ha)

    orc = FockOracle(3, convention="joint")
    h_el = oracle_superc_hamiltonian(orc, cfg, hloc, um, bath,
                                     hloc_anomalous=ha).toarray()
    evals, evecs = np.linalg.eigh(h_el)
    psi0 = evecs[:, 0]
    assert abs(res.e0 - evals[0]) < 1e-8
    # eknot = <Hloc diag> + <H_anom>; extract H_anom as the H difference so
    # the oracle shares the engine's operator-ordering convention exactly
    h_el0 = oracle_superc_hamiltonian(orc, cfg, hloc, um, bath,
                                      hloc_anomalous=None).toarray()
    h_an = h_el - h_el0
    nop = (orc.n(0, 0) + orc.n(0, 1)).toarray()
    eknot_ex = np.real(psi0.conj() @ ((0.2 * nop + h_an) @ psi0))
    assert abs(res.obs.eknot - eknot_ex) < 1e-7, (res.obs.eknot, eknot_ex)


def test_nonsu2_phonon_dimp():
    cfg = default_config(norb=1, nbath=1, nspin=2, ed_mode="nonsu2",
                         uloc=[1.2], xmu=0.6, beta=80.0,
                         spin_field_x=[0.15], nph=2, g_ph=[0.25], w0_ph=0.5,
                         lanc_dim_threshold=8)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((2, 2, 1, 1), complex)
    res = solve_impurity(cfg, hloc, um, bath)

    ns = 2
    orc = FockOracle(ns, convention="joint")
    h_el = oracle_nonsu2_hamiltonian(orc, cfg, hloc, um, bath).toarray()
    nb, x = _phonon_full(h_el, cfg)
    g_imp = cfg.g_ph[0] * (orc.n(0, 0) + orc.n(0, 1)).toarray()
    dim_el = h_el.shape[0]
    h_full = (np.kron(np.eye(cfg.nph + 1), h_el)
              + cfg.w0_ph * np.kron(nb, np.eye(dim_el))
              + np.kron(x, g_imp))
    evals, evecs = np.linalg.eigh(h_full)
    e0 = evals[0]
    assert abs(res.e0 - e0) < 1e-8
    psi0 = evecs[:, 0]
    z = 1j * 2 * np.arange(1, 8) * np.pi / cfg.beta
    d_eng = res.get_dimp(z)
    xfull = np.kron(x, np.eye(dim_el))
    d_ex = _dimp_exact(z, evals, evecs, psi0, e0, xfull, cfg.beta)
    assert np.allclose(d_eng, d_ex, atol=1e-7), np.abs(d_eng - d_ex).max()
