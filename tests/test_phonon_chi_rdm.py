"""Phonon solve (polaron-shift analytic limit + D(z)), susceptibilities vs
exact Lehmann, and impurity RDM vs oracle partial trace."""
import numpy as np
import pytest

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.umatrix import build_umatrix

from oracle import FockOracle, oracle_normal_hamiltonian


def test_polaron_shift_analytic():
    """Isolated impurity (v=0) + Holstein coupling: ground energy gains the
    exact polaron shift -(g n)^2/w0 for electronic occupation n."""
    g, w0, u = 0.3, 1.0, 2.0
    cfg = default_config(norb=1, nbath=1, nspin=1, uloc=[u], xmu=0.0,
                         nph=24, w0_ph=w0, g_ph=[g], hfmode=False,
                         lanc_dim_threshold=4000)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    bath.v[:] = 0.0          # decouple the bath
    bath.e[:] = 5.0          # push bath level up: GS has empty bath
    hloc = np.zeros((1, 1, 1, 1))
    hloc[0, 0, 0, 0] = -2.0  # favour single occupation... n=1: E_el=-2
    res = solve_impurity(cfg, hloc, um, bath)
    # electronic candidates: n=0: E=0; n=1: -2 - g^2/w0; n=2: -4+U - 4g^2/w0
    cands = [0.0, -2.0 - g ** 2 / w0, -4.0 + u - 4 * g ** 2 / w0]
    e_exact = min(cands)
    assert abs(res.e0 - e_exact) < 1e-6, (res.e0, e_exact)
    # phonon occupation distribution is normalized
    assert abs(res.obs.ph_n.sum() - 1.0) < 1e-8
    # D(z) evaluates without error and is negative at iw=0+ (causal boson)
    d = res.get_dimp(1j * np.array([1e-8, 0.5, 1.0]))
    assert np.real(d[0]) < 0


def test_chi_spin_dens_exact():
    cfg = default_config(norb=1, nbath=2, nspin=1, uloc=[2.0], xmu=0.13,
                         beta=60.0, chispin_flag=True, chidens_flag=True,
                         chipair_flag=True)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    res = solve_impurity(cfg, hloc, um, bath)

    orc = FockOracle(3, convention="per-spin")
    h = oracle_normal_hamiltonian(orc, cfg, hloc, um, bath)
    evals, evecs = np.linalg.eigh(h.toarray())
    e0 = evals[0]
    psi = evecs[:, 0]
    de = evals - e0
    z = 1j * 2 * np.arange(1, 20) * np.pi / cfg.beta  # bosonic, skip nu=0

    sz = 0.5 * (orc.n(0, 0) - orc.n(0, 1)).toarray()
    amp = evecs.T @ (sz @ psi)
    chi_exact = (np.abs(amp) ** 2 * (1.0 / (z[:, None] - de[None, :])
                                     - 1.0 / (z[:, None] + de[None, :]))).sum(1)
    chi_eng = res.get_chi("spin", z)[0, 0]
    assert np.allclose(chi_eng, chi_exact, atol=1e-8), \
        np.abs(chi_eng - chi_exact).max()

    nop = (orc.n(0, 0) + orc.n(0, 1)).toarray()
    ampn = evecs.T @ (nop @ psi)
    chin_exact = (np.abs(ampn) ** 2 * (1.0 / (z[:, None] - de[None, :])
                                       - 1.0 / (z[:, None] + de[None, :]))).sum(1)
    chin_eng = res.get_chi("dens", z)[0, 0]
    assert np.allclose(chin_eng, chin_exact, atol=1e-8)

    # pair susceptibility, reference convention (ED_CHI_PAIR.f90:128-155):
    # "lesser" c_up c_dw channel at +de, "greater" c†_dw c†_up at -de
    pop = (orc.c(0, 1) @ orc.c(0, 0)).toarray()
    amp_p = evecs.T @ (pop @ psi)           # <n| c_dw c_up |0>
    amp_pd = evecs.T @ (pop.T @ psi)        # <n| (c_dw c_up)† |0>
    chip_eng = res.get_chi("pair", z)[0, 0]
    chip_ref = (np.abs(amp_p) ** 2 / (z[:, None] - de[None, :])).sum(1) \
        + (np.abs(amp_pd) ** 2 / (z[:, None] + de[None, :])).sum(1)
    assert np.allclose(chip_eng, chip_ref, atol=1e-8), \
        np.abs(chip_eng - chip_ref).max()


def test_rdm_vs_oracle_trace():
    cfg = default_config(norb=1, nbath=2, nspin=1, uloc=[1.7], xmu=0.21,
                         rdm_flag=True)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    res = solve_impurity(cfg, hloc, um, bath)
    rho = res.get_rdm()
    assert rho.shape == (4, 4)
    # hermitian, unit trace, positive
    assert np.allclose(rho, rho.conj().T, atol=1e-10)
    assert abs(np.trace(rho) - 1.0) < 1e-10
    assert np.all(np.linalg.eigvalsh(rho) > -1e-12)
    # oracle: partial trace over bath levels of |0><0|
    orc = FockOracle(3, convention="per-spin")
    h = oracle_normal_hamiltonian(orc, cfg, hloc, um, bath)
    evals, evecs = np.linalg.eigh(h.toarray())
    # average over the (possibly degenerate) ground multiplet like the engine
    deg = np.nonzero(evals - evals[0] <= 1e-9)[0]
    # basis index m: bit0=imp_up, bits1-2 bath_up, bit3=imp_dw, bits4-5 bath_dw
    rho_or = np.zeros((4, 4))
    for g in deg:
        psi = evecs[:, g]
        for m in range(orc.dim):
            iu, bu = m & 1, (m >> 1) & 3
            idn, bd = (m >> 3) & 1, (m >> 4) & 3
            for mp in range(orc.dim):
                ju, bu2 = mp & 1, (mp >> 1) & 3
                jd, bd2 = (mp >> 3) & 1, (mp >> 4) & 3
                if bu == bu2 and bd == bd2:
                    rho_or[iu + 2 * idn, ju + 2 * jd] += psi[m] * psi[mp] / len(deg)
    assert np.allclose(rho, rho_or, atol=1e-9), np.abs(rho - rho_or).max()
    # diagonal consistency: n_up = sum over states with imp_up=1
    nup = rho_or[1, 1] + rho_or[3, 3]
    assert abs(res.dens[0] / 2 - nup) < 1e-8  # nspin=1: dens = 2 n_up


def test_configuration_probabilities_and_phonon_pdf():
    cfg = default_config(norb=2, nbath=1, nspin=1, uloc=[2.0, 2.0], ust=0.8,
                         xmu=0.5, nph=10, w0_ph=1.0, g_ph=[0.3, 0.2],
                         lpos=200, xmin=-5, xmax=5)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    res = solve_impurity(cfg, np.zeros((1, 1, 2, 2)), um, bath)
    # probabilities normalized, consistent with docc
    p = res.obs.prob
    assert p.shape == (9,)
    assert abs(p.sum() - 1.0) < 1e-9
    # P(orbital 0 doubly occupied) = sum of classes with c_0 = 2
    p_d0 = sum(p[i] for i in range(9) if i % 3 == 2)
    assert abs(p_d0 - res.docc[0]) < 1e-8
    # phonon displacement PDF: normalized, mean = <X>/sqrt(2)... the natural
    # units make <x> = <b+b†>/sqrt(2)
    from edipack_tpu.solver.observables import phonon_position_pdf
    x, pdf = phonon_position_pdf(cfg, res.obs)
    dx = x[1] - x[0]
    assert abs(pdf.sum() * dx - 1.0) < 1e-3
    mean_x = (x * pdf).sum() * dx
    assert abs(mean_x - res.obs.ph_x / np.sqrt(2)) < 1e-3
