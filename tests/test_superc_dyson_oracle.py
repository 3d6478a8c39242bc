"""Pure-Lehmann Nambu-Dyson oracle for the superc Sigma/Self conventions.

Resolves the r03 HYBRID_SUPERC golden question.  Everything is assembled
in ONE basis — Ψ = (c↑, c†↓) with the engine's joint-JW Fock oracle — so
no bath-function sign convention enters:

* G_imp(z):  exact T=0 Lehmann resolvent of the INTERACTING dense H;
* G0_imp(z): the same Lehmann machinery on the U=0 quadratic H
  (same bath, xmu, anomalous Hloc; hfmode off so no Hartree shift);
* Sigma_Nambu(z) = G0_imp⁻¹ − G_imp⁻¹ — the exact impurity Dyson.

The engine's get_sigma(typ="n"/"a") must match the (1,1)/(1,2) blocks.
This fixes the sign of invf0_bath (= −ha − FΔ in the engine's F/FΔ
conventions — the U=0 inverse's 12-block equals −ha − FΔ numerically) and
proves Self ≡ 0 at U=0.  See test_reference_goldens.test_golden_superc
for the resulting verified correction of the HYBRID_SUPERC golden.
"""
import numpy as np

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.umatrix import build_umatrix

from oracle import FockOracle, oracle_superc_hamiltonian


def _lehmann_nambu(orc, h, ns, norb, z):
    """Exact T=0 Nambu impurity GF from the dense spectrum:
    G_ij(z) = <0|Psi_i (z - (H-E0))^-1 Psi_j^dag|0>
            + <0|Psi_j^dag (z + (H-E0))^-1 Psi_i|0>."""
    evals, evecs = np.linalg.eigh(h)
    e0 = evals[0]
    psi0 = evecs[:, 0]
    ops = [orc.c(a, 0).toarray() for a in range(norb)] \
        + [orc.cdg(a, 1).toarray() for a in range(norb)]
    nn = 2 * norb
    g = np.zeros((nn, nn, len(z)), complex)
    de = evals - e0
    for i in range(nn):
        for j in range(nn):
            a1 = psi0.conj() @ (ops[i] @ evecs)              # <0|Psi_i|m>
            amp1 = evecs.conj().T @ (ops[j].conj().T @ psi0)  # <m|Psi_j†|0>
            b2 = psi0.conj() @ (ops[j].conj().T @ evecs)     # <0|Psi_j†|m>
            a2 = evecs.conj().T @ (ops[i] @ psi0)            # <m|Psi_i|0>
            w1 = a1 * amp1
            w2 = b2 * a2
            g[i, j] = (w1[None, :] / (z[:, None] - de[None, :])).sum(1) \
                + (w2[None, :] / (z[:, None] + de[None, :])).sum(1)
    return g


def _setup(uval, han=None, deltasc=0.15):
    cfg = default_config(norb=1, nbath=2, nspin=1, ed_mode="superc",
                         bath_type="hybrid", uloc=[uval], xmu=0.2,
                         deltasc=deltasc, beta=200.0, lmats=16,
                         lanc_dim_threshold=16, ed_verbose=0)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    res = solve_impurity(cfg, hloc, um, bath, hloc_anomalous=han)
    ns = cfg.norb + cfg.nbath
    orc = FockOracle(ns, convention="joint")
    h = oracle_superc_hamiltonian(orc, cfg, hloc, um, bath,
                                  hloc_anomalous=han).toarray()
    # U=0 quadratic H for G0 (same bath instance, xmu, han; no Hartree)
    cfg0 = default_config(norb=1, nbath=2, nspin=1, ed_mode="superc",
                          bath_type="hybrid", uloc=[0.0], xmu=0.2,
                          deltasc=deltasc, hfmode=False)
    um0 = build_umatrix(cfg0)
    h0 = oracle_superc_hamiltonian(orc, cfg0, hloc, um0, bath,
                                   hloc_anomalous=han).toarray()
    return cfg, res, orc, h, h0, ns


def test_superc_self_exact_nambu_dyson():
    """Engine Sigma AND Self == pure-Lehmann Nambu Dyson at U != 0, with
    an anomalous Hloc in play."""
    han = np.array([[0.07]], complex)
    cfg, res, orc, h, h0, ns = _setup(-1.6, han=han)
    z = 1j * (2 * np.arange(cfg.lmats) + 1) * np.pi / cfg.beta

    g_leh = _lehmann_nambu(orc, h, ns, 1, z)
    g_eng = np.asarray(res.get_gimp(z))[0, 0]
    f_eng = np.asarray(res.get_gimp(z, typ="a"))[0, 0]
    np.testing.assert_allclose(g_leh[0, 0], g_eng[0, 0], atol=1e-7)
    np.testing.assert_allclose(g_leh[0, 1], f_eng[0, 0], atol=1e-7)

    g0_leh = _lehmann_nambu(orc, h0, ns, 1, z)
    sig_or = np.zeros((2, 2, len(z)), complex)
    for k in range(len(z)):
        sig_or[:, :, k] = np.linalg.inv(g0_leh[:, :, k]) \
            - np.linalg.inv(g_leh[:, :, k])
    sn = np.asarray(res.get_sigma(z, typ="n"))[0, 0, 0, 0]
    sa = np.asarray(res.get_sigma(z, typ="a"))[0, 0, 0, 0]
    np.testing.assert_allclose(sn, sig_or[0, 0], atol=1e-6)
    np.testing.assert_allclose(sa, sig_or[0, 1], atol=1e-6)


def test_invf0_is_the_u0_inverse_block():
    """invf0_bath == the (1,2) block of the U=0 Lehmann resolvent's inverse
    (the definitional check that fixes the −ha − FΔ sign)."""
    from edipack_tpu.bath.functions import invf0_bath
    han = np.array([[0.07]], complex)
    cfg, res, orc, h, h0, ns = _setup(0.0, han=han)
    z = 1j * (2 * np.arange(6) + 1) * np.pi / cfg.beta
    g0_leh = _lehmann_nambu(orc, h0, ns, 1, z)
    truth = np.array([np.linalg.inv(g0_leh[:, :, k])[0, 1]
                      for k in range(len(z))])
    if0 = invf0_bath(cfg, res.bath, han, z)[0, 0, 0, 0]
    np.testing.assert_allclose(if0, truth, atol=1e-9)


def test_superc_self_vanishes_at_u0():
    cfg, res, orc, h, h0, ns = _setup(0.0)
    z = 1j * (2 * np.arange(8) + 1) * np.pi / cfg.beta
    sa = np.asarray(res.get_sigma(z, typ="a"))
    sn = np.asarray(res.get_sigma(z, typ="n"))
    assert np.abs(sa).max() < 1e-7, np.abs(sa).max()
    assert np.abs(sn).max() < 1e-7, np.abs(sn).max()
