"""Pure-Lehmann Dyson oracle for the nonsu2 (spin-mixing) self-energy.

Companion of tests/test_superc_dyson_oracle.py: everything is assembled in
one basis — Psi_(s,a) = c_{a,s} with the joint-JW Fock oracle — so no
bath-function sign convention enters:

* G_imp(z): exact T=0 Lehmann resolvent of the interacting dense H,
  including the spin-off-diagonal blocks of a complex SOC-like Hloc;
* G0_imp(z): the same machinery on the U=0 quadratic H (hfmode off);
* Sigma(z) = G0_imp^-1 - G_imp^-1 as full (Nspin*Norb)^2 matrices.

The engine's get_sigma must match block-by-block (reference
get_Sigma_nonsu2 semantics; invG0 = (z+mu)I - impHloc - Delta,
ED_BATH/g0and_functions/g0and_hyrege.f90:85-98).

Also locks two semantic points:
* G_ji(z) = conj(G_ij(z*)) — the engine must NOT mirror G_ij into G_ji
  (only valid for real H); caught a real bug in eval_gf_nonsu2.
* spin_field_x is a Hamiltonian term NOT included in the reference's
  impHloc/invG0 (ED_NONSU2/stored/Himp.f90:235-290 vs g0and), so at U=0
  it surfaces in Sigma as the static field matrix.
"""
import numpy as np

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.umatrix import build_umatrix

from oracle import FockOracle, oracle_nonsu2_hamiltonian


def _lehmann_spin(orc, h, norb, z):
    """G_{(s,a),(s',b)}(z) at T=0 from the dense spectrum."""
    evals, evecs = np.linalg.eigh(h)
    e0 = evals[0]
    psi0 = evecs[:, 0]
    ops = [orc.c(a, s).toarray() for s in (0, 1) for a in range(norb)]
    nn = len(ops)
    g = np.zeros((nn, nn, len(z)), complex)
    de = evals - e0
    for i in range(nn):
        for j in range(nn):
            a1 = psi0.conj() @ (ops[i] @ evecs)               # <0|c_i|m>
            b1 = evecs.conj().T @ (ops[j].conj().T @ psi0)    # <m|c_j†|0>
            b2 = psi0.conj() @ (ops[j].conj().T @ evecs)      # <0|c_j†|m>
            a2 = evecs.conj().T @ (ops[i] @ psi0)             # <m|c_i|0>
            g[i, j] = ((a1 * b1)[None, :]
                       / (z[:, None] - de[None, :])).sum(1) \
                + ((b2 * a2)[None, :] / (z[:, None] + de[None, :])).sum(1)
    return g


def _hloc_soc():
    h = np.zeros((2, 2, 1, 1), complex)
    h[0, 0, 0, 0] = 0.15
    h[1, 1, 0, 0] = -0.1
    h[0, 1, 0, 0] = 0.12 + 0.08j     # spin-mixing (SOC-like) block
    h[1, 0, 0, 0] = np.conj(h[0, 1, 0, 0])
    return h


def _solve(hloc, uval, **kw):
    cfg = default_config(norb=1, nbath=2, nspin=2, ed_mode="nonsu2",
                         uloc=[uval], xmu=0.25, beta=200.0, lmats=12,
                         lanc_dim_threshold=16, ed_verbose=0, **kw)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    res = solve_impurity(cfg, hloc, um, bath)
    return cfg, um, bath, res


def test_nonsu2_sigma_exact_dyson():
    hloc = _hloc_soc()
    cfg, um, bath, res = _solve(hloc, 1.7)
    ns = cfg.norb + cfg.nbath
    orc = FockOracle(ns, convention="joint")
    h = oracle_nonsu2_hamiltonian(orc, cfg, hloc, um, bath).toarray()
    z = 1j * (2 * np.arange(cfg.lmats) + 1) * np.pi / cfg.beta

    # engine G (full spin matrix, incl. the non-mirrored G_ji) vs Lehmann
    g_leh = _lehmann_spin(orc, h, 1, z)
    g_eng = np.asarray(res.get_gimp(z))         # (2,2,1,1,L)
    for s1 in range(2):
        for s2 in range(2):
            np.testing.assert_allclose(g_leh[s1, s2], g_eng[s1, s2, 0, 0],
                                       atol=1e-7, err_msg=f"G[{s1}{s2}]")

    # U=0 quadratic H for G0 (same bath/hloc/xmu, no Hartree)
    cfg0 = default_config(norb=1, nbath=2, nspin=2, ed_mode="nonsu2",
                          uloc=[0.0], xmu=0.25, hfmode=False)
    um0 = build_umatrix(cfg0)
    h0 = oracle_nonsu2_hamiltonian(orc, cfg0, hloc, um0, bath).toarray()
    g0_leh = _lehmann_spin(orc, h0, 1, z)
    sig_or = np.zeros((2, 2, len(z)), complex)
    for k in range(len(z)):
        sig_or[:, :, k] = np.linalg.inv(g0_leh[:, :, k]) \
            - np.linalg.inv(g_leh[:, :, k])
    s_eng = np.asarray(res.get_sigma(z))
    for s1 in range(2):
        for s2 in range(2):
            np.testing.assert_allclose(s_eng[s1, s2, 0, 0], sig_or[s1, s2],
                                       atol=1e-6,
                                       err_msg=f"Sigma[{s1}{s2}]")


def test_nonsu2_gf_real_axis_transpose():
    """Real-axis (w + i*eta) G_ji must equal the Lehmann truth, not the
    mirrored G_ij — exercises the conj(z) evaluation branch of
    eval_gf_nonsu2 off the Matsubara axis."""
    hloc = _hloc_soc()
    cfg, um, bath, res = _solve(hloc, 1.7)
    ns = cfg.norb + cfg.nbath
    orc = FockOracle(ns, convention="joint")
    h = oracle_nonsu2_hamiltonian(orc, cfg, hloc, um, bath).toarray()
    z = np.linspace(-2.0, 2.0, 9) + 0.05j
    g_leh = _lehmann_spin(orc, h, 1, z)
    g_eng = np.asarray(res.get_gimp(z))
    for s1 in range(2):
        for s2 in range(2):
            np.testing.assert_allclose(g_leh[s1, s2], g_eng[s1, s2, 0, 0],
                                       atol=1e-7, err_msg=f"Gr[{s1}{s2}]")


def test_nonsu2_sigma_vanishes_at_u0():
    hloc = _hloc_soc()
    cfg, um, bath, res = _solve(hloc, 0.0, hfmode=False)
    z = 1j * (2 * np.arange(8) + 1) * np.pi / cfg.beta
    s = np.asarray(res.get_sigma(z))
    assert np.abs(s).max() < 1e-7, np.abs(s).max()


def test_nonsu2_spin_field_lands_in_sigma():
    """Reference semantics: spin_field is in H but NOT in impHloc/invG0,
    so at U=0 Sigma == the static field matrix (off-diag block = sfx)."""
    hloc = np.zeros((2, 2, 1, 1), complex)
    cfg, um, bath, res = _solve(hloc, 0.0, hfmode=False,
                                spin_field_x=[0.2])
    z = 1j * (2 * np.arange(8) + 1) * np.pi / cfg.beta
    s = np.asarray(res.get_sigma(z))
    np.testing.assert_allclose(s[0, 1, 0, 0], 0.2 + 0j, atol=1e-7)
    np.testing.assert_allclose(s[1, 0, 0, 0], 0.2 + 0j, atol=1e-7)
    np.testing.assert_allclose(s[0, 0, 0, 0], 0.0 + 0j, atol=1e-7)
