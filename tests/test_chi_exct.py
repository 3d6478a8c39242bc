"""Exciton susceptibility vs exact Lehmann."""
import numpy as np

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.umatrix import build_umatrix

from oracle import FockOracle, oracle_normal_hamiltonian


def test_chi_exct_singlet_tz():
    cfg = default_config(norb=2, nbath=1, nspin=1, uloc=[1.5, 1.5], ust=0.7,
                         jh=0.1, xmu=0.3, beta=50.0, chiexct_flag=True)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.diag([0.2, -0.2])
    res = solve_impurity(cfg, hloc, um, bath)

    orc = FockOracle(4, convention="per-spin")
    h = oracle_normal_hamiltonian(orc, cfg, hloc, um, bath)
    evals, evecs = np.linalg.eigh(h.toarray())
    e0 = evals[0]
    deg = np.nonzero(evals - e0 <= 1e-9)[0]
    de = evals - e0
    z = 1j * 2 * np.arange(1, 12) * np.pi / cfg.beta

    for key, s_dw in (("exct_s", 1.0), ("exct_tz", -1.0)):
        chi_ex = np.zeros(len(z), complex)
        o_l = (orc.cdg(0, 0) @ orc.c(1, 0) + s_dw * orc.cdg(0, 1) @ orc.c(1, 1)).toarray()
        for g in deg:
            psi = evecs[:, g]
            amp_l = evecs.T @ (o_l @ psi)            # lesser: +dE
            amp_g = evecs.T @ (o_l.T @ psi)          # greater: -dE
            chi_ex += (np.abs(amp_l) ** 2 / (z[:, None] - de[None, :])).sum(1) / len(deg)
            chi_ex += (np.abs(amp_g) ** 2 / (z[:, None] + de[None, :])).sum(1) / len(deg)
        w_eng, p_eng = res.chi.packed((key, 0, 1))
        chi_eng = (w_eng[None, :] / (z[:, None] - p_eng[None, :])).sum(1)
        assert np.allclose(chi_eng, chi_ex, atol=1e-8), \
            (key, np.abs(chi_eng - chi_ex).max())
