"""Finite-temperature path: thermal observables vs the exact thermal oracle."""
import numpy as np

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.umatrix import build_umatrix

from oracle import FockOracle, oracle_normal_hamiltonian


def test_finite_t_observables():
    beta = 4.0
    cfg = default_config(norb=1, nbath=2, nspin=1, uloc=[2.0], xmu=0.25,
                         beta=beta, ed_finite_temp=True,
                         lanc_nstates_total=60, lanc_nstates_sector=12,
                         cutoff=1e-10)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    res = solve_impurity(cfg, hloc, um, bath)

    orc = FockOracle(3, convention="per-spin")
    h = oracle_normal_hamiltonian(orc, cfg, hloc, um, bath)
    evals, evecs = np.linalg.eigh(h.toarray())
    w = np.exp(-beta * (evals - evals[0]))
    w /= w.sum()
    n_tot = (orc.n(0, 0) + orc.n(0, 1)).toarray()
    docc = (orc.n(0, 0) @ orc.n(0, 1)).toarray()
    dens_ex = float(np.einsum("n,in,ij,jn->", w, evecs, n_tot, evecs))
    docc_ex = float(np.einsum("n,in,ij,jn->", w, evecs, docc, evecs))
    # the engine truncates the thermal trace at lanc_nstates_total states;
    # at beta=4 the truncation error is tiny for this 64-state system
    assert abs(res.dens[0] - dens_ex) < 5e-3, (res.dens[0], dens_ex)
    assert abs(res.docc[0] - docc_ex) < 5e-3, (res.docc[0], docc_ex)

    # thermal GF
    z = 1j * (2 * np.arange(24) + 1) * np.pi / beta
    cu = orc.c(0, 0).toarray()
    de = evals[None, :] - evals[:, None]     # E_m - E_n
    amp = evecs.T @ cu @ evecs               # <n|c|m>
    g_ex = np.zeros(len(z), complex)
    for i, zz in enumerate(z):
        g_ex[i] = np.sum((w[None, :] + w[:, None]) * np.abs(amp) ** 2
                         / (zz - de))
    g_eng = res.get_gimp(z)[0, 0, 0, 0]
    assert np.allclose(g_eng, g_ex, atol=2e-3), np.abs(g_eng - g_ex).max()
