"""Sharded (multi-device) sector matvec inside the real solver: same physics
as single-device, on the virtual 8-CPU mesh."""
import jax
import numpy as np
import pytest

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.umatrix import build_umatrix


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_sharded_matches_single():
    # Ns=8: largest sector (4,4) has dim 70*70=4900 > 4*1024? No ->
    # lower the dense threshold so big sectors go through the sharded Lanczos
    base = dict(norb=1, nbath=7, nspin=1, uloc=[2.0], xmu=0.2, beta=100.0,
                lmats=16, lanc_dim_threshold=256)
    cfg = default_config(**base)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    res = solve_impurity(cfg, hloc, um, bath)   # sharded (8 devices visible)

    # single-device reference: raise threshold so everything is dense
    cfg_d = default_config(**{**base, "lanc_dim_threshold": 8192})
    res_d = solve_impurity(cfg_d, hloc, um, bath)

    assert abs(res.e0 - res_d.e0) < 1e-9
    assert np.allclose(res.dens, res_d.dens, atol=1e-7)
    z = 1j * (2 * np.arange(16) + 1) * np.pi / cfg.beta
    g = res.get_gimp(z)[0, 0, 0, 0]
    g_d = res_d.get_gimp(z)[0, 0, 0, 0]
    assert np.allclose(g, g_d, atol=1e-6), np.abs(g - g_d).max()


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_sharded_nonlocal_norb2():
    """Sharded matvec with norb=2 inter-orbital terms: the non-local
    (nl_*) gather path and off-diagonal Hloc run through the dw-sharded
    operator (SURVEY §2.4 strategy 4 — the reference's Allgather for
    inter-orbital hops, ED_HAMILTONIAN_NORMAL_STORED_HxV.f90 H_non_local).

    hybrid bath, Ns=8: sector (3,3) has dim_dw=56 (divisible by 8 -> truly
    sharded) and dim=3136 > 4*lanc_dim_threshold."""
    base = dict(norb=2, nbath=6, nspin=1, bath_type="hybrid",
                uloc=[1.8, 1.8], ust=0.9, jh=0.3, jx=0.3, jp=0.3,
                xmu=1.1, beta=80.0, lmats=12, lanc_dim_threshold=256)
    cfg = default_config(**base)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = [[-0.1, 0.25], [0.25, 0.1]]   # off-diag -> non-local hops
    res = solve_impurity(cfg, hloc, um, bath)

    cfg_d = default_config(**{**base, "lanc_dim_threshold": 8192})
    res_d = solve_impurity(cfg_d, hloc, um, bath)

    assert abs(res.e0 - res_d.e0) < 1e-9
    assert np.allclose(res.dens, res_d.dens, atol=1e-7)
    z = 1j * (2 * np.arange(12) + 1) * np.pi / cfg.beta
    g = np.asarray(res.get_gimp(z))
    g_d = np.asarray(res_d.get_gimp(z))
    assert np.allclose(g, g_d, atol=1e-6), np.abs(g - g_d).max()
