"""Sharded (multi-device) JOINT-mode matvec inside the real solver: the
superc/nonsu2 row-split ELL decomposition (reference Allgatherv pattern,
ED_SUPERC/ED_HAMILTONIAN_SUPERC_STORED_HxV.f90:366-432) on the virtual
8-CPU mesh, validated against a single-path dense solve."""
import jax
import numpy as np
import pytest

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.umatrix import build_umatrix

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multi-device mesh")


@pytest.mark.slow
def test_sharded_superc_matches_dense():
    # Ns=6 (norb=2, nbath=2): largest Sz sector dim C(12,6)=924; threshold
    # 128 pushes the big sectors through the SHARDED joint Lanczos
    base = dict(norb=2, nbath=2, nspin=1, ed_mode="superc",
                uloc=[-1.5, -1.5], ust=-0.8, jh=0.1, jx=0.1, jp=0.1,
                deltasc=0.05, xmu=0.15, beta=200.0, lmats=16,
                lanc_dim_threshold=32)
    cfg = default_config(**base)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.diag([0.2, -0.2])
    res = solve_impurity(cfg, hloc, um, bath)    # sharded (8 devices)

    cfg_d = default_config(**{**base, "lanc_dim_threshold": 8192})
    res_d = solve_impurity(cfg_d, hloc, um, bath)

    assert abs(res.e0 - res_d.e0) < 1e-9
    assert np.allclose(res.dens, res_d.dens, atol=1e-7)
    assert np.allclose(res.obs.phisc, res_d.obs.phisc, atol=1e-7)
    z = 1j * (2 * np.arange(16) + 1) * np.pi / cfg.beta
    g = res.get_gimp(z)
    g_d = res_d.get_gimp(z)
    assert np.allclose(g, g_d, atol=1e-6), np.abs(g - g_d).max()
    f = res.get_gimp(z, typ="a")
    f_d = res_d.get_gimp(z, typ="a")
    assert np.allclose(f, f_d, atol=1e-6), np.abs(f - f_d).max()


@pytest.mark.slow
def test_sharded_nonsu2_matches_dense():
    base = dict(norb=2, nbath=1, nspin=2, ed_mode="nonsu2",
                uloc=[1.2, 1.2], ust=0.6, jh=0.15, jx=0.15, jp=0.15,
                xmu=0.1, beta=200.0, lmats=16, lanc_dim_threshold=32,
                spin_field_x=[0.08, 0.03])
    cfg = default_config(**base)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((2, 2, 2, 2))
    hloc[0, 0] = np.diag([0.3, -0.3])
    hloc[1, 1] = np.diag([0.3, -0.3])
    res = solve_impurity(cfg, hloc, um, bath)    # sharded

    cfg_d = default_config(**{**base, "lanc_dim_threshold": 8192})
    res_d = solve_impurity(cfg_d, hloc, um, bath)

    assert abs(res.e0 - res_d.e0) < 1e-9
    assert np.allclose(res.dens, res_d.dens, atol=1e-7)
    assert np.allclose(res.obs.mag, res_d.obs.mag, atol=1e-7)
    z = 1j * (2 * np.arange(16) + 1) * np.pi / cfg.beta
    g = res.get_gimp(z)
    g_d = res_d.get_gimp(z)
    assert np.allclose(g, g_d, atol=1e-6), np.abs(g - g_d).max()
