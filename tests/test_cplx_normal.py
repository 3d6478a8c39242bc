"""Complex normal-mode Hloc (reference _CMPLX_NORMAL build variant,
ED_VARS_GLOBAL.f90:111-122): solved automatically through the nonsu2 joint
path with results spin-sliced back to normal-mode shapes.

Oracle: with density-density interactions and an orbital-diagonal bath, a
complex hopping h12 = |h| e^{iφ} is a pure gauge (c_2 → e^{iφ} c_2): the
spectrum, densities and diagonal GF equal the real-|h| normal solve, and
|G_12| is gauge invariant."""
import numpy as np
import pytest

from edipack_tpu.config import default_config, set_config
from edipack_tpu.main import EDSolver, _ComplexNormalProxy


def _solver(cfg):
    set_config(cfg)
    s = EDSolver(cfg)
    s.init_solver()
    return s


def test_cplx_normal_gauge_oracle():
    base = dict(norb=2, nbath=2, nspin=1, uloc=[1.6, 1.4], ust=0.8,
                xmu=0.3, beta=80.0, lmats=12, ed_verbose=0,
                ed_solve_offdiag_gf=True, lanc_dim_threshold=8192)
    phi = 0.6
    h = np.zeros((1, 1, 2, 2), complex)
    h[0, 0] = [[0.15, 0.1 * np.exp(1j * phi)],
               [0.1 * np.exp(-1j * phi), -0.05]]

    cfg_c = default_config(**base)
    sc = _solver(cfg_c)
    sc.set_hloc(h)
    res_c = sc.solve(flag_gf=True)
    assert isinstance(res_c, _ComplexNormalProxy)

    cfg_r = default_config(**base)
    sr = _solver(cfg_r)
    hr = np.zeros((1, 1, 2, 2))
    hr[0, 0] = [[0.15, 0.1], [0.1, -0.05]]
    sr.set_hloc(hr)
    res_r = sr.solve(flag_gf=True)

    assert abs(res_c.e0 - res_r.e0) < 1e-7, (res_c.e0, res_r.e0)
    np.testing.assert_allclose(np.asarray(res_c.dens),
                               np.asarray(res_r.dens), atol=1e-6)
    z = 1j * (2 * np.arange(12) + 1) * np.pi / 80.0
    gc = np.asarray(res_c.get_gimp(z))
    gr = np.asarray(res_r.get_gimp(z))
    assert gc.shape == gr.shape == (1, 1, 2, 2, 12)
    np.testing.assert_allclose(gc[0, 0, 0, 0], gr[0, 0, 0, 0], atol=2e-5)
    np.testing.assert_allclose(gc[0, 0, 1, 1], gr[0, 0, 1, 1], atol=2e-5)
    np.testing.assert_allclose(np.abs(gc[0, 0, 0, 1]),
                               np.abs(gr[0, 0, 0, 1]), atol=2e-5)
    # Dyson-consistent sigma in the sliced shape
    sg = np.asarray(res_c.get_sigma(z))
    assert sg.shape == (1, 1, 2, 2, 12) and np.all(np.isfinite(sg))


def test_cplx_normal_replica_rejected():
    cfg = default_config(norb=1, nbath=2, nspin=1, bath_type="replica")
    set_config(cfg)
    from edipack_tpu.bath.user import ed_set_hreplica, clear_global_basis
    ed_set_hreplica(np.eye(1)[None], [[0.2], [0.4]], nbath=2)
    s = EDSolver(cfg)
    s.init_solver()
    h = np.zeros((1, 1, 1, 1), complex)
    h[0, 0, 0, 0] = 0.1 + 0.2j   # non-hermitian diag imag is also complex
    with pytest.raises(ValueError):
        s.set_hloc(h)
    clear_global_basis()
