"""ed_twin work-halving reproduces the full-sweep physics."""
import numpy as np

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.umatrix import build_umatrix


def test_twin_matches_full_sweep():
    base = dict(norb=1, nbath=3, nspin=1, uloc=[2.2], xmu=0.15, beta=80.0,
                lmats=32)
    cfg_f = default_config(**base)
    um = build_umatrix(cfg_f)
    bath = init_bath(cfg_f)
    hloc = np.zeros((1, 1, 1, 1))
    res_f = solve_impurity(cfg_f, hloc, um, bath)

    cfg_t = default_config(ed_twin=True, **base)
    res_t = solve_impurity(cfg_t, hloc, um, bath)

    assert abs(res_f.e0 - res_t.e0) < 1e-10
    assert np.allclose(res_f.dens, res_t.dens, atol=1e-8)
    assert np.allclose(res_f.docc, res_t.docc, atol=1e-8)
    z = 1j * (2 * np.arange(32) + 1) * np.pi / cfg_f.beta
    g_f = res_f.get_gimp(z)[0, 0, 0, 0]
    g_t = res_t.get_gimp(z)[0, 0, 0, 0]
    assert np.allclose(g_f, g_t, atol=1e-7), np.abs(g_f - g_t).max()
    # magnetization stays zero (twin reconstruction restores spin balance)
    assert abs(res_t.mag[2][0]) < 1e-9
