"""Bath χ² fit and the full single-orbital Bethe-lattice DMFT loop
(reference quickstart doc/quickstart/02_dmft.f90 and benchmark config 2)."""
import numpy as np
import pytest

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import (array_to_bath, bath_to_array, init_bath)
from edipack_tpu.bath.fit import chi2_fitgf
from edipack_tpu.bath.functions import delta_bath, g0and_bath, matsubara_grid
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.umatrix import build_umatrix


def test_fit_recovers_known_bath_delta():
    cfg = default_config(norb=1, nbath=3, nspin=1, beta=50.0, lfit=200,
                         cg_scheme="delta", cg_niter=800, cg_ftol=1e-10)
    rng = np.random.default_rng(5)
    truth = init_bath(cfg)
    truth.e[0, 0] = np.array([-0.7, 0.1, 0.9])
    truth.v[0, 0] = np.array([0.45, 0.3, 0.55])
    z = matsubara_grid(cfg, cfg.lfit)
    target = delta_bath(cfg, truth, z)  # (1,1,1,1,L)

    start = init_bath(cfg)
    arr0 = bath_to_array(start)
    arr_fit = chi2_fitgf(cfg, target[0, 0][None, None][0, 0], arr0, ispin=1)
    fitted = array_to_bath(arr_fit, cfg)
    d_fit = delta_bath(cfg, fitted, z)
    err = np.abs(d_fit - target).max()
    assert err < 1e-5, err


def test_fit_weiss_scheme():
    cfg = default_config(norb=1, nbath=2, nspin=1, beta=40.0, lfit=150,
                         cg_scheme="weiss", cg_niter=600, cg_ftol=1e-10,
                         xmu=0.1)
    truth = init_bath(cfg)
    truth.e[0, 0] = np.array([-0.4, 0.6])
    truth.v[0, 0] = np.array([0.5, 0.35])
    hloc = np.zeros((1, 1, 1, 1))
    z = matsubara_grid(cfg, cfg.lfit)
    target = g0and_bath(cfg, truth, hloc, z)
    arr_fit = chi2_fitgf(cfg, target, bath_to_array(init_bath(cfg)), ispin=1)
    fitted = array_to_bath(arr_fit, cfg)
    g0_fit = g0and_bath(cfg, fitted, hloc, z)
    assert np.abs(g0_fit - target).max() < 1e-5


@pytest.mark.slow
def test_bethe_dmft_loop_converges():
    """U=2, D=1 Bethe lattice at half filling: the canonical quickstart run.
    Self-consistency: Delta(iw) = t^2 G_imp(iw), t = D/2."""
    d_band = 1.0
    t2 = (d_band / 2.0) ** 2
    cfg = default_config(norb=1, nbath=4, nspin=1, uloc=[2.0], xmu=0.0,
                         beta=50.0, lmats=256, lfit=200, cg_scheme="delta",
                         cg_niter=400, cg_ftol=1e-8, hfmode=True)
    um = build_umatrix(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    bath = init_bath(cfg)
    z = matsubara_grid(cfg, cfg.lmats)

    err_hist = []
    delta_old = None
    for it in range(12):
        res = solve_impurity(cfg, hloc, um, bath)
        g = res.get_gimp(z)[0, 0, 0, 0]
        delta_new = t2 * g
        if delta_old is not None:
            err = np.mean(np.abs(delta_new - delta_old)) / np.mean(np.abs(delta_new))
            err_hist.append(err)
            if err < 1e-5:
                break
        # mix and fit the bath onto the new hybridization
        target = delta_new if delta_old is None else 0.7 * delta_new + 0.3 * delta_old
        delta_old = delta_new
        arr = chi2_fitgf(cfg, target[None, None, None, None, :][0, 0],
                         bath_to_array(bath), ispin=1)
        bath = array_to_bath(arr, cfg)

    # converged (or monotonically heading there) and half-filled
    assert err_hist[-1] < 5e-3, err_hist
    assert abs(res.dens[0] - 1.0) < 1e-6
    # causal G on the Matsubara axis
    assert np.all(np.imag(g) < 0)
