"""superc / nonsu2 bath fits recover known baths."""
import numpy as np
import pytest

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import array_to_bath, bath_to_array, init_bath
from edipack_tpu.bath.fit import chi2_fitgf
from edipack_tpu.bath.functions import delta_bath, fdelta_bath, matsubara_grid


def test_superc_delta_fit():
    cfg = default_config(norb=1, nbath=3, nspin=1, ed_mode="superc",
                         beta=50.0, lfit=200, cg_scheme="delta",
                         cg_niter=800, cg_ftol=1e-12)
    truth = init_bath(cfg)
    truth.e[0, 0] = [-0.6, 0.05, 0.8]
    truth.d[0, 0] = [0.3, 0.25, 0.2]
    truth.v[0, 0] = [0.4, 0.3, 0.5]
    z = matsubara_grid(cfg, cfg.lfit)
    dd = delta_bath(cfg, truth, z)[0, 0]
    fd = fdelta_bath(cfg, truth, z)[0, 0]
    target = np.stack([dd, fd])
    arr = chi2_fitgf(cfg, target, bath_to_array(init_bath(cfg)), ispin=1)
    fit = array_to_bath(arr, cfg)
    dd_f = delta_bath(cfg, fit, z)[0, 0]
    fd_f = fdelta_bath(cfg, fit, z)[0, 0]
    assert np.abs(dd_f - dd).max() < 2e-4, np.abs(dd_f - dd).max()
    assert np.abs(fd_f - fd).max() < 2e-4, np.abs(fd_f - fd).max()


def test_nonsu2_delta_fit():
    cfg = default_config(norb=1, nbath=2, nspin=2, ed_mode="nonsu2",
                         beta=40.0, lfit=150, cg_scheme="delta",
                         cg_niter=800, cg_ftol=1e-12)
    truth = init_bath(cfg)
    truth.e[:, 0] = [[-0.5, 0.7], [-0.5, 0.7]]
    truth.v[:, 0] = [[0.45, 0.35], [0.45, 0.35]]
    truth.u[:, 0] = [[0.2, 0.15], [0.2, 0.15]]
    z = matsubara_grid(cfg, cfg.lfit)
    target = delta_bath(cfg, truth, z)
    arr = chi2_fitgf(cfg, target, bath_to_array(init_bath(cfg)), ispin=1)
    fit = array_to_bath(arr, cfg)
    d_f = delta_bath(cfg, fit, z)
    assert np.abs(d_f - target).max() < 1e-3, np.abs(d_f - target).max()
