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


def _mk_superc_replica_cfg():
    from edipack_tpu.bath.replica import make_basis
    cfg = default_config(norb=2, nbath=2, nspin=1, ed_mode="superc",
                         bath_type="replica", beta=50.0, lfit=150,
                         cg_scheme="delta", cg_niter=800, cg_ftol=1e-12)
    # Nambu basis: N-type (h, -h^T), same-orbital pairing, cross pairing
    o1 = np.zeros((2, 2, 2, 2), complex)
    o1[0, 0] = np.diag([1.0, -1.0]); o1[1, 1] = -o1[0, 0].T
    o2 = np.zeros((2, 2, 2, 2), complex)
    o2[0, 1] = np.eye(2); o2[1, 0] = np.eye(2)
    o3 = np.zeros((2, 2, 2, 2), complex)
    o3[0, 1] = np.array([[0, 1], [1, 0]]); o3[1, 0] = o3[0, 1]
    basis = make_basis(np.stack([o1, o2, o3]),
                       np.array([[0.5, 0.2, 0.1], [-0.4, 0.15, 0.05]]))
    return cfg, basis


def test_superc_replica_delta_fit():
    """Replica-superc roundtrip: plant bath -> (Delta, FDelta) -> refit from
    a perturbed start -> recover both Nambu functions (reference
    ED_FIT_REPLICA.f90 superc branch)."""
    cfg, basis = _mk_superc_replica_cfg()
    truth = init_bath(cfg, basis=basis)
    truth.lambdas[:] = [[0.55, 0.22, 0.12], [-0.38, 0.18, 0.04]]
    truth.vs[:] = [0.45, 0.6]
    z = matsubara_grid(cfg, cfg.lfit)
    dd = delta_bath(cfg, truth, z)[0, 0]
    fd = fdelta_bath(cfg, truth, z)[0, 0]
    start = init_bath(cfg, basis=basis)
    arr = chi2_fitgf(cfg, np.stack([dd, fd]), bath_to_array(start),
                     ispin=1, basis=basis)
    fit = array_to_bath(arr, cfg, basis)
    dd_f = delta_bath(cfg, fit, z)[0, 0]
    fd_f = fdelta_bath(cfg, fit, z)[0, 0]
    assert np.abs(dd_f - dd).max() < 5e-4, np.abs(dd_f - dd).max()
    assert np.abs(fd_f - fd).max() < 5e-4, np.abs(fd_f - fd).max()


def test_nonsu2_replica_delta_fit():
    """Replica-nonsu2 roundtrip with a spin-mixing basis operator."""
    from edipack_tpu.bath.replica import make_basis
    cfg = default_config(norb=1, nbath=2, nspin=2, ed_mode="nonsu2",
                         bath_type="replica", beta=40.0, lfit=120,
                         cg_scheme="delta", cg_niter=800, cg_ftol=1e-12)
    o1 = np.zeros((2, 2, 1, 1), complex)
    o1[0, 0, 0, 0] = 1.0; o1[1, 1, 0, 0] = 1.0        # identity
    o2 = np.zeros((2, 2, 1, 1), complex)
    o2[0, 1, 0, 0] = 1.0; o2[1, 0, 0, 0] = 1.0        # sigma_x spin flip
    basis = make_basis(np.stack([o1, o2]),
                       np.array([[-0.4, 0.2], [0.5, 0.15]]))
    truth = init_bath(cfg, basis=basis)
    truth.lambdas[:] = [[-0.45, 0.25], [0.55, 0.1]]
    truth.vs[:] = [0.5, 0.35]
    z = matsubara_grid(cfg, cfg.lfit)
    target = delta_bath(cfg, truth, z)
    arr = chi2_fitgf(cfg, target, bath_to_array(init_bath(cfg, basis=basis)),
                     ispin=1, basis=basis)
    fit = array_to_bath(arr, cfg, basis)
    d_f = delta_bath(cfg, fit, z)
    assert np.abs(d_f - target).max() < 1e-3, np.abs(d_f - target).max()


def test_fit_iorb_component():
    """iorb argument fits a single orbital's bath block only (reference
    ED_BATH_FIT.f90:112-113)."""
    cfg = default_config(norb=2, nbath=3, nspin=1, beta=50.0, lfit=150,
                         cg_scheme="delta", cg_niter=600, cg_ftol=1e-12)
    truth = init_bath(cfg)
    truth.e[0, 0] = [-0.5, 0.1, 0.7]
    truth.v[0, 0] = [0.4, 0.3, 0.5]
    z = matsubara_grid(cfg, cfg.lfit)
    target = delta_bath(cfg, truth, z)[0, 0]
    start = init_bath(cfg)
    arr = chi2_fitgf(cfg, target, bath_to_array(start), ispin=1, iorb=1)
    fit = array_to_bath(arr, cfg)
    d_f = delta_bath(cfg, fit, z)[0, 0]
    # fitted orbital 1 matches; orbital 2 untouched (kept at the start bath)
    assert np.abs(d_f[0, 0] - target[0, 0]).max() < 5e-4
    assert np.allclose(fit.e[0, 1], start.e[0, 1])
    assert np.allclose(fit.v[0, 1], start.v[0, 1])


def test_fit_frobenius_norm():
    """cg_norm=frobenius reaches the same hybrid-bath minimum."""
    cfg = default_config(norb=2, nbath=3, nspin=1, bath_type="hybrid",
                         beta=50.0, lfit=150, cg_scheme="delta",
                         cg_niter=800, cg_ftol=1e-12, cg_norm="frobenius")
    truth = init_bath(cfg)
    truth.e[0, 0] = [-0.6, 0.0, 0.6]
    truth.v[0] = [[0.4, 0.3, 0.5], [0.25, 0.45, 0.3]]
    z = matsubara_grid(cfg, cfg.lfit)
    target = delta_bath(cfg, truth, z)[0, 0]
    arr = chi2_fitgf(cfg, target, bath_to_array(init_bath(cfg)), ispin=1)
    fit = array_to_bath(arr, cfg)
    d_f = delta_bath(cfg, fit, z)[0, 0]
    assert np.abs(d_f - target).max() < 1e-3, np.abs(d_f - target).max()
