"""Inequivalent-impurities batched solver (reference src/ineq E2I layer)."""
import numpy as np

import edipack_tpu as ed
from edipack_tpu.config import default_config, set_config


def test_ineq_two_sites(tmp_path):
    cfg = default_config(norb=1, nbath=2, nspin=1, uloc=[2.0], beta=100.0,
                         lmats=32, ed_output_dir=str(tmp_path))
    set_config(cfg)
    solver = ed.EDIneqSolver(2, cfg)
    baths = solver.init_solver()
    assert baths.shape[0] == 2
    hloc = np.zeros((2, 1, 1, 1, 1))
    hloc[0, 0, 0, 0, 0] = 0.3    # site-dependent local level
    hloc[1, 0, 0, 0, 0] = -0.3
    solver.set_hloc(hloc)
    solver.solve(baths)
    dens = solver.get_dens()
    assert dens.shape == (2, 1)
    # site 0 (higher level) is less occupied than site 1 (ph conjugates)
    assert dens[0, 0] < dens[1, 0]
    assert abs((dens[0, 0] + dens[1, 0]) - 2.0) < 1e-6  # ph-related pair
    sig = solver.get_sigma(1j * (2 * np.arange(16) + 1) * np.pi / cfg.beta)
    assert sig.shape == (2, 1, 1, 1, 1, 16)
    g = solver.get_gimp(1j * (2 * np.arange(16) + 1) * np.pi / cfg.beta)
    assert np.all(np.imag(g[:, 0, 0, 0, 0, :]) < 0)
    # batched fit runs
    from edipack_tpu.bath.functions import matsubara_grid, delta_bath
    z = matsubara_grid(cfg, 64)
    targets = np.stack([
        delta_bath(cfg, s.result.bath, z)[0, 0] for s in solver.solvers])
    cfg2 = cfg.replace(cg_scheme="delta", lfit=64)
    for s in solver.solvers:
        s.cfg = cfg2
    new_baths = solver.fit_gf(targets, baths)
    assert new_baths.shape == baths.shape
