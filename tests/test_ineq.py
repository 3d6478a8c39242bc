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


def test_ineq_per_site_interactions_and_flag_gf(tmp_path):
    """Per-site Uloc overrides (E2I_MAIN.f90:261-265) and the flag_gf GF
    skip (:179)."""
    cfg = default_config(norb=1, nbath=2, nspin=1, uloc=[1.0], beta=80.0,
                         lmats=16, ed_output_dir=str(tmp_path))
    set_config(cfg)
    solver = ed.EDIneqSolver(2, cfg)
    baths = solver.init_solver()
    solver.set_hloc(np.zeros((1, 1, 1, 1)))   # single Hloc for all sites
    solver.solve(baths, uloc_ii=np.array([[1.0], [4.0]]),
                 ust_ii=np.zeros(2), flag_gf=True)
    docc = solver.get_docc()
    assert docc.shape == (2, 1)
    # stronger U suppresses double occupancy on that site only
    assert docc[1, 0] < docc[0, 0] - 1e-3
    # per-site eimp/doubles/evals/neigen getters deliver per-site arrays
    assert solver.get_eimp().shape[0] == 2
    assert solver.get_doubles().shape[0] == 2
    assert len(solver.get_evals()) == 2
    assert solver.get_mag("z").shape == (2, 1)

    # flag_gf=False: no dynamical pass; G evaluates to zero but statics live
    solver2 = ed.EDIneqSolver(2, cfg)
    b2 = solver2.init_solver()
    solver2.set_hloc(np.zeros((1, 1, 1, 1)))
    solver2.solve(b2, flag_gf=False)
    assert np.allclose(solver2.get_gimp(np.array([1j])), 0.0)
    assert np.all(solver2.get_dens() > 0)
