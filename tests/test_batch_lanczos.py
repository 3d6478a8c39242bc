"""Lockstep-batched same-shape Lanczos sectors == serial sector loop.

diag.py groups Lanczos-sized sectors with identical (ph, dw, up) shapes —
across inequivalent-impurity sites and particle-hole partners within a
site — into single vmapped DS-sweep launches (ops.lanczos
.eigsh_lowest_batch / lanczos_sweep_ds_batch).  The reference runs sectors
strictly serially (ED_DIAG_NORMAL.f90:108; SURVEY §2.4.1)."""
import numpy as np
import jax.numpy as jnp

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.solver.core import solve_impurity, solve_impurity_sites
from edipack_tpu.umatrix import build_umatrix


BASE = dict(norb=1, nbath=4, nspin=1, uloc=[2.0], xmu=0.3, beta=50.0,
            lmats=12, ed_verbose=0, lanc_dim_threshold=24,
            ed_mixed_matvec="always", ed_twin=False,
            ed_finite_temp=True, lanc_nstates_total=24, cutoff=1e-6)


def test_batched_lanczos_single_site_matches_serial():
    res = {}
    for batch in (False, True):
        cfg = default_config(**BASE, ed_batch_lanczos=batch)
        um = build_umatrix(cfg)
        bath = init_bath(cfg)
        hloc = np.zeros((1, 1, 1, 1))
        res[batch] = solve_impurity(cfg, hloc, um, bath)
    a, b = res[False], res[True]
    assert abs(a.e0 - b.e0) < 1e-9, (a.e0, b.e0)
    np.testing.assert_allclose(np.asarray(a.dens), np.asarray(b.dens),
                               atol=1e-8)
    for i, ev in a.diag.evals_by_sector.items():
        k = min(len(ev), len(b.diag.evals_by_sector[i]))
        np.testing.assert_allclose(np.sort(ev)[:k],
                                   np.sort(b.diag.evals_by_sector[i])[:k],
                                   atol=1e-8)
    z = 1j * (2 * np.arange(12) + 1) * np.pi / 50.0
    np.testing.assert_allclose(np.asarray(a.get_gimp(z)),
                               np.asarray(b.get_gimp(z)), atol=1e-6)


def test_batched_lanczos_cross_site():
    """Two inequivalent sites: the same sector from both sites shares one
    batched launch."""
    cfgs = {}
    outs = {}
    for batch in (False, True):
        cfg = default_config(**BASE, ed_batch_lanczos=batch)
        um = build_umatrix(cfg)
        bath1 = init_bath(cfg)
        bath2 = init_bath(cfg)
        hl1 = np.zeros((1, 1, 1, 1))
        hl2 = np.full((1, 1, 1, 1), 0.2)
        outs[batch] = solve_impurity_sites(
            cfg, [hl1, hl2], [um, um], [bath1, bath2])
        cfgs[batch] = cfg
    for s in range(2):
        a, b = outs[False][s], outs[True][s]
        assert abs(a.e0 - b.e0) < 1e-9, (s, a.e0, b.e0)
        np.testing.assert_allclose(np.asarray(a.dens), np.asarray(b.dens),
                                   atol=1e-8)
        z = 1j * (2 * np.arange(12) + 1) * np.pi / 50.0
        np.testing.assert_allclose(np.asarray(a.get_gimp(z)),
                                   np.asarray(b.get_gimp(z)), atol=1e-6)
