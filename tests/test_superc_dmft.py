"""Attractive-U Bethe-lattice DMFT with s-wave pairing (benchmark config 3):
the superc solver + Nambu fit sustain a nonzero superconducting order
parameter through the self-consistency."""
import numpy as np
import pytest

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import array_to_bath, bath_to_array, init_bath
from edipack_tpu.bath.fit import chi2_fitgf
from edipack_tpu.bath.functions import matsubara_grid
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.umatrix import build_umatrix


@pytest.mark.slow
def test_attractive_u_superc_loop():
    t_hop = 0.5   # Bethe half-bandwidth D = 1
    cfg = default_config(norb=1, nbath=4, nspin=1, ed_mode="superc",
                         uloc=[-1.8], xmu=0.0, beta=50.0, lmats=256,
                         lfit=150, cg_scheme="delta", cg_niter=400,
                         cg_ftol=1e-8, deltasc=0.2, hfmode=True)
    um = build_umatrix(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    bath = init_bath(cfg)
    z = matsubara_grid(cfg, cfg.lmats)
    zf = z[: cfg.lfit]

    phis = []
    for it in range(10):
        res = solve_impurity(cfg, hloc, um, bath)
        g = res.get_gimp(z)[0, 0, 0, 0]
        f = res.get_gimp(z, typ="a")[0, 0, 0, 0]
        phis.append(res.obs.phisc[0, 0])
        # Bethe Nambu self-consistency: Δ = t² G, FΔ = -t² F
        target = np.stack([(t_hop ** 2) * g[: cfg.lfit],
                           -(t_hop ** 2) * f[: cfg.lfit]])
        arr = chi2_fitgf(cfg, target, bath_to_array(bath), ispin=1)
        # enforce particle-hole symmetry at half filling so the fit cannot
        # drift into a ph-asymmetric bath (reference ph_symmetrize_bath usage)
        from edipack_tpu.bath.user import ed_ph_symmetrize_bath
        arr = ed_ph_symmetrize_bath(arr, cfg=cfg)
        bath = array_to_bath(arr, cfg)
        if it >= 2 and abs(phis[-1] - phis[-2]) < 1e-4:
            break

    # superconductivity survives self-consistency
    assert phis[-1] > 0.05, phis
    assert np.max(np.abs(f)) > 1e-3
    # anomalous self-energy is finite
    self_a = res.get_self(z)[0, 0, 0, 0]
    assert np.max(np.abs(self_a)) > 1e-2
    # half filling maintained by ph symmetry
    assert abs(res.dens[0] - 1.0) < 1e-4
