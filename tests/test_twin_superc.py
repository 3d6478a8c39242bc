"""superc twin-sector elision (ed_twin): Sz<0 sectors are skipped and their
states reconstructed by the signed spin-swap permutation
(diag._twin_state_joint; reference twin_sector_order + flip_state_other,
ED_SECTOR.f90:1776-1816). Every solve product must match the both-twins
sweep."""
import numpy as np

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.umatrix import build_umatrix
from edipack_tpu.solver.core import solve_impurity


def _solve(tw, **over):
    base = dict(norb=1, nbath=2, nspin=1, ed_mode="superc", uloc=[2.0],
                deltasc=0.08, beta=40.0, xmu=0.15, lmats=12, ed_verbose=0,
                ed_finite_temp=True, lanc_nstates_total=20, cutoff=1e-7)
    base.update(over)
    cfg = default_config(**base, ed_twin=tw)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((cfg.nspin, cfg.nspin, cfg.norb, cfg.norb))
    return cfg, solve_impurity(cfg, hloc, um, bath)


def test_superc_twin_matches_full_sweep():
    cfg, a = _solve(False)
    _, b = _solve(True)
    # the odd-filling finite-T setup retains states in an Sz=+-1 pair, so
    # the elided path must actually build twin states
    twins = sum(1 for st in b.diag.state_list.states
                if getattr(st, "twin_of", None) is not None)
    assert twins > 0, "twin reconstruction never exercised"
    assert abs(a.e0 - b.e0) < 1e-10
    np.testing.assert_allclose(np.asarray(a.dens), np.asarray(b.dens),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(a.phisc), np.asarray(b.phisc),
                               atol=1e-10)
    z = 1j * (2 * np.arange(12) + 1) * np.pi / cfg.beta
    for typ in "na":
        ga = np.asarray(a.get_gimp(z, typ=typ))
        gb = np.asarray(b.get_gimp(z, typ=typ))
        np.testing.assert_allclose(ga, gb, atol=1e-8)


def test_superc_twin_multiorb_pairing():
    """norb=2 with inter-orbital U: pairing + interaction terms cross the
    signed permutation (the sign is nontrivial in odd-Sz sectors)."""
    over = dict(norb=2, nbath=2, uloc=[-1.2, -1.0], ust=0.4, xmu=0.3,
                deltasc=0.12, beta=60.0, ed_finite_temp=True,
                lanc_nstates_total=24, cutoff=1e-6)
    cfg, a = _solve(False, **over)
    _, b = _solve(True, **over)
    assert abs(a.e0 - b.e0) < 1e-10
    z = 1j * (2 * np.arange(12) + 1) * np.pi / cfg.beta
    for typ in "na":
        ga = np.asarray(a.get_gimp(z, typ=typ))
        gb = np.asarray(b.get_gimp(z, typ=typ))
        np.testing.assert_allclose(ga, gb, atol=1e-8)
