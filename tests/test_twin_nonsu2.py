"""nonsu2 twin-sector elision (ed_twin): Ntot > Ns sectors are skipped
during the sweep (reference ED_SETUP.f90:592-603); any elided sector whose
spectrum (particle-hole mirrored from its solved partner) survives the trim
is re-solved exactly (diag._resolve_nonsu2_twins) — there is no
basis-level signed permutation of the PH map valid for arbitrary baths,
so vectors are never reconstructed approximately.  Every solve product
must match the both-twins sweep at 1e-9."""
import numpy as np

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.umatrix import build_umatrix
from edipack_tpu.solver.core import solve_impurity


def _solve(tw, **over):
    # PH-symmetric point: xmu=0 with hfmode=True (U(n-1/2)(n-1/2)) and the
    # default symmetric bath levels — ed_twin is the user's assertion of
    # this symmetry, exactly as in the reference
    # no magnetic/in-plane fields: any field term flips sign under the PH
    # complement and breaks the sector pairing (verified numerically)
    base = dict(norb=1, nbath=2, nspin=2, ed_mode="nonsu2", uloc=[2.0],
                beta=30.0, xmu=0.0, lmats=12, ed_verbose=0,
                ed_finite_temp=True, lanc_nstates_total=24, cutoff=1e-6)
    base.update(over)
    cfg = default_config(**base, ed_twin=tw)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((cfg.nspin, cfg.nspin, cfg.norb, cfg.norb), complex)
    return cfg, solve_impurity(cfg, hloc, um, bath)


def test_nonsu2_twin_matches_full_sweep():
    cfg, a = _solve(False)
    _, b = _solve(True)
    assert abs(a.e0 - b.e0) < 1e-9
    # finite T at this beta retains states in N != Ns sectors, so elided
    # sectors must have been re-solved (identical retained state count)
    assert len(a.diag.state_list) == len(b.diag.state_list), \
        (len(a.diag.state_list), len(b.diag.state_list))
    secs_a = sorted(st.sector for st in a.diag.state_list)
    secs_b = sorted(st.sector for st in b.diag.state_list)
    assert secs_a == secs_b
    np.testing.assert_allclose(np.asarray(a.dens), np.asarray(b.dens),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(a.mag), np.asarray(b.mag),
                               atol=1e-9)
    z = 1j * (2 * np.arange(12) + 1) * np.pi / cfg.beta
    ga = np.asarray(a.get_gimp(z))
    gb = np.asarray(b.get_gimp(z))
    np.testing.assert_allclose(ga, gb, atol=1e-8)


def test_nonsu2_twin_t0_skips_half_the_sweep():
    """T=0: the ground multiplet lives in the self-twin N=Ns sector; the
    elided sweep must reproduce it without re-solving anything, and the
    mirrored energies must still be reported."""
    over = dict(ed_finite_temp=False, beta=1000.0)
    cfg, a = _solve(False, **over)
    _, b = _solve(True, **over)
    assert abs(a.e0 - b.e0) < 1e-9
    np.testing.assert_allclose(np.asarray(a.dens), np.asarray(b.dens),
                               atol=1e-9)
    # mirrored spectra are recorded for every nonempty sector
    assert set(a.diag.evals_by_sector) == set(b.diag.evals_by_sector)
    for i, ev in a.diag.evals_by_sector.items():
        np.testing.assert_allclose(np.sort(ev)[:3],
                                   np.sort(b.diag.evals_by_sector[i])[:3],
                                   atol=1e-9)
    z = 1j * (2 * np.arange(12) + 1) * np.pi / cfg.beta
    np.testing.assert_allclose(np.asarray(a.get_gimp(z)),
                               np.asarray(b.get_gimp(z)), atol=1e-8)
