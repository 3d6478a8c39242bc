"""nonsu2 quantum-SOC-operator observables (reference
ED_IO/get_imp_SOC_op.f90:289-400): matrix-level identities plus a
free-fermion oracle — with U=0 and a decoupled bath the impurity density
matrix is the projector onto the occupied one-body orbitals, so
⟨L·S⟩/⟨J⟩/⟨J²⟩ have closed forms."""
import numpy as np
import pytest

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.solver.soc import (atomic_j, atomic_soc,
                                    atomic_soc_rotation,
                                    orbital_lz_rotation,
                                    quantum_soc_operators)
from edipack_tpu.umatrix import build_umatrix


def test_soc_matrix_identities():
    """U diagonalizes L·S (t2g: J=1/2 doublet at +1, J=3/2 quartet at
    -1/2), Jz eigenvalues, J² = j(j+1)."""
    ls = atomic_soc()
    u = atomic_soc_rotation()
    assert np.abs(u.conj().T @ u - np.eye(6)).max() < 1e-14
    d = u.conj().T @ ls @ u
    assert np.abs(d - np.diag(np.diag(d))).max() < 1e-14
    np.testing.assert_allclose(np.diag(d).real,
                               [1, 1, -0.5, -0.5, -0.5, -0.5], atol=1e-14)
    dz = np.diag(u.conj().T @ atomic_j("z") @ u).real
    np.testing.assert_allclose(dz, [-0.5, 0.5, -1.5, 1.5, -0.5, 0.5],
                               atol=1e-14)
    j2 = sum(atomic_j(c) @ atomic_j(c) for c in "xyz")
    d2 = np.diag(u.conj().T @ j2 @ u).real
    np.testing.assert_allclose(d2, [0.75, 0.75, 3.75, 3.75, 3.75, 3.75],
                               atol=1e-13)
    ul = orbital_lz_rotation()
    assert np.abs(ul.conj().T @ ul - np.eye(6)).max() < 1e-14


def _ls_hloc(lam):
    """Hloc = lam * (L·S) as the (2,2,3,3) nn block layout."""
    ls = atomic_soc()
    h = np.zeros((2, 2, 3, 3), complex)
    for s1 in range(2):
        for s2 in range(2):
            h[s1, s2] = lam * ls[3 * s1:3 * s1 + 3, 3 * s2:3 * s2 + 3]
    return h


def test_soc_operators_free_fermion_oracle():
    """U=0, decoupled replica bath, Hloc = λ L·S: the ground state fills
    the J=3/2 quartet ⇒ ⟨LS⟩ = 4·(−1/2) = −2, ⟨J_α⟩ = 0, tr(ρJ_α²) = 5."""
    from edipack_tpu.bath.user import ed_set_hreplica, clear_global_basis
    from edipack_tpu.config import set_config
    from edipack_tpu.solver.core import solve_impurity
    lam = 0.3
    cfg = default_config(norb=3, nbath=1, nspin=2, ed_mode="nonsu2",
                         bath_type="replica", uloc=[0.0, 0.0, 0.0],
                         xmu=0.0, beta=200.0, lmats=8, ed_verbose=0)
    set_config(cfg)
    eye6 = np.eye(6)[None, :, :]
    basis = ed_set_hreplica(eye6, [[-0.7]], nbath=1)
    um = build_umatrix(cfg)
    bath = init_bath(cfg, basis=basis)
    bath.vs[:] = 0.0          # decouple the bath (filled levels at -0.7)
    hloc = _ls_hloc(lam)
    res = solve_impurity(cfg, hloc, um, bath, flag_gf=False)
    clear_global_basis()
    rho = res.obs.imp_dm_nn
    assert rho is not None
    # exact one-body oracle: occupied orbitals = the J=3/2 quartet columns
    u = atomic_soc_rotation()
    occ = u[:, 2:6]
    rho_so_exact = np.conj(occ) @ occ.T          # ⟨c†_i c_j⟩
    rho_exact = np.zeros((2, 2, 3, 3), complex)
    for s1 in range(2):
        for s2 in range(2):
            rho_exact[s1, s2] = rho_so_exact[3 * s1:3 * s1 + 3,
                                             3 * s2:3 * s2 + 3]
    np.testing.assert_allclose(rho, rho_exact, atol=1e-7)
    soc = quantum_soc_operators(cfg, rho)
    assert abs(soc.ls_imp - (-2.0)) < 1e-7
    np.testing.assert_allclose(soc.j_imp, np.zeros(3), atol=1e-7)
    np.testing.assert_allclose(soc.j_imp_sq.real, [5.0, 5.0, 5.0],
                               atol=1e-7)
    # ⟨Sz⟩ per orbital and ⟨Lz⟩ per spin sum to ⟨Jz⟩ = 0
    sz_tot = np.trace(soc.s_imp[2]).real
    lz_tot = np.trace(soc.l_imp[2]).real
    assert abs(sz_tot + lz_tot) < 1e-7
    # getter-level guards
    from edipack_tpu.solver.soc import quantum_soc_operators as q
    with pytest.raises(ValueError):
        q(default_config(norb=2, nbath=1, nspin=2, ed_mode="nonsu2"),
          np.zeros((2, 2, 2, 2)))
