"""edipack_tpu — a TPU-native exact-diagonalization engine for quantum impurity
problems (the capabilities of EDIpack, re-designed for JAX/XLA/Pallas/pjit).

Design stance (vs the Fortran+MPI reference at EDIpack v6.1.0):

* Sector vectors in the *normal* mode are dense matrices ``V[DimDw, DimUp]``
  (× phonon axis) and every Hamiltonian term is a Kronecker factor
  ``A_up ⊗ B_dw``; the matvec is a handful of dense matmuls that run on the
  MXU instead of the reference's row-loop CSR SpMV
  (cf. reference ED_NORMAL/ED_HAMILTONIAN_NORMAL_STORED_HxV.f90).
* superc/nonsu2 joint sectors use padded-ELL sparse matvec + dense fallback.
* Sector enumeration / term generation is vectorized host-side (NumPy / C++),
  everything on the solve path is jittable with static shapes.
* Multi-chip scaling shards the dw axis of V over a `jax.sharding.Mesh`;
  the reference's MPI_AlltoAllV "vector transpose" becomes an XLA collective
  inserted by GSPMD (cf. reference ED_HAMILTONIAN_NORMAL_COMMON.f90:66-167).

Public API mirrors the reference's Fortran/Python-facing surface
(`ed_init_solver`, `ed_solve`, `ed_get_sigma`, ... — reference EDIPACK.f90).
"""
import os

# f64 is required for Lanczos recurrences and 1e-8-grade observables
# (reference lanc_tolerance=1e-18, ED_INPUT_VARS.f90:731). Opt out with
# EDIPACK_TPU_NO_X64=1 before first import.
if not os.environ.get("EDIPACK_TPU_NO_X64"):
    import jax

    jax.config.update("jax_enable_x64", True)

from .version import __version__
from .config import EDConfig, ed_read_input, default_config, get_config, set_config
from .main import (
    EDSolver,
    ed_init_solver,
    ed_solve,
    ed_finalize_solver,
    ed_set_hloc,
    ed_get_bath_dimension,
    ed_get_sigma,
    ed_get_gimp,
    ed_get_g0imp,
    ed_get_dimp,
    ed_get_dens,
    ed_get_docc,
    ed_get_mag,
    ed_get_phi,
    ed_get_argphi,
    ed_get_exct,
    ed_get_eimp,
    ed_get_doubles,
    ed_get_evals,
    ed_get_neigen_sector,
    ed_set_neigen_sector,
    ed_get_chi,
    ed_get_rdm,
    ed_get_sp_dm,
    ed_get_imp_info,
    ed_get_g0and,
    ed_get_delta,
    ed_chi2_fitgf,
    ed_add_twobody_operator,
    ed_reset_umatrix,
    ed_search_variable,
)
from .bath import (
    ed_set_hreplica,
    ed_set_hgeneral,
    ed_spin_symmetrize_bath,
    ed_orb_symmetrize_bath,
    ed_break_symmetry_bath,
    ed_orb_equality_bath,
    ed_ph_symmetrize_bath,
    ed_enforce_normal_bath,
)
from .ineq import EDIneqSolver

__all__ = [k for k in dir() if k.startswith("ed_") or k in
           ("EDConfig", "EDSolver", "EDIneqSolver", "__version__")]
