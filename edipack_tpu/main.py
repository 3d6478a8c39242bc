"""Solver lifecycle and the `ed_*` functional API.

Parity target: reference ED_MAIN.f90 (`ed_init_solver` :90-139, `ed_solve`
:164-228, `ed_finalize_solver` :236-266) and the EDIPACK.f90 re-export
surface. The class :class:`EDSolver` is the underlying object API; the
module-level `ed_*` functions mirror the reference's global-state workflow.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from .config import EDConfig, get_config
from .umatrix import TwoBodyTerm, Umatrix, build_umatrix, make_term
from .bath.dmft_bath import (array_to_bath, bath_to_array, get_bath_dimension,
                             init_bath)
from .bath.user import get_global_basis
from .solver.core import SolveResult, solve_impurity

# ---------------------------------------------------------------------------
# object API
# ---------------------------------------------------------------------------


class EDSolver:
    """One impurity solver instance (the reference equivalent is the global
    module state between ed_init_solver / ed_finalize_solver)."""

    def __init__(self, cfg: Optional[EDConfig] = None):
        self.cfg = cfg or get_config()
        self.cfg.validate()
        self.hloc = np.zeros((self.cfg.nspin, self.cfg.nspin,
                              self.cfg.norb, self.cfg.norb), dtype=complex)
        self.hloc_anomalous: Optional[np.ndarray] = None
        self.runtime_terms: List[TwoBodyTerm] = []
        self.result: Optional[SolveResult] = None
        self.basis = get_global_basis()
        self.neigen_sector_override = None

    # -- lifecycle ------------------------------------------------------
    def init_solver(self, bath_array: Optional[np.ndarray] = None) -> np.ndarray:
        """Initialize (or adopt) the bath; returns the packed bath array
        (reference ed_init_solver fills the user array in place)."""
        self.basis = get_global_basis()
        if bath_array is not None and np.asarray(bath_array).size \
                == get_bath_dimension(self.cfg, self.basis) \
                and np.any(np.asarray(bath_array) != 0):
            self.bath = array_to_bath(bath_array, self.cfg, self.basis)
        else:
            import os
            restart = self.cfg.hfile + self.cfg.ed_file_suffix + ".restart"
            self.bath = init_bath(self.cfg, basis=self.basis,
                                  restart_file=restart)
        return bath_to_array(self.bath)

    def set_hloc(self, hloc: np.ndarray, hloc_anomalous=None) -> None:
        """reference ed_set_Hloc (ED_AUX_FUNX.f90:202-274). Accepts
        (Nspin,Nspin,Norb,Norb) or (Nspin*Norb, Nspin*Norb)."""
        ns, no = self.cfg.nspin, self.cfg.norb
        h = np.asarray(hloc, dtype=complex)
        if h.shape == (ns * no, ns * no):
            h = h.reshape(ns, no, ns, no).transpose(0, 2, 1, 3)
        if h.shape != (ns, ns, no, no):
            raise ValueError(f"bad Hloc shape {h.shape}")
        self.hloc = h
        if hloc_anomalous is not None:
            ha = np.asarray(hloc_anomalous, dtype=complex)
            if ha.shape[-2:] != (no, no):
                raise ValueError(f"bad anomalous Hloc shape {ha.shape}")
            self.hloc_anomalous = ha.reshape(no, no) if ha.ndim == 2 \
                else ha[0, 0]

    def add_twobody_operator(self, oi, si, oj, sj, ok, sk, ol, sl, u) -> None:
        self.runtime_terms.append(make_term(oi, si, oj, sj, ok, sk, ol, sl, u))

    def reset_umatrix(self) -> None:
        self.runtime_terms = []

    def solve(self, bath_array: Optional[np.ndarray] = None,
              flag_gf: bool = True) -> SolveResult:
        if bath_array is not None:
            self.bath = array_to_bath(bath_array, self.cfg, self.basis)
        um = build_umatrix(self.cfg, runtime_terms=self.runtime_terms)
        neigen = self.neigen_sector_override
        sector_mask = None
        from . import io as edio
        from .sectors import SectorTable
        if neigen is None or self.cfg.ed_sectors:
            table = SectorTable(self.cfg)
            if neigen is None:
                neigen = edio.read_state_list_restart(self.cfg, table)
            if self.cfg.ed_sectors:
                sector_mask = edio.read_sectors_restart(self.cfg, table)
        self.result = solve_impurity(self.cfg, self.hloc, um, self.bath,
                                     neigen_override=neigen,
                                     sector_mask=sector_mask,
                                     hloc_anomalous=self.hloc_anomalous,
                                     flag_gf=flag_gf)
        if self.cfg.ed_write_files:
            edio.write_all_outputs(self.cfg, self.result)
        return self.result

    def finalize(self) -> None:
        self.result = None


# ---------------------------------------------------------------------------
# module-level functional API (global-state parity with the reference)
# ---------------------------------------------------------------------------

_solver: Optional[EDSolver] = None


def _S() -> EDSolver:
    if _solver is None:
        raise RuntimeError("call ed_init_solver first")
    return _solver


def ed_init_solver(bath=None, cfg: Optional[EDConfig] = None):
    global _solver
    _solver = EDSolver(cfg)
    arr = _solver.init_solver(bath)
    if bath is not None and hasattr(bath, "__setitem__") \
            and np.asarray(bath).size == arr.size:
        np.asarray(bath)[...] = arr.reshape(np.asarray(bath).shape)
    return arr


def ed_set_hloc(hloc, hloc_anomalous=None) -> None:
    _S().set_hloc(hloc, hloc_anomalous)


def ed_solve(bath=None, flag_gf: bool = True):
    """reference ed_solve(bath, flag_gf) (ED_MAIN.f90:164; flag_gf skips the
    dynamical-response pass, E2I_MAIN.f90:179)."""
    return _S().solve(np.asarray(bath, float) if bath is not None else None,
                      flag_gf=flag_gf)


def ed_finalize_solver() -> None:
    global _solver
    if _solver is not None:
        _solver.finalize()
    _solver = None


def ed_get_bath_dimension(cfg: Optional[EDConfig] = None) -> int:
    return get_bath_dimension(cfg or get_config(), get_global_basis())


def ed_add_twobody_operator(oi, si, oj, sj, ok, sk, ol, sl, u) -> None:
    _S().add_twobody_operator(oi, si, oj, sj, ok, sk, ol, sl, u)


def ed_reset_umatrix() -> None:
    _S().reset_umatrix()


# -- result getters (reference ED_IO) ---------------------------------------


def _R() -> "SolveResult":
    r = _S().result
    if r is None:
        raise RuntimeError("call ed_solve first")
    return r


def ed_get_sigma(zeta=None, axis="m", typ="n"):
    return _R().get_sigma(zeta, axis, typ)


def ed_get_gimp(zeta=None, axis="m", typ="n"):
    return _R().get_gimp(zeta, axis, typ)


def ed_get_g0imp(zeta=None, axis="m", typ="n"):
    return _R().get_g0imp(zeta, axis, typ)


def ed_get_dimp(zeta=None, axis="m"):
    return _R().get_dimp(zeta, axis)


def ed_get_g0and(zeta, bath=None, axis="m", typ="n"):
    """Evaluate the Anderson Weiss field; with an explicit packed ``bath``
    array the evaluation uses that bath instead of the solved one
    (reference ed_get_g0and signature)."""
    if bath is None:
        return _R().get_g0and(zeta, axis, typ)
    from .bath.dmft_bath import array_to_bath
    from .bath.functions import g0and_bath
    cfg = get_config()
    b = array_to_bath(np.asarray(bath, float), cfg, get_global_basis())
    return g0and_bath(cfg, b, _S().hloc, np.asarray(zeta, complex))


def ed_get_delta(zeta, bath=None, axis="m", typ="n"):
    if bath is None:
        return _R().get_delta(zeta, axis, typ)
    from .bath.dmft_bath import array_to_bath
    from .bath.functions import delta_bath, fdelta_bath
    cfg = get_config()
    b = array_to_bath(np.asarray(bath, float), cfg, get_global_basis())
    fn = delta_bath if typ == "n" else fdelta_bath
    return fn(cfg, b, np.asarray(zeta, complex))


def ed_get_dens():
    return _R().dens


def ed_get_docc():
    return _R().docc


def ed_get_mag(component="z"):
    return _R().mag[{"x": 0, "y": 1, "z": 2}[component]]


def ed_get_phi():
    return _R().phisc


def ed_get_argphi():
    return _R().argphi


def ed_get_exct():
    return _R().exct


def ed_get_eimp():
    return _R().energies


def ed_get_doubles():
    return _R().doubles


def ed_get_evals():
    return _R().evals


def ed_get_neigen_sector():
    return _R().neigen_sector


def ed_set_neigen_sector(neigen):
    _S().neigen_sector_override = np.asarray(neigen, int)


def ed_get_chi(kind="spin", zeta=None, axis="m"):
    return _R().get_chi(kind, zeta, axis)


def ed_get_rdm(norbs=None):
    return _R().get_rdm(norbs)


def ed_get_reduced_rdm(orbital_mask):
    """Orbital-subset impurity RDM with fermionic sign bookkeeping
    (reference get_reduced_rdm, ED_RDM.f90:71-230)."""
    from .solver.rdm import get_reduced_rdm
    r = _R()
    return get_reduced_rdm(r.get_rdm(), orbital_mask, r.cfg.norb)


def ed_update_input(name: str, vals):
    """Runtime update of the whitelisted input fields (reference
    ed_update_input, ED_INPUT_VARS.f90:887-916): EXC_FIELD, PAIR_FIELD,
    SPIN_FIELD_X/Y/Z."""
    s = _S()
    cfg = s.cfg
    key = name.upper()
    vals = list(np.atleast_1d(np.asarray(vals, float)))
    sizes = {"EXC_FIELD": 4, "PAIR_FIELD": cfg.norb,
             "SPIN_FIELD_X": cfg.norb, "SPIN_FIELD_Y": cfg.norb,
             "SPIN_FIELD_Z": cfg.norb}
    if key not in sizes:
        raise ValueError("WRONG NAME ON ED_UPDATE_INPUT")
    if len(vals) != sizes[key]:
        raise ValueError(f"WRONG SIZE IN ED_UPDATE_{key}")
    field = key.lower()
    if key != "EXC_FIELD":
        cur = list(getattr(cfg, field))
        cur[:len(vals)] = vals
        vals = cur
    s.cfg = cfg.replace(**{field: vals})


def ed_get_sp_dm():
    return _R().single_particle_dm


def ed_get_imp_info():
    return _R().imp_info


def ed_search_variable(var: float, ntmp: float, converged: bool):
    """Chemical-potential search helper (reference ed_search_variable /
    search_chemical_potential, ED_AUX_FUNX.f90:1228-1516): adjust ``var``
    toward the target density cfg.nread given the measured density ``ntmp``."""
    from .solver.mu_search import search_variable
    return search_variable(get_config(), var, ntmp, converged)


def ed_chi2_fitgf(func, bath, ispin=1, iorb=None, fmpi=True):
    """Bath fit on the packed user array (reference ed_chi2_fitgf,
    ED_FIT/ED_BATH_FIT.f90:29-55)."""
    from .bath.fit import chi2_fitgf
    cfg = get_config()
    return chi2_fitgf(cfg, np.asarray(func), np.asarray(bath, float),
                      ispin=ispin, iorb=iorb, basis=get_global_basis())
