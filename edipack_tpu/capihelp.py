"""Flat-buffer helpers for the C ABI (edipack_tpu/capi).

The C layer passes flat float lists + dims; these helpers reshape and call
the public ed_* API. Parity targets are the reference C bindings
(src/c_bindings/edipack_cbindings.h): init_Hreplica/Hgeneral_symmetries_*,
get_sigma/gimp rank overloads, lattice (ineq) variants, chi getters.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from . import main as M
from .config import get_config
from .ineq import EDIneqSolver

_ineq: Optional[EDIneqSolver] = None


def _cplx(re, im, shape):
    a = np.asarray(re, float).reshape(shape)
    b = np.asarray(im, float).reshape(shape) if im is not None else 0.0
    return a + 1j * b


# -- replica/general bases --------------------------------------------------

def set_hreplica_flat(re, im, nsym, nspin, norb, lam, nbath):
    ops = _cplx(re, im, (nsym, nspin, nspin, norb, norb))
    lam = np.asarray(lam, float)
    if lam.size == nsym:
        lam = lam.reshape(nsym)
    else:
        lam = lam.reshape(nbath, nsym)
    from .bath.user import ed_set_hreplica
    ed_set_hreplica(ops, lam, nbath=nbath)
    return 0


def set_hgeneral_flat(re, im, nsym, nspin, norb, lam, nbath):
    ops = _cplx(re, im, (nsym, nspin, nspin, norb, norb))
    lam = np.asarray(lam, float)
    lam = lam.reshape(nsym) if lam.size == nsym else lam.reshape(nbath, nsym)
    from .bath.user import ed_set_hgeneral
    ed_set_hgeneral(ops, lam, nbath=nbath)
    return 0


# -- dynamical getters on default grids --------------------------------------

def get_gf(which: str, axis: str = "m", typ: str = "n"):
    fn = {"sigma": M.ed_get_sigma, "gimp": M.ed_get_gimp,
          "g0imp": M.ed_get_g0imp, "dimp": M.ed_get_dimp}[which]
    if which == "dimp":
        return np.ascontiguousarray(fn(None, axis))
    return np.ascontiguousarray(fn(None, axis, typ))


def get_chi(kind: str, axis: str = "m"):
    return np.ascontiguousarray(M.ed_get_chi(kind, None, axis))


def get_rdm_flat():
    r = M.ed_get_rdm()
    return np.ascontiguousarray(np.asarray(r))


def get_sp_dm_flat():
    return np.ascontiguousarray(np.asarray(M.ed_get_sp_dm()))


# -- ineq (lattice) -----------------------------------------------------------

def ineq_init(nineq: int):
    global _ineq
    _ineq = EDIneqSolver(int(nineq), get_config())
    return 0


def _I() -> EDIneqSolver:
    if _ineq is None:
        raise RuntimeError("call ineq_init first")
    return _ineq


def ineq_init_solver(baths_flat=None, nb: int = 0):
    s = _I()
    baths = None
    if baths_flat is not None and nb > 0:
        baths = np.asarray(baths_flat, float).reshape(s.nineq, nb)
    return np.ascontiguousarray(s.init_solver(baths))


def ineq_set_hloc(re, im, nso: int, per_site: int):
    s = _I()
    if per_site:
        h = _cplx(re, im, (s.nineq, nso, nso))
    else:
        h = _cplx(re, im, (nso, nso))
    s.set_hloc(h)
    return 0


def ineq_solve(baths_flat, nb: int, flag_gf: int = 1):
    s = _I()
    baths = np.asarray(baths_flat, float).reshape(s.nineq, nb)
    s.solve(baths, flag_gf=bool(flag_gf))
    return 0


def ineq_get(name: str, *args):
    s = _I()
    fn = getattr(s, "get_" + name)
    return np.ascontiguousarray(np.asarray(fn(*args)))


def ineq_fit_gf(funcs_flat, l: int, baths_flat, nb: int, ispin: int = 1):
    s = _I()
    cfg = s.solvers[0].cfg
    funcs = np.asarray(funcs_flat, float).view(complex).reshape(
        s.nineq, cfg.norb, cfg.norb, l)
    baths = np.asarray(baths_flat, float).reshape(s.nineq, nb)
    return np.ascontiguousarray(s.fit_gf(funcs, baths, ispin=ispin))
