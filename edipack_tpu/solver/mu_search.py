"""Fixed-density chemical-potential controller.

Parity target: reference `ed_search_variable`/`search_chemical_potential`
(ED_AUX_FUNX.f90:1228-1516): adjust xmu between DMFT iterations toward the
target density `nread` with an adaptive step, persisted via xmu.restart.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import EDConfig


@dataclass
class MuSearchState:
    ndelta: float
    nold: float = None
    sign_old: int = 0


_state: MuSearchState = None


def search_variable(cfg: EDConfig, var: float, ntmp: float, converged: bool):
    """One controller step. Returns (new_var, still_converged).

    Bisection-flavoured: step toward the target, halving the step on sign
    change of the density error (the reference's ndelta shrink logic)."""
    global _state
    if _state is None:
        _state = MuSearchState(ndelta=cfg.ndelta * cfg.ncoeff)
    nerror = cfg.nread - ntmp
    if abs(nerror) < cfg.nerr:
        return var, converged
    sign = 1 if nerror > 0 else -1
    if _state.sign_old != 0 and sign != _state.sign_old:
        _state.ndelta = _state.ndelta / 2.0
    _state.sign_old = sign
    new_var = var + sign * _state.ndelta
    return new_var, False


def reset_search():
    global _state
    _state = None
