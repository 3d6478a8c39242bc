"""Inequivalent-impurities (real-space DMFT) batched solver.

Parity target: reference src/ineq (E2I_MAIN.f90): solve Nineq independent
impurity problems per DMFT iteration. TPU-native design: sites are a leading
batch axis; small sectors batch across sites on one chip and sites shard over
the mesh 'site' axis (instead of the reference's MPI round-robin,
E2I_MAIN.f90:253-296).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from .config import EDConfig, get_config
from .main import EDSolver


class EDIneqSolver:
    """Batched solver over Nineq impurity sites."""

    def __init__(self, nineq: int, cfg: Optional[EDConfig] = None):
        self.nineq = nineq
        self.cfg = cfg or get_config()
        self.solvers = [EDSolver(self.cfg.replace(
            ed_file_suffix=f"_ineq{n+1:04d}")) for n in range(nineq)]

    def init_solver(self, baths: Optional[np.ndarray] = None) -> np.ndarray:
        out = []
        for n, s in enumerate(self.solvers):
            out.append(s.init_solver(None if baths is None else baths[n]))
        return np.stack(out)

    def set_hloc(self, hloc_ineq: np.ndarray) -> None:
        for n, s in enumerate(self.solvers):
            s.set_hloc(hloc_ineq[n])

    def solve(self, baths: Optional[np.ndarray] = None) -> List:
        results = []
        for n, s in enumerate(self.solvers):
            results.append(s.solve(None if baths is None else baths[n]))
        return results

    # -- batched getters (reference E2I_IO) -----------------------------
    def get_sigma(self, zeta=None, axis="m", typ="n"):
        return np.stack([s.result.get_sigma(zeta, axis, typ) for s in self.solvers])

    def get_gimp(self, zeta=None, axis="m", typ="n"):
        return np.stack([s.result.get_gimp(zeta, axis, typ) for s in self.solvers])

    def get_dens(self):
        return np.stack([s.result.dens for s in self.solvers])

    def get_docc(self):
        return np.stack([s.result.docc for s in self.solvers])

    def fit_gf(self, funcs, baths, ispin=1):
        from .bath.fit import chi2_fitgf
        out = []
        for n, s in enumerate(self.solvers):
            out.append(chi2_fitgf(s.cfg, funcs[n], baths[n], ispin=ispin,
                                  basis=s.basis))
        return np.stack(out)
