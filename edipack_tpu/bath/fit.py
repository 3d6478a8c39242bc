"""χ² bath fitting.

Parity target: reference ED_FIT/ (ED_BATH_FIT.f90:29-55 interface;
per-(bath_type×ed_mode) χ² and gradients, e.g. ED_FIT_NORMAL.f90:709-761).
TPU-native redesign: the Anderson function Δ(iω;p) / G0(iω;p) is written in
JAX over the *packed bath vector*, the gradient is exact via autodiff
(replacing the reference's hand-coded analytic gradients), and the
minimization uses scipy L-BFGS-B/CG on the host (the χ² is tiny).

Fit targets (cg_scheme): 'delta' fits Δ(iω), 'weiss' fits G0and(iω).
Weights (cg_weight): 1, 1/n, or 1/ω_n; power cg_pow; first cfg.lfit
Matsubara frequencies.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

from ..config import EDConfig
from .dmft_bath import array_to_bath, bath_to_array, get_bath_dimension
from .replica import ReplicaBasis


# ---------------------------------------------------------------------------
# jax Anderson functions from the packed bath vector (normal mode)
# ---------------------------------------------------------------------------


def _unpack_normal(p, cfg: EDConfig):
    """packed (normal/hybrid, ed_mode normal) -> (e, v) arrays."""
    ns, no, nb = cfg.nspin, cfg.norb, cfg.nbath
    if cfg.bath_type == "normal":
        e = p[: ns * no * nb].reshape(ns, no, nb)
        v = p[ns * no * nb: 2 * ns * no * nb].reshape(ns, no, nb)
    else:  # hybrid
        e = p[: ns * nb].reshape(ns, 1, nb)
        v = p[ns * nb: ns * nb + ns * no * nb].reshape(ns, no, nb)
    return e, v


def _delta_normal_jax(p, z, cfg: EDConfig, ispin: int):
    """Δ^s_ab(z): (Norb, Norb, Lz) for the requested spin."""
    e, v = _unpack_normal(p, cfg)
    if cfg.bath_type == "normal":
        # diagonal: Σ_k v²/(z - e)
        d = jnp.sum(v[ispin, :, :, None] ** 2
                    / (z[None, None, :] - e[ispin, :, :, None]), axis=1)
        return jnp.einsum("al,ab->abl", d, jnp.eye(cfg.norb))
    return jnp.sum(v[ispin, :, None, :, None] * v[ispin, None, :, :, None]
                   / (z[None, None, None, :] - e[ispin, 0, None, None, :, None]),
                   axis=2)


def _delta_replica_jax(p, z, cfg: EDConfig, basis: ReplicaBasis, ispin: int):
    """Replica/general Δ^s(z) via (Norb,Norb) inversion per z per replica."""
    nb, no, ns = cfg.nbath, cfg.norb, cfg.nspin
    nsym = basis.nsym
    ops = jnp.asarray(np.real(basis.ops[:, ispin, ispin]))  # (Nsym,No,No)
    pos = 1
    out = jnp.zeros((no, no, z.shape[0]), dtype=z.dtype)
    for k in range(nb):
        if cfg.bath_type == "replica":
            vk = p[pos] * jnp.ones(no)
            pos += 1
        else:
            vk = p[pos: pos + ns * no].reshape(ns, no)[ispin]
            pos += ns * no
        lam = p[pos: pos + nsym]
        pos += nsym
        hk = jnp.einsum("s,sab->ab", lam, ops)
        zi = z[:, None, None] * jnp.eye(no)[None] - hk[None]
        g = jnp.linalg.inv(zi)  # (Lz, No, No)
        out = out + jnp.einsum("a,lab,b->abl", vk, g, vk)
    return out


def _weiss_from_delta(delta, z, hloc_s, cfg: EDConfig):
    """G0(z) = [(z+μ) - Hloc - Δ(z)]⁻¹ per frequency (Norb matrix)."""
    no = cfg.norb
    m = (z[:, None, None] + cfg.xmu) * jnp.eye(no)[None] \
        - hloc_s[None] - jnp.moveaxis(delta, -1, 0)
    return jnp.moveaxis(jnp.linalg.inv(m), 0, -1)


def chi2_fitgf(cfg: EDConfig, func: np.ndarray, bath_array: np.ndarray,
               ispin: int = 1, iorb: Optional[int] = None,
               basis: Optional[ReplicaBasis] = None,
               hloc: Optional[np.ndarray] = None) -> np.ndarray:
    """Fit the bath to ``func`` = Weiss field or Δ on Matsubara frequencies.

    ``func``: (Norb,Norb,Lmats) or (Nspin,Nspin,Norb,Norb,Lmats); returns the
    updated packed bath array (reference overwrites the user bath)."""
    s = ispin - 1
    func = np.asarray(func)
    if func.ndim == 5:
        func = func[s, s]
    elif func.ndim == 3 and func.shape[0] == cfg.norb:
        pass
    elif func.ndim == 1:
        func = func[None, None, :]
    nfit = min(cfg.lfit, func.shape[-1])
    target = jnp.asarray(func[..., :nfit])
    wn = (2 * np.arange(nfit) + 1) * np.pi / cfg.beta
    z = jnp.asarray(1j * wn)
    if cfg.cg_weight == 1:
        wts = np.ones(nfit)
    elif cfg.cg_weight == 2:
        wts = 1.0 / np.arange(1, nfit + 1)
    else:
        wts = 1.0 / wn
    wts = jnp.asarray(wts)

    if hloc is None:
        hloc = np.zeros((cfg.nspin, cfg.nspin, cfg.norb, cfg.norb))
    hloc_s = jnp.asarray(np.real(hloc[s, s]))

    is_replica = cfg.bath_type in ("replica", "general")

    p_full = jnp.asarray(np.asarray(bath_array, float))

    if is_replica:
        def delta_fn(p):
            return _delta_replica_jax(p, z, cfg, basis, s)
        # fit all parameters except the leading Nbasis count
        fit_idx = np.arange(1, p_full.shape[0])
    else:
        def delta_fn(p):
            return _delta_normal_jax(p, z, cfg, s)
        ns, no, nb = cfg.nspin, cfg.norb, cfg.nbath
        if cfg.bath_type == "normal":
            idx_e = (np.arange(no * nb) + s * no * nb)
            idx_v = ns * no * nb + s * no * nb + np.arange(no * nb)
        else:
            idx_e = s * nb + np.arange(nb)
            idx_v = ns * nb + s * no * nb + np.arange(no * nb)
        fit_idx = np.concatenate([idx_e, idx_v])

    fit_idx = jnp.asarray(fit_idx, jnp.int32)
    diag_only = (cfg.bath_type == "normal")

    def model(p_fit):
        p = p_full.at[fit_idx].set(p_fit)
        d = delta_fn(p)
        if cfg.cg_scheme == "weiss":
            return _weiss_from_delta(d, z, hloc_s, cfg)
        return d

    def chi2(p_fit):
        f = model(p_fit)
        diff = f - target
        if diag_only:
            diff = diff * jnp.eye(cfg.norb)[:, :, None]
        an = jnp.abs(diff) ** cfg.cg_pow
        if cfg.cg_norm == "frobenius":
            return jnp.sum(wts[None, None, :] * an) / nfit
        return jnp.sum(wts[None, None, :] * an) / nfit

    val_grad = jax.jit(jax.value_and_grad(chi2))

    def fun(x):
        v, g = val_grad(jnp.asarray(x))
        return float(v), np.asarray(g, dtype=float)

    x0 = np.asarray(p_full)[np.asarray(fit_idx)]
    method = "CG" if cfg.cg_method == 0 else "L-BFGS-B"
    opts = ({"maxiter": cfg.cg_niter, "gtol": cfg.cg_ftol * 1e-2}
            if method == "CG" else {"maxiter": cfg.cg_niter, "ftol": cfg.cg_ftol})

    # multi-start: the chi^2 landscape has spurious basins (a bath pole
    # escaping to large |e| with v->0); a few perturbed restarts recover the
    # global basin. The first start is always the caller's bath (warm start
    # across DMFT iterations).
    rng = np.random.default_rng(12345)
    starts = [x0]
    for _ in range(4):
        starts.append(x0 + rng.normal(scale=0.3, size=x0.shape)
                      * np.maximum(1.0, np.abs(x0)))
    best = None
    for xs in starts:
        res = scipy.optimize.minimize(fun, xs, jac=True, method=method,
                                      options=opts)
        if best is None or res.fun < best.fun:
            best = res
        if best.fun < 1e-12:
            break
    out = np.array(p_full)
    out[np.asarray(fit_idx)] = best.x
    return out
