"""Sector-to-sector excitation-operator maps.

Parity target: reference ED_SECTOR.f90 apply_op_C/CDG/apply_COps
(:465-1129), re-expressed as precomputed gather maps: for the factorized
normal mode an operator c_{a,s} only permutes one spin axis of
``V[DimPh, DimDw, DimUp]``, so its application is a single axis-gather with
signs — no scatter, jit-friendly, static indices.

Joint-basis (superc/nonsu2) operators are position maps over the joint state
list with full Jordan-Wigner signs.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fock import apply_c, apply_cdg, parity_sign, popcount, state_index


@dataclass
class AxisOpMap:
    """Gather map along one spin axis: out[..., j] = sign[j] * in[..., src[j]]
    (src[j] = -1 -> zero). ``axis``: 2 = up, 1 = dw of the (ph, dw, up) tensor."""
    axis: int
    src: np.ndarray     # (dim_tgt,) int32 into the source axis
    sign: np.ndarray    # (dim_tgt,) float

    def apply(self, v3):
        src = jnp.asarray(np.where(self.src < 0, 0, self.src), jnp.int32)
        sign = jnp.asarray(np.where(self.src < 0, 0.0, self.sign), v3.dtype)
        out = jnp.take(v3, src, axis=self.axis)
        shape = [1, 1, 1]
        shape[self.axis] = -1
        return out * sign.reshape(shape)


def spin_axis_op(basis_src: np.ndarray, basis_tgt: np.ndarray, ns: int,
                 kind: str, level: int, axis: int) -> AxisOpMap:
    """Map for c (kind='c') or c† (kind='cdg') at ``level`` acting on one spin
    species with per-spin JW signs (normal-mode convention)."""
    fn = apply_c if kind == "c" else apply_cdg
    new_states, signs, valid = fn(basis_src, level)
    # build target-side gather: for each target position, its source
    src = np.full(len(basis_tgt), -1, dtype=np.int64)
    sgn = np.zeros(len(basis_tgt))
    ok = np.nonzero(valid)[0]
    tgt_pos = state_index(basis_tgt, new_states[ok])
    good = tgt_pos >= 0
    src[tgt_pos[good]] = ok[good]
    sgn[tgt_pos[good]] = signs[ok[good]]
    return AxisOpMap(axis, src.astype(np.int32), sgn)


@dataclass
class JointOpMap:
    """Joint-basis operator map: out[j] = sign[j] * in[src[j]]."""
    src: np.ndarray
    sign: np.ndarray

    def apply(self, v):
        src = jnp.asarray(np.where(self.src < 0, 0, self.src), jnp.int32)
        sign = jnp.asarray(np.where(self.src < 0, 0.0, self.sign), v.dtype)
        return jnp.take(v, src, axis=0) * sign


def joint_op(states_src: np.ndarray, states_tgt: np.ndarray, ns: int,
             kind: str, level: int, spin: int) -> JointOpMap:
    """c/c† at (level, spin) on the joint basis with full JW over the packed
    bitset (up bits 0..ns-1, dw bits ns..2ns-1)."""
    pos = level + spin * ns
    fn = apply_c if kind == "c" else apply_cdg
    new_states, signs, valid = fn(states_src, pos)
    src = np.full(len(states_tgt), -1, dtype=np.int64)
    sgn = np.zeros(len(states_tgt))
    ok = np.nonzero(valid)[0]
    tgt_pos = state_index(states_tgt, new_states[ok])
    good = tgt_pos >= 0
    src[tgt_pos[good]] = ok[good]
    sgn[tgt_pos[good]] = signs[ok[good]]
    return JointOpMap(src.astype(np.int32), sgn)


def combine_joint(maps, coeffs) -> "JointLinComb":
    return JointLinComb(list(maps), list(coeffs))


@dataclass
class JointLinComb:
    """Linear combination Σ_k coeff_k O_k of joint maps (reference apply_COps)."""
    maps: list
    coeffs: list

    def apply(self, v):
        out = None
        for m, c in zip(self.maps, self.coeffs):
            term = m.apply(v) * c
            out = term if out is None else out + term
        return out
