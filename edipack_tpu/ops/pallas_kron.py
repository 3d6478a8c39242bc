"""Pallas TPU kernel: fused normal-mode sector matvec.

Computes  out = D ⊙ V + V @ Hupᵀ + Hdw @ V  in a single pass over (dw, up)
tiles: each grid step loads one row-panel of V (for the Hup product), one
column-panel (for the Hdw product) and the tile of D, runs both contractions
on the MXU and writes the tile once — one HBM round-trip for `out` instead
of the three XLA materializes for the unfused expression.

Shapes padded to multiples of the tile sizes by the caller (KronPallasMatvec).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_fused(d_ref, v_tile_ref, v_row_ref, hup_t_ref, hdw_row_ref,
                  v_col_ref, out_ref):
    acc = jnp.dot(v_row_ref[:], hup_t_ref[:],
                  preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(hdw_row_ref[:], v_col_ref[:],
                        preferred_element_type=jnp.float32)
    out_ref[:] = acc + d_ref[:] * v_tile_ref[:]


def kron_matvec_pallas(v, d, hup_t, hdw, bd=128, bu=128):
    """v, d: (DD, DU); hup_t: (DU, DU); hdw: (DD, DD) — all f32, DD/DU
    multiples of the tile sizes."""
    dd, du = v.shape
    grid = (dd // bd, du // bu)
    return pl.pallas_call(
        _kernel_fused,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bd, bu), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),        # d tile
            pl.BlockSpec((bd, bu), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),        # V tile (diag term)
            # note j - j instead of literal 0: under jax_enable_x64 a literal
            # lowers to i64 while program ids are i32, and Mosaic rejects the
            # mixed-typed index tuple ("failed to legalize func.return")
            pl.BlockSpec((bd, du), lambda i, j: (i, j - j),
                         memory_space=pltpu.VMEM),        # V row panel
            pl.BlockSpec((du, bu), lambda i, j: (i - i, j),
                         memory_space=pltpu.VMEM),        # Hupᵀ col panel
            pl.BlockSpec((bd, dd), lambda i, j: (i, j - j),
                         memory_space=pltpu.VMEM),        # Hdw row panel
            pl.BlockSpec((dd, bu), lambda i, j: (i - i, j),
                         memory_space=pltpu.VMEM),        # V col panel
        ],
        out_specs=pl.BlockSpec((bd, bu), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dd, du), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * dd * du * (dd + du),
            bytes_accessed=4 * (dd * du * 3 + dd * dd + du * du),
            transcendentals=0),
    )(d, v, v, hup_t, hdw, v)


class KronPallasMatvec:
    """Drop-in fused matvec for phonon-free normal sectors (f32)."""

    def __init__(self, op, bd=128, bu=128):
        assert op.ph_mat is None, "pallas path: no phonons yet"
        dd, du = op.hdw.shape[0], op.hup.shape[0]
        self.dd0, self.du0 = dd, du
        # sublane tiles multiple of 8, lane tiles multiple of 128
        self.bd = bd if dd >= bd else ((dd + 7) // 8) * 8
        self.bu = bu if du >= bu else 128
        ddp = ((dd + self.bd - 1) // self.bd) * self.bd
        dup = ((du + self.bu - 1) // self.bu) * self.bu
        self.ddp, self.dup = ddp, dup
        dpad = np.zeros((ddp, dup), np.float32)
        dpad[:dd, :du] = op.d
        hup_t = np.zeros((dup, dup), np.float32)
        hup_t[:du, :du] = op.hup.T
        hdw = np.zeros((ddp, ddp), np.float32)
        hdw[:dd, :dd] = op.hdw
        self.d = jax.device_put(jnp.asarray(dpad))
        self.hup_t = jax.device_put(jnp.asarray(hup_t))
        self.hdw = jax.device_put(jnp.asarray(hdw))
        self.dim = dd * du
        self.dtype = jnp.float32
        self.nnz = op.nnz_estimate()
        self.nl = None
        if op.nl_a is not None:
            self.nl = (jax.device_put(jnp.asarray(
                np.swapaxes(op.nl_a, 1, 2), jnp.float32)),
                jax.device_put(jnp.asarray(op.nl_b, jnp.float32)))

    def pad(self, v):
        v2 = v.reshape(self.dd0, self.du0)
        return jnp.pad(v2, ((0, self.ddp - self.dd0), (0, self.dup - self.du0)))

    def __call__(self, v):
        vp = self.pad(v)
        out = kron_matvec_pallas(vp, self.d, self.hup_t, self.hdw,
                                 self.bd, self.bu)
        out = out[: self.dd0, : self.du0]
        if self.nl is not None:
            v2 = v.reshape(self.dd0, self.du0)
            out = out + jnp.einsum("kde,eu,kuv->dv", self.nl[1], v2,
                                   self.nl[0],
                                   preferred_element_type=jnp.float32)
        return out.reshape(-1)
