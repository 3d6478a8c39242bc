"""Fused Pallas TPU kernel for the normal-mode sector matvec.

Replaces the reference's distributed CSR SpMV hot loop
(ED_NORMAL/ED_HAMILTONIAN_NORMAL_STORED_HxV.f90:765-1082) with a single
VMEM-resident kernel built from ops.fused_normal metadata:

    W = s * ( D (.) V  +  V @ Hup^T  +  Hdw @ V  +  nl shifts )

* The sector tensor V (DimDw', DimUp') and the result W live in VMEM
  scratch for the whole kernel (v5e VMEM is ~128 MB; sectors up to ~45 MB
  qualify — the two-orbital Kanamori flagship sector is 47 MB padded).
* Hup/Hdw enter as block-compacted 128x128 nonzero blocks (15-40 % fill
  under the imp-MSB ordering) and are applied as statically-unrolled MXU
  matmuls — a ~4x FLOP cut over the dense Kronecker matmuls and ~zero HBM
  traffic per iteration.
* The diagonal is applied from its rank-<=8 factorization D = a @ b^T.
* Non-local Kanamori terms (Jx/Jp) are single rectangle shifts in the
  imp-MSB ordering: two static slice-adds each.
* ``niter`` power-type iterations run inside ONE kernel launch
  (grid=(niter,)): each grid step computes W = H V / ||V_prev|| with the
  norm accumulated in SMEM, so the per-call dispatch cost amortizes away.
  niter=1 gives a plain matvec for the Lanczos drivers.

The same kernel body serves the double-single f64 path: call it three
times with (H_hi, v_hi), (H_hi, v_lo), (H_lo, v_hi) operand sets and sum
in f64 (see ops.matvec.MixedKronMatvec for the error analysis).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_normal import BLK, FusedNormalOp

_INTERPRET = False  # set True (tests) to run kernels in interpreter mode


def _apply_terms(fop: FusedNormalOp, upv_ref, dwv_ref, da_ref, db_ref,
                 v_ref, w_ref, scale):
    """w = scale * H v with all operands resident in VMEM. Static unroll."""
    nbu = fop.dup // BLK
    nbd = fop.ddp // BLK
    up_ptr, up_src = fop.up_ptr, fop.up_src
    dw_ptr, dw_src = fop.dw_ptr, fop.dw_src

    # diagonal: D = a @ b^T, applied per up column-block
    a = da_ref[:]                             # (ddp, 8)
    for j in range(nbu):
        bj = db_ref[j * BLK:(j + 1) * BLK, :]  # (128, 8)
        dcol = jax.lax.dot_general(
            a, bj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # (ddp, 128)
        acc = dcol * v_ref[:, j * BLK:(j + 1) * BLK]
        # up factor: acc += V[:, kB] @ HupT[kB, jB]
        for m in range(int(up_ptr[j]), int(up_ptr[j + 1])):
            k = int(up_src[m])
            acc = acc + jnp.dot(
                v_ref[:, k * BLK:(k + 1) * BLK],
                upv_ref[m * BLK:(m + 1) * BLK, :],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        w_ref[:, j * BLK:(j + 1) * BLK] = acc * scale

    # dw factor: W[rB, :] += s * Hdw[rB, kB] @ V[kB, :]
    # (dw_vals[m] stores Hdw^T[kB, rB] = Hdw[rB, kB]^T -> contract axis 0)
    for r in range(nbd):
        ms = list(range(int(dw_ptr[r]), int(dw_ptr[r + 1])))
        if not ms:
            continue
        acc = None
        for m in ms:
            k = int(dw_src[m])
            t = jax.lax.dot_general(
                dwv_ref[m * BLK:(m + 1) * BLK, :],
                v_ref[k * BLK:(k + 1) * BLK, :],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)      # (128, dup)
            acc = t if acc is None else acc + t
        w_ref[r * BLK:(r + 1) * BLK, :] = (
            w_ref[r * BLK:(r + 1) * BLK, :] + acc * scale)

    # non-local rectangle shifts (static slices)
    for rn in fop.nl_runs:
        w_ref[rn.dd0:rn.dd0 + rn.ld, rn.du0:rn.du0 + rn.lu] = (
            w_ref[rn.dd0:rn.dd0 + rn.ld, rn.du0:rn.du0 + rn.lu]
            + (rn.val) * scale
            * v_ref[rn.sd0:rn.sd0 + rn.ld, rn.su0:rn.su0 + rn.lu])


def _power_kernel(fop: FusedNormalOp, niter: int,
                  upv_ref, dwv_ref, da_ref, db_ref, vin_hbm, out_hbm,
                  norms_ref, va, vb, ssq_ref, sem):
    """grid=(niter,) power-iteration steps: parity ping-pong va <-> vb."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dma = pltpu.make_async_copy(vin_hbm, va, sem)
        dma.start()
        dma.wait()
        ssq_ref[0] = 1.0

    scale = jax.lax.rsqrt(ssq_ref[0])

    def step(src, dst):
        _apply_terms(fop, upv_ref, dwv_ref, da_ref, db_ref, src, dst, scale)
        ssq_ref[0] = jnp.sum(dst[:] * dst[:])

    @pl.when(i % 2 == 0)
    def _():
        step(va, vb)

    @pl.when(i % 2 == 1)
    def _():
        step(vb, va)

    norms_ref[i] = jnp.sqrt(ssq_ref[0])

    @pl.when(i == niter - 1)
    def _():
        src = va if (niter % 2 == 0) else vb
        dma = pltpu.make_async_copy(src, out_hbm, sem)
        dma.start()
        dma.wait()


class FusedPowerMatvec:
    """niter chained (matvec + normalize) steps in one kernel launch.

    ``__call__(v)`` returns (w, norms): w = the UN-normalized H v_last,
    norms[k] = ||w_k|| — the same sequence as the unfused
    ``w = H v; v = w/||w||`` loop, with the normalization folded into the
    next step's matvec (lazy normalization)."""

    def __init__(self, fop: FusedNormalOp, niter: int):
        self.fop = fop
        self.niter = niter
        self.upv = jnp.asarray(fop.up_vals.reshape(-1, BLK))
        self.dwv = jnp.asarray(fop.dw_vals.reshape(-1, BLK))
        self.da = jnp.asarray(fop.diag_a)
        self.db = jnp.asarray(fop.diag_b)
        kern = functools.partial(_power_kernel, fop, niter)
        self._call = pl.pallas_call(
            kern,
            grid=(niter,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # up blocks
                pl.BlockSpec(memory_space=pltpu.VMEM),   # dw blocks
                pl.BlockSpec(memory_space=pltpu.VMEM),   # diag a
                pl.BlockSpec(memory_space=pltpu.VMEM),   # diag b
                pl.BlockSpec(memory_space=pltpu.ANY),    # v_in (HBM)
            ],
            out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            out_shape=(
                jax.ShapeDtypeStruct((fop.ddp, fop.dup), jnp.float32),
                jax.ShapeDtypeStruct((niter,), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((fop.ddp, fop.dup), jnp.float32),
                pltpu.VMEM((fop.ddp, fop.dup), jnp.float32),
                pltpu.SMEM((1,), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=_INTERPRET,
        )

    def __call__(self, v):
        return self._call(self.upv, self.dwv, self.da, self.db, v)


def _matvec_kernel(fop: FusedNormalOp,
                   upv_ref, dwv_ref, da_ref, db_ref, v_ref, w_ref):
    """Single matvec, fully VMEM-visible operands."""
    _apply_terms(fop, upv_ref, dwv_ref, da_ref, db_ref, v_ref, w_ref,
                 jnp.float32(1.0))


class FusedMatvec:
    """Single H·v (internal imp-MSB layout, padded (ddp, dup) f32)."""

    def __init__(self, fop: FusedNormalOp,
                 up_vals: Optional[np.ndarray] = None,
                 dw_vals: Optional[np.ndarray] = None,
                 diag_a: Optional[np.ndarray] = None,
                 diag_b: Optional[np.ndarray] = None,
                 nl_scale: float = 1.0):
        """Operand overrides (up_vals/dw_vals/diag_a/diag_b) support the
        double-single path: pass the _lo parts with the same sparsity
        pattern. nl_scale rescales the non-local run values likewise."""
        self.fop = fop
        if nl_scale != 1.0 or up_vals is not None:
            import copy
            fop = copy.copy(fop)
            if nl_scale != 1.0:
                from .fused_normal import NlRun
                fop.nl_runs = [NlRun(val=r.val * nl_scale, dd0=r.dd0,
                                     sd0=r.sd0, ld=r.ld, du0=r.du0,
                                     su0=r.su0, lu=r.lu)
                               for r in self.fop.nl_runs]
            self.fop = fop
        self.upv = jnp.asarray(
            (up_vals if up_vals is not None else fop.up_vals)
            .reshape(-1, BLK))
        self.dwv = jnp.asarray(
            (dw_vals if dw_vals is not None else fop.dw_vals)
            .reshape(-1, BLK))
        self.da = jnp.asarray(diag_a if diag_a is not None else fop.diag_a)
        self.db = jnp.asarray(diag_b if diag_b is not None else fop.diag_b)
        kern = functools.partial(_matvec_kernel, self.fop)
        self._call = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((fop.ddp, fop.dup), jnp.float32),
            interpret=_INTERPRET,
        )

    def __call__(self, v):
        return self._call(self.upv, self.dwv, self.da, self.db, v)
