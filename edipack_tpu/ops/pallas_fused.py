"""Fused Pallas TPU kernels for the normal-mode sector matvec.

TPU-native replacement of the reference's distributed CSR SpMV hot loop
(ED_NORMAL/ED_HAMILTONIAN_NORMAL_STORED_HxV.f90:765-1082), built from
ops.fused_normal metadata (imp-MSB ordering, block-compacted factors,
low-rank diagonal, single-run non-local terms):

    W = s * ( D (.) V  +  V @ Hup^T  +  Hdw @ V  +  nl shifts )

Design (column-block grid):

* Internal vector layout is **column-blocked**: V3[(j*ddp + d), r] =
  V[d, j*BLK + r].  All dynamic indexing then happens on the sublane-major
  axis (fully supported by Mosaic); lane offsets are static.
* grid=(nbu,): each step produces one 128-wide column block of W.  The
  whole V3 (<= ~45 MB) stays VMEM-resident; v5e VMEM is 128 MB.
* Factor blocks are padded to a fixed per-row degree NMAX and applied as
  ONE large-K MXU matmul per column block (up factor) / per 128-row block
  (dw factor) after cheap VMEM block gathers — zero value-blocks in the
  padding slots null their contribution.
* The diagonal is applied from its rank-<=8 factorization D = a @ b^T.
* Non-local Kanamori terms (Jx/Jp) are rectangle shifts: static lane
  shift delta = (su0-du0) mod 128 + a dynamic source-block select, masked
  by the rectangle bounds.
* ``FusedPower`` runs niter chained (matvec + normalize) steps in one
  kernel launch (grid=(niter, nbu)) with the normalization lazily folded
  into the next step (exactly the  w = H v; v = w/||w||  sequence).

Matmul precision: 'default' (one-pass bf16, matching the engine's f32
XLA path on TPU) or 'highest' (full f32).  The double-single f64 solver
path composes three kernel calls — see MixedFusedMatvec.
"""
from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_normal import BLK, FusedNormalOp, padded_block_tables

_INTERPRET = False  # flip in tests to force interpreter mode


def _interpret() -> bool:
    # interpreter mode off-TPU so the fused path stays testable on the
    # CPU suite (conftest pins jax_platforms=cpu)
    return _INTERPRET or jax.default_backend() not in ("tpu", "axon")


def _clip(x, lo, hi):
    return jnp.minimum(jnp.maximum(x, lo), hi)


def fused_vmem_ok(fop: FusedNormalOp, budget_bytes: int = 118 * 2**20) -> bool:
    """True when the VMEM-resident working set (V3 + padded factor block
    tables + column scratch) fits the per-core VMEM budget."""
    nbu = fop.dup // BLK
    nbd = fop.ddp // BLK
    deg_u = int(np.diff(fop.up_ptr).max()) if nbu else 0
    deg_d = int(np.diff(fop.dw_ptr).max()) if nbd else 0
    v3 = nbu * fop.ddp * BLK * 4
    tables = (nbu * max(deg_u, 1) + nbd * max(deg_d, 1)) * BLK * BLK * 4
    scratch = fop.ddp * max(deg_u, 1) * BLK * 4 + 3 * fop.ddp * BLK * 4
    return v3 + tables + scratch <= budget_bytes


def _column_block(fop: FusedNormalOp, nmu: int, nmd: int, prec,
                  j, scale,
                  upsrc_ref, dwsrc_ref, upv_ref, dwv_ref, da_ref, db_ref,
                  v3_ref, gup_ref, gdw_ref, acc_ref):
    """Write column block j of  scale * H V  (V3 VMEM-resident) into
    acc_ref (ddp, BLK).  All accumulation is static-slice RMW on the ref
    (Mosaic has no scatter-add on values)."""
    ddp = fop.ddp
    nbu = fop.dup // BLK
    nbd = fop.ddp // BLK

    vj = v3_ref[pl.ds(j * ddp, ddp), :]                      # (ddp, BLK)

    # ---- diagonal (low-rank) + up factor -------------------------------
    dbj = db_ref[pl.ds(j * BLK, BLK), :]                      # (BLK, R)
    dcol = jax.lax.dot_general(
        da_ref[:], dbj, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                  # (ddp, BLK)
    for s in range(nmu):
        k = upsrc_ref[j, s]
        gup_ref[:, s * BLK:(s + 1) * BLK] = v3_ref[pl.ds(k * ddp, ddp), :]
    upb = upv_ref[pl.ds(j * (nmu * BLK), nmu * BLK), :]
    acc_ref[:] = dcol * vj + jnp.dot(
        gup_ref[:], upb, preferred_element_type=jnp.float32, precision=prec)

    # ---- dw factor: per 128-row block, one (nmd*BLK)-contraction ------
    for r in range(nbd):
        for s in range(nmd):
            k = dwsrc_ref[r, s]
            gdw_ref[s * BLK:(s + 1) * BLK, :] = \
                v3_ref[pl.ds(j * ddp + k * BLK, BLK), :]
        dwb = dwv_ref[pl.ds(r * (nmd * BLK), nmd * BLK), :]
        t = jax.lax.dot_general(
            dwb, gdw_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        acc_ref[r * BLK:(r + 1) * BLK, :] = acc_ref[r * BLK:(r + 1) * BLK, :] + t

    # ---- non-local rectangle shifts -----------------------------------
    if fop.nl_runs:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1) + j * BLK
        for rn in fop.nl_runs:
            off = rn.su0 - rn.du0
            q, delta = divmod(off, BLK)
            b0 = _clip(j + q, 0, nbu - 1)
            base0 = b0 * ddp + rn.sd0
            va = v3_ref[pl.ds(base0, rn.ld), :]
            if delta:
                b1 = _clip(j + q + 1, 0, nbu - 1)
                base1 = b1 * ddp + rn.sd0
                vb = v3_ref[pl.ds(base1, rn.ld), :]
                t = jnp.concatenate([va[:, delta:], vb[:, :delta]], axis=1)
            else:
                t = va
            mask = ((lane >= rn.du0) & (lane < rn.du0 + rn.lu)
                    ).astype(jnp.float32)
            acc_ref[rn.dd0:rn.dd0 + rn.ld, :] = (
                acc_ref[rn.dd0:rn.dd0 + rn.ld, :] + rn.val * (t * mask))

    acc_ref[:] = acc_ref[:] * scale


def _matvec_kernel(fop, nmu, nmd, prec,
                   upsrc_ref, dwsrc_ref, upv_ref, dwv_ref, da_ref, db_ref,
                   v3_ref, out_ref, gup_ref, gdw_ref):
    j = pl.program_id(0)
    _column_block(fop, nmu, nmd, prec, j, jnp.float32(1.0),
                  upsrc_ref, dwsrc_ref, upv_ref, dwv_ref,
                  da_ref, db_ref, v3_ref, gup_ref, gdw_ref, out_ref)


def _column_block_ds(fop, nmu, nmd, hi_prec, j,
                     upsrc_ref, dwsrc_ref,
                     upvh_ref, upvl_ref, dwvh_ref, dwvl_ref,
                     dah_ref, dbh_ref, dal_ref, dbl_ref,
                     nl_lo_vals,
                     v3_ref, main_ref, corr_ref):
    """Double-single column block: ONE pass over the operands computes

        main = Hhi V        (hi_prec matmuls, f32 accumulate)
        corr = Hlo V        (1-pass bf16 matmuls — the term is ~6e-8 |HV|)

    The caller merges in f64: H V = main + corr.  VMEM discipline (the
    per-core budget is 128M and a first cut ran out at 160M): no gather
    scratch — every factor matmul is fed directly from ref slices — and the
    lo tables are stored bf16 (their own relative precision only needs to
    beat corr's share of the error budget, ~0.4% of a 6e-8 term)."""
    ddp = fop.ddp
    nbd = fop.ddp // BLK
    lo_prec = jax.lax.Precision.DEFAULT

    vj = v3_ref[pl.ds(j * ddp, ddp), :]                      # (ddp, BLK)

    # ---- diagonal (low-rank, hi & lo stacks) ---------------------------
    # dbh/dbl arrive as per-j windows (BLK, R) — see the windowed BlockSpecs
    # in FusedMatvecDS: only block-row j of the up tables and diag-b stacks
    # is ever read, so windowing them saves ~28M VMEM on reference-scale
    # sectors (the full-window variant exceeded the 128M budget by 9.25M).
    dcol = jax.lax.dot_general(
        dah_ref[:], dbh_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    dcol_lo = jax.lax.dot_general(
        dal_ref[:], dbl_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=lo_prec)

    main_ref[:] = dcol * vj
    corr_ref[:] = dcol_lo * vj

    # ---- up factor: slice-fed per-source-block matmuls -----------------
    for s in range(nmu):
        k = upsrc_ref[j, s]
        vs = v3_ref[pl.ds(k * ddp, ddp), :]                  # (ddp, BLK)
        ubh = upvh_ref[pl.ds(s * BLK, BLK), :]
        ubl = upvl_ref[pl.ds(s * BLK, BLK), :].astype(jnp.float32)
        main_ref[:] = main_ref[:] + jnp.dot(
            vs, ubh, preferred_element_type=jnp.float32, precision=hi_prec)
        corr_ref[:] = corr_ref[:] + jnp.dot(
            vs, ubl, preferred_element_type=jnp.float32, precision=lo_prec)

    # ---- dw factor ------------------------------------------------------
    for r in range(nbd):
        for s in range(nmd):
            k = dwsrc_ref[r, s]
            vks = v3_ref[pl.ds(j * ddp + k * BLK, BLK), :]   # (BLK, BLK)
            dbh_s = dwvh_ref[pl.ds((r * nmd + s) * BLK, BLK), :]
            dbl_s = dwvl_ref[pl.ds((r * nmd + s) * BLK, BLK), :] \
                .astype(jnp.float32)
            tm = jax.lax.dot_general(
                dbh_s, vks, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi_prec)
            tc = jax.lax.dot_general(
                dbl_s, vks, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=lo_prec)
            main_ref[r * BLK:(r + 1) * BLK, :] = \
                main_ref[r * BLK:(r + 1) * BLK, :] + tm
            corr_ref[r * BLK:(r + 1) * BLK, :] = \
                corr_ref[r * BLK:(r + 1) * BLK, :] + tc

    # ---- non-local rectangle shifts (hi -> main, lo -> corr) ------------
    if fop.nl_runs:
        nbu = fop.dup // BLK
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1) + j * BLK
        for rn, vlo in zip(fop.nl_runs, nl_lo_vals):
            off = rn.su0 - rn.du0
            q, delta = divmod(off, BLK)
            b0 = _clip(j + q, 0, nbu - 1)
            base0 = b0 * ddp + rn.sd0
            va = v3_ref[pl.ds(base0, rn.ld), :]
            if delta:
                b1 = _clip(j + q + 1, 0, nbu - 1)
                base1 = b1 * ddp + rn.sd0
                vb = v3_ref[pl.ds(base1, rn.ld), :]
                t = jnp.concatenate([va[:, delta:], vb[:, :delta]], axis=1)
            else:
                t = va
            mask = ((lane >= rn.du0) & (lane < rn.du0 + rn.lu)
                    ).astype(jnp.float32)
            tm = t * mask
            main_ref[rn.dd0:rn.dd0 + rn.ld, :] = (
                main_ref[rn.dd0:rn.dd0 + rn.ld, :] + rn.val * tm)
            corr_ref[rn.dd0:rn.dd0 + rn.ld, :] = (
                corr_ref[rn.dd0:rn.dd0 + rn.ld, :] + vlo * tm)


def _matvec_ds_kernel(fop, nmu, nmd, hi_prec, nl_lo_vals,
                      upsrc_ref, dwsrc_ref, upvh_ref, upvl_ref,
                      dwvh_ref, dwvl_ref, dah_ref, dbh_ref, dal_ref, dbl_ref,
                      v3_ref, main_ref, corr_ref):
    j = pl.program_id(0)
    _column_block_ds(fop, nmu, nmd, hi_prec, j,
                     upsrc_ref, dwsrc_ref, upvh_ref, upvl_ref,
                     dwvh_ref, dwvl_ref, dah_ref, dbh_ref, dal_ref, dbl_ref,
                     nl_lo_vals, v3_ref, main_ref, corr_ref)


def _power_kernel(fop, nmu, nmd, prec, niter,
                  upsrc_ref, dwsrc_ref, upv_ref, dwv_ref, da_ref, db_ref,
                  vin_hbm, w_hbm, norms_ref,
                  v3_ref, gup_ref, gdw_ref, wcol_ref, ssq_ref, sem, csem):
    it = pl.program_id(0)
    j = pl.program_id(1)
    nbu = fop.dup // BLK
    ddp = fop.ddp

    @pl.when((it == 0) & (j == 0))
    def _():
        dma = pltpu.make_async_copy(vin_hbm, v3_ref, csem)
        dma.start()
        dma.wait()
        ssq_ref[0] = 1.0
        ssq_ref[1] = 0.0

    scale = jax.lax.rsqrt(ssq_ref[0])
    _column_block(fop, nmu, nmd, prec, j, scale,
                  upsrc_ref, dwsrc_ref, upv_ref, dwv_ref,
                  da_ref, db_ref, v3_ref, gup_ref, gdw_ref, wcol_ref)
    ssq_ref[1] = ssq_ref[1] + jnp.sum(wcol_ref[:] * wcol_ref[:])
    # write W column block to HBM (wait immediately: the end-of-iteration
    # W -> V copy-back must observe every column)
    dma = pltpu.make_async_copy(
        wcol_ref, w_hbm.at[pl.ds(j * ddp, ddp), :], sem)
    dma.start()
    dma.wait()

    @pl.when(j == nbu - 1)
    def _():
        norms_ref[it] = jnp.sqrt(ssq_ref[1])
        ssq_ref[0] = ssq_ref[1]
        ssq_ref[1] = 0.0

        @pl.when(it < niter - 1)
        def _():
            dma2 = pltpu.make_async_copy(w_hbm, v3_ref, csem)
            dma2.start()
            dma2.wait()


class _OperandPack:
    """Device operands shared by the kernel entry points."""

    def __init__(self, fop: FusedNormalOp, up_vals=None, dw_vals=None,
                 diag_a=None, diag_b=None):
        nbu = fop.dup // BLK
        nbd = fop.ddp // BLK
        uv, us, nmu = padded_block_tables(
            up_vals if up_vals is not None else fop.up_vals,
            fop.up_src, fop.up_ptr, nbu)
        dv, dsrc, nmd = padded_block_tables(
            dw_vals if dw_vals is not None else fop.dw_vals,
            fop.dw_src, fop.dw_ptr, nbd)
        self.nmu, self.nmd = nmu, nmd
        self.upv = jnp.asarray(uv.reshape(-1, BLK))
        self.dwv = jnp.asarray(dv.reshape(-1, BLK))
        self.upsrc = jnp.asarray(us)
        self.dwsrc = jnp.asarray(dsrc)
        self.da = jnp.asarray(diag_a if diag_a is not None else fop.diag_a,
                              jnp.float32)
        db = diag_b if diag_b is not None else fop.diag_b
        # blocked db: (nbu*BLK, R)
        self.db = jnp.asarray(np.asarray(db, np.float32))

    def args(self):
        return (self.upsrc, self.dwsrc, self.upv, self.dwv, self.da, self.db)


def _full(shape, space):
    """Full-array BlockSpec with an explicit i32-safe index map (default
    index maps emit i64 literals under jax_enable_x64, which Mosaic
    rejects: "failed to legalize func.return")."""
    z = lambda *ids: tuple(ids[0] - ids[0] for _ in shape)
    return pl.BlockSpec(shape, z, memory_space=space)


def _in_specs(pack):
    return [
        _full(pack.upsrc.shape, pltpu.SMEM),    # up src
        _full(pack.dwsrc.shape, pltpu.SMEM),    # dw src
        _full(pack.upv.shape, pltpu.VMEM),      # up vals
        _full(pack.dwv.shape, pltpu.VMEM),      # dw vals
        _full(pack.da.shape, pltpu.VMEM),       # diag a
        _full(pack.db.shape, pltpu.VMEM),       # diag b
    ]


class FusedMatvecDS:
    """Single-pass double-single matvec: (v3 f32) -> (main, corr) f32 planes
    with  H v  =  main + corr  merged in f64 by the caller.

    main = Hhi v at ``hi_precision`` (default HIGHEST = full-f32 MXU passes);
    corr = Hlo v at 1-pass bf16 (the term is ~6e-8 of |Hv|).  The input-lo
    term Hhi (v - f32(v)) is dropped: it is bounded by the f32 ulp of v and
    sits below the f32 accumulation noise of the main product."""

    def __init__(self, fop: FusedNormalOp, hi_precision: str = "highest"):
        self.fop = fop
        self.pack = _OperandPack(fop)
        pack_lo = _OperandPack(fop, up_vals=fop.up_vals_lo,
                               dw_vals=fop.dw_vals_lo)
        # lo tables live in bf16: halves their VMEM share, and their own
        # rounding only perturbs the ~6e-8-relative correction term
        upv_lo = pack_lo.upv.astype(jnp.bfloat16)
        dwv_lo = pack_lo.dwv.astype(jnp.bfloat16)
        a64, b64 = fop.diag_a64, fop.diag_b64
        ahi = a64.astype(np.float32)
        alo = (a64 - ahi.astype(np.float64)).astype(np.float32)
        bhi = b64.astype(np.float32)
        blo = (b64 - bhi.astype(np.float64)).astype(np.float32)
        # d_lo ~= ahi @ blo^T + alo @ bhi^T (stacked rank-2R factorization)
        dal = jnp.asarray(np.concatenate([ahi, alo], axis=1))
        dbl = jnp.asarray(np.concatenate([blo, bhi], axis=1))
        nl64 = fop.nl_vals64 if fop.nl_vals64 is not None else np.zeros(0)
        nl_lo = tuple(float(v - np.float32(v)) for v in nl64)
        self._ops = (self.pack.upsrc, self.pack.dwsrc,
                     self.pack.upv, upv_lo,
                     self.pack.dwv, dwv_lo,
                     self.pack.da, self.pack.db, dal, dbl)
        nbu = fop.dup // BLK
        prec = (jax.lax.Precision.HIGHEST if hi_precision == "highest"
                else jax.lax.Precision.HIGH)
        kern = functools.partial(_matvec_ds_kernel, fop, self.pack.nmu,
                                 self.pack.nmd, prec, nl_lo)
        # up tables and diag-b stacks are read only at block-row j: window
        # them per grid step ((nmu*BLK, BLK) / (BLK, R) windows instead of
        # full residency) — the dw tables are indexed by the inner r loop
        # and stay fully resident.
        nmu = self.pack.nmu
        wrow = lambda shape: pl.BlockSpec(
            shape, lambda j: (j, j - j), memory_space=pltpu.VMEM)
        specs = [
            _full(self.pack.upsrc.shape, pltpu.SMEM),
            _full(self.pack.dwsrc.shape, pltpu.SMEM),
            wrow((nmu * BLK, BLK)),                 # up hi window (row j)
            wrow((nmu * BLK, BLK)),                 # up lo window (row j)
            _full(self.pack.dwv.shape, pltpu.VMEM),
            _full(dwv_lo.shape, pltpu.VMEM),
            _full(self.pack.da.shape, pltpu.VMEM),
            wrow((BLK, self.pack.db.shape[1])),     # diag-b hi (row j)
            _full(dal.shape, pltpu.VMEM),
            wrow((BLK, dbl.shape[1])),              # diag-b lo (row j)
            _full((nbu * fop.ddp, BLK), pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec((fop.ddp, BLK), lambda j: (j, j - j),
                                memory_space=pltpu.VMEM)
        self._call = pl.pallas_call(
            kern,
            grid=(nbu,),
            in_specs=specs,
            out_specs=(out_spec, out_spec),
            out_shape=(
                jax.ShapeDtypeStruct((nbu * fop.ddp, BLK), jnp.float32),
                jax.ShapeDtypeStruct((nbu * fop.ddp, BLK), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
            interpret=_interpret(),
        )

    def __call__(self, v3):
        return self._call(*self._ops, v3)


def fused_ds_vmem_ok(fop: FusedNormalOp,
                     budget_bytes: int = 112 * 2**20) -> bool:
    """VMEM feasibility of the DS kernel: one V3 plane + fully-resident dw
    tables (f32 hi + bf16 lo) + per-j windowed up tables and diag-b stacks
    (double-buffered) + output accumulators.  The budget leaves ~16M of the
    128M/core for Mosaic scoped overhead (calibrated on chip: the
    pre-windowing variant predicted 113M and measured 137M)."""
    nbu = fop.dup // BLK
    nbd = fop.ddp // BLK
    deg_u = int(np.diff(fop.up_ptr).max()) if nbu else 0
    deg_d = int(np.diff(fop.dw_ptr).max()) if nbd else 0
    v3 = nbu * fop.ddp * BLK * 4
    dw_blocks = nbd * max(deg_d, 1) * BLK * BLK
    dw_tables = dw_blocks * 4 + dw_blocks * 2   # f32 hi + bf16 lo, resident
    up_win = 2 * max(deg_u, 1) * BLK * BLK * (4 + 2)  # windows, dbl-buffered
    outs = 4 * fop.ddp * BLK * 4                # 2 outputs, double-buffered
    return v3 + dw_tables + up_win + outs <= budget_bytes


class FusedMatvec:
    """Single  W3 = H V3  on the blocked internal layout (nbu*ddp, BLK)."""

    def __init__(self, fop: FusedNormalOp, precision: str = "default",
                 nl_vals: Optional[List[float]] = None,
                 up_vals=None, dw_vals=None, diag_a=None, diag_b=None):
        if nl_vals is not None:
            import copy
            from .fused_normal import NlRun
            fop = copy.copy(fop)
            fop.nl_runs = [NlRun(val=v, dd0=r.dd0, sd0=r.sd0, ld=r.ld,
                                 du0=r.du0, su0=r.su0, lu=r.lu)
                           for r, v in zip(fop.nl_runs, nl_vals)]
        self.fop = fop
        self.pack = _OperandPack(fop, up_vals, dw_vals, diag_a, diag_b)
        nbu = fop.dup // BLK
        prec = (jax.lax.Precision.HIGHEST if precision == "highest"
                else jax.lax.Precision.DEFAULT)
        kern = functools.partial(_matvec_kernel, fop, self.pack.nmu,
                                 self.pack.nmd, prec)
        self._call = pl.pallas_call(
            kern,
            grid=(nbu,),
            in_specs=_in_specs(self.pack)
            + [_full((nbu * fop.ddp, BLK), pltpu.VMEM)],
            out_specs=pl.BlockSpec((fop.ddp, BLK), lambda j: (j, j - j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nbu * fop.ddp, BLK),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((fop.ddp, self.pack.nmu * BLK), jnp.float32),
                pltpu.VMEM((self.pack.nmd * BLK, BLK), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
            interpret=_interpret(),
        )

    def __call__(self, v3):
        return self._call(*self.pack.args(), v3)


class FusedPower:
    """niter chained (matvec + normalize) steps in one kernel launch.

    __call__(v3) -> (w3, norms): w3 is the UN-normalized H v of the last
    step; norms[k] = ||H v_k|| — identical sequence to the unfused loop
    ``w = H v; v = w / ||w||`` (lazy normalization)."""

    def __init__(self, fop: FusedNormalOp, niter: int,
                 precision: str = "default"):
        self.fop = fop
        self.niter = niter
        self.pack = _OperandPack(fop)
        nbu = fop.dup // BLK
        prec = (jax.lax.Precision.HIGHEST if precision == "highest"
                else jax.lax.Precision.DEFAULT)
        kern = functools.partial(_power_kernel, fop, self.pack.nmu,
                                 self.pack.nmd, prec, niter)
        self._call = pl.pallas_call(
            kern,
            grid=(niter, nbu),
            in_specs=_in_specs(self.pack)
            + [pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                       _full((niter,), pltpu.SMEM)),
            out_shape=(
                jax.ShapeDtypeStruct((nbu * fop.ddp, BLK), jnp.float32),
                jax.ShapeDtypeStruct((niter,), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((nbu * fop.ddp, BLK), jnp.float32),
                pltpu.VMEM((fop.ddp, self.pack.nmu * BLK), jnp.float32),
                pltpu.VMEM((self.pack.nmd * BLK, BLK), jnp.float32),
                pltpu.VMEM((fop.ddp, BLK), jnp.float32),
                pltpu.SMEM((2,), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
            interpret=_interpret(),
        )

    def __call__(self, v3):
        return self._call(*self.pack.args(), v3)


# ---------------------------------------------------------------------------
# Solver-facing wrappers (flat internal vectors)
# ---------------------------------------------------------------------------


class _FastLayout:
    """Device-side original<->internal layout conversion as per-axis
    permutation takes + reshapes.

    The flat-index formulation (1D gather / scatter over dd*du elements)
    costs ~0.75 s PER DIRECTION on an 11.8M sector — TPU 1D scatter is
    near-serial — and was the real unit cost behind the r4 843 s
    time-to-ground-state (every exact matvec pays both directions).  The
    imp-MSB layout factorizes: internal[(u//BLK)*ddp + d, u%BLK] =
    v[perm_dw[d], perm_up[u]], so the conversion is two fast axis-gathers
    (row-major contiguous), a static pad, and a transpose."""

    def __init__(self, fop):
        self.dd, self.du = fop.dd, fop.du
        self.ddp, self.dup = fop.ddp, fop.dup
        self.nub = fop.dup // BLK
        self._perm_dw = jax.device_put(jnp.asarray(fop.perm_dw, jnp.int32))
        self._perm_up = jax.device_put(jnp.asarray(fop.perm_up, jnp.int32))
        inv_dw = np.empty(self.dd, np.int64)
        inv_dw[np.asarray(fop.perm_dw)] = np.arange(self.dd)
        inv_up = np.empty(self.du, np.int64)
        inv_up[np.asarray(fop.perm_up)] = np.arange(self.du)
        self._iperm_dw = jax.device_put(jnp.asarray(inv_dw, jnp.int32))
        self._iperm_up = jax.device_put(jnp.asarray(inv_up, jnp.int32))

    def to_internal_flat(self, v_orig):
        v2 = v_orig.reshape(self.dd, self.du)
        v2 = jnp.take(v2, self._perm_dw, axis=0)
        v2 = jnp.take(v2.T, self._perm_up, axis=0).T
        vp = jnp.zeros((self.ddp, self.dup), v2.dtype) \
            .at[:self.dd, :self.du].set(v2)
        return vp.reshape(self.ddp, self.nub, BLK) \
            .transpose(1, 0, 2).reshape(-1)

    def from_internal_flat(self, v_int):
        x = v_int.reshape(self.nub, self.ddp, BLK) \
            .transpose(1, 0, 2).reshape(self.ddp, self.dup)
        v2 = x[:self.dd, :self.du]
        v2 = jnp.take(v2, self._iperm_dw, axis=0)
        v2 = jnp.take(v2.T, self._iperm_up, axis=0).T
        return v2.reshape(-1)


class FusedKron:
    """Solver-facing f32 matvec on flat internal vectors (n_internal,).

    Drop-in for ops.matvec.KronMatvec in the Lanczos drivers, except the
    vector space is the padded imp-MSB-blocked internal layout; use
    to_internal_flat / from_internal_flat at the boundaries (start vectors,
    returned eigenvectors).  Padding slots are structurally zero — matvec
    output never populates them; project random start vectors with
    v0_project."""

    def __init__(self, fop: FusedNormalOp, precision: str = "default"):
        self.fop = fop
        self.mv = FusedMatvec(fop, precision=precision)
        self.dim = fop.n_internal
        self.dtype = jnp.float32
        self.nnz = fop.nnz
        self._idx = jax.device_put(jnp.asarray(fop.internal_index_map()))
        self._layout = _FastLayout(fop)
        mask = np.zeros(fop.n_internal, np.float32)
        mask[fop.internal_index_map()] = 1.0
        self._mask = jax.device_put(jnp.asarray(mask))

    def __call__(self, v):
        return self.mv(v.reshape(-1, BLK).astype(jnp.float32)) \
            .reshape(-1).astype(v.dtype)

    def v0_project(self, v):
        return v * self._mask.astype(v.dtype)

    def to_internal_flat(self, v_orig):
        return self._layout.to_internal_flat(v_orig)

    def from_internal_flat(self, v_int):
        return self._layout.from_internal_flat(v_int)


class MixedFusedKron:
    """f64-in/f64-out fused matvec in double-single f32 — ONE kernel call.

    H v = main + corr from :class:`FusedMatvecDS`: main = Hhi f32(v) at
    full-f32 MXU precision, corr = Hlo f32(v) at bf16.  Error budget is the
    f32 accumulation noise of the main product (~1e-6 relative on large
    sectors) — identical to the previous 3-call composition, at ~1/5 the
    cost.  Pair with an exact f64 refine (attribute ``exact``) set by the
    caller for full-precision eigenvalues."""

    def __init__(self, fop: FusedNormalOp, hi_precision: str = "highest"):
        self.fop = fop
        self.dim = fop.n_internal
        self.dtype = jnp.float64
        self.nnz = fop.nnz
        # interpret-mode pallas (CPU tests) unrolls the kernel grid into the
        # HLO; scanning that inside the DS Lanczos recurrences produces a
        # program XLA:CPU segfaults COMPILING — the DS drivers fall back to
        # the (r03-proven) f64 recurrence off-TPU
        self.ds_recurrence_ok = not _interpret()
        self._ds = FusedMatvecDS(fop, hi_precision=hi_precision)
        self._idx = jax.device_put(jnp.asarray(fop.internal_index_map()))
        self._layout = _FastLayout(fop)
        mask = np.zeros(fop.n_internal, np.float64)
        mask[fop.internal_index_map()] = 1.0
        self._mask = jax.device_put(jnp.asarray(mask))

    def __call__(self, v):
        v3 = v.reshape(-1, BLK).astype(jnp.float32)
        main, corr = self._ds(v3)
        y = main.astype(jnp.float64) + corr.astype(jnp.float64)
        return y.reshape(-1)

    def pair(self, v32):
        """f32 flat internal vector -> (main, corr) f32 flat planes with
        H v = main + corr — the whole-f32 interface consumed by the DS
        Lanczos recurrences (ops.lanczos.lanczos_tridiag_ds/_sweep_ds),
        which avoid every emulated-f64 elementwise pass."""
        main, corr = self._ds(v32.astype(jnp.float32).reshape(-1, BLK))
        return main.reshape(-1), corr.reshape(-1)

    def v0_project(self, v):
        return v * self._mask.astype(v.dtype)

    def to_internal_flat(self, v_orig):
        return self._layout.to_internal_flat(v_orig)

    def from_internal_flat(self, v_int):
        return self._layout.from_internal_flat(v_int)


def wrap_exact_internal(fused, exact_orig):
    """Adapt an original-layout exact matvec (e.g. f64 KronMatvec) to the
    fused internal layout for the Rayleigh-Ritz refine pass."""
    def exact(v_int):
        vo = fused.from_internal_flat(v_int)
        w = exact_orig(vo)
        return fused.to_internal_flat(w)
    return exact
