"""Host-side metadata for the fused (single-kernel) normal-mode matvec.

TPU-first redesign of the reference's hottest loop — the per-sector
``H·v`` consumed by Lanczos (ED_NORMAL/ED_HAMILTONIAN_NORMAL_STORED_HxV.f90:
765-1082).  Two structural facts make a much faster kernel possible than
either a CSR SpMV (the reference) or dense Kronecker matmuls (our baseline
path):

1. **imp-MSB basis ordering.**  Re-ranking each spin basis by the key
   ``(impurity bits << (Ns-Norb)) | bath bits`` groups states by impurity
   configuration.  Under this ordering every Kanamori non-local factor
   (spin-exchange Jx, pair-hopping Jp — reference stored/H_non_local.f90)
   becomes a *single contiguous constant-offset run*: the operator
   ``c†_a c_b`` only permutes the impurity MSBs while acting as the identity
   on the rank-ordered bath states, and the Jordan-Wigner string over the
   in-between impurity bits is constant per (a,b).  The 8 full-array gather
   ops of the permutation form collapse to slice-shifted adds.

2. **Block sparsity.**  The one-spin hop matrices carry ~6 nnz/row; under
   imp-MSB ordering their nonzero 128x128 blocks drop to ~15-25% fill
   (hybridization hops become monotone staircase maps between impurity
   groups).  The factor products then run as block-compacted MXU matmuls
   with the zero blocks skipped entirely.

The device kernel lives in ops.pallas_fused; this module holds the pure
NumPy metadata builder so it is testable without a TPU.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

BLK = 128          # factor block size (MXU native)
DIAG_RANK = 8      # padded low-rank width of the diagonal


def msb_perm(states: np.ndarray, norb: int) -> np.ndarray:
    """Permutation sorting one-spin basis states by the imp-MSB key
    (impurity bits most significant, bath rank within)."""
    s = np.asarray(states, dtype=np.int64).reshape(-1)
    mask = (1 << norb) - 1
    key = ((s & mask) << 48) | (s >> norb)
    return np.argsort(key, kind="stable").astype(np.int32)


def _runs_of_perm(src: np.ndarray, sgn: np.ndarray
                  ) -> List[Tuple[int, int, int, float]]:
    """Maximal (row0, col0, length, value) constant-offset contiguous runs of
    the partial permutation  M[r, src[r]] = sgn[r]  (sgn 0 marks empty)."""
    rows = np.nonzero(sgn)[0]
    if len(rows) == 0:
        return []
    cols = src[rows]
    vals = sgn[rows]
    runs = []
    i = 0
    while i < len(rows):
        j = i + 1
        while (j < len(rows) and rows[j] == rows[j - 1] + 1
               and cols[j] == cols[j - 1] + 1 and vals[j] == vals[i]):
            j += 1
        runs.append((int(rows[i]), int(cols[i]), int(j - i), float(vals[i])))
        i = j
    return runs


def _permute_perm(src: np.ndarray, sgn: np.ndarray, perm: np.ndarray,
                  ipos: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Re-index a partial permutation (src, sgn) into the ordering ``perm``
    (internal i <-> original perm[i]); ipos is the inverse of perm."""
    src2 = ipos[src[perm]].astype(np.int64)
    sgn2 = sgn[perm]
    return src2, sgn2


def _block_compact(h: np.ndarray, blk: int = BLK
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Compact the padded square matrix ``h`` (f64) into nonzero (blk x blk)
    blocks grouped by COLUMN-block:  for col-block j the blocks
    vals[ptr[j]:ptr[j+1]] hold h[src[m]*blk:(src[m]+1)*blk, j*blk:(j+1)*blk].

    Grouping by column-block serves the right-multiply ``out = x @ h``:
    out[:, jB] = sum_m x[:, src[m]B] @ vals[m].

    Returns (vals_hi, vals_lo, src, ptr) with the double-single split
    h = hi + lo (hi = f32(h), lo = f32(h - hi)) sharing one block pattern —
    the lo blocks feed the correction call of the mixed-precision path."""
    n = h.shape[0]
    assert n % blk == 0
    nb = n // blk
    hb = h.reshape(nb, blk, nb, blk)
    nz = (np.abs(hb).sum(axis=(1, 3)) > 0)          # (row_blk, col_blk)
    ptr = np.zeros(nb + 1, dtype=np.int32)
    srcs, vals = [], []
    for j in range(nb):
        ks = np.nonzero(nz[:, j])[0]
        ptr[j + 1] = ptr[j] + len(ks)
        for k in ks:
            srcs.append(k)
            vals.append(hb[k, :, j, :])
    if vals:
        v64 = np.stack(vals).astype(np.float64)
    else:
        v64 = np.zeros((0, blk, blk), np.float64)
    hi = v64.astype(np.float32)
    lo = (v64 - hi.astype(np.float64)).astype(np.float32)
    return hi, lo, np.asarray(srcs, np.int32), ptr


@dataclass
class NlRun:
    """One non-local Kronecker term B (x) A as a rectangle-shifted add:
    out[dd0:dd0+ld, du0:du0+lu] += val * v[sd0:sd0+ld, su0:su0+lu]."""
    val: float
    dd0: int
    sd0: int
    ld: int
    du0: int
    su0: int
    lu: int


def padded_block_tables(vals: np.ndarray, src: np.ndarray, ptr: np.ndarray,
                        nb: int, nmax: Optional[int] = None
                        ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Re-pack block-CSC (vals, src, ptr) into dense padded tables for the
    static-loop kernel: vals2 (nb, NMAX, BLK, BLK) with zero blocks in the
    padding slots, src2 (nb, NMAX) int32 (padding points at block 0 — the
    zero value block makes the contribution vanish)."""
    deg = np.diff(ptr)
    if nmax is None:
        nmax = int(deg.max()) if len(deg) and deg.max() > 0 else 1
    vals2 = np.zeros((nb, nmax, BLK, BLK), np.float32)
    src2 = np.zeros((nb, nmax), np.int32)
    for j in range(nb):
        for s, m in enumerate(range(ptr[j], ptr[j + 1])):
            vals2[j, s] = vals[m]
            src2[j, s] = src[m]
    return vals2, src2, nmax


@dataclass
class FusedNormalOp:
    """Block-compacted, imp-MSB-ordered operator data for the fused kernel.

    The kernel works on padded (ddp, dup) tensors; entries beyond (dd, du)
    are structurally zero.  perm_up/perm_dw map internal index -> original
    basis position (v_int[i] = v_orig[perm[i]])."""
    dd: int
    du: int
    ddp: int
    dup: int
    perm_up: np.ndarray
    perm_dw: np.ndarray
    # right-multiply factor blocks of Hup^T (by output up col-block)
    up_vals: np.ndarray
    up_src: np.ndarray
    up_ptr: np.ndarray
    # factor blocks of Hdw^T (per 128-row block of the dw product)
    dw_vals: np.ndarray
    dw_src: np.ndarray
    dw_ptr: np.ndarray
    # diagonal low-rank factors: D = diag_a @ diag_b.T  (ddp,R) (dup,R)
    diag_a: np.ndarray
    diag_b: np.ndarray
    nl_runs: List[NlRun]
    nnz: int
    # double-single lo parts (same block patterns / run list); f64 diag
    # factors for the correction stack of the mixed-precision path
    up_vals_lo: Optional[np.ndarray] = None
    dw_vals_lo: Optional[np.ndarray] = None
    diag_a64: Optional[np.ndarray] = None
    diag_b64: Optional[np.ndarray] = None
    nl_vals64: Optional[np.ndarray] = None

    # ---- reference application (tests) --------------------------------
    def dense_hup(self) -> np.ndarray:
        h = np.zeros((self.dup, self.dup), np.float64)
        nb = self.dup // BLK
        for j in range(nb):
            for m in range(self.up_ptr[j], self.up_ptr[j + 1]):
                k = self.up_src[m]
                # vals[m] = HupT[kB, jB]  =>  Hup[jB, kB] = vals[m].T
                h[j * BLK:(j + 1) * BLK, k * BLK:(k + 1) * BLK] = \
                    self.up_vals[m].T
        return h

    def dense_hdw(self) -> np.ndarray:
        h = np.zeros((self.ddp, self.ddp), np.float64)
        nb = self.ddp // BLK
        for j in range(nb):
            for m in range(self.dw_ptr[j], self.dw_ptr[j + 1]):
                k = self.dw_src[m]
                h[j * BLK:(j + 1) * BLK, k * BLK:(k + 1) * BLK] = \
                    self.dw_vals[m].T
        return h

    def apply_ref(self, v: np.ndarray) -> np.ndarray:
        """NumPy oracle on the padded internal layout (ddp, dup)."""
        d = self.diag_a.astype(np.float64) @ self.diag_b.T.astype(np.float64)
        out = d * v
        out += v @ self.dense_hup().T
        out += self.dense_hdw() @ v
        for r in self.nl_runs:
            out[r.dd0:r.dd0 + r.ld, r.du0:r.du0 + r.lu] += \
                r.val * v[r.sd0:r.sd0 + r.ld, r.su0:r.su0 + r.lu]
        return out

    # ---- layouts -------------------------------------------------------
    def to_blocked(self, v2: np.ndarray) -> np.ndarray:
        """(ddp, dup) 2D layout -> column-blocked kernel layout
        (nbu*ddp, BLK): V3[(j*ddp + d), r] = V[d, j*BLK + r]."""
        nbu = self.dup // BLK
        return np.ascontiguousarray(
            v2.reshape(self.ddp, nbu, BLK).swapaxes(0, 1)
            .reshape(nbu * self.ddp, BLK))

    def from_blocked(self, v3: np.ndarray) -> np.ndarray:
        nbu = self.dup // BLK
        return np.ascontiguousarray(
            v3.reshape(nbu, self.ddp, BLK).swapaxes(0, 1)
            .reshape(self.ddp, self.dup))

    def internal_index_map(self) -> np.ndarray:
        """int32 (dd*du,): flat original index (d*du + u) -> flat position
        in the blocked internal layout.  Used for device-side layout
        conversion:  v_int.ravel()[map] == v_orig.ravel()  (gather), and
        zeros(N_int).at[map].set(v_orig) (scatter)."""
        ipos_dw = np.empty(self.dd, np.int64)
        ipos_dw[self.perm_dw] = np.arange(self.dd)
        ipos_up = np.empty(self.du, np.int64)
        ipos_up[self.perm_up] = np.arange(self.du)
        d = ipos_dw[:, None]
        u = ipos_up[None, :]
        idx = ((u // BLK) * self.ddp + d) * BLK + (u % BLK)
        return idx.reshape(-1).astype(np.int32)

    @property
    def n_internal(self) -> int:
        return (self.dup // BLK) * self.ddp * BLK

    def to_internal(self, v: np.ndarray) -> np.ndarray:
        """(dd, du) original-layout -> padded internal layout."""
        out = np.zeros((self.ddp, self.dup), v.dtype)
        out[:self.dd, :self.du] = v[np.ix_(self.perm_dw, self.perm_up)]
        return out

    def from_internal(self, v: np.ndarray) -> np.ndarray:
        out = np.empty((self.dd, self.du), v.dtype)
        out[np.ix_(self.perm_dw, self.perm_up)] = v[:self.dd, :self.du]
        return out


def _pad(n: int, blk: int = BLK) -> int:
    return -(-n // blk) * blk


def build_fused_normal(op, norb: int) -> Optional[FusedNormalOp]:
    """Build fused-kernel metadata from a models.normal.NormalSectorOp.

    Returns None when the operator shape is outside the fused kernel's
    domain (phonons present, non-local terms that do not reduce to single
    contiguous runs, or missing low-rank diagonal factors)."""
    if op.ph_mat is not None:
        return None
    dfac = getattr(op, "d_factors", None)
    if dfac is None:
        return None
    sec = op.sector
    perm_up = msb_perm(np.asarray(sec.ups), norb)
    perm_dw = msb_perm(np.asarray(sec.dws), norb)
    ipos_up = np.empty_like(perm_up)
    ipos_up[perm_up] = np.arange(len(perm_up), dtype=np.int32)
    ipos_dw = np.empty_like(perm_dw)
    ipos_dw[perm_dw] = np.arange(len(perm_dw), dtype=np.int32)

    dd, du = op.hdw.shape[0], op.hup.shape[0]
    ddp, dup = _pad(dd), _pad(du)

    # non-local terms -> single-run rectangles (else bail)
    nl_runs: List[NlRun] = []
    if op.nl_perm is not None:
        src_a, sgn_a, src_b, sgn_b = op.nl_perm
        for k in range(src_a.shape[0]):
            sa, ga = _permute_perm(src_a[k], sgn_a[k], perm_up, ipos_up)
            sb, gb = _permute_perm(src_b[k], sgn_b[k], perm_dw, ipos_dw)
            ra = _runs_of_perm(sa, ga)
            rb = _runs_of_perm(sb, gb)
            if len(ra) != 1 or len(rb) != 1:
                return None
            (u0, su0, lu, va) = ra[0]
            (d0, sd0, ld, vb) = rb[0]
            nl_runs.append(NlRun(val=va * vb, dd0=d0, sd0=sd0, ld=ld,
                                 du0=u0, su0=su0, lu=lu))

    hup = np.zeros((dup, dup))
    hup[:du, :du] = op.hup[np.ix_(perm_up, perm_up)]
    hdw = np.zeros((ddp, ddp))
    hdw[:dd, :dd] = op.hdw[np.ix_(perm_dw, perm_dw)]

    up_vals, up_lo, up_src, up_ptr = _block_compact(hup.T)
    dw_vals, dw_lo, dw_src, dw_ptr = _block_compact(hdw.T)

    ddw, dup_vec, adw, bup = dfac
    r = adw.shape[1]
    if 2 + r > DIAG_RANK:
        return None
    a64 = np.zeros((ddp, DIAG_RANK), np.float64)
    b64 = np.zeros((dup, DIAG_RANK), np.float64)
    a64[:dd, 0] = ddw[perm_dw]
    b64[:du, 0] = 1.0
    a64[:dd, 1] = 1.0
    b64[:du, 1] = dup_vec[perm_up]
    a64[:dd, 2:2 + r] = adw[perm_dw]
    b64[:du, 2:2 + r] = bup[perm_up]

    return FusedNormalOp(
        dd=dd, du=du, ddp=ddp, dup=dup,
        perm_up=perm_up, perm_dw=perm_dw,
        up_vals=up_vals, up_src=up_src, up_ptr=up_ptr,
        dw_vals=dw_vals, dw_src=dw_src, dw_ptr=dw_ptr,
        diag_a=a64.astype(np.float32), diag_b=b64.astype(np.float32),
        nl_runs=nl_runs, nnz=op.nnz_estimate(),
        up_vals_lo=up_lo, dw_vals_lo=dw_lo,
        diag_a64=a64, diag_b64=b64,
        nl_vals64=np.array([rn.val for rn in nl_runs], np.float64),
    )
