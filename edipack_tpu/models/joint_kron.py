"""Blocked-Kronecker joint-sector operator: the TPU-native superc/nonsu2
Hamiltonian.

The reference (and the ELL path here, models/joint.py) treats an Sz / Ntot
sector as one flat sorted Fock basis and multiplies with a row-wise sparse
gather — fundamentally random-access, which the TPU's memory system executes
at ~0.1 Gelem/s.  But every joint sector DECOMPOSES into (Nup, Ndw) product
blocks: within a block the basis is ups x dws exactly like the normal mode,
so

* every particle-number-conserving same-spin term (Hloc hopping,
  hybridization, bath hops — the bulk of the nonzeros) is a per-block
  Kronecker factor: dense (dup x dup) / (ddw x ddw) matmuls on the MXU;
* pairing terms (superc: c†↑c†↓, Δ-bath) and spin-flip terms (nonsu2: SOC,
  in-plane fields, u-hybridization) CONNECT neighbouring blocks as
  per-spin signed partial permutations — vectorized axis gathers, with the
  cross-register Jordan-Wigner string reducing to the per-block scalar
  (-1)^{Nup} (Nup is constant within a block);
* mixed four-operator strings (Jx/Jp, nonsu2 sundry) split per register the
  same way.

The operator's vector layout is the concatenation of per-block
(dim_ph, ddw, dup) tensors ("blocked layout"); ``to_internal_flat`` /
``from_internal_flat`` convert to/from the sorted joint basis by one fixed
permutation (the Lanczos/GF drivers already support internal-layout
operators via these hooks — the fused normal kernel uses the same
contract).

Parity target: the dense matrix of this operator under the sorted
permutation equals models/joint.build_joint_sector_op().to_dense() exactly
(tests/test_joint_kron.py battery).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EDConfig
from ..fock import apply_c, apply_cdg, enumerate_states, occupations, \
    state_index
from ..sectors import Sector


@dataclass
class _Block:
    nup: int
    ndw: int
    ups: np.ndarray       # sorted up-register basis (C(ns,nup) ints)
    dws: np.ndarray       # sorted dw-register basis
    offset: int           # start of this block in the blocked flat layout

    @property
    def dup(self) -> int:
        return len(self.ups)

    @property
    def ddw(self) -> int:
        return len(self.dws)

    @property
    def size(self) -> int:
        return self.dup * self.ddw


@dataclass
class _GatherTerm:
    """out[dst] += coeff * (dw_sgn ⊙ v[src][dw_src][:, up_src] ⊙ up_sgn)."""
    src: int
    dst: int
    coeff: complex
    up_src: np.ndarray    # (dup_dst,) int32 source column per target column
    up_sgn: np.ndarray    # (dup_dst,) float (0 invalidates)
    dw_src: np.ndarray    # (ddw_dst,) int32
    dw_sgn: np.ndarray


def _register_map(basis_src: np.ndarray, basis_dst: np.ndarray,
                  ops: List[Tuple[str, int]]):
    """Compose single-register operator substring; returns target-indexed
    (src_idx, sign) arrays over basis_dst (0/0 where no source)."""
    st = np.asarray(basis_src, np.int64)
    sign = np.ones(len(st))
    valid = np.ones(len(st), dtype=bool)
    for kind, lvl in ops:
        fn = apply_c if kind == "c" else apply_cdg
        st, s, v = fn(st, lvl)
        sign = sign * s
        valid &= v
    tgt = state_index(np.asarray(basis_dst, np.int64), st[valid])
    srcs = np.nonzero(valid)[0]
    good = tgt >= 0
    src_of = np.zeros(len(basis_dst), np.int32)
    sgn_of = np.zeros(len(basis_dst))
    src_of[tgt[good]] = srcs[good]
    sgn_of[tgt[good]] = sign[valid][good]
    return src_of, sgn_of


class BlockedTermAccumulator:
    """JointTermAccumulator-compatible accumulator building the blocked-Kron
    structure instead of sorted COO.  Basis ORDER: blocks in (nup
    descending-sz-scan) enumeration order; within a block, index =
    idw * dup + iup (up fastest)."""

    def __init__(self, sec: Sector, ns: int):
        self.ns = ns
        cfgmode = sec.mode
        blocks: List[_Block] = []
        off = 0
        pairs = []
        if cfgmode == "superc":
            sz = sec.qn[1]
            for nup in range(max(0, sz), min(ns, ns + sz) + 1):
                ndw = nup - sz
                if 0 <= ndw <= ns:
                    pairs.append((nup, ndw))
        else:  # nonsu2 (nt / ntj)
            n = sec.qn[1]
            for nup in range(max(0, n - ns), min(ns, n) + 1):
                pairs.append((nup, n - nup))
        for nup, ndw in pairs:
            b = _Block(nup, ndw, enumerate_states(ns, nup),
                       enumerate_states(ns, ndw), off)
            blocks.append(b)
            off += b.size
        self.blocks = blocks
        self.dim = off
        self._bidx: Dict[Tuple[int, int], int] = {
            (b.nup, b.ndw): i for i, b in enumerate(blocks)}
        # blocked-order joint states (for occ/diag and the sorted perm)
        parts = [
            (b.ups[None, :] | (b.dws[:, None] << np.int64(ns))).ravel()
            for b in blocks]
        self.states = (np.concatenate(parts) if parts
                       else np.zeros(0, np.int64))
        self.occ = occupations(self.states, 2 * ns).astype(np.float64)
        self.diag = np.zeros(self.dim)
        self.eph_diag = None
        # dense within-block same-spin factors (built lazily)
        self.hup = [np.zeros((b.dup, b.dup), complex) for b in blocks]
        self.hdw = [np.zeros((b.ddw, b.ddw), complex) for b in blocks]
        self.gathers: List[_GatherTerm] = []

    # -- JointTermAccumulator interface ---------------------------------
    def pos(self, level: int, spin: int) -> int:
        return level + spin * self.ns

    def add_diag(self, d: np.ndarray) -> None:
        self.diag += np.real(d)

    def add_opstring(self, ops: List[Tuple[str, int, int]],
                     coeff: complex) -> None:
        if coeff == 0:
            return
        # split per register, tracking the cross-register JW bookkeeping:
        # a dw operator's global string covers ALL up bits, i.e. a factor
        # (-1)^{nup at application time} = (-1)^{nup_block + dnup_so_far}
        up_ops: List[Tuple[str, int]] = []
        dw_ops: List[Tuple[str, int]] = []
        dnup = 0
        n_dw_ops = 0
        cross_fixed = 0          # sum of dnup values at each dw op
        for kind, lvl, spin in ops:
            if spin == 0:
                up_ops.append((kind, lvl))
                dnup += 1 if kind == "cdg" else -1
            else:
                dw_ops.append((kind, lvl))
                cross_fixed += dnup
        ddw_n = sum(1 if k == "cdg" else -1 for k, _ in dw_ops)
        n_dw_ops = len(dw_ops)

        for i, b in enumerate(self.blocks):
            nup_t = b.nup + dnup
            ndw_t = b.ndw + ddw_n
            j = self._bidx.get((nup_t, ndw_t))
            if j is None:
                continue
            tgt = self.blocks[j]
            up_src, up_sgn = _register_map(b.ups, tgt.ups, up_ops)
            dw_src, dw_sgn = _register_map(b.dws, tgt.dws, dw_ops)
            if not up_sgn.any() or not dw_sgn.any():
                continue
            cross = (-1.0) ** ((n_dw_ops * b.nup + cross_fixed) % 2)
            c = coeff * cross
            # same-spin within-block single-register maps merge into the
            # dense Kron factors (the MXU path)
            if not dw_ops and i == j:
                m = np.zeros((tgt.dup, b.dup), complex)
                cols = up_src[up_sgn != 0]
                rows = np.nonzero(up_sgn != 0)[0]
                m[rows, cols] = c * up_sgn[up_sgn != 0]
                self.hup[i] += m
                continue
            if not up_ops and i == j:
                m = np.zeros((tgt.ddw, b.ddw), complex)
                cols = dw_src[dw_sgn != 0]
                rows = np.nonzero(dw_sgn != 0)[0]
                m[rows, cols] = c * dw_sgn[dw_sgn != 0]
                self.hdw[i] += m
                continue
            self.gathers.append(_GatherTerm(
                src=i, dst=j, coeff=c,
                up_src=up_src.astype(np.int32), up_sgn=up_sgn,
                dw_src=dw_src.astype(np.int32), dw_sgn=dw_sgn))


class JointKronMatvec:
    """Device matvec over the blocked layout (solver-facing).

    ``__call__(v)`` takes/returns the flat blocked vector (dim_ph * dim_el);
    use to_internal_flat / from_internal_flat at the sorted-basis boundary.
    """

    def __init__(self, cfg: EDConfig, sec: Sector, acc: BlockedTermAccumulator,
                 eph_acc: Optional[BlockedTermAccumulator] = None,
                 dtype=jnp.complex128):
        from .normal import _phonon_matrices
        from ..ops.matvec import device_put_cplx
        self.sector = sec
        self.blocks = acc.blocks
        self.dim_el = acc.dim
        self.dim_ph = sec.dim_ph
        self.dim = self.dim_el * self.dim_ph
        self.dtype = dtype
        put = lambda x: device_put_cplx(np.asarray(x), dtype)
        # static real-dtype mapping (jnp.zeros(0,.).real would dispatch
        # eagerly — rejected by the tunneled TPU transport)
        rdt = jnp.float32 if dtype == jnp.complex64 else jnp.float64
        putr = lambda x: jax.device_put(
            jnp.asarray(np.asarray(x, np.dtype(rdt))))

        self._shapes = [(b.ddw, b.dup) for b in self.blocks]
        self._offsets = [b.offset for b in self.blocks]
        # per-block diagonal (real) + dense spin factors (skip zero ones)
        self.diag_b = []
        for b, sh in zip(self.blocks, self._shapes):
            d = acc.diag[b.offset:b.offset + b.size].reshape(sh)
            self.diag_b.append(putr(d))
        self.hup_b = [put(h.T) if np.any(h) else None for h in acc.hup]
        self.hdw_b = [put(h) if np.any(h) else None for h in acc.hdw]
        self.gathers = [
            (g.src, g.dst, complex(g.coeff),
             jax.device_put(jnp.asarray(g.dw_src)),
             putr(g.dw_sgn),
             jax.device_put(jnp.asarray(g.up_src)),
             putr(g.up_sgn)) for g in acc.gathers]

        self.has_ph = cfg.nph > 0
        if self.has_ph:
            ph_mat, ph_x = _phonon_matrices(cfg)
            self.ph_mat = putr(np.real(ph_mat))
            self.ph_x = putr(np.real(ph_x))
            self.eph_diag_b = [
                putr(acc.eph_diag[b.offset:b.offset + b.size].reshape(sh))
                for b, sh in zip(self.blocks, self._shapes)]
            self.eph_up_b = [put(h.T) if np.any(h) else None
                             for h in eph_acc.hup]
            self.eph_dw_b = [put(h) if np.any(h) else None
                             for h in eph_acc.hdw]
            self.eph_gathers = [
                (g.src, g.dst, complex(g.coeff),
                 jax.device_put(jnp.asarray(g.dw_src)), putr(g.dw_sgn),
                 jax.device_put(jnp.asarray(g.up_src)), putr(g.up_sgn))
                for g in eph_acc.gathers]

        # sorted <-> blocked permutation: sorted_states[k] =
        # blocked_states[order[k]]
        order = np.argsort(acc.states, kind="stable")
        self._order = jax.device_put(jnp.asarray(order.astype(np.int32)))
        self._inv_order = jax.device_put(
            jnp.asarray(np.argsort(order).astype(np.int32)))
        nnz = int(np.sum(np.abs(acc.diag) > 0))
        for b, h in zip(self.blocks, acc.hup):
            nnz += int(np.count_nonzero(h)) * b.ddw
        for b, h in zip(self.blocks, acc.hdw):
            nnz += int(np.count_nonzero(h)) * b.dup
        nnz += sum(int(np.count_nonzero(g.up_sgn)) *
                   int(np.count_nonzero(g.dw_sgn)) for g in acc.gathers)
        self.nnz = max(nnz, acc.dim) * max(1, self.dim_ph)

    # -- layout conversion ----------------------------------------------
    def to_internal_flat(self, v_sorted):
        """sorted-basis vector -> blocked layout: blocked[j] lives at sorted
        position inv_order[j]."""
        v2 = v_sorted.reshape(self.dim_ph, self.dim_el)
        return jnp.take(v2, self._inv_order, axis=1) \
            .astype(self.dtype).reshape(-1)

    def from_internal_flat(self, v_blocked):
        v2 = v_blocked.reshape(self.dim_ph, self.dim_el)
        return jnp.take(v2, self._order, axis=1).reshape(-1)

    # -- matvec ----------------------------------------------------------
    def _apply_el(self, vb: List, hup_b, hdw_b, diag_b, gathers):
        """One electronic application on the per-block tensor list."""
        out = []
        for i, v in enumerate(vb):
            w = diag_b[i] * v if diag_b is not None else jnp.zeros_like(v)
            if hup_b[i] is not None:
                w = w + v @ hup_b[i]
            if hdw_b[i] is not None:
                w = w + jnp.einsum("de,peu->pdu", hdw_b[i], v,
                                   preferred_element_type=v.dtype)
            out.append(w)
        for (src, dst, coeff, dw_src, dw_sgn, up_src, up_sgn) in gathers:
            t = jnp.take(vb[src], dw_src, axis=1)
            t = jnp.take(t, up_src, axis=2)
            t = t * (dw_sgn[None, :, None] * up_sgn[None, None, :])
            out[dst] = out[dst] + coeff * t
        return out

    def split_blocks(self, v):
        v2 = v.reshape(self.dim_ph, self.dim_el)
        return [v2[:, o:o + s[0] * s[1]].reshape(self.dim_ph, *s)
                for o, s in zip(self._offsets, self._shapes)]

    def join_blocks(self, vb):
        return jnp.concatenate(
            [w.reshape(self.dim_ph, -1) for w in vb], axis=1).reshape(-1)

    def __call__(self, v):
        vb = [b.astype(self.dtype) for b in self.split_blocks(v)]
        out = self._apply_el(vb, self.hup_b, self.hdw_b, self.diag_b,
                             self.gathers)
        if self.has_ph:
            # phonon oscillator + e-ph: X ⊗ (eph_diag + eph hops)
            ev = self._apply_el(vb, self.eph_up_b, self.eph_dw_b,
                                self.eph_diag_b, self.eph_gathers)
            for i in range(len(out)):
                out[i] = out[i] \
                    + jnp.einsum("pq,qdu->pdu", self.ph_mat.astype(self.dtype),
                                 vb[i]) \
                    + jnp.einsum("pq,qdu->pdu", self.ph_x.astype(self.dtype),
                                 ev[i])
        return self.join_blocks(out).astype(v.dtype)

    def to_dense(self) -> np.ndarray:
        """Dense matrix in the BLOCKED layout (tests)."""
        eye = np.eye(self.dim, dtype=complex)
        cols = [np.asarray(self(jnp.asarray(eye[:, i], self.dtype)))
                for i in range(self.dim)]
        return np.stack(cols, axis=1)


def build_joint_kron_op(cfg: EDConfig, sec: Sector, hloc, um, bath,
                        hloc_anomalous=None,
                        dtype=jnp.complex128) -> JointKronMatvec:
    from .joint import _enumerate_joint_terms
    if sec.qn[0] not in ("sz", "nt"):
        raise ValueError("blocked-Kron operator requires full (Nup,Ndw) "
                         "product blocks; Jz-filtered sectors use the ELL "
                         "path")
    acc = BlockedTermAccumulator(sec, sec.ns)
    eph = _enumerate_joint_terms(cfg, sec, hloc, um, bath, hloc_anomalous,
                                 acc, lambda: BlockedTermAccumulator(
                                     sec, sec.ns))
    return JointKronMatvec(cfg, sec, acc, eph_acc=eph, dtype=dtype)
