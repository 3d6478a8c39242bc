"""Device-side sector matvecs.

Two operator classes cover all three ED modes:

* :class:`KronMatvec` — normal mode. The sector vector is a dense tensor
  ``V[DimPh, DimDw, DimUp]``; H·V is dense matmuls on the spin-factor
  matrices (MXU-friendly), replacing the reference's row-loop CSR SpMV
  (ED_NORMAL/..._STORED_HxV.f90:765-1082).
* :class:`EllMatvec` — superc/nonsu2 joint sectors. Padded-ELL storage
  (fixed nnz/row) with gather + fused multiply-add; replaces the reference's
  row-split CSR + Allgatherv matvec (ED_SUPERC/..._STORED_HxV.f90:366-432).

Both expose ``__call__(v)`` on flat vectors and carry ``dim``/``dtype`` so the
eigensolvers are representation-agnostic.

Sharding: ``shard()`` places the dw axis of V (Kron) or rows (ELL) over a
mesh axis; the up/dw transpose the reference does with MPI_AlltoAllV
(ED_HAMILTONIAN_NORMAL_COMMON.f90:66-167) becomes an XLA collective inserted
by GSPMD when contracting the sharded axis.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.normal import NormalSectorOp


class KronMatvec:
    """H·V = D⊙V + V@Hupᵀ + Hdw@V + Σ_k B_k@V@A_kᵀ (+ phonon terms)."""

    def __init__(self, op: NormalSectorOp, dtype=jnp.float64,
                 sharding: Optional[jax.sharding.NamedSharding] = None):
        self.shape3 = (op.sector.dim_ph, op.hdw.shape[0], op.hup.shape[0])
        self.dim = int(np.prod(self.shape3))
        self.dtype = dtype
        put = (lambda x: jax.device_put(jnp.asarray(x, dtype))) if sharding is None \
            else (lambda x: jax.device_put(jnp.asarray(x, dtype)))
        self.d = put(op.d)
        self.hup_t = put(op.hup.T)
        self.hdw = put(op.hdw)
        self.nl_a = put(np.swapaxes(op.nl_a, 1, 2)) if op.nl_a is not None else None
        self.nl_b = put(op.nl_b) if op.nl_b is not None else None
        self.has_ph = op.ph_mat is not None
        if self.has_ph:
            self.ph_mat = put(op.ph_mat)
            self.ph_x = put(op.ph_x)
            self.eph_d = put(op.eph_d)
            self.eph_up_t = put(op.eph_up.T)
            self.eph_dw = put(op.eph_dw)
        self.nnz = op.nnz_estimate()
        self._sharding = sharding

    def apply3(self, v):
        """Matvec on the (DimPh, DimDw, DimUp) tensor form."""
        out = self.d * v
        out = out + v @ self.hup_t
        out = out + jnp.einsum("de,peu->pdu", self.hdw, v,
                               preferred_element_type=self.dtype)
        if self.nl_a is not None:
            out = out + jnp.einsum("kde,peu,kuv->pdv", self.nl_b, v, self.nl_a,
                                   preferred_element_type=self.dtype)
        if self.has_ph:
            out = out + jnp.einsum("pq,qdu->pdu", self.ph_mat, v,
                                   preferred_element_type=self.dtype)
            ev = self.eph_d * v + v @ self.eph_up_t \
                + jnp.einsum("de,peu->pdu", self.eph_dw, v,
                             preferred_element_type=self.dtype)
            out = out + jnp.einsum("pq,qdu->pdu", self.ph_x, ev,
                                   preferred_element_type=self.dtype)
        return out

    def __call__(self, v):
        v3 = v.reshape(self.shape3)
        if self._sharding is not None:
            v3 = jax.lax.with_sharding_constraint(v3, self._sharding)
        out = self.apply3(v3)
        if self._sharding is not None:
            out = jax.lax.with_sharding_constraint(out, self._sharding)
        return out.reshape(-1)


class EllMatvec:
    """Padded-ELL sparse matvec: out[i] = Σ_k vals[i,k] * v[cols[i,k]].

    Rows are padded to a fixed K with (col=i, val=0) entries. ``cols`` int32.
    """

    def __init__(self, cols: np.ndarray, vals: np.ndarray, dtype=jnp.float64,
                 nnz: Optional[int] = None):
        assert cols.shape == vals.shape and cols.ndim == 2
        self.dim = cols.shape[0]
        self.k = cols.shape[1]
        self.dtype = dtype
        self.cols = jax.device_put(jnp.asarray(cols, jnp.int32))
        self.vals = jax.device_put(jnp.asarray(vals, dtype))
        self.nnz = int(nnz if nnz is not None else np.count_nonzero(vals))

    def __call__(self, v):
        gathered = jnp.take(v, self.cols, axis=0)        # (dim, K)
        return jnp.sum(self.vals * gathered, axis=1)


class JointMatvec:
    """superc/nonsu2 sector matvec: padded-ELL electronic H batched over the
    phonon axis, plus phonon and electron-phonon Kronecker terms.

    v is flat (dim_ph * dim_el); internally (dim_ph, dim_el)."""

    def __init__(self, op, dtype=jnp.complex128):
        self.dim_el = op.dim_el
        self.dim_ph = op.sector.dim_ph
        self.dim = self.dim_el * self.dim_ph
        self.dtype = dtype
        cols, vals = op.ell()
        self.cols = jax.device_put(jnp.asarray(cols, jnp.int32))
        self.vals = jax.device_put(jnp.asarray(vals, dtype))
        self.has_ph = op.ph_mat is not None
        if self.has_ph:
            self.ph_mat = jax.device_put(jnp.asarray(op.ph_mat, dtype))
            self.ph_x = jax.device_put(jnp.asarray(op.ph_x, dtype))
            self.eph_diag = jax.device_put(jnp.asarray(op.eph_diag, dtype))
            if op.eph_rows is not None and len(op.eph_rows):
                import numpy as _np
                e = _np.zeros((self.dim_el, self.dim_el), dtype=complex)
                _np.add.at(e, (op.eph_rows, op.eph_cols), op.eph_vals)
                self.eph_dense = jax.device_put(jnp.asarray(e, dtype))
            else:
                self.eph_dense = None
        self.nnz = op.nnz_estimate()

    def __call__(self, v):
        v2 = v.reshape(self.dim_ph, self.dim_el)
        gathered = jnp.take(v2, self.cols, axis=1)          # (dp, de, K)
        out = jnp.sum(self.vals[None, :, :] * gathered, axis=-1)
        if self.has_ph:
            out = out + self.ph_mat @ v2
            ev = self.eph_diag[None, :] * v2
            if self.eph_dense is not None:
                ev = ev + v2 @ self.eph_dense.T
            out = out + self.ph_x @ ev
        return out.reshape(-1)


class DenseMatvec:
    """Explicit dense H for small sectors and tests."""

    def __init__(self, h: np.ndarray, dtype=jnp.float64):
        self.h = jax.device_put(jnp.asarray(h, dtype))
        self.dim = h.shape[0]
        self.dtype = dtype
        self.nnz = int(np.count_nonzero(h))

    def __call__(self, v):
        return self.h @ v
