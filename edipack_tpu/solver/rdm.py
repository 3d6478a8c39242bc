"""Impurity reduced density matrix (normal mode).

Parity target: reference ED_RDM.f90 + ED_RDM_NORMAL.f90 (:90-213), which
factorizes each sector state into impurity⊗bath via the sparse_map
intersections. Here: impurity levels are the low ``Norb`` bits of each
spin's bitset, so the state tensor is scattered into a dense
(imp_up, bath_up, imp_dw, bath_dw) layout and the bath is traced with one
einsum. Fermionic cross signs cancel because the RDM is particle-number
block-diagonal per spin (even operator pairing), so the per-spin convention
is exact.

RDM basis index: I = imp_up + 2^Norb * imp_dw (up bits fastest), matching the
reference's [4^Norb x 4^Norb] layout.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..config import EDConfig
from ..sectors import SectorTable
from .eigenspace import StateList


def _split_scatter(basis: np.ndarray, norb: int):
    """Return (imp_conf, bath_rank, n_bath_configs) for each basis state."""
    imp_mask = (1 << norb) - 1
    imp = (basis & imp_mask).astype(np.int64)
    bath = (basis >> norb).astype(np.int64)
    uniq, rank = np.unique(bath, return_inverse=True)
    return imp, rank, len(uniq)


def impurity_rdm_normal(cfg: EDConfig, table: SectorTable,
                        sl: StateList) -> np.ndarray:
    norb = cfg.norb
    nimp = 1 << norb
    w = sl.boltzmann_weights()
    rho = np.zeros((nimp * nimp, nimp * nimp))
    for ist, st in enumerate(sl):
        sec = table.sector(st.sector)
        v3 = np.asarray(st.vector).reshape(sec.dim_ph, sec.dim_dw, sec.dim_up)
        iu, bu_rank, nbu = _split_scatter(sec.ups, norb)
        idn, bd_rank, nbd = _split_scatter(sec.dws, norb)
        for p in range(sec.dim_ph):
            wdense = np.zeros((nimp, nbu, nimp, nbd))
            # scatter amplitudes: V[p, d, u] -> W[iu(u), bu(u), id(d), bd(d)]
            wdense[iu[:, None], bu_rank[:, None], idn[None, :], bd_rank[None, :]] = \
                v3[p].T
            rho_st = np.einsum("axby,cxdy->abcd", wdense, wdense)
            rho += w[ist] * _pack(rho_st, nimp)  # rho_st[iu, id, ju, jd]
    return rho


def _pack(rho4: np.ndarray, nimp: int) -> np.ndarray:
    """(iu, id, ju, jd) -> [iu + nimp*id, ju + nimp*jd]."""
    return rho4.transpose(1, 0, 3, 2).reshape(nimp * nimp, nimp * nimp)


def impurity_rdm_joint(cfg: EDConfig, table: SectorTable,
                       sl: StateList) -> np.ndarray:
    """RDM for superc/nonsu2 joint bases (reference ED_RDM_SUPERC/NONSU2).

    Joint bit layout: [imp_up | bath_up | imp_dw | bath_dw]. Factorizing into
    |imp⟩⊗|bath⟩ (imp = imp_up,imp_dw first) commutes the imp_dw creation
    operators past the bath_up ones: amplitude picks up
    (-1)^{n(imp_dw)·n(bath_up)}. Pairing (superc) makes the RDM
    particle-number OFF-diagonal, so the sign must be carried explicitly."""
    norb = cfg.norb
    ns = table.dims.ns
    nb_bits = ns - norb
    nimp = 1 << norb
    imp_mask = np.int64(nimp - 1)
    bath_mask = np.int64((1 << nb_bits) - 1)
    w = sl.boltzmann_weights()
    rho = np.zeros((nimp * nimp, nimp * nimp), dtype=complex)
    from ..fock import popcount

    for ist, st in enumerate(sl):
        sec = table.sector(st.sector)
        states = sec.states
        iu = (states & imp_mask).astype(np.int64)
        bu = ((states >> np.int64(norb)) & bath_mask).astype(np.int64)
        idn = ((states >> np.int64(ns)) & imp_mask).astype(np.int64)
        bd = ((states >> np.int64(ns + norb)) & bath_mask).astype(np.int64)
        sign = 1.0 - 2.0 * ((popcount(idn) * popcount(bu)) % 2)
        bath_key = bu | (bd << np.int64(nb_bits))
        uniq, brank = np.unique(bath_key, return_inverse=True)
        impi = (iu + nimp * idn).astype(np.int64)
        v2 = np.asarray(st.vector).reshape(sec.dim_ph, sec.dim_el)
        for p in range(sec.dim_ph):
            wmat = np.zeros((nimp * nimp, len(uniq)), dtype=complex)
            wmat[impi, brank] = sign * v2[p]
            rho += w[ist] * (wmat @ wmat.conj().T)
    return rho


def get_reduced_rdm(rdm: np.ndarray, orbital_mask, norb: int,
                    ) -> np.ndarray:
    """Trace the impurity RDM down to an orbital subset with fermionic
    sign bookkeeping (reference get_reduced_rdm_normal, ED_RDM.f90:71-230).

    ``rdm``: (4^norb, 4^norb) impurity RDM with index I = iu + 2^norb*id.
    ``orbital_mask``: length-norb booleans, True = keep."""
    mask = np.asarray(orbital_mask, bool)
    if mask.shape != (norb,):
        raise ValueError("orbital_mask must have one entry per orbital")
    nred = int(mask.sum())
    if nred < 1:
        raise ValueError("reduced system needs at least one orbital")
    if nred == norb:
        return rdm.copy()
    red = np.nonzero(mask)[0]
    tra = np.nonzero(~mask)[0]
    nimp = 1 << norb

    bits = ((np.arange(nimp)[:, None] >> np.arange(norb)[None, :]) & 1)
    # sign: for each kept orbital r, count occupied TRACED bits below r
    filt = bits.copy()
    filt[:, red] = 0
    csum = np.cumsum(filt, axis=1)      # inclusive prefix sums
    n = np.zeros(nimp, dtype=np.int64)
    for r in red:
        n += csum[:, r] - filt[:, r]    # traced bits strictly below r
    sgn = 1.0 - 2.0 * (n % 2)
    red_idx = (bits[:, red] << np.arange(nred)[None, :]).sum(1)
    tra_idx = (bits[:, tra] << np.arange(norb - nred)[None, :]).sum(1)

    nred_imp = 1 << nred
    out = np.zeros((nred_imp * nred_imp, nred_imp * nred_imp), rdm.dtype)
    for iu in range(nimp):
        for idw in range(nimp):
            i = iu + nimp * idw
            for ju in range(nimp):
                if tra_idx[ju] != tra_idx[iu]:
                    continue
                for jd in range(nimp):
                    if tra_idx[jd] != tra_idx[idw]:
                        continue
                    j = ju + nimp * jd
                    io = red_idx[iu] + nred_imp * red_idx[idw]
                    jo = red_idx[ju] + nred_imp * red_idx[jd]
                    s = sgn[iu] * sgn[idw] * sgn[ju] * sgn[jd]
                    out[io, jo] += rdm[i, j] * s
    return out
