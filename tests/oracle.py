"""Independent brute-force ED oracle used to validate the engine.

Builds many-body operators over the FULL Fock space (4^Ns states) from
Kronecker chains of 2x2 matrices — a deliberately different code path from
edipack_tpu.fock (bit arithmetic), so shared sign bugs are unlikely.

State index convention matches the engine: level p of spin s occupies bit
(p + s*Ns); basis index == packed integer. Two spin conventions:
  * 'joint'    — Jordan-Wigner string over the whole joint bitset
  * 'per-spin' — JW within each spin species only (up/dw species commute);
                 this is the reference's normal-mode convention.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import scipy.sparse as sp

I2 = sp.identity(2, format="csr")
A = sp.csr_matrix(np.array([[0.0, 1.0], [0.0, 0.0]]))   # annihilation: <0|a|1>=1
Z = sp.csr_matrix(np.array([[1.0, 0.0], [0.0, -1.0]]))


def _chain(mats):
    """kron chain with mats[0] acting on bit 0 (fastest index)."""
    out = mats[0]
    for m in mats[1:]:
        out = sp.kron(m, out, format="csr")
    return out


@lru_cache(maxsize=None)
def c_op(nlev: int, pos: int, jw_lo: int = 0):
    """Annihilation at bit ``pos`` of an ``nlev``-bit register, with the JW
    string covering bits [jw_lo, pos)."""
    mats = []
    for b in range(nlev):
        if b < jw_lo:
            mats.append(I2)
        elif b < pos:
            mats.append(Z)
        elif b == pos:
            mats.append(A)
        else:
            mats.append(I2)
    return _chain(mats)


class FockOracle:
    def __init__(self, ns: int, convention: str = "per-spin"):
        self.ns = ns
        self.nlev = 2 * ns
        self.dim = 1 << self.nlev
        self.convention = convention

    def c(self, orb_level: int, spin: int):
        pos = orb_level + spin * self.ns
        if self.convention == "joint":
            return c_op(self.nlev, pos, 0)
        jw_lo = spin * self.ns
        return c_op(self.nlev, pos, jw_lo)

    def cdg(self, orb_level: int, spin: int):
        return self.c(orb_level, spin).conj().T.tocsr()

    def n(self, orb_level: int, spin: int):
        c = self.c(orb_level, spin)
        return (c.conj().T @ c).tocsr()

    def opstring(self, ops, coeff=1.0):
        """Product of ops applied right-to-left: ops[0] acts FIRST on the ket.
        ops: list of (kind, level, spin)."""
        m = sp.identity(self.dim, format="csr")
        for kind, lvl, spin in ops:
            o = self.c(lvl, spin) if kind == "c" else self.cdg(lvl, spin)
            m = o @ m
        return coeff * m

    # ------------------------------------------------------------------
    def occupations(self):
        """(dim, nlev) occupation table of the full basis."""
        s = np.arange(self.dim, dtype=np.int64)[:, None]
        bits = np.arange(self.nlev)[None, :]
        return ((s >> bits) & 1).astype(np.float64)

    def sector_indices(self, nup: int, ndw: int):
        occ = self.occupations()
        return np.nonzero((occ[:, :self.ns].sum(1) == nup)
                          & (occ[:, self.ns:].sum(1) == ndw))[0]

    def sector_indices_sz(self, sz: int):
        occ = self.occupations()
        return np.nonzero(occ[:, :self.ns].sum(1) - occ[:, self.ns:].sum(1) == sz)[0]

    def sector_indices_n(self, n: int):
        occ = self.occupations()
        return np.nonzero(occ.sum(1) == n)[0]

    def project(self, h, idx):
        return np.asarray(h.tocsr()[np.ix_(idx, idx)].todense())


def oracle_normal_hamiltonian(orc: FockOracle, cfg, hloc, um, bath):
    """Full-Fock H for the normal mode, built from first principles with the
    oracle's own operator algebra (structure mirrors the physics, not the
    engine's factorization)."""
    from edipack_tpu.fock import bath_level
    from edipack_tpu.bath.dmft_bath import bath_levels, bath_hyb

    ns, norb, nbath, nspin = orc.ns, cfg.norb, cfg.nbath, cfg.nspin
    isdw = nspin - 1
    h = sp.csr_matrix((orc.dim, orc.dim))
    mf = um.mf_hloc
    h_imp = {0: np.real(hloc[0, 0] + mf[0, 0]), 1: np.real(hloc[isdw, isdw] + mf[1, 1])}
    sfz = np.asarray(cfg.spin_field_z[:norb])
    # impurity one-body + fields - xmu
    for s in (0, 1):
        for i in range(norb):
            for j in range(norb):
                t = h_imp[s][i, j]
                if i == j:
                    t += -cfg.xmu + (sfz[i] if s == 0 else -sfz[i])
                if t != 0:
                    h = h + t * (orc.cdg(i, s) @ orc.c(j, s))
    exc = np.asarray(cfg.exc_field)
    if np.any(exc != 0):
        for s in (0, 1):
            fz = exc[0] + (exc[3] if s == 0 else -exc[3])
            for i in range(norb):
                for j in range(norb):
                    if i != j and fz != 0:
                        h = h + fz * (orc.cdg(i, s) @ orc.c(j, s))
    # bath levels + hybridization
    ed = bath_levels(bath)
    vh = bath_hyb(bath)
    for s in (0, 1):
        sidx = 0 if s == 0 else isdw
        for i in range(ed.shape[1]):
            for k in range(nbath):
                lb = bath_level(cfg.bath_type, norb, nbath, i, k)
                if ed[sidx, i, k] != 0:
                    h = h + ed[sidx, i, k] * orc.n(lb, s)
        for i in range(norb):
            for k in range(nbath):
                lb = bath_level(cfg.bath_type, norb, nbath, i, k)
                v = vh[sidx, i, k]
                if v != 0:
                    h = h + v * (orc.cdg(i, s) @ orc.c(lb, s)
                                 + orc.cdg(lb, s) @ orc.c(i, s))
    # replica off-diagonal bath
    if bath.is_replica:
        hb = bath.hbath()
        for k in range(nbath):
            for s in (0, 1):
                sidx = 0 if s == 0 else isdw
                m = np.real(hb[k, sidx, sidx])
                for i in range(norb):
                    for j in range(norb):
                        if i != j and m[i, j] != 0:
                            h = h + m[i, j] * (
                                orc.cdg(bath_level(cfg.bath_type, norb, nbath, i, k), s)
                                @ orc.c(bath_level(cfg.bath_type, norb, nbath, j, k), s))
    # interaction: density-density
    nmat_u = [orc.n(i, 0) for i in range(norb)]
    nmat_d = [orc.n(i, 1) for i in range(norb)]
    for a in range(norb):
        h = h + um.uloc[a] * (nmat_u[a] @ nmat_d[a])
    for a in range(norb):
        for b in range(a + 1, norb):
            h = h + um.ust[a, b] * (nmat_u[a] @ nmat_d[b] + nmat_u[b] @ nmat_d[a])
            h = h + um.ustp[a, b] * (nmat_u[a] @ nmat_u[b] + nmat_d[a] @ nmat_d[b])
    if cfg.hfmode:
        eye = sp.identity(orc.dim, format="csr")
        for a in range(norb):
            h = h - 0.5 * um.uloc[a] * (nmat_u[a] + nmat_d[a]) \
                + 0.25 * um.uloc[a] * eye
        for a in range(norb):
            for b in range(a + 1, norb):
                na = nmat_u[a] + nmat_d[a] + nmat_u[b] + nmat_d[b]
                h = h - 0.5 * um.ust[a, b] * na + 0.5 * um.ust[a, b] * eye
                h = h - 0.5 * um.ustp[a, b] * na + 0.5 * um.ustp[a, b] * eye
    # spin exchange / pair hopping (per-spin convention factor products)
    for a in range(norb):
        for b in range(norb):
            if a != b and um.jx[a, b] != 0:
                up = orc.cdg(a, 0) @ orc.c(b, 0)
                dw = orc.cdg(b, 1) @ orc.c(a, 1)
                h = h + um.jx[a, b] * (up @ dw)
            if a != b and um.jp[a, b] != 0:
                up = orc.cdg(a, 0) @ orc.c(b, 0)
                dw = orc.cdg(a, 1) @ orc.c(b, 1)
                h = h + um.jp[a, b] * (up @ dw)
    for t in um.sundry:
        h = h + np.real(t.coeff) * orc.opstring([(k, o, s) for (k, o, s) in t.ops])
    return h


def oracle_superc_hamiltonian(orc: FockOracle, cfg, hloc, um, bath,
                              hloc_anomalous=None):
    """Full-Fock superc H (joint JW convention): normal part + pairing."""
    import numpy as np
    from edipack_tpu.fock import bath_level
    from edipack_tpu.bath.dmft_bath import bath_levels, bath_hyb

    assert orc.convention == "joint"
    ns, norb, nbath = orc.ns, cfg.norb, cfg.nbath
    h = sp.csr_matrix((orc.dim, orc.dim), dtype=complex)
    hloc = np.asarray(hloc, dtype=complex)
    mf = um.mf_hloc
    # impurity one-body (both spins) - xmu
    for s in (0, 1):
        blk = hloc[0, 0] + mf[s, s] if s == 0 else hloc[cfg.nspin - 1,
                                                        cfg.nspin - 1] + mf[1, 1]
        for i in range(norb):
            for j in range(norb):
                t = blk[i, j] - (cfg.xmu if i == j else 0)
                if t != 0:
                    h = h + t * (orc.cdg(i, s) @ orc.c(j, s))
    # pairing on impurity
    pf = np.asarray(cfg.pair_field[:norb])
    han = (np.asarray(hloc_anomalous, complex) if hloc_anomalous is not None
           else np.zeros((norb, norb), complex))
    for a in range(norb):
        for b in range(norb):
            amp = han[a, b] + (pf[a] if a == b else 0.0)
            if amp != 0:
                # amp * c_{b,dw} c_{a,up} + conj(amp') c†_{a,up} c†_{b,dw}
                h = h + amp * (orc.c(b, 1) @ orc.c(a, 0))
                h = h + (np.conj(han[a, b]) + (pf[a] if a == b else 0.0)) * \
                    (orc.cdg(a, 0) @ orc.cdg(b, 1))
    # bath levels + pairing + hybridization (normal/hybrid bath)
    ed = bath_levels(bath)
    vh = bath_hyb(bath)
    isdw = cfg.nspin - 1
    for i in range(ed.shape[1]):
        for k in range(nbath):
            lb = bath_level(cfg.bath_type, norb, nbath, i, k)
            for s in (0, 1):
                e = ed[0 if s == 0 else isdw, i, k]
                if e != 0:
                    h = h + e * orc.n(lb, s)
    if bath.d is not None:
        for i in range(bath.d.shape[1]):
            for k in range(nbath):
                lb = bath_level(cfg.bath_type, norb, nbath, i, k)
                dk = bath.d[0, i, k]
                if dk != 0:
                    h = h + dk * (orc.c(lb, 1) @ orc.c(lb, 0))
                    h = h + dk * (orc.cdg(lb, 0) @ orc.cdg(lb, 1))
    for i in range(norb):
        for k in range(nbath):
            lb = bath_level(cfg.bath_type, norb, nbath, i, k)
            for s in (0, 1):
                v = vh[0 if s == 0 else isdw, i, k]
                if v != 0:
                    h = h + v * (orc.cdg(i, s) @ orc.c(lb, s)
                                 + orc.cdg(lb, s) @ orc.c(i, s))
    # interaction: density-density + Hartree (same as normal)
    nmu = [orc.n(i, 0) for i in range(norb)]
    nmd = [orc.n(i, 1) for i in range(norb)]
    for a in range(norb):
        h = h + um.uloc[a] * (nmu[a] @ nmd[a])
    for a in range(norb):
        for b in range(a + 1, norb):
            h = h + um.ust[a, b] * (nmu[a] @ nmd[b] + nmu[b] @ nmd[a])
            h = h + um.ustp[a, b] * (nmu[a] @ nmu[b] + nmd[a] @ nmd[b])
    if cfg.hfmode:
        eye = sp.identity(orc.dim, format="csr")
        for a in range(norb):
            h = h - 0.5 * um.uloc[a] * (nmu[a] + nmd[a]) + 0.25 * um.uloc[a] * eye
        for a in range(norb):
            for b in range(a + 1, norb):
                na = nmu[a] + nmd[a] + nmu[b] + nmd[b]
                h = h - 0.5 * (um.ust[a, b] + um.ustp[a, b]) * na \
                    + 0.5 * (um.ust[a, b] + um.ustp[a, b]) * eye
    # Jx / Jp in the joint convention (reference Hint.f90 operator order)
    for a in range(norb):
        for b in range(norb):
            if a != b and um.jx[a, b] != 0:
                op = (orc.cdg(a, 0) @ orc.cdg(b, 1) @ orc.c(a, 1) @ orc.c(b, 0))
                h = h + um.jx[a, b] * op
            if a != b and um.jp[a, b] != 0:
                op = (orc.cdg(a, 0) @ orc.cdg(a, 1) @ orc.c(b, 1) @ orc.c(b, 0))
                h = h + um.jp[a, b] * op
    return h


def oracle_nonsu2_hamiltonian(orc: FockOracle, cfg, hloc, um, bath):
    """Full-Fock nonsu2 H (joint convention): full spin-block one-body,
    spin fields, spin-flip bath hybridization u."""
    import numpy as np
    from edipack_tpu.fock import bath_level
    from edipack_tpu.bath.dmft_bath import bath_levels, bath_hyb

    assert orc.convention == "joint"
    ns, norb, nbath = orc.ns, cfg.norb, cfg.nbath
    h = sp.csr_matrix((orc.dim, orc.dim), dtype=complex)
    hloc = np.asarray(hloc, complex)
    mf = um.mf_hloc
    sfx = np.asarray(cfg.spin_field_x[:norb])
    sfy = np.asarray(cfg.spin_field_y[:norb])
    sfz = np.asarray(cfg.spin_field_z[:norb])
    for s1 in (0, 1):
        for s2 in (0, 1):
            blk = hloc[s1, s2] + mf[s1, s2]
            for i in range(norb):
                for j in range(norb):
                    t = blk[i, j]
                    if s1 == s2 and i == j:
                        t = t - cfg.xmu + (sfz[i] if s1 == 0 else -sfz[i])
                    if t != 0:
                        h = h + t * (orc.cdg(i, s1) @ orc.c(j, s2))
    for a in range(norb):
        if sfx[a] != 0 or sfy[a] != 0:
            h = h + (sfx[a] - 1j * sfy[a]) * (orc.cdg(a, 0) @ orc.c(a, 1))
            h = h + (sfx[a] + 1j * sfy[a]) * (orc.cdg(a, 1) @ orc.c(a, 0))
    ed = bath_levels(bath)
    vh = bath_hyb(bath)
    isdw = cfg.nspin - 1
    for i in range(ed.shape[1]):
        for k in range(nbath):
            lb = bath_level(cfg.bath_type, norb, nbath, i, k)
            h = h + ed[0, i, k] * orc.n(lb, 0) + ed[isdw, i, k] * orc.n(lb, 1)
    for i in range(norb):
        for k in range(nbath):
            lb = bath_level(cfg.bath_type, norb, nbath, i, k)
            for s in (0, 1):
                v = vh[0 if s == 0 else isdw, i, k]
                if v != 0:
                    h = h + v * (orc.cdg(i, s) @ orc.c(lb, s)
                                 + orc.cdg(lb, s) @ orc.c(i, s))
    if bath.u is not None:
        for i in range(norb):
            for k in range(nbath):
                lb = bath_level(cfg.bath_type, norb, nbath, i, k)
                u1 = bath.u[0, i, k]
                u2 = bath.u[isdw, i, k]
                # imp up <-> bath dw and imp dw <-> bath up
                # (reference ED_NONSU2/stored/Himp_bath.f90:82-130)
                if u1 != 0:
                    h = h + u1 * (orc.cdg(lb, 1) @ orc.c(i, 0)
                                  + orc.cdg(i, 0) @ orc.c(lb, 1))
                if u2 != 0:
                    h = h + u2 * (orc.cdg(lb, 0) @ orc.c(i, 1)
                                  + orc.cdg(i, 1) @ orc.c(lb, 0))
    # interaction density + Hartree + Jx/Jp (joint convention)
    nmu = [orc.n(i, 0) for i in range(norb)]
    nmd = [orc.n(i, 1) for i in range(norb)]
    for a in range(norb):
        h = h + um.uloc[a] * (nmu[a] @ nmd[a])
    for a in range(norb):
        for b in range(a + 1, norb):
            h = h + um.ust[a, b] * (nmu[a] @ nmd[b] + nmu[b] @ nmd[a])
            h = h + um.ustp[a, b] * (nmu[a] @ nmu[b] + nmd[a] @ nmd[b])
    if cfg.hfmode:
        eye = sp.identity(orc.dim, format="csr")
        for a in range(norb):
            h = h - 0.5 * um.uloc[a] * (nmu[a] + nmd[a]) + 0.25 * um.uloc[a] * eye
        for a in range(norb):
            for b in range(a + 1, norb):
                na = nmu[a] + nmd[a] + nmu[b] + nmd[b]
                h = h - 0.5 * (um.ust[a, b] + um.ustp[a, b]) * na \
                    + 0.5 * (um.ust[a, b] + um.ustp[a, b]) * eye
    for a in range(norb):
        for b in range(norb):
            if a != b and um.jx[a, b] != 0:
                h = h + um.jx[a, b] * (orc.cdg(a, 0) @ orc.cdg(b, 1)
                                       @ orc.c(a, 1) @ orc.c(b, 0))
            if a != b and um.jp[a, b] != 0:
                h = h + um.jp[a, b] * (orc.cdg(a, 0) @ orc.cdg(a, 1)
                                       @ orc.c(b, 1) @ orc.c(b, 0))
    for t in um.sundry:
        h = h + t.coeff * orc.opstring([(k, o, s) for (k, o, s) in t.ops])
    return h


def oracle_superc_replica_bath(orc: FockOracle, cfg, bath):
    """Nambu replica-bath terms: H_k = Ψ† Hn_k Ψ with Ψ=(d_up, d†_dw),
    Hn blocks (h00, h01; h10, h11); the constant Σ h11_ii is dropped
    (reference does the same through its cc† handling)."""
    import numpy as np
    from edipack_tpu.fock import bath_level
    h = sp.csr_matrix((orc.dim, orc.dim), dtype=complex)
    hb = bath.hbath()
    norb, nbath = cfg.norb, cfg.nbath
    for k in range(nbath):
        for i in range(norb):
            for j in range(norb):
                li = bath_level(cfg.bath_type, norb, nbath, i, k)
                lj = bath_level(cfg.bath_type, norb, nbath, j, k)
                h00 = hb[k, 0, 0, i, j]
                h01 = hb[k, 0, 1, i, j]
                h10 = hb[k, 1, 0, i, j]
                h11 = hb[k, 1, 1, i, j]
                if h00 != 0:
                    h = h + h00 * (orc.cdg(li, 0) @ orc.c(lj, 0))
                if h01 != 0:
                    h = h + h01 * (orc.cdg(li, 0) @ orc.cdg(lj, 1))
                if h10 != 0:
                    h = h + h10 * (orc.c(li, 1) @ orc.c(lj, 0))
                if h11 != 0:
                    if i == j:
                        h = h - h11 * orc.n(li, 1)
                    else:
                        h = h - h11 * (orc.cdg(lj, 1) @ orc.c(li, 1))
    return h
