"""jz_basis: (Ntot, 2Jz) nonsu2 sectors for the spin-orbit-coupled 3-orbital
(t2g, effective L=1) basis.

Parity targets: reference ED_SETUP.f90:817-983 (setup_global_nonsu2 Jz
branch, getCsector_Jz/getCDGsector_Jz), ED_SECTOR.f90:289-333 (Jz-filtered
basis build), ED_GF_NONSU2.f90:170-290 (Jz-routed GF channels).

Oracle: the identical problem solved with jz_basis=False — for a
Jz-conserving Hamiltonian the finer sector decomposition must reproduce
every physical result exactly.
"""
import numpy as np
import pytest

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.bath.replica import make_basis
from edipack_tpu.fock import binom
from edipack_tpu.sectors import SectorTable, jz_level_weights, max_two_jz
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.umatrix import build_umatrix


def _soc_matrix(lam: float) -> np.ndarray:
    """lam * L.S in the Lz-diagonal orbital basis Lz=diag(-1,+1,0)
    (reference Lzdiag, ED_VARS_GLOBAL.f90:283)."""
    lz = np.diag([-1.0, 1.0, 0.0])
    lp = np.zeros((3, 3))          # L+ (rows=target): |-1> -> |0> -> |+1>
    lp[2, 0] = np.sqrt(2.0)
    lp[1, 2] = np.sqrt(2.0)
    lm = lp.T
    soc = np.zeros((2, 2, 3, 3), complex)
    soc[0, 0] = 0.5 * lz
    soc[1, 1] = -0.5 * lz
    soc[0, 1] = 0.5 * lm           # (L- S+)/2 acting dw->up
    soc[1, 0] = 0.5 * lp
    return lam * soc


def _jz_problem(nbath=1, lam=0.25, **over):
    cfg = default_config(norb=3, nbath=nbath, nspin=2, ed_mode="nonsu2",
                         bath_type="replica", uloc=[1.0] * 3, ust=0.4,
                         jh=0.1, jx=0.05, jp=0.0, xmu=0.3, lmats=24, **over)
    um = build_umatrix(cfg)
    eye = np.zeros((2, 2, 3, 3))
    eye[0, 0] = np.eye(3)
    eye[1, 1] = np.eye(3)
    soc_op = _soc_matrix(1.0)
    basis = make_basis(np.stack([eye, soc_op]), np.array([0.35, 0.1]),
                       nbath=nbath)
    bath = init_bath(cfg, basis)
    hloc = _soc_matrix(lam)
    return cfg, hloc, um, bath, basis


def test_jz_sector_bookkeeping():
    cfg = default_config(norb=3, nbath=2, nspin=2, ed_mode="nonsu2",
                         bath_type="replica", jz_basis=True)
    table = SectorTable(cfg)
    ns = table.dims.ns
    w = jz_level_weights(cfg, ns)
    # greedy max matches the reference closed formula for Norb=3
    # (ED_SETUP.f90:817-827)
    nbath = cfg.nbath
    for n in range(2 * ns + 1):
        if n == 0 or n == 2 * ns:
            ref = 0
        else:
            shift = 0
            if n <= nbath + 1:
                shift = nbath - n + 1
            if n >= 2 * ns - nbath:
                shift = nbath - 2 * ns + n + 1
            ref = 5 + 5 * nbath - abs(n - ns) - 2 * shift
        assert max_two_jz(w, n) == ref, n
    # dims of all (n, 2jz) sectors tile the fixed-n space
    for n in range(2 * ns + 1):
        dims = [table.get_dim(i) for i, qn in enumerate(table.qns)
                if qn[1] == n]
        assert sum(dims) == binom(2 * ns, n)
    # c/cdg connectivity: removing (iorb,ispin) lands in the sector with
    # 2jz' = 2jz - (2*Lz+Sz) (reference getCsector_Jz)
    isec = table.index(("ntj", ns, 1))
    sec = table.sector(isec)
    for iorb, ispin, twojz_op in ((0, 0, -1), (1, 0, 3), (2, 0, 1),
                                  (0, 1, -3), (1, 1, 1), (2, 1, -1)):
        j = table.c_sector(isec, ispin, iorb=iorb)
        if j is not None:
            assert table.qns[j] == ("ntj", ns - 1, 1 - twojz_op)
        j = table.cdg_sector(isec, ispin, iorb=iorb)
        if j is not None:
            assert table.qns[j] == ("ntj", ns + 1, 1 + twojz_op)


def test_jz_hamiltonian_blocks_are_exact():
    """The Jz-filtered sector H must be an exact sub-block of the N-sector H
    (no matrix elements may leave a (N,2Jz) block for a Jz-conserving H)."""
    from edipack_tpu.models.joint import build_joint_sector_op
    cfg, hloc, um, bath, _ = _jz_problem(nbath=1)
    cfg_jz = cfg.replace(jz_basis=True)
    t_n = SectorTable(cfg)
    t_jz = SectorTable(cfg_jz)
    ns = t_n.dims.ns
    n_probe = ns  # half filling: richest Jz structure
    sec_n = t_n.by_qn(("nt", n_probe))
    h_full = build_joint_sector_op(cfg, sec_n, hloc, um, bath).to_dense()
    # eigenvalues of the union of jz blocks == eigenvalues of the full block
    evs = []
    total = 0
    for i, qn in enumerate(t_jz.qns):
        if qn[1] != n_probe or t_jz.get_dim(i) == 0:
            continue
        sec = t_jz.sector(i)
        h = build_joint_sector_op(cfg_jz, sec, hloc, um, bath).to_dense()
        # block must carry the full norm of those rows of the N-sector H:
        # index the N basis by the jz-sector states
        pos = np.searchsorted(sec_n.states, sec.states)
        sub = h_full[np.ix_(pos, pos)]
        assert np.allclose(h, sub, atol=1e-12)
        off = h_full[np.ix_(pos, np.setdiff1d(np.arange(sec_n.dim_el), pos))]
        assert np.abs(off).max() < 1e-12  # H conserves Jz => no leakage
        evs.append(np.linalg.eigvalsh(h))
        total += sec.dim_el
    assert total == sec_n.dim_el
    assert np.allclose(np.sort(np.concatenate(evs)),
                       np.linalg.eigvalsh(h_full), atol=1e-10)


def test_jz_solve_matches_plain_nonsu2():
    cfg, hloc, um, bath, _ = _jz_problem(nbath=1)
    res_n = solve_impurity(cfg, hloc, um, bath)
    res_j = solve_impurity(cfg.replace(jz_basis=True), hloc, um, bath)

    assert abs(res_n.e0 - res_j.e0) < 1e-9
    assert np.allclose(res_n.dens, res_j.dens, atol=1e-8)
    assert np.allclose(res_n.obs.docc, res_j.obs.docc, atol=1e-8)
    assert np.allclose(res_n.obs.mag[2], res_j.obs.mag[2], atol=1e-8)

    g_n = res_n.get_gimp()
    g_j = res_j.get_gimp()
    assert g_n.shape == g_j.shape
    assert np.allclose(g_n, g_j, atol=1e-7), np.abs(g_n - g_j).max()

    s_n = res_n.get_sigma()
    s_j = res_j.get_sigma()
    assert np.allclose(s_n, s_j, atol=1e-6), np.abs(s_n - s_j).max()


def test_jz_solve_with_phonons_matches_plain_nonsu2():
    """jz_basis + phonons (reference supports nonsu2 phonons generally,
    ED_GF_NONSU2.f90:102): the Jz-filtered solve must reproduce the plain
    Ntot nonsu2 solve including phonon observables and D(z)."""
    cfg, hloc, um, bath, _ = _jz_problem(nbath=1, nph=2, w0_ph=0.5,
                                         g_ph=[0.2, 0.2, 0.2])
    res_n = solve_impurity(cfg, hloc, um, bath)
    res_j = solve_impurity(cfg.replace(jz_basis=True), hloc, um, bath)
    assert abs(res_n.e0 - res_j.e0) < 1e-9
    assert np.allclose(res_n.dens, res_j.dens, atol=1e-8)
    assert abs(res_n.obs.ph_x - res_j.obs.ph_x) < 1e-8
    assert abs(res_n.obs.ph_x2 - res_j.obs.ph_x2) < 1e-8
    assert np.allclose(res_n.obs.ph_n, res_j.obs.ph_n, atol=1e-8)
    g_n = res_n.get_gimp()
    g_j = res_j.get_gimp()
    assert np.allclose(g_n, g_j, atol=1e-7), np.abs(g_n - g_j).max()
