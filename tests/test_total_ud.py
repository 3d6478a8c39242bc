"""ed_total_ud=False (per-orbital quantum numbers) must reproduce the
total-QN physics when the Hamiltonian is orbital-diagonal."""
import numpy as np

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.sectors import SectorTable
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.umatrix import build_umatrix


def test_orbital_qn_sector_dims():
    cfg = default_config(norb=2, nbath=2, nspin=1, ed_total_ud=False,
                         uloc=[2.0, 1.5], ust=0.8)
    table = SectorTable(cfg)
    d = table.dims
    assert d.ns_ud == 2 and d.ns_orb == 3
    assert len(table) == (4 ** 2) ** 2
    sec = table.by_qn(("n", (1, 2), (2, 0)))
    assert sec.dim_up == 3 * 3
    assert sec.dim_dw == 3 * 1
    assert len(sec.ups) == sec.dim_up
    # each up state has exactly 1 particle in orbital-0 block, 2 in orbital-1
    from edipack_tpu.fock import occupations
    occ = occupations(sec.ups, d.ns)
    # orbital 0 block: level 0 (imp) + levels 2,3 (bath); orbital 1: 1 + 4,5
    n0 = occ[:, [0, 2, 3]].sum(1)
    n1 = occ[:, [1, 4, 5]].sum(1)
    assert np.all(n0 == 1) and np.all(n1 == 2)


def test_total_ud_false_matches_true():
    base = dict(norb=2, nbath=1, nspin=1, uloc=[2.0, 1.6], ust=0.9,
                jh=0.15, xmu=0.4, beta=90.0, lmats=32)
    cfg_t = default_config(ed_total_ud=True, **base)
    um = build_umatrix(cfg_t)
    bath = init_bath(cfg_t)
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.diag([0.2, -0.2])
    res_t = solve_impurity(cfg_t, hloc, um, bath)

    cfg_o = default_config(ed_total_ud=False, **base)
    um_o = build_umatrix(cfg_o)
    res_o = solve_impurity(cfg_o, hloc, um_o, bath)

    assert abs(res_t.e0 - res_o.e0) < 1e-10
    assert np.allclose(res_t.dens, res_o.dens, atol=1e-8)
    assert np.allclose(res_t.docc, res_o.docc, atol=1e-8)
    z = 1j * (2 * np.arange(32) + 1) * np.pi / cfg_t.beta
    g_t = res_t.get_gimp(z)
    g_o = res_o.get_gimp(z)
    for a in range(2):
        assert np.allclose(g_t[0, 0, a, a], g_o[0, 0, a, a], atol=1e-7), a
