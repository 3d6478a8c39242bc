"""ed_sparse_h=False: matrix-free COO joint matvec vs the stored ELL path
(the reference's stored/direct consistency sweep, ed_normal_normal.f90:72-77)."""
import numpy as np
import jax.numpy as jnp
import pytest

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.models.joint import build_joint_sector_op
from edipack_tpu.ops.matvec import JointMatvec, JointMatvecDirect
from edipack_tpu.sectors import SectorTable
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.umatrix import build_umatrix


def test_joint_direct_matvec_matches_ell():
    cfg = default_config(norb=2, nbath=2, nspin=1, ed_mode="superc",
                         uloc=[-1.5, -1.5], ust=-0.6, jh=0.1, jx=0.1, jp=0.1,
                         deltasc=0.04)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.diag([0.3, -0.3])
    table = SectorTable(cfg)
    rng = np.random.default_rng(5)
    tested = 0
    for sec in table:
        if sec.dim == 0 or sec.dim > 2000:
            continue
        op = build_joint_sector_op(cfg, sec, hloc, um, bath)
        ell = JointMatvec(op)
        direct = JointMatvecDirect(op)
        v = jnp.asarray(rng.normal(size=sec.dim)
                        + 1j * rng.normal(size=sec.dim))
        dev = float(jnp.abs(ell(v) - direct(v)).max())
        assert dev < 1e-12, (sec.qn, dev)
        tested += 1
    assert tested > 3


@pytest.mark.parametrize("mode,kw", [
    ("superc", dict(uloc=[-1.2, -1.2], ust=-0.5, deltasc=0.05, nspin=1)),
    ("nonsu2", dict(uloc=[1.2, 1.2], ust=0.5, nspin=2,
                    spin_field_x=[0.05, 0.02])),
])
def test_solve_direct_vs_stored(mode, kw):
    base = dict(norb=2, nbath=1, ed_mode=mode, jh=0.1, jx=0.1, jp=0.1,
                beta=100.0, lmats=8, lanc_dim_threshold=16, **kw)
    cfg_s = default_config(**base, ed_sparse_h=True)
    cfg_d = default_config(**base, ed_sparse_h=False)
    um = build_umatrix(cfg_s)
    bath = init_bath(cfg_s)
    ns = cfg_s.nspin
    hloc = np.zeros((ns, ns, 2, 2))
    for s in range(ns):
        hloc[s, s] = np.diag([0.2, -0.2])
    r1 = solve_impurity(cfg_s, hloc, um, bath)
    r2 = solve_impurity(cfg_d, hloc, um, bath)
    assert abs(r1.e0 - r2.e0) < 1e-9
    np.testing.assert_allclose(r1.dens, r2.dens, atol=1e-8)
    z = 1j * (2 * np.arange(8) + 1) * np.pi / cfg_s.beta
    np.testing.assert_allclose(r1.get_gimp(z), r2.get_gimp(z), atol=1e-7)
