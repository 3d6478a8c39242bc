"""Fused Pallas matvec: metadata builder, kernels (interpret mode on the
CPU suite), mixed-precision wrapper, and end-to-end solver parity against
the XLA Kronecker path."""
import numpy as np
import jax.numpy as jnp
import pytest

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.models.normal import build_normal_sector_op
from edipack_tpu.sectors import SectorTable
from edipack_tpu.umatrix import build_umatrix
from edipack_tpu.ops.fused_normal import build_fused_normal
from edipack_tpu.ops import pallas_fused as pf


def _setup(norb=2, nbath=4, nup=5, ndw=5, **kw):
    cfg = default_config(norb=norb, nbath=nbath, nspin=1,
                         uloc=[2.0, 1.7][:norb], ust=1.2, jh=0.2,
                         jx=0.15, jp=0.12, **kw)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, norb, norb))
    hloc[0, 0] = np.diag([0.1, -0.2][:norb])
    table = SectorTable(cfg)
    sec = table.by_qn(("n", (nup,), (ndw,)))
    op = build_normal_sector_op(cfg, sec, hloc, um, bath)
    return cfg, op


def test_fused_metadata_vs_dense():
    cfg, op = _setup(nbath=3, nup=4, ndw=3)
    f = build_fused_normal(op, cfg.norb)
    assert f is not None
    rng = np.random.default_rng(1)
    v = rng.normal(size=(f.dd, f.du))
    ref = (op.to_dense() @ v.reshape(-1)).reshape(f.dd, f.du)
    out = f.from_internal(f.apply_ref(f.to_internal(v)))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-6


@pytest.mark.slow
def test_fused_kernel_matvec_and_power():
    cfg, op = _setup()                    # (5,5) of ns=10: 252^2, 2 blocks
    f = build_fused_normal(op, cfg.norb)
    rng = np.random.default_rng(3)
    v = rng.normal(size=(f.ddp, f.dup)).astype(np.float32)
    v[f.dd:, :] = 0
    v[:, f.du:] = 0
    ref = f.apply_ref(v.astype(np.float64))
    v3 = jnp.asarray(f.to_blocked(v))

    out = f.from_blocked(np.asarray(pf.FusedMatvec(f, precision="highest")(v3)))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 3e-6

    K = 3
    w3, norms = pf.FusedPower(f, K, precision="highest")(v3)
    vv = v.astype(np.float64)
    for k in range(K):
        wk = f.apply_ref(vv)
        nk = np.linalg.norm(wk)
        assert abs(float(norms[k]) - nk) / nk < 1e-5
        vv = wk / nk
    w = f.from_blocked(np.asarray(w3))
    assert np.abs(w / np.linalg.norm(w) - vv).max() < 1e-5


@pytest.mark.slow
def test_mixed_fused_accuracy():
    cfg, op = _setup()
    f = build_fused_normal(op, cfg.norb)
    mv = pf.MixedFusedKron(f)
    rng = np.random.default_rng(7)
    v = rng.normal(size=(f.ddp, f.dup))
    v[f.dd:, :] = 0
    v[:, f.du:] = 0
    ref = f.apply_ref(v)
    out = f.from_blocked(np.asarray(
        mv(jnp.asarray(f.to_blocked(v).reshape(-1))).reshape(-1, 128)))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 5e-6
    # layout round trip
    vo = jnp.asarray(rng.normal(size=f.dd * f.du))
    vi = mv.to_internal_flat(vo)
    assert np.allclose(np.asarray(mv.from_internal_flat(vi)), np.asarray(vo))


@pytest.mark.slow
def test_solve_fused_vs_xla():
    """End-to-end solve parity: fused (forced, mixed-ds) vs plain f64 XLA."""
    from edipack_tpu.solver.core import solve_impurity

    norb, nbath = 2, 4
    base = default_config(norb=norb, nbath=nbath, nspin=1,
                          uloc=[2.0, 2.0], ust=1.0, jh=0.15, jx=0.15,
                          jp=0.15, lanc_dim_threshold=512,
                          lanc_nstates_sector=1)
    um = build_umatrix(base)
    bath = init_bath(base)
    hloc = np.zeros((1, 1, norb, norb))

    ref = solve_impurity(base.replace(ed_fused_matvec="never"),
                         hloc, um, bath)
    # exact-f64 GF moments on top of the fused-diag eigenstates: tight
    fus = solve_impurity(base.replace(ed_fused_matvec="always",
                                      ed_mixed_matvec="always",
                                      ed_mixed_gf=False),
                         hloc, um, bath)
    assert abs(fus.e0 - ref.e0) < 1e-7 * max(1.0, abs(ref.e0))
    np.testing.assert_allclose(fus.dens, ref.dens, atol=1e-6)
    np.testing.assert_allclose(fus.docc, ref.docc, atol=1e-6)
    z = 1j * np.pi / base.beta * (2 * np.arange(8) + 1)
    g1 = ref.get_gimp(z)
    g2 = fus.get_gimp(z)
    np.testing.assert_allclose(g2, g1, atol=2e-5)
    # mixed-GF moments through the fused kernel: the ~3e-7 matvec noise
    # shifts poles by ~1e-6*||H||, visible only at the lowest T=0 Matsubara
    # frequencies (the reference asserts Sigma moments, not pointwise G,
    # for the same reason — ed_normal_normal.f90:111-115)
    fusg = solve_impurity(base.replace(ed_fused_matvec="always",
                                       ed_mixed_matvec="always"),
                          hloc, um, bath)
    np.testing.assert_allclose(fusg.get_gimp(z), g1, atol=5e-3)
