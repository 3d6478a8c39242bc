"""ed_sanitize debug mode: the runtime self-check analog of the
reference's BUILD_TYPE=DEBUG/TESTING builds (-fcheck=all, -fbacktrace;
reference CMakeLists).  A sanitized solve must pass untouched on a
correct model, and the Hermiticity check must actually catch a broken
operator."""
import numpy as np
import pytest

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.solver.diag import _sanitize_mv, sanitize_enabled
from edipack_tpu.umatrix import build_umatrix


def test_sanitized_solve_passes_normal():
    cfg = default_config(norb=1, nbath=3, nspin=1, uloc=[2.0], xmu=0.3,
                         ed_sanitize=True, lanc_dim_threshold=8)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    res = solve_impurity(cfg, hloc, um, bath)
    assert np.isfinite(res.e0)


def test_sanitized_solve_passes_superc():
    cfg = default_config(norb=1, nbath=2, nspin=1, ed_mode="superc",
                         uloc=[-1.5], deltasc=0.1, ed_sanitize=True,
                         lanc_dim_threshold=8)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    res = solve_impurity(cfg, hloc, um, bath)
    assert np.isfinite(res.e0)


def test_sanitize_catches_broken_operator():
    cfg = default_config(norb=1, nbath=2, nspin=1, uloc=[1.0],
                         ed_sanitize=True)

    class BrokenOp:
        """Deliberately non-Hermitian matvec."""
        dim = 64
        import jax.numpy as jnp
        dtype = jnp.float64
        _m = np.triu(np.random.default_rng(0).normal(size=(64, 64)))

        def __call__(self, v):
            import jax.numpy as jnp
            return jnp.asarray(self._m) @ v

    with pytest.raises(AssertionError, match="Hermiticity"):
        _sanitize_mv(cfg, 0, BrokenOp())


def test_sanitize_env_override(monkeypatch):
    cfg = default_config(norb=1, nbath=2, nspin=1)
    assert not sanitize_enabled(cfg)
    monkeypatch.setenv("EDIPACK_TPU_SANITIZE", "1")
    assert sanitize_enabled(cfg)
    monkeypatch.setenv("EDIPACK_TPU_SANITIZE", "0")
    assert not sanitize_enabled(cfg)
