"""Fused Pallas Kron matvec agrees with the einsum path (interpret mode on
CPU; compiled on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.models.normal import build_normal_sector_op
from edipack_tpu.ops.matvec import KronMatvec
from edipack_tpu.sectors import SectorTable
from edipack_tpu.umatrix import build_umatrix


def test_pallas_kron_matches_einsum():
    from jax.experimental.pallas import tpu as pltpu
    from edipack_tpu.ops.pallas_kron import KronPallasMatvec

    cfg = default_config(norb=2, nbath=2, nspin=1, uloc=[2.0, 1.5], ust=0.7,
                         jh=0.1, jx=0.1, jp=0.1, xmu=0.2)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.array([[0.1, 0.04], [0.04, -0.1]])
    table = SectorTable(cfg)
    sec = table.by_qn(("n", (3,), (2,)))
    op = build_normal_sector_op(cfg, sec, hloc, um, bath)

    ref = KronMatvec(op, dtype=jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(0), (sec.dim,), jnp.float32)
    want = np.asarray(ref(v))

    with pltpu.force_tpu_interpret_mode():
        mv = KronPallasMatvec(op)
        got = np.asarray(mv(v))
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()
