"""Krylov spread-complexity diagnostics (reference ED_KRYLOV)."""
import numpy as np

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.solver.krylov import krylov_state_complexity
from edipack_tpu.umatrix import build_umatrix


def test_krylov_complexity_basic():
    cfg = default_config(norb=1, nbath=2, nspin=1, uloc=[2.0], xmu=0.1,
                         tmax=5.0, ltimes=50)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    res = solve_impurity(cfg, np.zeros((1, 1, 1, 1)), um, bath)
    kr = krylov_state_complexity(res, ops=["cdg", "c"])
    key = ("cdg", 0, 0)
    assert key in kr.complexity
    k = kr.complexity[key]
    assert k.shape == (50,)
    # K(0) = 0 (seed occupies chain site 0) and grows initially
    assert abs(k[0]) < 1e-10
    assert k[1] > 0
    # entropy starts at 0 and P is a normalized distribution at all times
    assert abs(kr.entropy[key][0]) < 1e-10
    p = kr.distribution[key]
    assert np.allclose(p.sum(0), 1.0, atol=1e-8)
