"""Native C++ kernels agree with the NumPy implementations."""
import numpy as np
import pytest

from edipack_tpu import native
from edipack_tpu import fock

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_enum_states_matches_numpy():
    for ns, n in [(5, 2), (12, 6), (20, 10), (24, 3)]:
        nat = native.enum_states(ns, n)
        allst = np.arange(1 << min(ns, 20), dtype=np.int64)
        if ns <= 20:
            ref = allst[fock.popcount(allst) == n]
            assert np.array_equal(nat, ref), (ns, n)
        assert len(nat) == fock.binom(ns, n)
        assert np.all(np.diff(nat) > 0)
        assert np.all(fock.popcount(nat) == n)


def test_hop_elements_matches_numpy():
    basis = fock.enumerate_states(8, 4)
    for (i, j) in [(0, 3), (5, 1), (2, 2), (7, 0)]:
        nat = native.hop_elements(basis, i, j)
        ref = fock.hop_elements(basis, 8, i, j)
        hn = np.zeros((len(basis),) * 2)
        hr = np.zeros_like(hn)
        hn[nat[0], nat[1]] = nat[2]
        hr[ref[0], ref[1]] = ref[2]
        assert np.allclose(hn, hr), (i, j)


def test_apply_opstring_matches_numpy():
    basis = fock.enumerate_states(10, 5)
    ops = [("c", 2), ("cdg", 7), ("c", 0), ("cdg", 1)]
    nat = native.apply_opstring(basis, ops)
    st, sg, ok = basis.copy(), np.ones(len(basis)), np.ones(len(basis), bool)
    for kind, lvl in ops:
        fn = fock.apply_c if kind == "c" else fock.apply_cdg
        st, s, v = fn(st, lvl)
        sg = sg * s
        ok &= v
    assert np.array_equal(nat[2], ok)
    assert np.allclose(nat[1][ok], sg[ok])
    assert np.array_equal(nat[0][ok], st[ok])
