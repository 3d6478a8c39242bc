import numpy as np
import pytest

from edipack_tpu.fock import (apply_c, apply_cdg, binom, enumerate_states,
                              hop_elements, occupations, parity_sign, popcount,
                              state_index)


def test_enumerate_states_counts_and_order():
    for ns in (1, 3, 6, 9):
        for n in range(ns + 1):
            st = enumerate_states(ns, n)
            assert len(st) == binom(ns, n)
            assert np.all(np.diff(st) > 0)
            assert np.all(popcount(st) == n)


def test_enumerate_states_wide():
    st = enumerate_states(22, 3)
    assert len(st) == binom(22, 3)
    st_sorted = np.sort(st)
    assert np.all(popcount(st_sorted) == 3)
    assert len(np.unique(st_sorted)) == len(st)


def test_parity_sign():
    # |0b1011>: levels 0,1,3 occupied
    s = np.array([0b1011])
    assert parity_sign(s, 0)[0] == 1.0
    assert parity_sign(s, 1)[0] == -1.0   # one occupied below
    assert parity_sign(s, 2)[0] == 1.0    # two below
    assert parity_sign(s, 3)[0] == 1.0
    assert parity_sign(s, 4)[0] == -1.0   # three below


def test_apply_c_cdg_roundtrip():
    ns = 5
    st = enumerate_states(ns, 2)
    for pos in range(ns):
        s1, sg1, v1 = apply_c(st, pos)
        s2, sg2, v2 = apply_cdg(s1, pos)
        # where valid, cdg c = n -> back to original state, sign^2 = 1
        assert np.all(s2[v1] == st[v1])
        assert np.allclose((sg1 * sg2)[v1], 1.0)


def test_hop_elements_vs_scalar():
    rng = np.random.default_rng(0)
    ns, n = 6, 3
    basis = enumerate_states(ns, n)
    for (i, j) in [(0, 1), (2, 5), (4, 0), (3, 3)]:
        rows, cols, signs = hop_elements(basis, ns, i, j)
        h = np.zeros((len(basis), len(basis)))
        h[rows, cols] = signs
        # scalar reference
        href = np.zeros_like(h)
        for col, m in enumerate(basis):
            if not (m >> j) & 1:
                continue
            sgn = 1.0
            for l in range(j):
                if (m >> l) & 1:
                    sgn = -sgn
            m1 = m & ~(1 << j)
            if (m1 >> i) & 1 and i != j:
                continue
            if i != j:
                for l in range(i):
                    if (m1 >> l) & 1:
                        sgn = -sgn
                m2 = m1 | (1 << i)
            else:
                m2 = m
            row = int(np.searchsorted(basis, m2))
            href[row, col] = sgn if i != j else 1.0
        assert np.allclose(h, href), (i, j)


def test_hop_hermiticity():
    ns, n = 7, 4
    basis = enumerate_states(ns, n)
    r1, c1, s1 = hop_elements(basis, ns, 2, 5)
    r2, c2, s2 = hop_elements(basis, ns, 5, 2)
    h1 = np.zeros((len(basis),) * 2)
    h2 = np.zeros_like(h1)
    h1[r1, c1] = s1
    h2[r2, c2] = s2
    assert np.allclose(h1, h2.T)


def test_state_index():
    basis = enumerate_states(8, 4)
    idx = state_index(basis, basis[::-1])
    assert np.all(idx == np.arange(len(basis))[::-1])
    missing = state_index(basis, np.array([0b1]))  # popcount 1 not in basis
    assert missing[0] == -1


def test_occupations():
    basis = enumerate_states(5, 2)
    occ = occupations(basis, 5)
    assert occ.shape == (len(basis), 5)
    assert np.all(occ.sum(1) == 2)
