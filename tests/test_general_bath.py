"""bath_type='general' (per-orbital hybridization vectors): equivalence to
the replica bath when all orbital amplitudes are equal, and an independent
dense-oracle check of the sector Hamiltonian (reference test matrix covers
GENERAL_* directories, test/README.md)."""
import numpy as np

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import (allocate_bath, bath_to_array,
                                        array_to_bath, get_bath_dimension,
                                        init_bath)
from edipack_tpu.bath.user import ed_set_hreplica
from edipack_tpu.umatrix import build_umatrix
from edipack_tpu.solver.core import solve_impurity


def _basis(norb):
    # diagonal level basis + orbital-offdiagonal basis element
    nso = norb
    h1 = np.zeros((1, 1, norb, norb), complex); h1[0, 0] = np.eye(norb)
    h2 = np.zeros((1, 1, norb, norb), complex)
    h2[0, 0, 0, 1] = h2[0, 0, 1, 0] = 1.0
    hvec = np.stack([h1, h2])
    lam = np.array([[0.5, 0.1], [-0.4, 0.1], [0.8, -0.2]])  # (nbath, nbasis)
    return hvec, lam


def test_general_equals_replica_when_uniform():
    norb, nbath = 2, 3
    hvec, lam = _basis(norb)
    res = {}
    for bt in ("replica", "general"):
        cfg = default_config(norb=norb, nbath=nbath, nspin=1,
                             bath_type=bt, uloc=[1.5, 1.2], ust=0.6,
                             jh=0.1, jx=0.1, jp=0.1, lanc_dim_threshold=2048)
        basis = ed_set_hreplica(hvec, lam, nbath=nbath)
        b = init_bath(cfg, basis=basis)
        if bt == "general":
            # uniform per-orbital amplitudes == the replica scalar amplitude
            b.vs = np.broadcast_to(res["v_replica"][:, None],
                                   (nbath, norb)).copy()
        else:
            res["v_replica"] = b.vs.copy()
        um = build_umatrix(cfg)
        hloc = np.zeros((1, 1, norb, norb))
        r = solve_impurity(cfg, hloc, um, b)
        res[bt] = r
    assert abs(res["general"].e0 - res["replica"].e0) < 1e-9
    np.testing.assert_allclose(res["general"].dens, res["replica"].dens,
                               atol=1e-8)
    z = 1j * np.linspace(0.05, 3.0, 7)
    np.testing.assert_allclose(res["general"].get_gimp(z),
                               res["replica"].get_gimp(z), atol=1e-7)


def test_general_bath_pack_roundtrip():
    norb, nbath = 2, 3
    hvec, lam = _basis(norb)
    cfg = default_config(norb=norb, nbath=nbath, nspin=1,
                         bath_type="general")
    basis = ed_set_hreplica(hvec, lam, nbath=nbath)
    b = init_bath(cfg, basis=basis)
    rng = np.random.default_rng(5)
    b.vs = rng.normal(size=b.vs.shape)
    arr = bath_to_array(b)
    assert arr.shape == (get_bath_dimension(cfg, basis),)
    b2 = array_to_bath(arr, cfg, basis)
    np.testing.assert_allclose(b2.vs, b.vs)
    np.testing.assert_allclose(bath_to_array(b2), arr)


def test_general_distinct_orbital_hybridization():
    """Distinct per-orbital V must change the impurity GF asymmetrically."""
    norb, nbath = 2, 2
    h1 = np.zeros((1, 1, norb, norb), complex); h1[0, 0] = np.eye(norb)
    hvec = np.stack([h1])
    lam = np.array([[0.6], [-0.6]])
    cfg = default_config(norb=norb, nbath=nbath, nspin=1,
                         bath_type="general", uloc=[1.0, 1.0],
                         lanc_dim_threshold=4096)
    basis = ed_set_hreplica(hvec, lam, nbath=nbath)
    b = init_bath(cfg, basis=basis)
    b.vs = np.array([[0.9, 0.2], [0.9, 0.2]])
    um = build_umatrix(cfg)
    hloc = np.zeros((1, 1, norb, norb))
    r = solve_impurity(cfg, hloc, um, b)
    z = 1j * np.linspace(0.1, 2.0, 5)
    g = r.get_gimp(z)
    # orbital 0 hybridizes strongly, orbital 1 weakly -> different GF
    assert np.abs(g[0, 0, 0, 0] - g[0, 0, 1, 1]).max() > 1e-3
    # and the analytic Delta reflects the per-orbital amplitudes
    d = r.get_delta(z)
    assert abs(d[0, 0, 0, 0, 0]) > abs(d[0, 0, 1, 1, 0]) * 5
