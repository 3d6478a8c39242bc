"""Module-level `ed_*` API exercised like the reference test program
(test/src/NORMAL_NORMAL/ed_normal_normal.f90): solve a 2-orbital impurity
under the Kanamori / runtime-umatrix / file-umatrix option sweep and assert
identical physics across the equivalent code paths, plus density-matrix
invariants (:213-248)."""
import os

import numpy as np
import pytest

import edipack_tpu as ed
from edipack_tpu.config import default_config, set_config


DELTA = 0.5


def _setup_cfg(tmpdir, **kw):
    base = dict(norb=2, nbath=2, nspin=1, uloc=[2.0, 2.0], ust=2.0, jh=0.125,
                jx=0.125, jp=0.125, beta=1000.0, lmats=64, xmu=0.0,
                lanc_nstates_sector=2)
    base.update(kw)
    cfg = default_config(**base)
    set_config(cfg)
    return cfg


def _hloc(nspin=1, norb=2):
    h = np.zeros((nspin, nspin, norb, norb))
    for s in range(nspin):
        h[s, s] = DELTA * np.diag([1.0, -1.0])
    return h


def _run(cfg, umatrix_terms=None):
    bath = ed.ed_init_solver(cfg=cfg)
    ed.ed_set_hloc(_hloc())
    if umatrix_terms:
        for t in umatrix_terms:
            ed.ed_add_twobody_operator(*t)
    ed.ed_solve(bath)
    out = dict(
        dens=ed.ed_get_dens().copy(),
        docc=ed.ed_get_docc().copy(),
        energy=ed.ed_get_eimp().copy(),
        doubles=ed.ed_get_doubles().copy(),
        evals=ed.ed_get_evals().copy(),
        sigma=ed.ed_get_sigma(1j * (2 * np.arange(32) + 1) * np.pi / cfg.beta),
        denmat=ed.ed_get_sp_dm().copy(),
    )
    ed.ed_finalize_solver()
    return out


KANAMORI_AS_TERMS = [
    (1, "u", 1, "d", 1, "u", 1, "d", 2.0), (1, "d", 1, "u", 1, "d", 1, "u", 2.0),
    (2, "u", 2, "d", 2, "u", 2, "d", 2.0), (2, "d", 2, "u", 2, "d", 2, "u", 2.0),
    (1, "d", 2, "u", 1, "d", 2, "u", 2.0), (1, "u", 2, "d", 1, "u", 2, "d", 2.0),
    (2, "d", 1, "u", 2, "d", 1, "u", 2.0), (2, "u", 1, "d", 2, "u", 1, "d", 2.0),
    (1, "u", 2, "u", 1, "u", 2, "u", 2.0), (1, "d", 2, "d", 1, "d", 2, "d", 2.0),
    (2, "u", 1, "u", 2, "u", 1, "u", 2.0), (2, "d", 1, "d", 2, "d", 1, "d", 2.0),
    (1, "u", 2, "u", 2, "u", 1, "u", 0.125), (1, "d", 2, "d", 2, "d", 1, "d", 0.125),
    (2, "u", 1, "u", 1, "u", 2, "u", 0.125), (2, "d", 1, "d", 1, "d", 2, "d", 0.125),
    (1, "d", 2, "u", 2, "d", 1, "u", 0.125), (1, "u", 2, "d", 2, "u", 1, "d", 0.125),
    (2, "d", 1, "u", 1, "d", 2, "u", 0.125), (2, "u", 1, "d", 1, "u", 2, "d", 0.125),
    (1, "d", 1, "u", 2, "d", 2, "u", 0.125), (1, "u", 1, "d", 2, "u", 2, "d", 0.125),
    (2, "d", 2, "u", 1, "d", 1, "u", 0.125), (2, "u", 2, "d", 1, "u", 1, "d", 0.125),
]


def test_kanamori_vs_runtime_umatrix(tmp_path):
    os.chdir(tmp_path)
    cfg_k = _setup_cfg(tmp_path)
    res_k = _run(cfg_k)

    cfg_u = _setup_cfg(tmp_path, ed_use_kanamori=False)
    res_u = _run(cfg_u, umatrix_terms=KANAMORI_AS_TERMS)

    assert np.allclose(res_k["dens"], res_u["dens"], atol=1e-8)
    assert np.allclose(res_k["docc"], res_u["docc"], atol=1e-8)
    assert np.allclose(res_k["energy"], res_u["energy"], atol=1e-8)
    assert np.allclose(res_k["doubles"], res_u["doubles"], atol=1e-8)
    assert np.allclose(res_k["evals"], res_u["evals"], atol=1e-8)
    assert np.allclose(res_k["sigma"], res_u["sigma"], atol=1e-7)


def test_kanamori_vs_file_umatrix(tmp_path):
    os.chdir(tmp_path)
    cfg_k = _setup_cfg(tmp_path)
    res_k = _run(cfg_k)
    # write the interaction out, read it back through the file path
    from edipack_tpu.umatrix import build_umatrix, save_umatrix_file
    um = build_umatrix(cfg_k)
    save_umatrix_file(um, str(tmp_path / "umatrix.restart"))
    cfg_f = _setup_cfg(tmp_path, ed_use_kanamori=False, ed_read_umatrix=True,
                       umatrix_file=str(tmp_path / "umatrix"))
    res_f = _run(cfg_f)
    assert np.allclose(res_k["dens"], res_f["dens"], atol=1e-8)
    assert np.allclose(res_k["evals"], res_f["evals"], atol=1e-8)
    assert np.allclose(res_k["sigma"], res_f["sigma"], atol=1e-7)


def test_denmat_invariants(tmp_path):
    """reference test_denmat_checks: hermiticity, real diagonal, n_i
    consistency (ed_normal_normal.f90:213-248)."""
    os.chdir(tmp_path)
    cfg = _setup_cfg(tmp_path)
    res = _run(cfg)
    dm = res["denmat"][0]   # (Ns, Ns) up component
    assert np.allclose(dm, dm.conj().T, atol=1e-9)
    assert np.max(np.abs(np.imag(np.diag(dm)))) < 1e-10
    # diagonal of the impurity block == dens_up (= dens/2, spin symmetric)
    assert np.allclose(np.real(np.diag(dm))[:2] * 2, res["dens"], atol=1e-7)


def test_bath_dimension_and_symmetrize(tmp_path):
    os.chdir(tmp_path)
    cfg = _setup_cfg(tmp_path, nspin=2)
    nb = ed.ed_get_bath_dimension(cfg)
    assert nb == 2 * 2 * 2 * 2  # 2 (e,v) * nspin * norb * nbath
    bath = ed.ed_init_solver(cfg=cfg)
    assert bath.size == nb
    b2 = ed.ed_spin_symmetrize_bath(bath, cfg=cfg)
    from edipack_tpu.bath.dmft_bath import array_to_bath
    bb = array_to_bath(b2, cfg)
    assert np.allclose(bb.e[0], bb.e[1])
    assert np.allclose(bb.v[0], bb.v[1])
    b3 = ed.ed_break_symmetry_bath(b2, 0.1, 1.0, cfg=cfg)
    bb3 = array_to_bath(b3, cfg)
    assert np.allclose(bb3.e[0], bb.e[0] + 0.1)
    ed.ed_finalize_solver()


def test_replica_basis_mutators_and_bath_read(tmp_path, monkeypatch):
    """ed_set_linit/hsym_Hreplica + ed_read_dmft_bath parity (reference
    ED_BATH_REPLICA.f90:448-478, ED_BATH_DMFT read_dmft_bath)."""
    import numpy as np
    import edipack_tpu as E
    from edipack_tpu.config import default_config, set_config
    monkeypatch.chdir(tmp_path)

    cfg = default_config(norb=1, nbath=2, bath_type="replica", nspin=1)
    set_config(cfg)
    ops = np.zeros((2, 1, 1, 1, 1), complex)
    ops[0] = 1.0
    ops[1] = 0.5
    E.ed_set_hreplica(ops, np.array([[0.3, 1.0], [-0.3, 1.0]]))
    E.ed_set_linit_hreplica(np.array([[0.5, 0.9], [-0.5, 0.9]]))
    E.ed_set_hsym_hreplica(2, 0.7 * np.ones((1, 1, 1, 1)))
    b = E.bath.get_global_basis()
    assert b.linit[0, 0] == 0.5 and b.ops[1].ravel()[0] == 0.7
    import pytest
    with pytest.raises(ValueError):
        E.ed_set_linit_hreplica(np.zeros((3, 2)))

    cfg2 = default_config(norb=1, nbath=2, nspin=1)
    set_config(cfg2)
    E.bath.user.clear_global_basis()
    arr = E.ed_init_solver(cfg=cfg2)
    E.ed_save_array_as_bath(arr)
    back = E.ed_read_dmft_bath()
    np.testing.assert_allclose(np.asarray(back), np.asarray(arr))


def test_complex_hloc_accepted_in_normal_mode(tmp_path):
    """Complex Hloc in normal mode is ACCEPTED and routed through the
    nonsu2 fallback at solve time (reference _CMPLX_NORMAL capability;
    full physics equivalence pinned in tests/test_cplx_normal.py);
    replica/general baths cannot be promoted and must raise."""
    os.chdir(tmp_path)
    cfg = default_config(norb=2, nbath=2, nspin=1, ed_verbose=0)
    set_config(cfg)
    ed.main.ed_init_solver(cfg=cfg)
    h = np.zeros((1, 1, 2, 2), complex)
    h[0, 0, 0, 1] = 0.1 + 0.05j
    h[0, 0, 1, 0] = 0.1 - 0.05j
    ed.main.ed_set_hloc(h)                        # accepted (fallback)
    ed.main.ed_set_hloc(h.real.astype(complex))   # real-valued: fine
    ed.main.ed_finalize_solver()
