"""File outputs and restart-file contracts."""
import os

import numpy as np
import pytest

import edipack_tpu as ed
from edipack_tpu.config import default_config, set_config
from edipack_tpu import io as edio
from edipack_tpu.sectors import SectorTable


def test_outputs_and_restarts(tmp_path):
    cfg = default_config(norb=1, nbath=2, nspin=1, uloc=[2.0], xmu=0.1,
                         ed_write_files=True, ed_output_dir=str(tmp_path))
    set_config(cfg)
    bath = ed.ed_init_solver(cfg=cfg)
    ed.ed_set_hloc(np.zeros((1, 1, 1, 1)))
    res = ed.ed_solve(bath)
    for name in ("observables_last.ed", "observables_info.ed", "energy_last.ed",
                 "eigenvalues_list.ed", "state_list.ed"):
        assert (tmp_path / name).exists(), name
    assert (tmp_path / "state_list.restart").exists()
    assert (tmp_path / "sectors.restart").exists()

    vals = np.loadtxt(tmp_path / "observables_last.ed")
    assert abs(vals[0] - res.dens[0]) < 1e-10

    # state_list restart seeds neigen
    table = SectorTable(cfg)
    neigen = edio.read_state_list_restart(cfg, table)
    assert neigen is not None
    counts_max = neigen.max()
    assert counts_max >= 1

    # sector restart restricts the sweep and still finds the same GS
    cfg2 = cfg.replace(ed_sectors=True)
    set_config(cfg2)
    bath2 = ed.ed_init_solver(cfg=cfg2)
    ed.ed_set_hloc(np.zeros((1, 1, 1, 1)))
    res2 = ed.ed_solve(bath2)
    assert abs(res2.e0 - res.e0) < 1e-10
    # restricted sweep visited fewer sectors
    assert len(res2.diag.evals_by_sector) < len(res.diag.evals_by_sector)
    ed.ed_finalize_solver()


def test_bath_restart_roundtrip(tmp_path):
    from edipack_tpu.bath.dmft_bath import (bath_to_array, init_bath,
                                            read_bath_file, save_bath_file)
    cfg = default_config(norb=2, nbath=3, nspin=2)
    b = init_bath(cfg)
    b.e[1, 0] += 0.3
    path = str(tmp_path / "hamiltonian.restart")
    save_bath_file(b, path)
    b2 = init_bath(cfg)
    read_bath_file(b2, path)
    assert np.allclose(bath_to_array(b), bath_to_array(b2))


def test_gfmatrix_roundtrip(tmp_path):
    """GFmatrix persistence: re-evaluate dynamical functions without
    re-solving (reference write/read_GFmatrix)."""
    from edipack_tpu.solver.greens import GFMatrix
    gf = GFMatrix()
    gf.add(("g", 0, 0, 0), np.array([0.5, 0.25 + 0.1j]), np.array([1.0, -2.0]))
    gf.add(("ph",), np.array([0.3]), np.array([0.7]))
    path = str(tmp_path / "gfmatrix.npz")
    gf.save(path)
    gf2 = GFMatrix.load(path)
    z = 1j * np.linspace(0.1, 3, 7)
    assert np.allclose(gf.eval(("g", 0, 0, 0), z), gf2.eval(("g", 0, 0, 0), z))
    assert np.allclose(gf.eval(("ph",), z), gf2.eval(("ph",), z))


def test_xmu_restart(tmp_path):
    cfg = default_config(ed_output_dir=str(tmp_path))
    edio.write_xmu_restart(cfg, 0.37, 0.05)
    xmu, nd = edio.read_xmu_restart(cfg)
    assert xmu == pytest.approx(0.37)
    assert nd == pytest.approx(0.05)


def test_gf_text_outputs(tmp_path):
    """ed_print_* text writers: impG/impG0/impSigma files in the reference
    [w, Im, Re] format + G(tau) on the ltau grid + chi _iv files."""
    import os
    import edipack_tpu as ed
    from edipack_tpu.config import default_config

    cfg = default_config(norb=1, nbath=2, nspin=1, uloc=[2.0], beta=20.0,
                         lmats=16, lreal=21, ltau=11, chispin_flag=True,
                         ed_write_files=True, ed_output_dir=str(tmp_path))
    bath = ed.ed_init_solver(cfg=cfg)
    ed.ed_set_hloc(np.zeros((1, 1, 1, 1)))
    ed.ed_solve(bath)
    try:
        for name in ("impG_l11_s1_iw", "impG_l11_s1_realw", "impG0_l11_s1_iw",
                     "impSigma_l11_s1_iw", "impG_l11_s1_tau",
                     "spinChi_l11_iv"):
            path = tmp_path / (name + ".ed")
            assert path.exists(), name
            rows = np.loadtxt(path)
            assert np.all(np.isfinite(rows))
        g_iw = np.loadtxt(tmp_path / "impG_l11_s1_iw.ed")
        assert g_iw.shape[0] == cfg.lmats and g_iw.shape[1] == 3
        # G(tau=0+) + G(tau=beta-) = -<{c,c+}> = -1 (sum rule)
        gt = np.loadtxt(tmp_path / "impG_l11_s1_tau.ed")
        assert abs(gt[0, 1] + gt[-1, 1] + 1.0) < 1e-6
    finally:
        ed.ed_finalize_solver()


def test_check_convergence_helper():
    import edipack_tpu as ed
    from edipack_tpu.config import default_config, set_config
    set_config(default_config(dmft_error=1e-3, nsuccess=2))
    ed.ed_reset_convergence()
    f = np.ones(8)
    err, conv = ed.ed_check_convergence(f)
    assert not conv
    err, conv = ed.ed_check_convergence(f * (1 + 1e-5))
    assert err < 1e-3 and not conv      # first success
    err, conv = ed.ed_check_convergence(f * (1 + 2e-5))
    assert conv                          # nsuccess=2 reached
    ed.ed_reset_convergence()


def test_finite_t_annealing_across_solves():
    """Successive ed_solve calls adapt neigen_sector / lanc_nstates_total
    (reference ed_post_diag feedback, ED_DIAG_NORMAL.f90:475-517)."""
    import edipack_tpu as ed
    from edipack_tpu.config import default_config

    cfg = default_config(norb=1, nbath=3, nspin=1, uloc=[1.5], beta=3.0,
                         ed_finite_temp=True, lanc_nstates_total=4,
                         lanc_nstates_sector=2, lanc_nstates_step=2,
                         cutoff=1e-5, lmats=8)
    bath = ed.ed_init_solver(cfg=cfg)
    ed.ed_set_hloc(np.zeros((1, 1, 1, 1)))
    try:
        r1 = ed.ed_solve(bath, flag_gf=False)
        n1 = len(r1.diag.state_list)
        total1 = r1.diag.lanc_nstates_total
        assert total1 != 0
        assert r1.diag.sector_histogram is not None
        assert r1.diag.sector_histogram.sum() == n1
        # second solve must consume the annealed budget automatically
        r2 = ed.ed_solve(bath, flag_gf=False)
        assert r2.cfg.lanc_nstates_total == total1
        # at beta=3 with a small cutoff the budget grows until the Boltzmann
        # tail is below cutoff; retained count must not shrink
        assert len(r2.diag.state_list) >= n1
    finally:
        ed.ed_finalize_solver()
