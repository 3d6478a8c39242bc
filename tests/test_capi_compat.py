"""Drop-in reference C-ABI layer: drivers written against the reference's
symbol names/signatures (src/c_bindings/edipack_cbindings.h) link against
libedipack_tpu_c.so unchanged and reproduce the Python-side results."""
import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CAPI = os.path.join(REPO, "edipack_tpu", "capi")

# single-site flow: live globals -> init -> solve -> statics + Sigma + fit
DRIVER_SITE = r"""
#include <stdio.h>
#include <string.h>
#include "edipack_tpu.h"
#include "edipack_compat.h"
int main(void) {
  edtpu_init();
  edtpu_set_option_i("ed_verbose", 0);
  edtpu_set_option_i("lanc_nstates_sector", 2);
  /* reference drivers write the bind(c) module globals directly */
  Norb = 1; Nbath = 2; Nspin = 1; beta = 50.0; Lmats = 64; Lfit = 64;
  Uloc[0] = 2.0; xmu = 1.0;
  int nb = get_bath_dimension_direct();
  printf("NB %d\n", nb);
  double bath[64];
  int64_t db[1] = {nb};
  init_solver_site(bath, db);
  edc hloc[1]; memset(hloc, 0, sizeof(hloc));
  int64_t dh[2] = {1, 1};
  ed_set_Hloc_single_N2(hloc, hloc, dh);
  solve_site(bath, db, 1, 0);
  double dens[1], docc[1], eimp[4];
  ed_get_dens_n1(dens);
  ed_get_docc_n1(docc);
  ed_get_eimp_n1(eimp);
  printf("DENS %.12f\n", dens[0]);
  printf("DOCC %.12f\n", docc[0]);
  printf("EPOT %.12f\n", eimp[1]);
  /* Matsubara self-energy on the default grid (zflag=0) */
  edc sig[64];
  get_sigma_site_n5(sig, 0, 0, NULL, 64, 0);
  double s0re, s0im;
  memcpy(&s0re, &sig[0], 8);
  memcpy(&s0im, ((char*)&sig[0]) + 8, 8);
  printf("SIG0 %.10f %.10f\n", s0re, s0im);
  /* delta builder on a custom grid */
  edc w[8], dl[8];
  for (int i = 0; i < 8; ++i) {
    double wn = (2 * i + 1) * 3.14159265358979323846 / beta;
    memset(&w[i], 0, 16);
    memcpy(((char*)&w[i]) + 8, &wn, 8);
  }
  int64_t dw[1] = {8}, dd[3] = {1, 1, 8};
  get_delta_n3(w, dw, bath, nb, dl, dd, (char*)"m", (char*)"n");
  double d0im;
  memcpy(&d0im, ((char*)&dl[0]) + 8, 8);
  printf("DELTA0IM %.10f\n", d0im);
  /* chi2 fit roundtrip on the solved G0 target keeps bath finite */
  edc g[64];
  get_gimp_site_n5(g, 0, 0, NULL, 64, 0);
  int64_t dg[5] = {1, 1, 1, 1, 64};
  chi2_fitgf_single_normal_n5(g, dg, bath, db, 1, 0, 0);
  double bsum = 0;
  for (int i = 0; i < nb; ++i) bsum += bath[i] * bath[i];
  printf("FITB %.6f\n", bsum);
  /* globals round-trip: xmu pushed from C must be visible in config */
  printf("XMU %.6f\n", xmu);
  finalize_solver(0);
  return 0;
}
"""

# lattice (ineq) flow: per-site Hloc rank-3, solve, batched getters
DRIVER_INEQ = r"""
#include <stdio.h>
#include <string.h>
#include "edipack_tpu.h"
#include "edipack_compat.h"
int main(void) {
  edtpu_init();
  edtpu_set_option_i("ed_verbose", 0);
  Norb = 1; Nbath = 2; Nspin = 1; beta = 25.0; Lmats = 32;
  Uloc[0] = 1.5; xmu = 0.75;
  int nb = get_bath_dimension_direct();
  int nlat = 2;
  edc hloc[2];
  memset(hloc, 0, sizeof(hloc));
  double e0 = -0.1, e1 = 0.1;
  memcpy(&hloc[0], &e0, 8);
  memcpy(&hloc[1], &e1, 8);
  int64_t dh[3] = {2, 1, 1};
  ed_set_Hloc_lattice_N3(hloc, hloc, dh, nlat);
  double bath[128];
  int64_t db[2] = {2, 0};
  db[1] = nb;
  init_solver_ineq(bath, db);
  solve_ineq(bath, db, 1, 0);
  double dens[2], docc[2];
  ed_get_dens_n2(dens, nlat);
  ed_get_docc_n2(docc, nlat);
  printf("DENS %.10f %.10f\n", dens[0], dens[1]);
  printf("DOCC %.10f %.10f\n", docc[0], docc[1]);
  edc gl[2 * 32];
  get_gimp_lattice_n6(gl, nlat, 0, 0, NULL, 32, 0);
  double g0im, g1im;
  memcpy(&g0im, ((char*)&gl[0]) + 8, 8);     /* site 1, first freq (F-order) */
  memcpy(&g1im, ((char*)&gl[1]) + 8, 8);     /* site 2, first freq */
  printf("GIM %.8f %.8f\n", g0im, g1im);
  finalize_solver(2);
  return 0;
}
"""


def _build_and_run(tmp_path, code, name):
    r = subprocess.run(["make", "-C", CAPI, "-s"], capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"capi build failed: {r.stderr.decode()[:200]}")
    src = tmp_path / f"{name}.c"
    src.write_text(code)
    exe = tmp_path / name
    r = subprocess.run(
        ["gcc", "-O2", "-I", CAPI, "-o", str(exe), str(src),
         "-L", CAPI, "-ledipack_tpu_c", f"-Wl,-rpath,{CAPI}"],
        capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[:500]
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    out = subprocess.run([str(exe)], capture_output=True, env=env,
                         timeout=600, cwd=str(tmp_path))
    return out.stdout.decode(), out.stderr.decode()


@pytest.mark.skipif(not os.path.exists(os.path.join(CAPI, "edipack_compat.h")),
                    reason="compat header missing")
def test_reference_abi_single_site(tmp_path):
    text, err = _build_and_run(tmp_path, DRIVER_SITE, "site")
    assert "DENS" in text, text + err[-400:]
    vals = {ln.split()[0]: [float(x) for x in ln.split()[1:]]
            for ln in text.strip().splitlines()}

    # python-side reference solve with identical parameters
    from edipack_tpu.config import default_config
    from edipack_tpu.umatrix import build_umatrix
    from edipack_tpu.bath.dmft_bath import bath_to_array, init_bath
    from edipack_tpu.solver.core import solve_impurity
    cfg = default_config(norb=1, nbath=2, nspin=1, beta=50.0, uloc=[2.0],
                         xmu=1.0, lmats=64, ed_verbose=0,
                         lanc_nstates_sector=2)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    res = solve_impurity(cfg, np.zeros((1, 1, 1, 1)), um, bath)

    assert vals["NB"][0] == len(bath_to_array(bath))
    assert abs(vals["DENS"][0] - float(np.sum(res.dens))) < 1e-7
    assert abs(vals["DOCC"][0] - float(res.docc[0])) < 1e-7
    wn = (2 * np.arange(64) + 1) * np.pi / 50.0
    sig = np.asarray(res.get_sigma(1j * wn))
    assert abs(vals["SIG0"][0] - sig[0, 0, 0, 0, 0].real) < 1e-6
    assert abs(vals["SIG0"][1] - sig[0, 0, 0, 0, 0].imag) < 1e-6
    assert vals["DELTA0IM"][0] != 0.0
    assert np.isfinite(vals["FITB"][0]) and vals["FITB"][0] > 0
    assert abs(vals["XMU"][0] - 1.0) < 1e-12


@pytest.mark.skipif(not os.path.exists(os.path.join(CAPI, "edipack_compat.h")),
                    reason="compat header missing")
def test_reference_abi_lattice(tmp_path):
    text, err = _build_and_run(tmp_path, DRIVER_INEQ, "ineq")
    assert "DENS" in text, text + err[-400:]
    vals = {ln.split()[0]: [float(x) for x in ln.split()[1:]]
            for ln in text.strip().splitlines()}
    d1, d2 = vals["DENS"]
    # staggered Hloc: site 1 (e=-0.1) fills more than site 2 (e=+0.1)
    assert d1 > d2
    assert 0.0 < vals["DOCC"][0] < 1.0
    assert vals["GIM"][0] < 0 and vals["GIM"][1] < 0  # Im G(iw0) < 0
