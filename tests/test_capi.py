"""The C ABI (embedded-Python bindings) drives the solver end-to-end and
reproduces the Python-side observables."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CAPI = os.path.join(REPO, "edipack_tpu", "capi")

DRIVER = r"""
#include <stdio.h>
#include "edipack_tpu.h"
int main(void) {
  if (edtpu_init()) { printf("ERR %s\n", edtpu_last_error()); return 1; }
  edtpu_set_option_i("norb", 1);
  edtpu_set_option_i("nbath", 2);
  edtpu_set_option_d("xmu", 0.17);
  edtpu_set_option_i("ed_verbose", 0);
  int nb = edtpu_get_bath_dimension();
  double bath[64];
  if (edtpu_init_solver(bath, nb)) { printf("ERR %s\n", edtpu_last_error()); return 1; }
  double re[1] = {0.0};
  edtpu_set_hloc(re, 0, 1);
  if (edtpu_solve(bath, nb)) { printf("ERR %s\n", edtpu_last_error()); return 1; }
  double dens[1];
  edtpu_get_dens(dens, 1);
  printf("DENS %.12f\n", dens[0]);
  edtpu_finalize();
  return 0;
}
"""


@pytest.mark.skipif(not os.path.exists(os.path.join(CAPI, "edipack_tpu.h")),
                    reason="capi sources missing")
def test_c_driver_matches_python(tmp_path):
    # build the shared lib + driver
    r = subprocess.run(["make", "-C", CAPI, "-s"], capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"capi build failed: {r.stderr.decode()[:200]}")
    src = tmp_path / "driver.c"
    src.write_text(DRIVER)
    exe = tmp_path / "driver"
    r = subprocess.run(
        ["gcc", "-O2", "-I", CAPI, "-o", str(exe), str(src),
         "-L", CAPI, "-ledipack_tpu_c", f"-Wl,-rpath,{CAPI}"],
        capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"driver build failed: {r.stderr.decode()[:200]}")
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    out = subprocess.run([str(exe)], capture_output=True, env=env,
                         timeout=300, cwd=str(tmp_path))
    text = out.stdout.decode()
    assert "DENS" in text, text + out.stderr.decode()[-300:]
    dens_c = float(text.split("DENS")[1].split()[0])

    # python reference
    from edipack_tpu.config import default_config
    from edipack_tpu.bath.dmft_bath import init_bath
    from edipack_tpu.solver.core import solve_impurity
    from edipack_tpu.umatrix import build_umatrix
    cfg = default_config(norb=1, nbath=2, nspin=1, xmu=0.17)
    res = solve_impurity(cfg, np.zeros((1, 1, 1, 1)), build_umatrix(cfg),
                         init_bath(cfg))
    assert abs(dens_c - res.dens[0]) < 1e-9
