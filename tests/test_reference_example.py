"""The ULTIMATE drop-in check: compile the reference's own C++ DMFT example
(examples/cpp/hm_bethe.cpp, read VERBATIM from the reference tree at test
time) against libedipack_tpu_c.so + the alias/MPI-shim headers, run a short
Bethe-lattice DMFT loop, and check it produces finite physics."""
import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CAPI = os.path.join(REPO, "edipack_tpu", "capi")
REF_EXAMPLE = "/root/reference/examples/cpp/hm_bethe.cpp"

INPUT = """\
NORB=1
NBATH=5
NSPIN=1
ULOC=2.0
BETA=100.0
XMU=0.0
NLOOP=2
DMFT_ERROR=1e-4
NSUCCESS=1
LMATS=256
LFIT=256
ED_TWIN=T
ED_VERBOSE=0
LANC_NSTATES_SECTOR=2
"""


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(REF_EXAMPLE),
                    reason="reference example tree not available")
def test_reference_cpp_example_runs_unmodified(tmp_path):
    r = subprocess.run(["make", "-C", CAPI, "-s"], capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"capi build failed: {r.stderr.decode()[:200]}")
    exe = tmp_path / "hm_bethe"
    r = subprocess.run(
        ["g++", "-O2", "-I", CAPI, "-I", os.path.join(CAPI, "compat_include"),
         "-o", str(exe), REF_EXAMPLE,
         "-L", CAPI, "-ledipack_tpu_c", f"-Wl,-rpath,{CAPI}"],
        capture_output=True)
    assert r.returncode == 0, \
        "reference example failed to compile against the compat ABI:\n" \
        + r.stderr.decode()[:800]

    (tmp_path / "inputED.conf").write_text(INPUT)
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    out = subprocess.run([str(exe)], capture_output=True, env=env,
                         timeout=1200, cwd=str(tmp_path))
    text = out.stdout.decode() + out.stderr.decode()
    assert out.returncode == 0, text[-800:]

    # the driver writes error.err: one line per DMFT iteration
    err_file = tmp_path / "error.err"
    assert err_file.exists(), text[-500:]
    errs = [float(ln.split()[1]) for ln in err_file.read_text().splitlines()
            if ln.strip()]
    assert len(errs) >= 2 and all(np.isfinite(errs)), errs
    # first iteration compares against Xold=0 -> err=1; later iterations are
    # real self-consistency errors
    assert errs[-1] < 1.0
