#!/usr/bin/env python
"""Benchmark: effective sector-H SpMV throughput (nnz/s) in the largest
sector of the two-orbital Kanamori impurity (BASELINE.md north-star metric).

The engine's normal-mode matvec is dense Kronecker-factor matmuls on the MXU;
"nnz" counts the nonzeros of the equivalent sparse sector Hamiltonian the
reference would build (diag + Hup⊗I + I⊗Hdw + nonlocal), so the number is
directly comparable with CSR-SpMV implementations.

vs_baseline: ratio to the HBM-roofline CSR SpMV on the same chip — a memory
-bound CSR SpMV moves ~10 bytes/nnz (8B value + 2B amortized index), so the
best any sparse implementation can do is BW/10 nnz/s. v5e HBM ~ 819 GB/s
-> 8.2e10 nnz/s roofline. vs_baseline > 1 means we beat the reference's
algorithm class at its own theoretical best on this hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from edipack_tpu.config import default_config
    from edipack_tpu.bath.dmft_bath import init_bath
    from edipack_tpu.models.normal import build_normal_sector_op
    from edipack_tpu.ops.matvec import KronMatvec
    from edipack_tpu.sectors import SectorTable
    from edipack_tpu.umatrix import build_umatrix

    norb, nbath = 2, 6            # Ns = 14, largest sector 3432^2 = 11.8M
    cfg = default_config(norb=norb, nbath=nbath, nspin=1,
                         uloc=[2.0, 2.0], ust=1.2, jh=0.2, jx=0.15, jp=0.15)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    hloc = np.zeros((1, 1, norb, norb))
    table = SectorTable(cfg)
    ns = table.dims.ns
    sec = table.by_qn(("n", (ns // 2,), (ns // 2,)))
    t0 = time.time()
    op = build_normal_sector_op(cfg, sec, hloc, um, bath)
    t_build = time.time() - t0

    dev = jax.devices()[0]
    platform = dev.platform

    from edipack_tpu.ops.matvec import MixedKronMatvec

    def scan_time(mv, vdtype, label, n=20):
        """Time matvec+normalize inside one jitted lax.scan — exactly how the
        Lanczos eigensolver consumes the matvec (amortizes the per-program
        dispatch overhead of the remote-tunnel path)."""
        def step(v, _):
            w = mv.apply3(v)
            return w / jnp.linalg.norm(w), None
        f = jax.jit(lambda v: jax.lax.scan(step, v, None, length=n)[0])
        key = jax.random.PRNGKey(0)
        v = jax.random.normal(key, mv.shape3, jnp.float32).astype(vdtype)
        w = f(v)
        _ = float(jnp.vdot(w, w))      # compile + warmup + full roundtrip
        t0 = time.time()
        w = f(v)
        # host-fetched scalar: block_until_ready on a remote (tunneled)
        # array can return before execution completes
        _ = float(jnp.vdot(w, w))
        dt = (time.time() - t0) / n
        print(f"[bench] {label}: {dt*1e3:.3f} ms/matvec  "
              f"({mv.nnz/dt/1e9:.2f} Gnnz/s, dim={mv.dim}, nnz={mv.nnz})",
              file=sys.stderr)
        return dt

    results = {}
    results["f32"] = scan_time(KronMatvec(op, dtype=jnp.float32),
                               jnp.float32, "f32")
    # the f64-accuracy path the solver actually runs on TPU: double-single
    # f32 on the MXU (ed_mixed_matvec), ~15x the emulated-f64 matvec
    results["mixed"] = scan_time(MixedKronMatvec(op), jnp.float64,
                                 "mixed-ds64")

    nnz = op.nnz_estimate()
    rate = nnz / results["f32"]

    hbm_bw = {"tpu": 819e9, "axon": 819e9}.get(platform, 100e9)  # bytes/s
    roofline_csr = hbm_bw / 10.0   # nnz/s for a memory-bound CSR SpMV
    print(f"[bench] platform={platform} build={t_build:.2f}s "
          f"roofline_csr={roofline_csr:.3e} nnz/s", file=sys.stderr)

    print(json.dumps({
        "metric": "sector_spmv_nnz_per_s",
        "value": rate,
        "unit": "nnz/s",
        "vs_baseline": rate / roofline_csr,
    }))


if __name__ == "__main__":
    main()
