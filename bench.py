#!/usr/bin/env python
"""Benchmark: effective sector-H SpMV throughput (nnz/s) in the largest
sector of the two-orbital Kanamori impurity (BASELINE.md north-star metric).

The engine's hot loop is the fused Pallas kernel (ops/pallas_fused.py):
imp-MSB-ordered block-compacted factor matmuls + rectangle-shift non-local
terms, with the whole sector vector VMEM-resident and ``niter`` chained
(matvec + normalize) power steps inside ONE kernel launch — the normalize
is folded lazily into the next matvec, reproducing exactly the
``w = H v; v = w/||w||`` sequence the Lanczos drivers execute.

"nnz" counts the nonzeros of the equivalent sparse sector Hamiltonian the
reference would build (diag + Hup(x)I + I(x)Hdw + nonlocal), so the number
is directly comparable with CSR-SpMV implementations.

vs_baseline: ratio to the HBM-roofline CSR SpMV on the same chip — a
memory-bound CSR SpMV moves ~10 bytes/nnz (8B value + 2B amortized index),
so the best any CSR implementation can do is BW/10 nnz/s.  v5e HBM ~819
GB/s -> 8.2e10 nnz/s roofline.  vs_baseline > 1 means we beat the
reference's algorithm class at its own theoretical best on this hardware.

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

    hbm_bw = {"tpu": 819e9, "axon": 819e9}.get(platform, 100e9)  # bytes/s
    roofline_csr = hbm_bw / 10.0   # nnz/s for a memory-bound CSR SpMV

    rate = None
    if platform in ("tpu", "axon"):
        try:
            rate = bench_fused(op, cfg, roofline_csr)
        except Exception as e:  # pragma: no cover - fallback path
            print(f"[bench] fused kernel unavailable ({type(e).__name__}: "
                  f"{e}); falling back to XLA matvec", file=sys.stderr)
    if rate is None:
        rate = bench_xla(op, platform)

    print(f"[bench] platform={platform} build={t_build:.2f}s "
          f"roofline_csr={roofline_csr:.3e} nnz/s", file=sys.stderr)

    print(json.dumps({
        "metric": "sector_spmv_nnz_per_s",
        "value": rate,
        "unit": "nnz/s",
        "vs_baseline": rate / roofline_csr,
    }))


def bench_fused(op, cfg, roofline_csr):
    """Fused-kernel path: K lazy-normalized power steps per launch."""
    import jax
    import jax.numpy as jnp
    from edipack_tpu.ops.fused_normal import build_fused_normal
    from edipack_tpu.ops.pallas_fused import (FusedPower, MixedFusedKron,
                                              fused_vmem_ok)

    fop = build_fused_normal(op, cfg.norb)
    if fop is None or not fused_vmem_ok(fop):
        return None
    rng = np.random.default_rng(0)
    v = rng.normal(size=(fop.ddp, fop.dup)).astype(np.float32)
    v[fop.dd:, :] = 0
    v[:, fop.du:] = 0
    v3 = jax.device_put(jnp.asarray(fop.to_blocked(v)))

    K = 100
    pw = FusedPower(fop, K)
    w3, norms = pw(v3)
    _ = float(jnp.vdot(norms, norms))    # compile + warmup + roundtrip
    t0 = time.time()
    w3, norms = pw(v3)
    # host-fetched scalar: block_until_ready on a remote (tunneled) array
    # can return before execution completes
    _ = float(jnp.vdot(norms, norms))
    dt = (time.time() - t0) / K
    rate = fop.nnz / dt
    print(f"[bench] fused f32: {dt*1e3:.3f} ms/matvec  "
          f"({rate/1e9:.2f} Gnnz/s, dim={fop.dd*fop.du}, nnz={fop.nnz}, "
          f"vs_csr_roofline={rate/roofline_csr:.2f})", file=sys.stderr)

    # secondary: the double-single f64-accuracy solver matvec
    mv = MixedFusedKron(fop)
    vflat = jnp.asarray(fop.to_blocked(v).reshape(-1), jnp.float64)

    def step(u, _):
        w = mv(u)
        return w / jnp.linalg.norm(w), None
    f = jax.jit(lambda u: jax.lax.scan(step, u, None, length=20)[0])
    w = f(vflat)
    _ = float(jnp.vdot(w, w))
    t0 = time.time()
    w = f(vflat)
    _ = float(jnp.vdot(w, w))
    dtm = (time.time() - t0) / 20
    print(f"[bench] fused mixed-ds64: {dtm*1e3:.3f} ms/matvec  "
          f"({fop.nnz/dtm/1e9:.2f} Gnnz/s)", file=sys.stderr)
    return rate


def bench_xla(op, platform):
    """Fallback: dense-Kronecker XLA matvec inside one jitted scan."""
    import jax
    import jax.numpy as jnp
    from edipack_tpu.ops.matvec import KronMatvec

    mv = KronMatvec(op, dtype=jnp.float32)

    n = 50

    def step(v, _):
        w = mv.apply3(v)
        return w / jnp.linalg.norm(w), None
    f = jax.jit(lambda v: jax.lax.scan(step, v, None, length=n)[0])
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, mv.shape3, jnp.float32)
    w = f(v)
    _ = float(jnp.vdot(w, w))
    t0 = time.time()
    w = f(v)
    _ = float(jnp.vdot(w, w))
    dt = (time.time() - t0) / n
    print(f"[bench] xla f32: {dt*1e3:.3f} ms/matvec  "
          f"({mv.nnz/dt/1e9:.2f} Gnnz/s, dim={mv.dim}, nnz={mv.nnz})",
          file=sys.stderr)
    return mv.nnz / dt


if __name__ == "__main__":
    main()
