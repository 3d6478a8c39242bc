"""Krylov spread-complexity diagnostics (reference ED_KRYLOV)."""
import numpy as np

from edipack_tpu.config import default_config
from edipack_tpu.bath.dmft_bath import init_bath
from edipack_tpu.solver.core import solve_impurity
from edipack_tpu.solver.krylov import krylov_state_complexity
from edipack_tpu.umatrix import build_umatrix


def test_krylov_complexity_basic():
    cfg = default_config(norb=1, nbath=2, nspin=1, uloc=[2.0], xmu=0.1,
                         tmax=5.0, ltimes=50)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    res = solve_impurity(cfg, np.zeros((1, 1, 1, 1)), um, bath)
    kr = krylov_state_complexity(res, ops=["cdg", "c"])
    key = ("cdg", 0, 0)
    assert key in kr.complexity
    k = kr.complexity[key]
    assert k.shape == (50,)
    # K(0) = 0 (seed occupies chain site 0) and grows initially
    assert abs(k[0]) < 1e-10
    assert k[1] > 0
    # entropy starts at 0 and P is a normalized distribution at all times
    assert abs(kr.entropy[key][0]) < 1e-10
    p = kr.distribution[key]
    assert np.allclose(p.sum(0), 1.0, atol=1e-8)


def test_krylov_g1_combined_chain_dense_oracle():
    """g1 = c† + c must use the COMBINED Krylov chain on the direct-sum
    seed (reference ED_KRYLOV.f90:54-266) — summing per-sector chains is
    wrong because the combined chain's basis is not the union of the
    per-sector bases.  Oracle: explicit Gram-Schmidt Krylov basis of the
    dense direct-sum H + exact exp(-iHt) evolution."""
    import jax.numpy as jnp
    from edipack_tpu.sectors import SectorTable
    from edipack_tpu.solver.krylov import result_matvec
    from edipack_tpu.ops.sector_ops import spin_axis_op
    cfg = default_config(norb=1, nbath=2, nspin=1, uloc=[1.7], xmu=0.2,
                         tmax=4.0, ltimes=25)
    um = build_umatrix(cfg)
    bath = init_bath(cfg)
    res = solve_impurity(cfg, np.zeros((1, 1, 1, 1)), um, bath,
                         flag_gf=False)
    kr = krylov_state_complexity(res, ops=["g1"])
    key = ("g1", 0, 0)
    assert key in kr.complexity

    # dense oracle
    table = res.table
    sl = res.diag.state_list
    st = min(sl, key=lambda s: s.energy)
    sec = table.sector(st.sector)
    v3 = jnp.reshape(st.vector, (sec.dim_ph, sec.dim_dw, sec.dim_up))
    j1 = table.cdg_sector(st.sector, 0, 0)
    j2 = table.c_sector(st.sector, 0, 0)
    t1, t2 = table.sector(j1), table.sector(j2)
    phi1 = np.asarray(spin_axis_op(sec.ups, t1.ups, sec.ns, "cdg", 0, 2)
                      .apply(v3)).reshape(-1)
    phi2 = np.asarray(spin_axis_op(sec.ups, t2.ups, sec.ns, "c", 0, 2)
                      .apply(v3)).reshape(-1)
    h1 = np.zeros((t1.dim, t1.dim))
    h2 = np.zeros((t2.dim, t2.dim))
    mv1 = result_matvec(res, t1)
    mv2 = result_matvec(res, t2)
    for i in range(t1.dim):
        e = np.zeros(t1.dim)
        e[i] = 1.0
        h1[:, i] = np.asarray(mv1(jnp.asarray(e)))
    for i in range(t2.dim):
        e = np.zeros(t2.dim)
        e[i] = 1.0
        h2[:, i] = np.asarray(mv2(jnp.asarray(e)))
    import scipy.linalg as sla
    h = np.block([[h1, np.zeros((t1.dim, t2.dim))],
                  [np.zeros((t2.dim, t1.dim)), h2]])
    phi = np.concatenate([phi1, phi2])
    phi = phi / np.linalg.norm(phi)
    # Krylov basis by Gram-Schmidt on {phi, H phi, ...}
    basis = [phi]
    w = h @ phi
    while True:
        for q in basis:
            w = w - (q @ w) * q
        for q in basis:
            w = w - (q @ w) * q
        nw = np.linalg.norm(w)
        if nw < 1e-10 or len(basis) >= h.shape[0]:
            break
        basis.append(w / nw)
        w = h @ basis[-1]
    q = np.stack(basis)                       # (m, dim)
    ev, u = np.linalg.eigh(h)
    k_oracle = np.zeros(len(kr.times))
    for it, t in enumerate(kr.times):
        psi_t = (u * np.exp(-1j * ev * t)) @ (u.T @ phi)
        amps = q @ psi_t                     # components on the chain basis
        k_oracle[it] = (np.arange(len(basis)) * np.abs(amps) ** 2).sum()
    np.testing.assert_allclose(kr.complexity[key], k_oracle, atol=1e-6)
