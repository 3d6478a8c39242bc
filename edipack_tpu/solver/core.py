"""End-to-end impurity solve (the reference `ed_solve` body, ED_MAIN.f90:164-228):
bath set -> umatrix -> diagonalization -> Green's functions -> susceptibilities
-> observables -> energies -> RDM, with all products retained on the result
object for the `ed_get_*` getters (reference ED_IO)."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..bath.dmft_bath import DmftBath
from ..bath.functions import (g0and_bath, invg0_bath, delta_bath, fdelta_bath,
                              matsubara_grid, real_grid, _block_inv)
from ..config import EDConfig
from ..models.normal import NormalSectorOp, build_normal_sector_op
from ..ops.matvec import KronMatvec
from ..sectors import Sector, SectorTable
from ..umatrix import Umatrix
from .diag import DiagResult, diagonalize, diagonalize_sites
from .eigenspace import StateList
from .greens import GFMatrix, build_gf_normal, eval_gf_normal, sigma_normal
from .observables import Observables, compute_observables_normal


@dataclass
class SolveResult:
    cfg: EDConfig
    table: SectorTable
    diag: DiagResult
    gf: Optional[GFMatrix]
    obs: Observables
    bath: DmftBath
    hloc: np.ndarray
    um: Umatrix
    chi: Optional[GFMatrix] = None
    rdm: Optional[np.ndarray] = None
    hloc_anomalous: Optional[np.ndarray] = None

    # ------------------------------------------------------------------
    def _zgrid(self, zeta, axis):
        if zeta is not None:
            return np.atleast_1d(np.asarray(zeta, complex))
        return matsubara_grid(self.cfg) if axis.startswith("m") \
            else real_grid(self.cfg)

    def get_gimp(self, zeta=None, axis="m", typ="n"):
        z = self._zgrid(zeta, axis)
        mode = self.cfg.ed_mode
        if mode == "normal":
            if typ != "n":
                raise ValueError("anomalous GF only exists in superc mode")
            return eval_gf_normal(self.cfg, self.gf, z)
        if mode == "superc":
            from .core_joint import eval_gf_superc
            g, f, _ = eval_gf_superc(self.cfg, self.gf, z)
            return g if typ == "n" else f
        from .core_joint import eval_gf_nonsu2
        if typ != "n":
            raise ValueError("anomalous GF only exists in superc mode")
        return eval_gf_nonsu2(self.cfg, self.gf, z)

    def get_g0imp(self, zeta=None, axis="m", typ="n"):
        z = self._zgrid(zeta, axis)
        return g0and_bath(self.cfg, self.bath, self.hloc, z)

    def get_g0and(self, zeta=None, axis="m", typ="n"):
        return self.get_g0imp(zeta, axis, typ)

    def get_delta(self, zeta=None, axis="m", typ="n"):
        z = self._zgrid(zeta, axis)
        if typ == "n":
            return delta_bath(self.cfg, self.bath, z)
        return fdelta_bath(self.cfg, self.bath, z)

    def get_sigma(self, zeta=None, axis="m", typ="n"):
        z = self._zgrid(zeta, axis)
        ig0 = invg0_bath(self.cfg, self.bath, self.hloc, z)
        if self.cfg.ed_mode == "superc":
            from ..bath.functions import invf0_bath
            from .core_joint import eval_gf_superc, sigma_superc
            g, f, _ = eval_gf_superc(self.cfg, self.gf, z)
            # F21 = F evaluated at conj(z) (reference get_impF_superc
            # zconj=.true.) — enters the Nambu 21 block as conj(F21)^T
            _, f21, _ = eval_gf_superc(self.cfg, self.gf, np.conj(z))
            if0 = invf0_bath(self.cfg, self.bath, self.hloc_anomalous, z)
            sigma, self_ = sigma_superc(self.cfg, g, f, ig0, if0,
                                        axis=axis[:1], f21=f21)
            return sigma if typ == "n" else self_
        g = self.get_gimp(z, axis, "n")
        return sigma_normal(self.cfg, g, ig0)

    def get_self(self, zeta=None, axis="m"):
        """Anomalous self-energy (superc; reference get_Self_superc)."""
        return self.get_sigma(zeta, axis, typ="a")

    def get_dimp(self, zeta=None, axis="m"):
        from .greens import eval_dimp
        z = self._zgrid(zeta, axis)
        return eval_dimp(self.cfg, self.gf, z, axis=axis[:1])

    def get_chi(self, kind="spin", zeta=None, axis="m"):
        if self.chi is None:
            raise RuntimeError(f"chi_{kind} was not computed (enable chi{kind}_flag)")
        z = self._zgrid(zeta, axis)
        norb = self.cfg.norb
        out = np.zeros((norb, norb, len(z)), complex)
        for a in range(norb):
            for b in range(norb):
                out[a, b] = self.chi.eval((kind, a, b), z)
        return out

    def get_rdm(self, norbs=None):
        if self.rdm is None:
            raise RuntimeError("rdm was not computed (enable rdm_flag)")
        return self.rdm

    # -- static getters -------------------------------------------------
    @property
    def dens(self):
        return self.obs.dens

    @property
    def docc(self):
        return self.obs.docc

    @property
    def mag(self):
        return self.obs.mag

    @property
    def energies(self):
        return self.obs.energies

    @property
    def doubles(self):
        return self.obs.doubles

    @property
    def imp_info(self):
        return self.obs.imp_info

    @property
    def single_particle_dm(self):
        return self.obs.sp_dm

    @property
    def phisc(self):
        return getattr(self.obs, "phisc", np.zeros(self.cfg.norb))

    @property
    def argphi(self):
        return getattr(self.obs, "argphi", np.zeros(self.cfg.norb))

    @property
    def exct(self):
        e = getattr(self.obs, "exct", None)
        return e if e is not None else np.zeros((4, self.cfg.norb, self.cfg.norb))

    @property
    def evals(self):
        """Energies of the *retained* state list (reference ed_get_evals:
        ED_DIAG.f90:39 es_return_evals(state_list, ed_evals))."""
        return np.array([st.energy for st in self.diag.state_list.states])

    @property
    def evals_all(self):
        """All computed sector eigenvalues, ascending."""
        parts = [v for v in self.diag.evals_by_sector.values()]
        return np.sort(np.concatenate(parts)) if parts else np.zeros(0)

    @property
    def neigen_sector(self):
        return self.diag.neigen_sector

    @property
    def e0(self):
        return self.diag.e0


# ---------------------------------------------------------------------------


def _normal_builders(cfg: EDConfig, table: SectorTable, hloc: np.ndarray,
                     um: Umatrix, bath: DmftBath):
    """Per-impurity operator/matvec builder set for the normal-mode solver.

    Extracted from solve_impurity so multi-site solves
    (solve_impurity_sites) can hold one builder set per site and feed them
    into a single cross-site diagonalization sweep."""
    dtype = jnp.float64 if cfg.ed_precision == "float64" else jnp.float32

    op_cache: Dict[int, NormalSectorOp] = {}
    mv_cache: Dict[int, KronMatvec] = {}
    dense_cache: Dict[int, Tuple] = {}

    def get_op(sec: Sector) -> NormalSectorOp:
        if sec.index not in op_cache:
            op_cache[sec.index] = build_normal_sector_op(cfg, sec, hloc, um, bath)
        return op_cache[sec.index]

    # multi-chip: shard the dw axis of large sectors over the device mesh
    # (the reference's MPI row split, ED_HAMILTONIAN_NORMAL.f90:129-142)
    import jax as _jax
    _ndev = len(_jax.devices())
    _mesh = None
    if _ndev > 1:
        from ..parallel.mesh import make_mesh
        _mesh = make_mesh(sec_axis=1)

    platform = _jax.devices()[0].platform
    use_mixed = (cfg.ed_precision == "float64"
                 and cfg.ed_mixed_matvec != "never"
                 and (cfg.ed_mixed_matvec == "always"
                      or platform in ("tpu", "axon")))

    if not cfg.ed_sparse_h:
        # reference ed_sparse_H=F selects the matrix-free direct HxV
        # (ED_NORMAL/..._DIRECT_HxV.f90). The normal-mode Kron operator is
        # already matrix-free in the relevant sense: only the
        # O(DimUp^2 + DimDw^2) spin factors are materialized, never the
        # O(Dim) sector matrix — so the flag is satisfied by construction.
        import warnings
        warnings.warn(
            "ed_sparse_h=False: the normal-mode Kronecker matvec stores "
            "only the per-spin factor matrices (memory O(DimUp^2+DimDw^2)), "
            "which already meets the matrix-free intent of the reference's "
            "direct HxV; the flag changes nothing in normal mode "
            "(joint modes switch to JointMatvecDirect)", stacklevel=2)

    def _try_fused(sec: Sector, mixed: bool):
        """Fused Pallas kernel path (single TPU chip, no phonons, sector
        fits VMEM-resident; ops.pallas_fused). Returns None when out of
        domain — caller falls back to the XLA Kronecker matvec."""
        force = cfg.ed_fused_matvec == "always"
        if cfg.ed_fused_matvec == "never" or (_mesh is not None and not force):
            return None
        if not force and (platform not in ("tpu", "axon")
                          or sec.dim < (1 << 17)):
            return None
        if not mixed and dtype != jnp.float32:
            # the plain fused kernel is f32; a full-f64 XLA matvec was
            # explicitly requested (ed_mixed_matvec=never at f64)
            return None
        from ..ops.fused_normal import build_fused_normal
        from ..ops.pallas_fused import (FusedKron, MixedFusedKron,
                                        fused_vmem_ok, fused_ds_vmem_ok,
                                        wrap_exact_internal)
        fop = build_fused_normal(get_op(sec), cfg.norb)
        vmem_ok = fused_ds_vmem_ok if mixed else fused_vmem_ok
        if fop is None or not vmem_ok(fop):
            return None
        if mixed:
            mv = MixedFusedKron(fop)
            # sparse-ELL exact f64 on TPU: the dense-f64 einsum is
            # software-emulated at ~10 Gflop/s (seconds per matvec on the
            # flagship sector — the r4 time-to-ground-state sink)
            from ..ops.matvec import ExactKronMatvec
            exact_orig = ExactKronMatvec(get_op(sec)) \
                if platform in ("tpu", "axon") \
                else KronMatvec(get_op(sec), dtype=jnp.float64)
            mv.exact = wrap_exact_internal(mv, exact_orig)
            mv.exact_orig = exact_orig
        else:
            mv = FusedKron(fop)
        return mv

    def matvec_builder(sec: Sector) -> KronMatvec:
        if sec.index not in mv_cache:
            shard_it = (_mesh is not None
                        and sec.dim > 4 * cfg.lanc_dim_threshold
                        and sec.dim_dw % _ndev == 0)
            mixed = use_mixed and (cfg.ed_mixed_matvec == "always"
                                   or sec.dim >= (1 << 17))
            mv = _try_fused(sec, mixed)
            if mv is not None:
                pass
            elif mixed:
                from ..ops.matvec import ExactKronMatvec, MixedKronMatvec
                mv = MixedKronMatvec(get_op(sec))
                exact = ExactKronMatvec(get_op(sec)) \
                    if platform in ("tpu", "axon") and not shard_it \
                    else KronMatvec(get_op(sec), dtype=jnp.float64)
                if shard_it:
                    from ..parallel.mesh import shard_kron_matvec
                    mv = shard_kron_matvec(mv, _mesh)
                    exact = shard_kron_matvec(exact, _mesh)
                mv.exact = exact
            else:
                mv = KronMatvec(get_op(sec), dtype=dtype)
                if shard_it:
                    from ..parallel.mesh import shard_kron_matvec
                    mv = shard_kron_matvec(mv, _mesh)
            if cfg.ed_verbose >= 4:
                # _DEBUG-level path tracing (reference -D_DEBUG prints the
                # per-sector build/split decisions,
                # ED_HAMILTONIAN_NORMAL.f90:75-156)
                print(f"[edipack_tpu:DEBUG] sector {sec.index} "
                      f"dim={sec.dim} (dw={sec.dim_dw}, up={sec.dim_up}, "
                      f"ph={sec.dim_ph}) -> {type(mv).__name__}"
                      f"{' sharded(dw/' + str(_ndev) + ')' if shard_it else ''}"
                      f"{' mixed-DS' if mixed else ''}")
            mv_cache[sec.index] = mv
        return mv_cache[sec.index]

    def dense_builder(sec: Sector) -> np.ndarray:
        return get_op(sec).to_dense()

    def dense_eig_cache(isec: int):
        """Full eigh of small sectors, cached, for exact GF moments."""
        sec = table.sector(isec)
        if sec.dim > cfg.lanc_dim_threshold:
            return None
        if isec not in dense_cache:
            h = dense_builder(sec)
            evals, evecs = np.linalg.eigh(h)
            dense_cache[isec] = (evals, jnp.asarray(evecs))
        return dense_cache[isec]

    def gf_matvec_builder(sec: Sector):
        """GF moments stay exact f64 unless ed_mixed_gf opts in."""
        mv = matvec_builder(sec)
        if not cfg.ed_mixed_gf:
            # prefer the original-layout exact operator: the GF start
            # vectors are built in the original basis
            if hasattr(mv, "exact_orig"):
                return mv.exact_orig
            if hasattr(mv, "exact"):
                return mv.exact
        return mv

    from types import SimpleNamespace
    return SimpleNamespace(matvec_builder=matvec_builder,
                           dense_builder=dense_builder,
                           dense_eig_cache=dense_eig_cache,
                           gf_matvec_builder=gf_matvec_builder,
                           op_cache=op_cache)


def _finish_normal_site(cfg: EDConfig, table: SectorTable, b, diag,
                        hloc: np.ndarray, um: Umatrix, bath: DmftBath,
                        flag_gf: bool, timer) -> "SolveResult":
    """GF + observables + chi + RDM for one site given its DiagResult."""
    gf = GFMatrix()
    if flag_gf:
        with timer.phase("greens_functions"):
            gf = build_gf_normal(cfg, table, diag.state_list,
                                 b.gf_matvec_builder, b.dense_eig_cache,
                                 all_g=cfg.ed_all_g)

    with timer.phase("observables"):
        obs = compute_observables_normal(cfg, table, diag.state_list, hloc,
                                         um, b.op_cache)

    chi = None
    if flag_gf and (cfg.chispin_flag or cfg.chidens_flag or cfg.chipair_flag
                    or cfg.chiexct_flag):
        from .chi import build_chi_normal
        chi = build_chi_normal(cfg, table, diag.state_list,
                               b.gf_matvec_builder, b.dense_eig_cache)

    rdm = None
    if cfg.rdm_flag:
        from .rdm import impurity_rdm_normal
        rdm = impurity_rdm_normal(cfg, table, diag.state_list)

    res = SolveResult(cfg=cfg, table=table, diag=diag, gf=gf, obs=obs,
                      bath=bath.copy(), hloc=np.asarray(hloc), um=um,
                      chi=chi, rdm=rdm)
    res.timings = dict(timer.timings)
    return res


def solve_impurity_sites(cfg: EDConfig, hlocs, ums, baths,
                         cfgs=None, neigen_overrides=None,
                         sector_masks=None,
                         flag_gf: bool = True) -> List["SolveResult"]:
    """Solve Nineq normal-mode impurity problems as ONE batched sweep.

    TPU-native site parallelism (SURVEY §2.4 strategy 8): the reference
    round-robins inequivalent sites over MPI ranks (E2I_MAIN.f90:253-296);
    here all sites share one SectorTable and their dense sectors enter the
    same padded eigh buckets, data-parallel over the device mesh.  Per-site
    interaction/Hloc/bath differences live in the builders; cfgs[i] may
    override interaction values but must keep the sector structure
    (norb/nbath/nspin/nph/ed_total_ud/bath_type) identical.
    """
    nsites = len(hlocs)
    if cfgs is None:
        cfgs = [cfg] * nsites
    for c in cfgs:
        c.validate()
        if (c.norb, c.nbath, c.nspin, c.nph, c.ed_total_ud, c.bath_type,
                c.ed_mode) != (cfg.norb, cfg.nbath, cfg.nspin, cfg.nph,
                               cfg.ed_total_ud, cfg.bath_type, cfg.ed_mode):
            raise ValueError("solve_impurity_sites: sites must share the "
                             "sector structure")
    from ..utils.timing import PhaseTimer
    table = SectorTable(cfg)
    builders = [_normal_builders(cfgs[s], table, hlocs[s], ums[s], baths[s])
                for s in range(nsites)]
    timer = PhaseTimer(verbose=cfg.ed_verbose)
    with timer.phase("diagonalization"):
        diags = diagonalize_sites(
            cfg, table, [b.matvec_builder for b in builders],
            [b.dense_builder for b in builders],
            neigen_overrides=neigen_overrides, sector_masks=sector_masks)
    out = []
    for s in range(nsites):
        site_timer = PhaseTimer(verbose=0)
        out.append(_finish_normal_site(cfgs[s], table, builders[s], diags[s],
                                       hlocs[s], ums[s], baths[s], flag_gf,
                                       site_timer))
    return out


def solve_impurity(cfg: EDConfig, hloc: np.ndarray, um: Umatrix,
                   bath: DmftBath,
                   neigen_override: Optional[np.ndarray] = None,
                   sector_mask: Optional[np.ndarray] = None,
                   hloc_anomalous: Optional[np.ndarray] = None,
                   flag_gf: bool = True) -> SolveResult:
    cfg.validate()
    if cfg.ed_mode != "normal":
        from .core_joint import solve_impurity_joint
        return solve_impurity_joint(cfg, hloc, um, bath,
                                    neigen_override=neigen_override,
                                    sector_mask=sector_mask,
                                    hloc_anomalous=hloc_anomalous,
                                    flag_gf=flag_gf)

    from ..utils.timing import PhaseTimer
    timer = PhaseTimer(verbose=cfg.ed_verbose,
                       trace_dir=cfg.ed_profile_dir or None)
    table = SectorTable(cfg)
    b = _normal_builders(cfg, table, hloc, um, bath)

    timer.__enter__()
    with timer.phase("diagonalization"):
        diag = diagonalize(cfg, table, b.matvec_builder, b.dense_builder,
                           neigen_override=neigen_override,
                           sector_mask=sector_mask)

    gf = GFMatrix()
    if flag_gf:
        with timer.phase("greens_functions"):
            gf = build_gf_normal(cfg, table, diag.state_list,
                                 b.gf_matvec_builder, b.dense_eig_cache,
                                 all_g=cfg.ed_all_g)

    with timer.phase("observables"):
        obs = compute_observables_normal(cfg, table, diag.state_list, hloc,
                                         um, b.op_cache)

    chi = None
    if flag_gf and (cfg.chispin_flag or cfg.chidens_flag or cfg.chipair_flag
                    or cfg.chiexct_flag):
        from .chi import build_chi_normal
        chi = build_chi_normal(cfg, table, diag.state_list,
                               b.gf_matvec_builder, b.dense_eig_cache)

    rdm = None
    if cfg.rdm_flag:
        from .rdm import impurity_rdm_normal
        rdm = impurity_rdm_normal(cfg, table, diag.state_list)

    timer.__exit__(None, None, None)
    res = SolveResult(cfg=cfg, table=table, diag=diag, gf=gf, obs=obs,
                      bath=bath.copy(), hloc=np.asarray(hloc), um=um,
                      chi=chi, rdm=rdm)
    res.timings = dict(timer.timings)
    return res
