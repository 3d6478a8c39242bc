"""File outputs and restart contracts.

Parity targets (SURVEY.md §5 checkpoint/resume):
  * observables_{info,last,all}.ed, energy_{info,last}.ed text metrics
    (reference write_obs_* ED_OBSERVABLES_NORMAL.f90:968-1210)
  * state_list.restart — per-retained-state sector quantum numbers, used to
    seed neigen_sector on restart (ED_SETUP.f90:557-590)
  * sectors.restart (SectorFile) — restrict the diagonalization sweep to
    listed sectors ± ed_sectors_shift (ED_DIAG_NORMAL.f90:311-371)
  * xmu.restart — chemical potential + step for fixed-density runs
  * hamiltonian.restart — bath parameters (bath/dmft_bath.py)
  * GFmatrix npz store (solver/greens.py GFMatrix.save/load)
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from .config import EDConfig
from .sectors import SectorTable
from .solver.diag import DiagResult
from .solver.observables import Observables


def _path(cfg: EDConfig, name: str) -> str:
    return os.path.join(cfg.ed_output_dir, name + cfg.ed_file_suffix + ".ed")


def write_observables(cfg: EDConfig, obs: Observables, last: bool = True) -> None:
    norb = cfg.norb
    names = ([f"dens_{a+1}" for a in range(norb)]
             + [f"docc_{a+1}" for a in range(norb)]
             + [f"nup_{a+1}" for a in range(norb)]
             + [f"ndw_{a+1}" for a in range(norb)]
             + [f"mag_{a+1}" for a in range(norb)]
             + ["s2tot", "egs"])
    vals = np.concatenate([obs.dens, obs.docc, obs.dens_up, obs.dens_dw,
                           obs.mag[2], [obs.s2tot, obs.egs]])
    with open(_path(cfg, "observables_info"), "w") as fh:
        fh.write("# " + " ".join(f"{i+1}:{n}" for i, n in enumerate(names)) + "\n")
    mode = "w" if last else "a"
    with open(_path(cfg, "observables_last" if last else "observables_all"),
              mode) as fh:
        fh.write(" ".join(f"{v:.12f}" for v in vals) + "\n")


def write_energy(cfg: EDConfig, obs: Observables) -> None:
    names = ["epot", "eint", "ehartree", "eknot", "dust", "dund", "dse", "dph"]
    vals = np.concatenate([obs.energies, obs.doubles])
    with open(_path(cfg, "energy_info"), "w") as fh:
        fh.write("# " + " ".join(f"{i+1}:{n}" for i, n in enumerate(names)) + "\n")
    with open(_path(cfg, "energy_last"), "w") as fh:
        fh.write(" ".join(f"{v:.12f}" for v in vals) + "\n")


def write_eigenvalues(cfg: EDConfig, diag: DiagResult, table: SectorTable) -> None:
    """eigenvalues_list.ed + state_list.ed (ED_DIAG_NORMAL.f90:280-285)."""
    with open(_path(cfg, "eigenvalues_list"), "w") as fh:
        for isec in sorted(diag.evals_by_sector):
            qn = table.qns[isec]
            for ev in diag.evals_by_sector[isec]:
                fh.write(f"{ev:.12f}  {qn}\n")
    with open(_path(cfg, "state_list"), "w") as fh:
        e0 = diag.e0
        for i, st in enumerate(diag.state_list):
            qn = table.qns[st.sector]
            fh.write(f"{i+1} {st.energy:.12f} {st.energy-e0:.12e} {qn}\n")


# ---------------------------------------------------------------------------
# restart files
# ---------------------------------------------------------------------------


def _qn_fields(qn: Tuple) -> List[int]:
    if qn[0] == "n":
        return list(qn[1]) + list(qn[2])
    if qn[0] == "ntj":
        return [qn[1], qn[2]]
    return [qn[1]]


def write_state_list_restart(cfg: EDConfig, diag: DiagResult,
                             table: SectorTable, path: Optional[str] = None) -> None:
    path = path or os.path.join(cfg.ed_output_dir,
                                "state_list" + cfg.ed_file_suffix + ".restart")
    with open(path, "w") as fh:
        for i, st in enumerate(diag.state_list):
            fields = " ".join(str(x) for x in _qn_fields(table.qns[st.sector]))
            fh.write(f"{i+1} {st.sector} {fields}\n")


def read_state_list_restart(cfg: EDConfig, table: SectorTable,
                            path: Optional[str] = None) -> Optional[np.ndarray]:
    """Seed neigen_sector from a previous run's retained states
    (reference setup_global, ED_SETUP.f90:557-590)."""
    path = path or os.path.join(cfg.ed_output_dir,
                                "state_list" + cfg.ed_file_suffix + ".restart")
    if not os.path.exists(path):
        return None
    counts = np.zeros(len(table), dtype=int)
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) >= 2:
                isec = int(parts[1])
                if 0 <= isec < len(table):
                    counts[isec] += 1
    if counts.sum() == 0:
        return None
    neigen_max = counts.max()
    neigen = np.full(len(table), neigen_max + 2 * cfg.lanc_nstates_step, int)
    nz = counts > 0
    neigen[nz] = np.maximum(1, counts[nz] + 2 * cfg.lanc_nstates_step)
    return neigen


def write_sectors_restart(cfg: EDConfig, diag: DiagResult, table: SectorTable,
                          path: Optional[str] = None) -> None:
    path = path or os.path.join(cfg.ed_output_dir,
                                cfg.sectorfile + cfg.ed_file_suffix + ".restart")
    secs = sorted({st.sector for st in diag.state_list})
    with open(path, "w") as fh:
        for isec in secs:
            fh.write(" ".join(str(x) for x in _qn_fields(table.qns[isec])) + "\n")


def read_sectors_restart(cfg: EDConfig, table: SectorTable,
                         path: Optional[str] = None) -> Optional[np.ndarray]:
    """Sector mask: listed sectors expanded by ±ed_sectors_shift in each
    quantum number (reference ED_DIAG_NORMAL.f90:325-371)."""
    path = path or os.path.join(cfg.ed_output_dir,
                                cfg.sectorfile + cfg.ed_file_suffix + ".restart")
    if not os.path.exists(path):
        return None
    listed = []
    with open(path) as fh:
        for line in fh:
            parts = [int(x) for x in line.split()]
            if parts:
                listed.append(parts)
    if not listed:
        return None
    mask = np.zeros(len(table), dtype=bool)
    shift = cfg.ed_sectors_shift
    for i, qn in enumerate(table.qns):
        fields = np.asarray(_qn_fields(qn))
        for ref in listed:
            if len(ref) == len(fields) and np.all(np.abs(fields - np.asarray(ref))
                                                  <= shift):
                mask[i] = True
                break
    return mask


def write_xmu_restart(cfg: EDConfig, xmu: float, ndelta: float,
                      path: Optional[str] = None) -> None:
    path = path or os.path.join(cfg.ed_output_dir, "xmu.restart")
    with open(path, "w") as fh:
        fh.write(f"{xmu:.12f} {ndelta:.12f}\n")


def read_xmu_restart(cfg: EDConfig, path: Optional[str] = None):
    path = path or os.path.join(cfg.ed_output_dir, "xmu.restart")
    if not os.path.exists(path):
        return None
    parts = open(path).read().split()
    return float(parts[0]), float(parts[1]) if len(parts) > 1 else cfg.ndelta


def write_all_outputs(cfg: EDConfig, result) -> None:
    """Everything ed_solve writes when ed_write_files is on."""
    os.makedirs(cfg.ed_output_dir, exist_ok=True)
    write_observables(cfg, result.obs)
    write_observables(cfg, result.obs, last=False)
    write_energy(cfg, result.obs)
    write_eigenvalues(cfg, result.diag, result.table)
    write_state_list_restart(cfg, result.diag, result.table)
    write_sectors_restart(cfg, result.diag, result.table)
    from .bath.dmft_bath import save_bath_file
    save_bath_file(result.bath, os.path.join(
        cfg.ed_output_dir, cfg.hfile + cfg.ed_file_suffix + ".used"))
    # Källén-Lehmann weight/pole stores, re-loadable without re-solving
    # (reference write_GFmatrix / ed_read_ImpGMatrix, ED_GFMATRIX.f90:78-107)
    if result.gf is not None and getattr(result.gf, "channels", None):
        result.gf.save(os.path.join(
            cfg.ed_output_dir, f"gfmatrix{cfg.ed_file_suffix}.npz"))
    if result.chi is not None and getattr(result.chi, "channels", None):
        result.chi.save(os.path.join(
            cfg.ed_output_dir, f"chimatrix{cfg.ed_file_suffix}.npz"))
