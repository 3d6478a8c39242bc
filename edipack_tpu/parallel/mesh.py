"""Multi-chip sharding of the sector matvec.

Design (SURVEY.md §2.4): the reference's MPI decomposition of the normal-mode
matvec shards the dw index of V[iup, idw] across ranks and alternates layouts
with an MPI_AlltoAllV vector transpose (ED_HAMILTONIAN_NORMAL_COMMON.f90:
66-167). TPU-native: V[ph, dw, up] carries a NamedSharding over the 'dw'
mesh axis; `V @ Hupᵀ` is embarrassingly local, and the dw-contraction
`Hdw @ V` lowers to XLA collectives over ICI inserted by GSPMD — the
all-to-all is implicit in the sharding propagation, not hand-written.

A second mesh axis 'sec' batches independent small sectors (the reference
runs sectors serially; here they are data-parallel).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, sec_axis: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with axes ('sec', 'dw'): 'dw' shards a sector's dw dimension
    (tensor parallel), 'sec' runs independent sectors/sites in parallel
    (data parallel)."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    sec_axis = max(1, min(sec_axis, n))
    while n % sec_axis:
        sec_axis -= 1
    arr = np.array(devs).reshape(sec_axis, n // sec_axis)
    return Mesh(arr, ("sec", "dw"))


def sector_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding of a sector tensor V[ph, dw, up]: dw sharded over ICI."""
    return NamedSharding(mesh, P(None, "dw", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_kron_matvec(mv, mesh: Mesh):
    """Install the dw sharding on a KronMatvec's operand pytree."""
    sh = sector_sharding(mesh)
    rep = replicated(mesh)
    row_sh = NamedSharding(mesh, P("dw", None))
    row_split = {"d", "eph_d", "d_lo", "eph_d_lo"}
    mv.ops = {name: jax.device_put(arr, row_sh if name in row_split else rep)
              for name, arr in mv.ops.items()}
    mv._sharding = sh
    return mv
