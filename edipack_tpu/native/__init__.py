"""ctypes bindings for the native host kernels, with transparent build and
NumPy fallback. The native tier covers what the reference implements in
Fortran: basis enumeration, fermionic operator application, sparse packing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libedipack_native.so")
_lib: Optional[ctypes.CDLL] = None


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _HERE, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("EDIPACK_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_SO) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
    i32a = np.ctypeslib.ndpointer(np.int32, flags="C")
    ip = ctypes.POINTER(ctypes.c_int)
    lib.edn_binom.restype = ctypes.c_int64
    lib.edn_binom.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.edn_enum_states.restype = None
    lib.edn_enum_states.argtypes = [ctypes.c_int, ctypes.c_int, i64p]
    lib.edn_apply_opstring.restype = None
    lib.edn_apply_opstring.argtypes = [i64p, ctypes.c_int64, ip, ip,
                                       ctypes.c_int, i64p, f64p, u8p]
    lib.edn_state_index.restype = None
    lib.edn_state_index.argtypes = [i64p, ctypes.c_int64, i64p,
                                    ctypes.c_int64, i64p]
    lib.edn_hop_elements.restype = ctypes.c_int64
    lib.edn_hop_elements.argtypes = [i64p, ctypes.c_int64, ctypes.c_int,
                                     ctypes.c_int, i64p, i64p, f64p]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


# ---------------------------------------------------------------------------
# python-facing wrappers (used opportunistically by fock.py)
# ---------------------------------------------------------------------------


def enum_states(ns: int, n: int) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    count = int(lib.edn_binom(ns, n))
    out = np.empty(count, dtype=np.int64)
    if count:
        lib.edn_enum_states(ns, n, out)
    return out


def hop_elements(basis: np.ndarray, i: int, j: int):
    lib = load()
    if lib is None:
        return None
    basis = np.ascontiguousarray(basis, np.int64)
    n = len(basis)
    rows = np.empty(n, np.int64)
    cols = np.empty(n, np.int64)
    signs = np.empty(n, np.float64)
    cnt = lib.edn_hop_elements(basis, n, i, j, rows, cols, signs)
    return rows[:cnt], cols[:cnt], signs[:cnt]


def apply_opstring(states: np.ndarray, ops):
    """ops: list of (kind, level) with kind 'c'|'cdg'."""
    lib = load()
    if lib is None:
        return None
    states = np.ascontiguousarray(states, np.int64)
    n = len(states)
    kinds = (ctypes.c_int * len(ops))(*[0 if k == "c" else 1 for k, _ in ops])
    levels = (ctypes.c_int * len(ops))(*[l for _, l in ops])
    out = np.empty(n, np.int64)
    signs = np.empty(n, np.float64)
    valid = np.empty(n, np.uint8)
    lib.edn_apply_opstring(states, n, kinds, levels, len(ops), out, signs, valid)
    return out, signs, valid.astype(bool)
