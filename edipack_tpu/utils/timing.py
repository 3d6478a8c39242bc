"""Per-phase wall-clock tracing (reference SF_TIMER start/stop/eta wrapping
every major phase, e.g. ED_DIAG_NORMAL.f90:101,154,292). Also the hook point
for `jax.profiler` traces: set EDIPACK_TPU_PROFILE_DIR to capture an XLA
trace of the solve."""
from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional


class PhaseTimer:
    def __init__(self, verbose: int = 0, logger=print, trace_dir=None):
        self.timings: Dict[str, float] = {}
        self.verbose = verbose
        self.logger = logger
        self._trace = None
        trace_dir = trace_dir or os.environ.get("EDIPACK_TPU_PROFILE_DIR")
        if trace_dir:
            import jax
            self._trace = jax.profiler.trace(trace_dir)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.timings[name] = self.timings.get(name, 0.0) + dt
            if self.verbose >= 2:
                self.logger(f"[edipack_tpu] {name}: {dt:.3f}s")

    def __enter__(self):
        if self._trace:
            self._trace.__enter__()
        return self

    def __exit__(self, *exc):
        if self._trace:
            self._trace.__exit__(*exc)
        return False

    def report(self) -> str:
        total = sum(self.timings.values())
        lines = [f"{k:30s} {v:10.3f}s" for k, v in self.timings.items()]
        lines.append(f"{'total':30s} {total:10.3f}s")
        return "\n".join(lines)
