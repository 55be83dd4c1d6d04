"""Per-stage timing: the successor of the reference's inline `#<microsec>`
chrono prints (MultiScale.cpp:296-302 et al.).

StageTimer records wall-clock per named stage (blocking on device results
so numbers are honest) and can emit the reference-style `#N` lines as well
as a structured summary. jax.profiler tracing can be layered on top via
the `trace` context for TensorBoard-grade traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class StageTimer:
    def __init__(self, enabled: bool = True, echo: bool = False):
        self.enabled = enabled
        self.echo = echo  # print '#<microseconds>' like the reference
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        # block on async dispatch so the stage really finished
        try:
            jax.block_until_ready(jax.device_put(0.0))
        except Exception:
            pass
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1
        if self.echo:
            print(f"\n#{int(dt * 1e6)}")

    @contextlib.contextmanager
    def trace(self, logdir: str):
        """jax.profiler trace around a region (TensorBoard viewable)."""
        with jax.profiler.trace(logdir):
            yield

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals):
            lines.append(
                f"{name:36s} {self.totals[name] * 1e3:10.2f} ms  x{self.counts[name]}"
            )
        return "\n".join(lines)
