"""Tracing / profiling / observability subsystem.

The reference has no profiler integration — only ad-hoc time.time() around
pipeline phases persisted into result JSONs (SURVEY.md §5;
pybullet_gto_planning.py:203,233,244,270). Here profiling is first-class:

  - PhaseTimer: named wall-clock phases with device sync, the structured
    version of the reference's checking/ik/planning timers; exports the
    same keys the result schema expects.
  - trace(): context manager around jax.profiler traces (TensorBoard
    format) for kernel-level device timelines.
  - debug_guard(): enables jax NaN/inf checking — the framework's
    sanitizer mode (the reference's closest analog is the
    violated_constraints checker).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulates wall-clock time per named phase.

    with timer.phase("ik"): ...       # accumulates into 'ik'
    timer.means() -> {'ik_time': ...} # result-schema-compatible keys
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        if self.sync:
            jax.effects_barrier()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                jax.effects_barrier()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def means(self) -> Dict[str, float]:
        return {
            f"{k}_time": self.totals[k] / self.counts[k] for k in self.totals
        }

    def report(self) -> str:
        lines = [
            f"{k}: total {self.totals[k]:.3f}s over {self.counts[k]} calls "
            f"(mean {self.totals[k]/self.counts[k]:.3f}s)"
            for k in sorted(self.totals)
        ]
        return "\n".join(lines)

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"totals": dict(self.totals), "counts": dict(self.counts)}, f)


@contextlib.contextmanager
def trace(logdir: str):
    """Device-level profiler trace (view with TensorBoard's profile tab)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_guard(nans: bool = True, disable_jit: bool = False):
    """NaN/inf checking (and optionally uncompiled execution) for
    debugging solver divergence."""
    overrides = {}
    if nans:
        overrides["jax_debug_nans"] = True
    if disable_jit:
        overrides["jax_disable_jit"] = True
    previous = {k: getattr(jax.config, k) for k in overrides}
    for k, v in overrides.items():
        jax.config.update(k, v)
    try:
        yield
    finally:
        for k, v in previous.items():
            jax.config.update(k, v)


def device_memory_stats() -> Optional[dict]:
    """Per-device memory statistics where the backend exposes them."""
    try:
        dev = jax.devices()[0]
        return dev.memory_stats()
    except Exception:
        return None
