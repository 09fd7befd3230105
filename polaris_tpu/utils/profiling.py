"""Profiling hooks: XLA traces + per-stage wall timing.

The reference threads wall-clock durations through every layer and renders
them as tables/charts (device/kernel.go:107-129, renderer/stats.go,
opengl.go:305-361) but has no profiler integration (SURVEY.md §5). Here:

  * ``trace(logdir)`` wraps ``jax.profiler`` for TensorBoard-compatible
    device traces of the jitted render programs
  * ``StageTimer`` collects named stage durations (fenced by
    block_until_ready) and prints the same style of table
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Dict, Optional


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    def __init__(self) -> None:
        self.stages: "OrderedDict[str, float]" = OrderedDict()

    @contextlib.contextmanager
    def stage(self, name: str, fence=None):
        """Time a stage; ``fence`` is an optional array to block on."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                try:
                    fence.block_until_ready()
                except AttributeError:
                    pass
            self.stages[name] = (
                self.stages.get(name, 0.0) + (time.perf_counter() - t0) * 1e3
            )

    def table(self) -> str:
        total = sum(self.stages.values()) or 1.0
        lines = [f"{'Stage':<32} {'Time':>10} {'%':>6}", "-" * 50]
        for name, ms in self.stages.items():
            lines.append(f"{name:<32} {ms:>8.1f}ms {100 * ms / total:>5.1f}%")
        lines.append("-" * 50)
        lines.append(f"{'TOTAL':<32} {total:>8.1f}ms")
        return "\n".join(lines)
