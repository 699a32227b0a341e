"""Profiling hooks: jax.profiler traces + simple wall-clock scopes.

The reference has no tracing at all (SURVEY §5); on TPU, XLA traces are
nearly free. Usage:

    with trace_if("/tmp/tb_trace", enabled=cfg_flag):
        engine.run_video_labels(...)
    # then: tensorboard --logdir /tmp/tb_trace

Or env-driven: RMNET_TRACE_DIR=/tmp/tb python -m rmnet_tpu.runner --test ...
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from collections import defaultdict
from typing import Dict, Optional


@contextlib.contextmanager
def trace_if(log_dir: Optional[str] = None, enabled: bool = True):
    """jax.profiler trace context; no-op when disabled or unsupported."""
    log_dir = log_dir or os.environ.get("RMNET_TRACE_DIR")
    if not (enabled and log_dir):
        yield
        return
    import jax

    try:
        with jax.profiler.trace(log_dir):
            yield
        logging.info("profiler trace written to %s", log_dir)
    except Exception as ex:  # some backends can't collect device traces
        logging.warning("profiler trace unavailable (%s); continuing", ex)
        yield


class Stopwatch:
    """Accumulating wall-clock scopes (host-side; call .sync() inside the
    scope for honest device timings)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def scope(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name}: total {tot*1e3:.1f} ms over {n} calls "
                         f"({tot/n*1e3:.2f} ms/call)")
        return "\n".join(lines)
