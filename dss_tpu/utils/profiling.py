"""Tracing and latency bookkeeping.

Parity target + upgrade: the reference's only tracing is the ``received_at``
wall-clock stamp at ingest and the ``previous_frames`` counter
(local/units.py:34-35, 89) — both kept as message-contract fields in
dss_tpu.runtime.messages.  This module adds the TPU-native layer on top:
``jax.profiler`` trace capture around any code region and a lightweight
per-stage latency recorder the runtime units feed.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, List

import numpy as np

logger = logging.getLogger("dss_tpu.profiling")


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (TensorBoard-viewable) for the region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"jax profiler trace written to {log_dir}")


class StageTimer:
    """Accumulates per-stage wall-clock latencies; reports percentiles."""

    def __init__(self):
        self._samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples[name].append((time.perf_counter() - t0) * 1000.0)

    def record(self, name: str, millis: float) -> None:
        self._samples[name].append(millis)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self._samples.items():
            arr = np.asarray(xs)
            out[name] = {
                "count": int(arr.size),
                "p50_ms": float(np.percentile(arr, 50)),
                "p95_ms": float(np.percentile(arr, 95)),
                "mean_ms": float(arr.mean()),
            }
        return out

    def log_summary(self) -> None:
        for name, stats in sorted(self.summary().items()):
            logger.info(
                f"stage {name}: n={stats['count']} p50={stats['p50_ms']:.2f}ms "
                f"p95={stats['p95_ms']:.2f}ms"
            )
