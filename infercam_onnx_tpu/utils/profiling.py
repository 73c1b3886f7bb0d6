"""Tracing and per-stage latency instrumentation.

The reference has no tracing/profiling at all (SURVEY.md section 5:
env_logger only). This subsystem adds:

- ``StageTimer``: cheap per-stage latency histograms (decode / device /
  draw / encode / ...) with p50/p95/p99 summaries, reported by the meter
  logger every period;
- ``device_trace``: a context manager around ``jax.profiler`` so a
  serving window can be captured for TensorBoard/XProf
  (``python -m infercam_onnx_tpu.serve --profile-dir /tmp/trace``).
"""

from __future__ import annotations

import contextlib
import random
import threading
import time
from collections import defaultdict


class StageTimer:
    """Records wall-clock samples per named stage; drainable summaries."""

    def __init__(self, max_samples_per_stage: int = 4096):
        self._samples: dict[str, list[float]] = defaultdict(list)
        self._totals: dict[str, float] = defaultdict(float)
        self._counts: dict[str, int] = defaultdict(int)
        self._lock = threading.Lock()
        self._max = max_samples_per_stage
        self._rng = random.Random(0)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(name, time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        with self._lock:
            # reservoir sample: keep a uniform subset over the WHOLE
            # period (keeping only the first N made a mid-period
            # latency regression invisible), exact count/total always
            self._counts[name] += 1
            self._totals[name] += seconds
            samples = self._samples[name]
            if len(samples) < self._max:
                samples.append(seconds)
            else:
                j = self._rng.randrange(self._counts[name])
                if j < self._max:
                    samples[j] = seconds

    def drain(self) -> dict[str, dict[str, float]]:
        """{stage: {count, p50_ms, p95_ms, p99_ms, total_ms}} and reset."""
        with self._lock:
            out = {}
            for name, samples in self._samples.items():
                if not samples:
                    continue
                s = sorted(samples)
                n = len(s)
                out[name] = {
                    "count": self._counts[name],
                    "p50_ms": s[n // 2] * 1e3,
                    "p95_ms": s[min(n - 1, int(n * 0.95))] * 1e3,
                    "p99_ms": s[min(n - 1, int(n * 0.99))] * 1e3,
                    "total_ms": self._totals[name] * 1e3,
                }
            self._samples.clear()
            self._counts.clear()
            self._totals.clear()
            return out

    def format_drain(self) -> str:
        parts = []
        for name, stats in sorted(self.drain().items()):
            parts.append(
                f"{name} p50 {stats['p50_ms']:.1f}ms "
                f"p95 {stats['p95_ms']:.1f}ms x{stats['count']}")
        return "; ".join(parts)


STAGES = StageTimer()


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """Capture a jax.profiler trace into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
