"""FPS meter (reference infer_server/src/meter.rs).

Counts items delivered to stream viewers (per-viewer deliveries, matching
the reference's semantics, reference endpoints.rs:35-38,60-63) and — as an
addition flagged in SURVEY.md section 7 — unique inferred/raw frames, plus
inference-latency aggregates. A logger task drains and logs every
``period_s`` seconds (reference meter.rs:41-64: 2 s).
"""

from __future__ import annotations

import asyncio
import itertools
import logging
import time

log = logging.getLogger("infercam.meter")


class Meter:
    def __init__(self) -> None:
        self.raw_delivered = 0
        self.inferred_delivered = 0
        self.raw_unique = 0
        self.inferred_unique = 0
        self.dropped = 0
        self.batches = 0
        self.batched_frames = 0
        self._lat_sum = 0.0
        self._lat_samples: list[float] = []

    # per-viewer deliveries (reference parity)
    def tick_raw(self) -> None:
        self.raw_delivered += 1

    def tick_inferred(self) -> None:
        self.inferred_delivered += 1

    # per-unique-frame counters (new capability)
    def tick_raw_unique(self) -> None:
        self.raw_unique += 1

    def tick_inferred_unique(self, n: int = 1) -> None:
        self.inferred_unique += n

    def tick_dropped(self, n: int = 1) -> None:
        self.dropped += n

    def tick_batch(self, batch_size: int, latency_s: float) -> None:
        self.batches += 1
        self.batched_frames += batch_size
        self._lat_sum += latency_s
        self._lat_samples.append(latency_s)

    def drain(self) -> dict:
        lat = sorted(self._lat_samples)
        snap = {
            "raw_fps_delivered": self.raw_delivered,
            "inferred_fps_delivered": self.inferred_delivered,
            "raw_unique": self.raw_unique,
            "inferred_unique": self.inferred_unique,
            "dropped": self.dropped,
            "batches": self.batches,
            "mean_batch": (self.batched_frames / self.batches
                           if self.batches else 0.0),
            "p50_batch_latency_ms": (
                lat[len(lat) // 2] * 1e3 if lat else 0.0),
        }
        self.__init__()
        return snap


METER = Meter()


async def meter_logger(period_s: float = 2.0, meter: Meter = METER):
    """Log FPS every period (reference meter.rs:41-64)."""
    for _ in itertools.count():
        start = time.monotonic()
        await asyncio.sleep(period_s)
        elapsed = time.monotonic() - start
        snap = meter.drain()
        raw = snap["raw_fps_delivered"] / elapsed
        inf = snap["inferred_fps_delivered"] / elapsed
        if snap["raw_fps_delivered"]:
            log.info("Raw frames per second: %.2f", raw)
        if snap["inferred_fps_delivered"]:
            log.info(
                "Infered frames per second: %.2f "
                "(unique %.2f, mean batch %.1f, p50 device %.1f ms, "
                "dropped %d)",
                inf, snap["inferred_unique"] / elapsed,
                snap["mean_batch"], snap["p50_batch_latency_ms"],
                snap["dropped"])
            from infercam_onnx_tpu.utils.profiling import STAGES

            stages = STAGES.format_drain()
            if stages:
                log.info("Stage latency: %s", stages)
