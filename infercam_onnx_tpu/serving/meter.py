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
        # cumulative totals + last drained window, served by /stats
        # (not reset by drain; new capability over the reference's
        # log-only meter)
        self.totals: dict[str, float] = {}
        self.last_window: dict = {}
        self.last_stages: dict = {}
        self.started_at = time.time()

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
        for key in ("raw_fps_delivered", "inferred_fps_delivered",
                    "raw_unique", "inferred_unique", "dropped", "batches"):
            self.totals[key] = self.totals.get(key, 0) + snap[key]
        totals, window, stages, started = (
            self.totals, self.last_window, self.last_stages,
            self.started_at)
        self.raw_delivered = 0
        self.inferred_delivered = 0
        self.raw_unique = 0
        self.inferred_unique = 0
        self.dropped = 0
        self.batches = 0
        self.batched_frames = 0
        self._lat_sum = 0.0
        self._lat_samples = []
        self.totals, self.last_window, self.last_stages = (
            totals, window, stages)
        self.started_at = started
        return snap

    def stats(self) -> dict:
        """Cumulative + last-window stats for the /stats endpoint."""
        return {
            "uptime_s": round(time.time() - self.started_at, 1),
            "totals": dict(self.totals),
            "window": dict(self.last_window),
            "stages": dict(self.last_stages),
        }

    def prometheus(self) -> str:
        """Prometheus text exposition of the same counters (for
        standard scrape-based monitoring; /metrics endpoint)."""
        s = self.stats()
        lines = [
            "# TYPE infercam_uptime_seconds gauge",
            f"infercam_uptime_seconds {s['uptime_s']}",
        ]
        for key, val in sorted(s["totals"].items()):
            name = f"infercam_{key}_total"
            lines.append(f"# TYPE {name} counter")
            lines.append(f"{name} {val}")
        window = s["window"]
        for key in ("raw_fps", "inferred_fps", "mean_batch",
                    "p50_batch_latency_ms"):
            if key in window:
                name = f"infercam_window_{key}"
                lines.append(f"# TYPE {name} gauge")
                lines.append(f"{name} {window[key]}")
        for stage, st in sorted(s["stages"].items()):
            for q in ("p50_ms", "p95_ms", "p99_ms"):
                name = f"infercam_stage_{stage}_{q}"
                lines.append(f"# TYPE {name} gauge")
                lines.append(f"{name} {st[q]}")
        return "\n".join(lines) + "\n"


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
        meter.last_window = {
            **snap,
            "raw_fps": round(raw, 2),
            "inferred_fps": round(inf, 2),
            "window_s": round(elapsed, 2),
        }
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

            stage_stats = STAGES.drain()
            meter.last_stages = stage_stats
            if stage_stats:
                log.info("Stage latency: %s", "; ".join(
                    f"{name} p50 {s['p50_ms']:.1f}ms "
                    f"p95 {s['p95_ms']:.1f}ms x{s['count']}"
                    for name, s in sorted(stage_stats.items())))
