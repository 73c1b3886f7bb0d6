"""Host->device link probing + adaptive transfer-path selection.

The transfer-heaviest serving path (the splice transcode: coefficients
decode mode + device annotate) ships full-resolution coefficient planes
up for every frame. On a healthy link it is the fastest AND the only
bit-exact-outside-overlay path; on a degraded link (observed on this
rig's TPU tunnel: ~45 MB/s vs ~1.5 GB/s healthy) it collapses below
the host-annotate fallback (docs/PERFORMANCE.md "splice caveat": 1.3
vs 8.1 fps observed).

bench.py has always probed the link and re-planned its sampling around
this; this module gives the *server* the same sense: probe H2D at
startup (and optionally on a timer) and (re-)select EVERY
transfer-sensitive serving choice:

- decode mode: degraded links re-route "coefficients" onto the
  packed-YCbCr path (~half the upload bytes, scaled-decode capable —
  the measured-best degraded-link path, BENCH_r03:
  annotated-device-ycbcr 97.3 fps vs host 58.4 on a 47 MB/s link);
- tiled upload route: stacked single-copy uploads vs per-frame
  chunked async uploads that amortize a tunnel's fixed per-transfer
  cost, split at a MEASURED crossover (~40 MB/s; decide_tiled_route);
- annotate mode: device-annotated output falls back to the host draw
  path only on collapse-grade links (decide_annotate_mode).

Every configured choice is re-evaluated on each probe, so a recovered
link gets its configured paths back; /stats exposes the full decision
table under link.decisions.

The reference has no equivalent (its single fixed path is
reference infer_server/src/inferer.rs:23); this is a TPU-first
capability driven by the tunnel/ICI cost model, disable with
``--link-adaptive off``.
"""

from __future__ import annotations

import logging
import time

log = logging.getLogger("infercam.link")


def probe_h2d_mbps(size_mb: float = 4.0, trials: int = 3) -> float:
    """Measured host->device bandwidth in MB/s (best of ``trials``).

    Same probe bench.py keys its sampling plan on: a synchronous
    ``device_put`` of a few MB, best-of-N so a one-off tunnel hiccup
    doesn't misclassify the link. Costs <1 s on any link state.
    """
    import jax
    import numpy as np

    probe = np.zeros((int(size_mb * 1024 * 1024),), np.uint8)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(probe))
        best = min(best, time.perf_counter() - t0)
    return size_mb / best


def decide_decode_mode(configured_mode: str, h2d_mbps: float,
                       healthy_mbps: float) -> tuple[str, str]:
    """Effective decode mode for a measured link; returns (mode, why).

    Only the coefficients mode is re-routed: its uploads are full-res
    12-bit coefficient planes that cannot ride the scaled decode, and
    its annotate tail (the splice transcode) is the documented
    degraded-link collapse. "pixels" (the reference-parity default)
    and "ycbcr" are left exactly as configured.
    """
    if configured_mode != "coefficients":
        return configured_mode, "configured path kept"
    if h2d_mbps >= healthy_mbps:
        return configured_mode, (
            f"link healthy ({h2d_mbps:.0f} >= {healthy_mbps:.0f} MB/s)")
    return "ycbcr", (
        f"H2D degraded ({h2d_mbps:.0f} < {healthy_mbps:.0f} MB/s): "
        "full-res coefficient uploads would collapse; re-routed to "
        "packed-YCbCr transfers until a probe sees recovery")


def decide_tiled_route(configured: str, h2d_mbps: float,
                       rows_below_mbps: float) -> tuple[str, str]:
    """Upload route for tiled high-res packed-plane batches on a
    single chip; returns (route, why) where route is "rows" or
    "stacked".

    "stacked" ships the whole batch in ONE device_put — fewest
    transfer calls, best when DMA bandwidth dominates. "rows" issues
    per-frame async device_puts back-to-back and stacks on device —
    amortizes a degraded tunnel's fixed per-transfer cost (CLAUDE.md
    cost model: back-to-back async puts ~15 ms/1.8 MB vs ~25 ms fixed
    each sync). The crossover is MEASURED, not the generic healthy
    threshold: two same-day round-5 bench windows put it between 30
    MB/s (rows won, 20.6 vs 13.8 fps) and 49 MB/s (stacked won, 40.9
    vs 37.3 — docs/PERFORMANCE.md), so "auto" picks rows only below
    ``rows_below_mbps`` (default 40). An explicit configuration wins.
    """
    if configured in ("rows", "stacked"):
        return configured, "configured route kept"
    if h2d_mbps >= rows_below_mbps:
        return "stacked", (
            f"link at/above the measured crossover ({h2d_mbps:.0f} >= "
            f"{rows_below_mbps:.0f} MB/s): one large copy beats "
            "per-frame transfer overhead")
    return "rows", (
        f"H2D below the measured crossover ({h2d_mbps:.0f} < "
        f"{rows_below_mbps:.0f} MB/s): chunked per-frame async uploads "
        "amortize the fixed per-transfer cost")


def decide_annotate_mode(configured: str, h2d_mbps: float,
                         floor_mbps: float) -> tuple[str, str]:
    """Annotated-output rendering for a measured link; returns
    (mode, why) where mode is "device" or "host".

    The device annotate tail (overlay + FDCT/quant on the TPU, host
    entropy-codes) stays faster than the reference-style host draw
    deep into degraded territory (measured 69.9 vs 55.5 fps at
    38 MB/s; 97.3 vs 58.4 at 47 — docs/PERFORMANCE.md), so only
    collapse-grade links below ``floor_mbps`` re-route to host.
    """
    if configured != "device":
        return configured, "configured mode kept"
    if h2d_mbps >= floor_mbps:
        return "device", (
            f"device annotate kept ({h2d_mbps:.0f} >= floor "
            f"{floor_mbps:.0f} MB/s; measured faster than host down "
            "to ~38 MB/s)")
    return "host", (
        f"H2D collapsed ({h2d_mbps:.0f} < floor {floor_mbps:.0f} "
        "MB/s): coefficient readback would dominate; host draw until "
        "a probe sees recovery")


def decide(engine_config, h2d_mbps: float) -> dict:
    """Full decision table for one probe: every transfer-sensitive
    serving choice, each entry {configured, effective, why}. This is
    what /stats exposes under link.decisions."""
    healthy = engine_config.link_healthy_h2d_mbps
    mode, mode_why = decide_decode_mode(
        engine_config.decode_mode, h2d_mbps, healthy)
    route, route_why = decide_tiled_route(
        engine_config.tiled_upload, h2d_mbps,
        engine_config.link_tiled_rows_below_mbps)
    annot, annot_why = decide_annotate_mode(
        engine_config.annotate_mode, h2d_mbps,
        engine_config.link_annotate_floor_mbps)
    return {
        "decode_mode": {"configured": engine_config.decode_mode,
                        "effective": mode, "why": mode_why},
        "tiled_upload": {"configured": engine_config.tiled_upload,
                         "effective": route, "why": route_why},
        "annotate_mode": {"configured": engine_config.annotate_mode,
                          "effective": annot, "why": annot_why},
    }
