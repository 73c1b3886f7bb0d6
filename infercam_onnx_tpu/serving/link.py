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


def probe_tiled_route_ms(frames: int = 4, mb_per_frame: float = 0.78,
                         trials: int = 2) -> tuple[float, float]:
    """Measure BOTH tiled upload routes directly; returns
    (stacked_ms, rows_ms) per batch, best-of-``trials`` each,
    interleaved so link drift mid-probe cannot bias one route.

    Why measured instead of a bandwidth threshold: three round-5 bench
    windows proved the rows/stacked winner is NOT monotonic in probed
    bandwidth — rows won at 30 MB/s (20.6 vs 13.8 fps) AND at a 61-72
    MB/s probe (35.3 vs 21.0), while stacked won at 49 (40.9 vs 37.3)
    — because the tunnel's fixed per-transfer cost drifts
    independently of bulk bandwidth (CLAUDE.md cost model). So "auto"
    times the two routes with the canonical tiled geometry (batch 4 ×
    ~0.78 MB packed 4:2:0 planes of a 960×540 scaled 1080p frame,
    matching bench.py/serving defaults) and picks the faster. The
    transfer patterns mirror serving/inferer.py exactly: one stacked
    ``device_put`` of the whole batch vs per-frame async puts blocked
    together. Costs ~12 MB of transfer (<0.5 s on the worst observed
    link state).
    """
    import jax
    import numpy as np

    per = np.zeros((int(mb_per_frame * 1024 * 1024),), np.uint8)
    whole = np.zeros((frames, per.size), np.uint8)
    stacked = rows = float("inf")
    for _ in range(max(1, trials)):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(whole))
        stacked = min(stacked, time.perf_counter() - t0)
        t0 = time.perf_counter()
        bufs = [jax.device_put(per) for _ in range(frames)]
        jax.block_until_ready(bufs)
        rows = min(rows, time.perf_counter() - t0)
    return stacked * 1e3, rows * 1e3


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
                       rows_below_mbps: float,
                       ab_ms: tuple[float, float] | None = None,
                       tie_pct: float = 10.0) -> tuple[str, str]:
    """Upload route for tiled high-res packed-plane batches on a
    single chip; returns (route, why) where route is "rows" or
    "stacked".

    "stacked" ships the whole batch in ONE device_put — fewest
    transfer calls, best when DMA bandwidth dominates. "rows" issues
    per-frame async device_puts back-to-back and stacks on device —
    amortizes a degraded tunnel's fixed per-transfer cost (CLAUDE.md
    cost model: back-to-back async puts ~15 ms/1.8 MB vs ~25 ms fixed
    each sync). When ``ab_ms`` (stacked_ms, rows_ms) from
    ``probe_tiled_route_ms`` is available, "auto" picks the MEASURED
    winner — round-5 bench windows proved bandwidth alone cannot
    predict it (rows won at 30 and 61-72 MB/s probes, stacked at 49:
    the fixed per-transfer cost drifts independently). Without an A/B
    measurement (probe disabled, or a bandwidth-only probe injected),
    the historical crossover threshold ``rows_below_mbps`` (default
    40) is the fallback. An explicit configuration always wins.
    """
    if configured in ("rows", "stacked"):
        return configured, "configured route kept"
    if ab_ms is not None:
        stacked_ms, rows_ms = ab_ms
        # near-tie band: gaps inside the tunnel's minute-scale noise
        # (the one observed A/B miss had a 5.8% gap; every correct
        # call had >= 25%) default to stacked — fewer transfer calls,
        # and the route the full window favored in that miss
        gap = abs(stacked_ms - rows_ms) / max(stacked_ms, rows_ms, 1e-9)
        if gap * 100.0 < tie_pct:
            return "stacked", (
                f"measured A/B within the {tie_pct:.0f}% tie band "
                f"(stacked {stacked_ms:.1f} vs rows {rows_ms:.1f} ms "
                "per batch — inside link noise): one large copy by "
                "default")
        if rows_ms < stacked_ms:
            return "rows", (
                f"measured A/B: rows {rows_ms:.1f} ms vs stacked "
                f"{stacked_ms:.1f} ms per batch — chunked per-frame "
                "async uploads win on this link state")
        return "stacked", (
            f"measured A/B: stacked {stacked_ms:.1f} ms vs rows "
            f"{rows_ms:.1f} ms per batch — one large copy wins on "
            "this link state")
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


def decide(engine_config, h2d_mbps: float,
           tiled_ab_ms: tuple[float, float] | None = None) -> dict:
    """Full decision table for one probe: every transfer-sensitive
    serving choice, each entry {configured, effective, why}. This is
    what /stats exposes under link.decisions. ``tiled_ab_ms`` is the
    optional (stacked_ms, rows_ms) A/B measurement from
    ``probe_tiled_route_ms``; without it the tiled route falls back to
    the bandwidth-crossover threshold."""
    healthy = engine_config.link_healthy_h2d_mbps
    mode, mode_why = decide_decode_mode(
        engine_config.decode_mode, h2d_mbps, healthy)
    route, route_why = decide_tiled_route(
        engine_config.tiled_upload, h2d_mbps,
        engine_config.link_tiled_rows_below_mbps, ab_ms=tiled_ab_ms,
        tie_pct=getattr(engine_config, "link_tiled_ab_tie_pct", 10.0))
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
