"""Configuration for the whole framework.

The reference hard-codes most of its knobs as compile-time constants
(channel capacities reference infer_server/src/lib.rs:23,29,37; JPEG quality
95 reference inferer.rs:39; router refresh batch of 4 reference router.rs:52;
assumed frame dims 1280x720 reference router.rs:66-67; model variant and
thresholds reference inferer.rs:23). Here they are promoted to real,
documented configuration with the reference values as defaults.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Detection model + post-processing configuration.

    Defaults mirror the reference serve-time setup
    (reference inferer.rs:23: W320H240, max_iou=0.5, min_confidence=0.5).
    """

    variant: str = "RFB-320"  # "RFB-320" (320x240) or "RFB-640" (640x480)
    max_iou: float = 0.5
    min_confidence: float = 0.5
    # Fixed-shape postprocessing sizes (TPU programs need static shapes).
    # `top_k` candidates enter NMS; `max_detections` boxes come out.
    top_k: int = 256
    max_detections: int = 64
    # Compute dtype for the conv trunk. bfloat16 feeds the MXU at full rate;
    # float32 is used by parity tests.
    compute_dtype: str = "bfloat16"


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Micro-batching inference engine configuration."""

    # Batch-size buckets: a batch of N frames runs with the smallest bucket
    # >= N (padded). Bounds XLA recompilation (one executable per bucket).
    batch_buckets: Sequence[int] = (1, 2, 4, 8, 16)
    # Bounded device work queue; frames are DROPPED when full, mirroring the
    # reference's try_send_ref backpressure (reference router.rs:65,
    # infer-channel cap 10, reference lib.rs:37).
    queue_capacity: int = 10
    # Max time to wait for more frames before dispatching a partial batch.
    batch_window_ms: float = 4.0
    # Coalesce to the newest frame per stream within a gather window
    # (True = reference-like freshest-frame-wins degradation). False
    # processes EVERY queued frame — multiple frames per stream ride one
    # batch, so N streams can be served losslessly whenever throughput
    # suffices (overload still drops at the bounded queue).
    coalesce_streams: bool = True
    # Decode incoming JPEGs at 1/decode_scale resolution (libjpeg IDCT
    # scaling) before inference. 2 turns 640x480 streams directly into the
    # 320x240 model input — 4x less host decode work and host->device
    # traffic. NOTE: annotated /face_stream output is then at the scaled
    # resolution (the reference always decodes full frames; set 1 for
    # exact output parity).
    decode_scale: int = 1
    # "pixels": host JPEG decode feeds uint8 frames to the device.
    # "coefficients": for detection-only consumers (/detections viewers
    # with no /face_stream viewer) the host does entropy decoding only
    # and dequant+IDCT+color run fused on the device (BASELINE config 4).
    # "ycbcr": detection-only consumers get the transfer-optimal split —
    # host entropy+IDCT, device chroma-upsample+color+detect over ONE
    # packed uint8 buffer (~half the bytes of RGB for 4:2:0; the bench
    # headline path).
    decode_mode: str = "pixels"
    # Annotated /face_stream rendering. "device": boxes + labels are
    # rendered into the frame ON the TPU inside the fused detection
    # program, the forward DCT + quantization run as MXU matmuls, and
    # the host performs JPEG entropy coding only (the encode mirror of
    # the ycbcr decode split — ops/jpeg_encode_device.py). "host":
    # reference-style host pixel draw + full host JPEG encode
    # (reference inferer.rs:37-39). Device mode needs the native shim;
    # the worker falls back to host mode (with a log line) when the
    # shim or the stream geometry can't support it.
    annotate_mode: str = "device"
    # Static per-frame budget of overlay-touched 8x8 blocks the splice
    # annotate path (coefficients decode mode) ships back; frames whose
    # overlay touches more blocks fall back to host annotation.
    annotate_splice_blocks: int = 768
    # Link-adaptive transfer-path selection (serving/link.py): probe
    # host->device bandwidth at startup (after the warm-up latch trip)
    # and re-route the transfer-hungry coefficients decode mode onto
    # packed-YCbCr when the link is degraded — the splice transcode
    # collapses below the host fallback on a slow link
    # (docs/PERFORMANCE.md). The decision is exposed in /stats.
    link_adaptive: bool = True
    # H2D bandwidth (MB/s) at or above which the link counts as healthy
    # (bench.py's slow-link threshold; healthy tunnels measure ~1500).
    link_healthy_h2d_mbps: float = 250.0
    # Re-probe the link every N seconds and re-apply the policy (0 =
    # probe once at startup only). Each probe costs <1 s on the device
    # executor between batches; recovery restores the configured path.
    link_probe_period_s: float = 0.0
    # H2D bandwidth (MB/s) below which device-annotated output re-routes
    # to the reference-style host draw path. The device annotate tail
    # stays faster than host annotation deep into degraded territory
    # (measured 69.9 vs 55.5 fps at 38 MB/s, 97.3 vs 58.4 at 47 —
    # docs/PERFORMANCE.md), so this floor only covers collapse-grade
    # links where the coefficient readback dominates everything.
    link_annotate_floor_mbps: float = 10.0
    # Measured crossover for the tiled upload route (two same-day
    # round-5 bench windows, docs/PERFORMANCE.md): per-frame chunked
    # uploads won at 30 MB/s (20.6 vs 13.8 fps) and a single stacked
    # copy already won at 49 MB/s (40.9 vs 37.3) — the flip sits
    # between, so only links below this go "rows" under "auto".
    link_tiled_rows_below_mbps: float = 40.0
    # Measure the tiled upload route directly: each link probe also
    # times BOTH routes with the canonical tiled geometry (~12 MB,
    # <0.5 s; serving/link.py probe_tiled_route_ms) and "auto" picks
    # the measured winner. Round-5 bench windows proved bandwidth alone
    # cannot predict the winner (rows won at 30 AND 61-72 MB/s probes,
    # stacked at 49 — the fixed per-transfer cost drifts independently
    # of bulk bandwidth). False = threshold fallback
    # (link_tiled_rows_below_mbps).
    link_tiled_ab_probe: bool = True
    # Tie band for the A/B decision, as a fraction of the slower
    # route's time: when the two measured routes are within this
    # margin, prefer "stacked" instead of the raw winner. Evidence
    # (docs/PERFORMANCE.md, fifth round-5 window): a 5.8% A/B gap
    # picked rows but stacked won the full window by ~3% — gaps that
    # small are inside the tunnel's minute-scale noise, while every
    # correctly-routed window had a gap >= 25%. Worst case of the tie
    # rule is bounded by the band itself. 0 disables (raw winner).
    link_tiled_ab_tie_pct: float = 10.0
    # Upload route for tiled high-res packed-plane batches on a single
    # chip. "stacked": one large device_put of the stacked batch (fewer
    # transfer calls; best on healthy DMA links). "rows": per-frame
    # async device_puts issued back-to-back, stacked ON device (
    # amortizes a tunnel's fixed per-transfer cost; best on degraded
    # links — CLAUDE.md cost model). "auto": link-adaptive — the probe
    # picks rows when degraded, stacked when healthy (rows until the
    # first probe). Meshed/lockstep detectors always use their own
    # stacked dispatch.
    tiled_upload: str = "auto"
    # Tiled high-res detection (BASELINE config 5): frames with at least
    # this many pixels (post-decode) run through the overlapping tile grid
    # with cross-tile NMS merge instead of a single squashed resize.
    # 0 disables tiling.
    tile_min_pixels: int = 0
    tile_grid: tuple[int, int] = (2, 2)
    tile_overlap: float = 0.2


@dataclasses.dataclass(frozen=True)
class ServerConfig:
    """Serving tier configuration (TCP ingest + HTTP MJPEG)."""

    http_address: str = "127.0.0.1:3000"  # reference infer_server.rs:20-23
    socket_address: str = "127.0.0.1:3001"  # reference infer_server.rs:25-28
    # Ingest channel capacity (reference lib.rs:23: StaticChannel<_, 200>).
    ingest_capacity: int = 200
    # Broadcast ring-buffer capacity per subscriber (reference lib.rs:28-30).
    broadcast_capacity: int = 20
    # Frames processed per router subscriber-map refresh (reference
    # router.rs:52).
    router_refresh_every: int = 4
    # Output JPEG encoding (reference inferer.rs:39: quality 95, 4:2:0).
    jpeg_quality: int = 95
    jpeg_subsampling: str = "420"
    # FPS meter log period in seconds (reference meter.rs:46).
    meter_period_s: float = 2.0
    # The reference assumes all senders stream 1280x720 (reference
    # router.rs:66-67) and scales relative bbox coords by that even when the
    # decoded frame differs. We use true decoded dimensions instead
    # (documented divergence, SURVEY.md section 7 "quirks": strictly better).
    assume_frame_dims: tuple[int, int] | None = None
    # Self-recycle (re-exec) the server process when its RSS exceeds this
    # many MiB (0 = disabled). Production mitigation for leaky runtime
    # dependencies — e.g. this rig's TPU-tunnel client leaks every
    # host->device staging buffer natively. Clients reconnect per the
    # 3 s-backoff contract (reference socket_sender.rs:53-59), so a
    # recycle looks like a brief server restart.
    max_rss_mb: int = 0
    # How often the RSS watchdog samples, in seconds.
    rss_check_period_s: float = 10.0


@dataclasses.dataclass(frozen=True)
class ClientConfig:
    """Edge sender configuration (reference socket_sender.rs:14-22)."""

    address: str = "127.0.0.1:3001"
    channel: str = "simon"
    reconnect_backoff_s: float = 3.0  # reference socket_sender.rs:58
    camera_device: str = "/dev/video0"  # reference sensors.rs:15


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Multi-chip scale-out configuration."""

    # Name of the data-parallel mesh axis (batch dim sharded over it).
    data_axis: str = "data"
    # High-res tiled detection: tile grid (cols x rows) for e.g. 1080p.
    tile_grid: tuple[int, int] = (2, 2)
    # Fractional overlap between adjacent tiles so faces on seams are seen
    # whole by at least one tile.
    tile_overlap: float = 0.2
