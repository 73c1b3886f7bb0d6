"""Inference server CLI (reference infer_server binary).

Usage::

    python -m infercam_onnx_tpu.serve \
        [--server-address 127.0.0.1:3000] [--socket-address 127.0.0.1:3001] \
        [--preset reference|throughput|lossless|latency] \
        [--variant RFB-320|RFB-640|slim-320|slim-640] \
        [--min-confidence 0.5] [--max-iou 0.5] [--top-k 256] \
        [--max-detections 64] [--max-batch 16] [--batch-window-ms 4] \
        [--queue-capacity 10] [--no-coalesce] \
        [--warmup 640x480,1280x720] [--warmup-sync] \
        [--decode-scale 1|2|4|8] \
        [--decode-mode pixels|coefficients|ycbcr] [--annotate device|host] \
        [--tile-min-pixels N] \
        [--link-adaptive on|off] [--link-healthy-mbps 250] \
        [--link-probe-period 0] \
        [--tile-grid 2x2] [--assume-frame-dims 1280x720] \
        [--data-parallel auto|on|off] [--max-rss-mb N] \
        [--onnx model.onnx [--runtime native|graph]] \
        [--profile-dir DIR] [--distributed host:port,...]

Flag names mirror the reference (reference
infer_server/src/bin/infer_server.rs:18-28) with the compile-time
constants promoted to flags (SURVEY.md section 5 'config').
"""

from __future__ import annotations

import argparse
import asyncio
import logging
import sys


# Named flag bundles (any explicitly-passed flag wins over the preset).
# "reference": the CLI defaults already mirror the reference's serve-time
# configuration. "throughput": the measured-best 16-stream setup
# (docs/PERFORMANCE.md). "lossless": process every frame, multiple
# frames per stream riding one batch.
PRESETS: dict[str, dict] = {
    "reference": {},
    "throughput": dict(decode_mode="ycbcr", decode_scale=2,
                       queue_capacity=48, max_batch=16,
                       batch_window_ms=6.0, warmup_async=True,
                       warmup="640x480"),
    "lossless": dict(decode_mode="ycbcr", decode_scale=2,
                     queue_capacity=96, max_batch=32,
                     batch_window_ms=15.0, no_coalesce=True,
                     warmup_async=True, warmup="640x480"),
    # cut-through single-stream latency: no batch window (dispatch the
    # moment a frame arrives), tiny bucket ladder (bucket-1 fast path),
    # full-res decode, shallow queue so a burst can't build a backlog
    "latency": dict(decode_mode="ycbcr", decode_scale=1,
                    queue_capacity=4, max_batch=2,
                    batch_window_ms=0.0, warmup="640x480"),
}


def bucket_ladder(max_batch: int) -> list[int]:
    """Doubling batch-size ladder capped at ``max_batch`` (a non-power-
    of-two cap must never dispatch a larger padded batch than asked)."""
    buckets = [1]
    while buckets[-1] < max_batch:
        buckets.append(min(buckets[-1] * 2, max_batch))
    return buckets


def main(argv: list[str] | None = None) -> int:
    # allow_abbrev=False: the preset machinery detects explicitly
    # passed flags by token name; an abbreviated --max-b would parse
    # but evade detection and be silently preset-overridden
    ap = argparse.ArgumentParser(description=__doc__,
                                 allow_abbrev=False)
    ap.add_argument("--server-address", default="127.0.0.1:3000",
                    help="HTTP address (default %(default)s)")
    ap.add_argument("--socket-address", default="127.0.0.1:3001",
                    help="TCP ingest address (default %(default)s)")
    ap.add_argument("--variant", default="RFB-320",
                    choices=["RFB-320", "RFB-640", "slim-320", "slim-640"])
    ap.add_argument("--min-confidence", type=float, default=0.5)
    ap.add_argument("--max-iou", type=float, default=0.5)
    ap.add_argument("--top-k", type=int, default=256)
    ap.add_argument("--max-detections", type=int, default=64)
    ap.add_argument("--batch-window-ms", type=float, default=4.0)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--queue-capacity", type=int, default=10,
                    help="bounded infer queue; frames drop when full "
                         "(reference cap 10, lib.rs:37). Raise to >= "
                         "max-batch for full batches under load")
    ap.add_argument("--max-rss-mb", type=int, default=0,
                    help="self-recycle the server when RSS exceeds "
                         "this many MiB (0 = off) — mitigation for "
                         "leaky runtime deps; clients reconnect. "
                         "Standalone servers re-exec in place; a "
                         "lockstep member instead exits with code 17 "
                         "so the cluster supervisor "
                         "(tools/cluster_launch.py) re-forms the whole "
                         "cluster (see docs/OPERATIONS.md)")
    ap.add_argument("--rss-check-period", type=float, default=10.0,
                    help="seconds between RSS watchdog checks "
                         "(default 10)")
    ap.add_argument("--no-coalesce", action="store_true",
                    help="process EVERY queued frame instead of "
                         "keeping only the newest per stream: several "
                         "frames of one stream may share a batch "
                         "(lossless serving when throughput suffices)")
    ap.add_argument("--warmup", default="",
                    help="comma-separated WxH input resolutions to "
                         "pre-compile, e.g. 640x480,1280x720")
    ap.add_argument("--warmup-async", dest="warmup_async",
                    action="store_true", default=True,
                    help="open listeners immediately and warm the "
                         "device in the background (the default: raw "
                         "streams flow at once, inference when warm — "
                         "matches the reference, whose HTTP listener "
                         "never waits for model load, "
                         "infer_server.rs:48-68; on this rig's tunnel "
                         "the warm-up latch read alone can stall "
                         "minutes, during which a sync server answers "
                         "nothing, not even /healthcheck)")
    ap.add_argument("--warmup-sync", dest="warmup_async",
                    action="store_false",
                    help="block the listeners until device warm-up "
                         "(latch-trip read, link probe, program "
                         "compiles) completes; /healthcheck then "
                         "implies fully warm")
    ap.add_argument("--decode-mode", default="pixels",
                    choices=["pixels", "coefficients", "ycbcr"],
                    help="coefficients: detection-only frames skip host "
                         "pixel decode (device IDCT tail); ycbcr: host "
                         "entropy+IDCT only, packed-plane transfer "
                         "(~half the bytes, the bench headline path)")
    ap.add_argument("--decode-scale", type=int, default=1,
                    choices=[1, 2, 4, 8],
                    help="decode incoming JPEGs at 1/N resolution "
                         "(fast path; annotated output is then scaled)")
    ap.add_argument("--annotate", default="device",
                    choices=["device", "host"],
                    help="device: /face_stream overlays are rendered on "
                         "the TPU and the output JPEG's DCT+quantize "
                         "run there too (host does entropy coding "
                         "only; in coefficients decode mode this is "
                         "the splice transcode — only overlay-touched "
                         "blocks cross back and the output is "
                         "bit-exact to the input elsewhere); host: "
                         "reference-style host draw + full host encode")
    ap.add_argument("--annotate-splice-blocks", type=int, default=768,
                    help="splice transcode: per-frame budget of "
                         "overlay-touched 8x8 blocks shipped from the "
                         "device; frames exceeding it fall back to "
                         "host annotation")
    ap.add_argument("--link-adaptive", default="on",
                    choices=["on", "off"],
                    help="probe host->device bandwidth at startup (and "
                         "optionally on a timer, --link-probe-period) "
                         "and re-route the transfer-hungry coefficients "
                         "decode mode onto packed-YCbCr when the link "
                         "is degraded (the splice transcode collapses "
                         "on a slow link, docs/PERFORMANCE.md); the "
                         "decision shows in /stats 'link'. off = always "
                         "serve exactly the configured path")
    ap.add_argument("--link-healthy-mbps", type=float, default=250.0,
                    help="H2D bandwidth (MB/s) at or above which the "
                         "link counts as healthy")
    ap.add_argument("--link-probe-period", type=float, default=0.0,
                    help="re-probe the link every N seconds and "
                         "re-apply the policy (0 = startup only); "
                         "recovery restores the configured path")
    ap.add_argument("--link-annotate-floor-mbps", type=float,
                    default=10.0,
                    help="H2D bandwidth (MB/s) below which device-"
                         "annotated output re-routes to host drawing "
                         "(device annotate measured faster down to "
                         "~38 MB/s; the floor covers collapse-grade "
                         "links only)")
    ap.add_argument("--tiled-upload", default="auto",
                    choices=["auto", "rows", "stacked"],
                    help="upload route for tiled high-res batches on "
                         "one chip: stacked = one large copy (healthy "
                         "DMA links), rows = per-frame async puts "
                         "stacked on device (amortizes a degraded "
                         "tunnel's per-transfer cost), auto = probe-"
                         "driven")
    ap.add_argument("--link-tiled-crossover-mbps", type=float,
                    default=40.0,
                    help="fallback rows/stacked crossover for "
                         "--tiled-upload auto when the A/B probe is "
                         "off: links below this go rows (measured: "
                         "rows won at 30 MB/s, stacked at 49 — "
                         "docs/PERFORMANCE.md)")
    ap.add_argument("--link-tiled-ab", default="on",
                    choices=["on", "off"],
                    help="measure both tiled upload routes directly on "
                         "each link probe (~12 MB, <0.5 s) and let "
                         "--tiled-upload auto pick the measured winner "
                         "— bandwidth alone cannot predict it (rows "
                         "won at 30 AND 61-72 MB/s probes, stacked at "
                         "49; docs/PERFORMANCE.md). off = threshold "
                         "fallback (--link-tiled-crossover-mbps)")
    ap.add_argument("--link-tiled-ab-tie-pct", type=float, default=10.0,
                    help="A/B gaps below this percent are inside link "
                         "noise: pick stacked (fewer transfer calls) "
                         "instead of the raw winner — the one observed "
                         "A/B miss had a 5.8%% gap, every correct call "
                         ">= 25%% (docs/PERFORMANCE.md). 0 = raw winner")
    ap.add_argument("--profile-dir", default=None,
                    help="capture a jax.profiler trace into this dir")
    ap.add_argument("--tile-min-pixels", type=int, default=0,
                    help="tile frames with >= this many pixels through "
                         "the overlapping grid with cross-tile NMS merge "
                         "(0 disables; e.g. 1000000 for 1080p streams)")
    ap.add_argument("--tile-grid", default="2x2",
                    help="tile grid CxR for high-res frames")
    ap.add_argument("--assume-frame-dims", default=None,
                    help="scale bbox drawing by WxH instead of true "
                         "decoded dims (strict reference parity: the "
                         "reference hard-codes 1280x720, router.rs:66-67)")
    ap.add_argument("--data-parallel", default="auto",
                    choices=["auto", "on", "off"],
                    help="shard stream batches across all visible chips "
                         "(auto: when >1 device; on: require a mesh)")
    ap.add_argument("--onnx", default=None,
                    help="explicit ONNX file to load weights from "
                         "(validated + structurally converted)")
    ap.add_argument("--runtime", default="native",
                    choices=["native", "graph"],
                    help="graph: serve ANY supported ONNX export "
                         "through the jitted graph interpreter "
                         "(requires --onnx; all decode modes, "
                         "data-parallel over the mesh; no tiling)")
    ap.add_argument("--distributed", default=None,
                    help="multi-host: host:port,num_processes=N,"
                         "process_id=I (jax.distributed over DCN)")
    ap.add_argument("--lockstep-address", default=None,
                    help="multi-host serving: host:port of the lockstep "
                         "dispatch coordinator (run on process 0). "
                         "Required when serving with --distributed over "
                         "a process-spanning mesh — every process must "
                         "dispatch the same programs in the same order")
    ap.add_argument("--preset", default=None, choices=sorted(PRESETS),
                    help="named flag bundle (explicit flags override): "
                         "reference = exact reference-parity defaults; "
                         "throughput = measured-best 16-stream setup; "
                         "lossless = process every frame")
    ap.add_argument("--log-level", default="INFO")
    args = ap.parse_args(argv)

    if args.preset:
        tokens = argv if argv is not None else sys.argv[1:]
        # map flag spellings to their argparse dests so aliases count
        # as the same setting (--warmup-sync and --warmup-async share
        # dest warmup_async: either one passed means the user chose,
        # and the preset must not override it)
        flag_dest = {opt[2:].replace("-", "_"): action.dest
                     for action in ap._actions
                     for opt in action.option_strings
                     if opt.startswith("--")}
        passed = {flag_dest.get(name, name) for name in
                  (t.split("=", 1)[0][2:].replace("-", "_")
                   for t in tokens if t.startswith("--"))}
        for key, value in PRESETS[args.preset].items():
            if key not in passed:  # explicitly-passed flags win
                setattr(args, key, value)

    logging.basicConfig(
        level=args.log_level.upper(),
        format="%(asctime)s.%(msecs)03d %(levelname)s %(name)s: "
               "%(message)s",
        datefmt="%Y-%m-%dT%H:%M:%S")

    # SIGUSR1 dumps all thread stacks to stderr (production debugging)
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1)

    from infercam_onnx_tpu.config import (
        DetectorConfig, EngineConfig, ServerConfig)
    from infercam_onnx_tpu.serving.app import serve_forever
    from infercam_onnx_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    buckets = bucket_ladder(args.max_batch)

    warmup = []
    if args.warmup:
        for spec in args.warmup.split(","):
            w, h = spec.lower().split("x")
            warmup.append((int(h), int(w)))

    from infercam_onnx_tpu.utils.profiling import device_trace

    if args.lockstep_address:
        if not args.distributed:
            ap.error("--lockstep-address requires --distributed")
        if args.data_parallel == "off":
            ap.error("--lockstep-address requires data-parallel serving")
        if args.tile_min_pixels:
            ap.error("--lockstep-address does not support tiling")
        if args.runtime != "native":
            ap.error("--lockstep-address requires --runtime native")
        # --max-rss-mb IS allowed under lockstep: a breach exits the
        # member with RSS_RECYCLE_EXIT_CODE instead of re-execing (a
        # restarted process cannot rejoin the jax.distributed
        # incarnation); the cluster supervisor re-forms the whole
        # cluster and streams resume (serving/app.py, docs/OPERATIONS.md)
    if args.distributed:
        from infercam_onnx_tpu.parallel.multihost import initialize

        initialize(args.distributed)

    assume_dims = None
    if args.assume_frame_dims:
        w, h = args.assume_frame_dims.lower().split("x")
        assume_dims = (int(w), int(h))

    detector_config = DetectorConfig(
        variant=args.variant,
        min_confidence=args.min_confidence,
        max_iou=args.max_iou,
        top_k=args.top_k,
        max_detections=args.max_detections,
        compute_dtype=("float32" if args.runtime == "graph"
                       else DetectorConfig.compute_dtype))
    detector = None
    if args.runtime == "graph":
        if not args.onnx:
            ap.error("--runtime graph requires --onnx")
        if args.tile_min_pixels:
            ap.error("--runtime graph does not support tiling")
        from infercam_onnx_tpu.models.onnx_exec import GraphDetector

        detector = GraphDetector(args.onnx, detector_config)
    elif args.onnx:
        from infercam_onnx_tpu.detector import Detector
        from infercam_onnx_tpu.models.convert import params_from_onnx

        detector = Detector(detector_config,
                            params=params_from_onnx(args.onnx))

    exit_code = 0
    try:
        with device_trace(args.profile_dir):
            asyncio.run(serve_forever(
                server_config=ServerConfig(
                    http_address=args.server_address,
                    socket_address=args.socket_address,
                    assume_frame_dims=assume_dims,
                    max_rss_mb=args.max_rss_mb,
                    rss_check_period_s=args.rss_check_period),
                detector_config=detector_config,
                detector=detector,
                engine_config=EngineConfig(
                    batch_buckets=tuple(buckets),
                    batch_window_ms=args.batch_window_ms,
                    queue_capacity=args.queue_capacity,
                    coalesce_streams=not args.no_coalesce,
                    decode_scale=args.decode_scale,
                    decode_mode=args.decode_mode,
                    annotate_mode=args.annotate,
                    annotate_splice_blocks=args.annotate_splice_blocks,
                    link_adaptive=args.link_adaptive == "on",
                    link_healthy_h2d_mbps=args.link_healthy_mbps,
                    link_probe_period_s=args.link_probe_period,
                    link_annotate_floor_mbps=(
                        args.link_annotate_floor_mbps),
                    link_tiled_rows_below_mbps=(
                        args.link_tiled_crossover_mbps),
                    link_tiled_ab_probe=args.link_tiled_ab == "on",
                    link_tiled_ab_tie_pct=args.link_tiled_ab_tie_pct,
                    tiled_upload=args.tiled_upload,
                    tile_min_pixels=args.tile_min_pixels,
                    tile_grid=tuple(
                        int(v) for v in args.tile_grid.split("x"))),
                warmup_resolutions=warmup or None,
                data_parallel=args.data_parallel,
                warmup_async=args.warmup_async,
                lockstep_address=args.lockstep_address,
            ))
    except KeyboardInterrupt:
        pass
    except SystemExit as e:
        # deliberate exits keep their status (BaseException would
        # swallow them into a fake crash)
        exit_code = (e.code if isinstance(e.code, int)
                     else 0 if e.code is None else 1)
    except Exception:
        # Crashes (bind failure, lockstep device-count mismatch, detector
        # errors) must surface a traceback and a non-zero status so
        # supervisors / cluster_launch see a failure, not a clean stop —
        # even on the --distributed hard-exit path below.
        import traceback as _traceback

        _traceback.print_exc()
        exit_code = 1
    finally:
        # after the graceful close (listeners + sender connections
        # are down, peers notified), exit HARD with the tracked status
        # when serve owns the process (argv is None = the python -m
        # entry; in-process test callers get a normal return):
        # - distributed: the jax.distributed runtime's non-daemon
        #   threads otherwise keep the process alive, and shutdown()
        #   barriers on peers that never arrive when one host of a
        #   cluster terminates alone (observed live);
        # - single-host too: the TPU-tunnel client can SIGABRT during
        #   interpreter TEARDOWN after all useful work (CLAUDE.md),
        #   which would turn a clean stop into exit 134 and make
        #   supervisors treat every graceful recycle as a crash
        if argv is None or args.distributed:
            import os as _os

            sys.stdout.flush()
            sys.stderr.flush()
            _os._exit(exit_code)
    return exit_code


if __name__ == "__main__":
    sys.exit(main())
