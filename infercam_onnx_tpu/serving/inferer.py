"""Micro-batched inference worker.

Replaces the reference's single sequential inference task (reference
infer_server/src/inferer.rs:29-49: one frame at a time, decode -> infer ->
draw -> encode -> publish) with a batching worker:

- a bounded submit queue (capacity mirrors the reference's infer channel,
  cap 10, reference lib.rs:37) with drop-on-full backpressure;
- a gather window that collects frames across streams, coalescing to the
  *latest* frame per stream (fresh frames win under overload, the same
  degradation mode as the reference's try_send_ref drop, SURVEY.md
  section 7);
- shape-bucketed batches padded to fixed sizes so the device program
  compiles once per (bucket, resolution);
- JPEG decode/encode on a worker thread (native C++ shim), the fused
  preprocess+CNN+NMS program on the TPU, drawing on the host;
- results published to each stream's reply broadcast as MJPEG parts.
"""

from __future__ import annotations

import asyncio
import bisect
import logging
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from infercam_onnx_tpu import codec
from infercam_onnx_tpu.config import EngineConfig, ServerConfig
from infercam_onnx_tpu.detector import Detector
from infercam_onnx_tpu.draw import draw_detections
from infercam_onnx_tpu.protocol import as_jpeg_stream_item
from infercam_onnx_tpu.serving.meter import METER, Meter
from infercam_onnx_tpu.serving.router import InferJob
from infercam_onnx_tpu.utils.profiling import STAGES

log = logging.getLogger("infercam.inferer")


class InferenceWorker:
    def __init__(
        self,
        detector: Detector,
        engine_config: EngineConfig = EngineConfig(),
        server_config: ServerConfig = ServerConfig(),
        meter: Meter = METER,
        mesh=None,
    ):
        """``mesh``: a jax.sharding.Mesh — batches shard their stream
        dimension across it (BASELINE config 5: data-parallel serving)
        and high-res tile batches shard-constrain onto it. None =
        single-device programs."""
        self._mesh = mesh
        if mesh is not None and getattr(detector, "mesh", None) is None:
            # detectors already bound to a mesh (ShardedDetector,
            # LockstepDetector, mesh-aware GraphDetector) pass through
            from infercam_onnx_tpu.parallel.data_parallel import (
                ShardedDetector)

            detector = ShardedDetector(detector, mesh)
        self._detector = detector
        self._cfg = engine_config
        self._server_cfg = server_config
        self._meter = meter
        self._queue: asyncio.Queue[InferJob] = asyncio.Queue(
            maxsize=engine_config.queue_capacity)
        self._buckets = sorted(engine_config.batch_buckets)
        # two single-thread executors form a 2-stage pipeline: decode of
        # batch k+1 overlaps the device round-trip of batch k (both
        # stages spend most of their time in GIL-releasing C/RPC waits)
        self._decode_exec = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="decode")
        self._device_exec = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="device")
        self._publish_exec = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="publish")
        self._loop: asyncio.AbstractEventLoop | None = None
        # device warm-up in progress (surfaced as /stats "warming")
        self.warming = False
        # link-adaptive transfer-path selection (serving/link.py):
        # the paths actually in effect (may differ from the configured
        # ones on a degraded link) + the probe verdict, surfaced via
        # /stats "link". Pre-probe defaults: decode/annotate as
        # configured; tiled_upload "auto" resolves to "rows" only when
        # a probe WILL run to re-decide it (this development rig's
        # tunnel is usually degraded — one probe flips it to "stacked"
        # on a healthy link). With link_adaptive off no probe ever
        # runs, so "auto" must resolve to the healthy-link default.
        self._effective_decode_mode = engine_config.decode_mode
        self._effective_annotate_mode = engine_config.annotate_mode
        if engine_config.tiled_upload != "auto":
            self._effective_tiled_route = engine_config.tiled_upload
        elif engine_config.link_adaptive:
            self._effective_tiled_route = "rows"
        else:
            self._effective_tiled_route = "stacked"
        self.link_status: dict = {
            "probed": False,
            "configured_decode_mode": engine_config.decode_mode,
            "decode_mode": engine_config.decode_mode,
        }
        # lazily-built tiled detectors per decoded frame size
        # (BASELINE config 5: high-res frames tile across the detector)
        self._tiled: dict[tuple[int, int], object] = {}
        # device-side annotated output (overlay + FDCT/quant on the TPU,
        # host entropy-codes only): needs the native shim AND a detector
        # exposing the fused annotated programs; otherwise fall back to
        # the reference-style host draw + encode path
        self._annotate_device = False
        if engine_config.annotate_mode == "device":
            if not hasattr(self._detector, "run_device_annotated"):
                log.info("annotate=device unavailable on %s; using the "
                         "host draw path",
                         type(self._detector).__name__)
            else:
                try:
                    from infercam_onnx_tpu.native import jpeg as nj

                    nj.load()
                    self._annotate_device = True
                except Exception as e:  # toolchain/libjpeg missing
                    log.warning("annotate=device needs the native JPEG "
                                "shim (%s); using the host draw path",
                                e)

    def probe_and_adapt(self, probe=None, probe_tiled=None) -> dict:
        """Probe H2D bandwidth and (re-)select every transfer-sensitive
        serving path (serving/link.py decision table: decode mode,
        tiled upload route, annotate mode). Call on the DEVICE executor
        thread so the probe never interleaves with a dispatch. Each
        configured choice is re-evaluated every call, so a recovered
        link restores the configured paths. Returns the updated link
        status dict (what /stats exposes).

        The tiled route additionally gets a direct A/B measurement of
        both upload patterns (``probe_tiled``, default
        link.probe_tiled_route_ms) when the route is "auto" and
        ``link_tiled_ab_probe`` is on — bandwidth alone cannot predict
        that winner (see probe_tiled_route_ms). An injected fake
        bandwidth ``probe`` without a matching ``probe_tiled`` skips
        the A/B (threshold fallback) so tests faking only bandwidth
        stay meaningful."""
        from infercam_onnx_tpu.serving import link as _link

        if probe is None:
            probe = _link.probe_h2d_mbps
            if probe_tiled is None:
                probe_tiled = _link.probe_tiled_route_ms
        mbps = float(probe())
        ab = None
        if (probe_tiled is not None
                and self._cfg.tiled_upload == "auto"
                and self._cfg.link_tiled_ab_probe
                and self._cfg.tile_min_pixels):
            # the ~12 MB A/B transfer is only worth paying when tiling
            # can actually be exercised (tile_min_pixels=0 disables it)
            stacked_ms, rows_ms = probe_tiled()
            ab = (float(stacked_ms), float(rows_ms))
        decisions = _link.decide(self._cfg, mbps, tiled_ab_ms=ab)
        changes = (
            ("decode mode", "_effective_decode_mode", "decode_mode"),
            ("tiled upload", "_effective_tiled_route", "tiled_upload"),
            ("annotate mode", "_effective_annotate_mode",
             "annotate_mode"),
        )
        for label, attr, key in changes:
            new = decisions[key]["effective"]
            if new != getattr(self, attr):
                log.warning("link-adaptive: %s %s -> %s (%s)", label,
                            getattr(self, attr), new,
                            decisions[key]["why"])
            setattr(self, attr, new)
        self.link_status = {
            "probed": True,
            "h2d_mbps": round(mbps, 1),
            "healthy_mbps": self._cfg.link_healthy_h2d_mbps,
            "degraded": mbps < self._cfg.link_healthy_h2d_mbps,
            # kept for compatibility with existing consumers/tests
            "configured_decode_mode": self._cfg.decode_mode,
            "decode_mode": decisions["decode_mode"]["effective"],
            "why": decisions["decode_mode"]["why"],
            "decisions": decisions,
            "tiled_ab_ms": (None if ab is None else
                            {"stacked": round(ab[0], 1),
                             "rows": round(ab[1], 1)}),
        }
        return self.link_status

    @property
    def _annotate_device_active(self) -> bool:
        """Device-annotate capability AND the link-effective mode: a
        collapse-grade link re-routes annotated output to the host
        draw path (serving/link.py decide_annotate_mode)."""
        return (self._annotate_device
                and self._effective_annotate_mode == "device")

    def _host_quant(self, quality: int):
        """[2, 64] uint16 encode quant tables for the host entropy
        encoder (shared process-wide cache)."""
        from infercam_onnx_tpu.native import jpeg as nj

        return nj.quant_tables_cached(quality)

    # -- submission (called from the router on the event loop) -------------

    def submit(self, job: InferJob) -> bool:
        """Non-blocking enqueue; False = dropped (queue full)."""
        try:
            self._queue.put_nowait(job)
            return True
        except asyncio.QueueFull:
            return False

    # -- worker loop -------------------------------------------------------

    def _bucket_size(self, n: int) -> int:
        i = bisect.bisect_left(self._buckets, n)
        bucket = self._buckets[min(i, len(self._buckets) - 1)]
        if self._mesh is not None:
            # pad to a mesh multiple HERE so the sharded programs never
            # re-pad (and never pull a device array back to the host).
            # Lockstep detectors expose a smaller granularity: each host
            # fills only ITS shard of the global batch.
            m = getattr(self._detector, "batch_granularity", None) \
                or self._mesh.shape["data"]
            bucket = ((bucket + m - 1) // m) * m
        return bucket

    async def run(self) -> None:
        """Three-stage pipeline on three single-thread executors:
        decode(k+2) || device(k+1) || draw+encode+publish(k). Each stage
        spends most of its time in GIL-releasing C/RPC waits, so the
        stages genuinely overlap even on a single-core host, and drawing
        no longer serializes with the next device dispatch."""
        import collections

        self._loop = asyncio.get_running_loop()
        max_bucket = self._buckets[-1]
        window = self._cfg.batch_window_ms / 1e3
        inflight: asyncio.Future | None = None
        publish_futs: collections.deque = collections.deque()

        async def flush_inflight():
            nonlocal inflight
            results = await inflight
            inflight = None
            publish_futs.append(self._loop.run_in_executor(
                self._publish_exec, self._publish_results, results))
            while len(publish_futs) > 2:  # bound publish backlog
                await publish_futs.popleft()

        get_task: asyncio.Future | None = None
        try:
            while True:
                # wait for the next job — but if the in-flight batch
                # finishes while the queue is idle, publish it
                # immediately instead of holding its results hostage to
                # future traffic (the trailing batch of a burst must not
                # wait for the next burst)
                get_task = asyncio.ensure_future(self._queue.get())
                while inflight is not None:
                    done, _ = await asyncio.wait(
                        {get_task, inflight},
                        return_when=asyncio.FIRST_COMPLETED)
                    if inflight in done:
                        await flush_inflight()
                    if get_task in done:
                        break
                jobs = [await get_task]
                deadline = self._loop.time() + window
                while len(jobs) < max_bucket:
                    timeout = deadline - self._loop.time()
                    if timeout <= 0:
                        break
                    try:
                        jobs.append(await asyncio.wait_for(
                            self._queue.get(), timeout))
                    except asyncio.TimeoutError:
                        break
                if self._cfg.coalesce_streams:
                    # coalesce: latest frame per stream wins
                    latest: dict[int, InferJob] = {}
                    for job in jobs:
                        if job.key in latest:
                            self._meter.tick_dropped()
                        latest[job.key] = job
                    jobs = list(latest.values())
                frames = await self._loop.run_in_executor(
                    self._decode_exec, self._decode, jobs)
                if inflight is not None:
                    await flush_inflight()
                inflight = self._loop.run_in_executor(
                    self._device_exec, self._device_stage, frames)
        finally:
            # on cancellation (server shutdown / supervisor restart),
            # don't leave a pending queue-get task behind
            if get_task is not None:
                get_task.cancel()

    # -- stage 1: decode (decode thread) -----------------------------------

    def _decode(self, jobs: list[InferJob]):
        """Pixel-decode jobs that need host pixels; device-decode-tail
        modes ("coefficients": entropy only; "ycbcr": entropy+IDCT,
        packed planes) apply to detection-only jobs. Corrupt frames are
        dropped, not fatal — hardening over the reference's panic,
        reference inferer.rs:35-36.

        This stage also ASSEMBLES the padded batches and starts their
        host->device transfers (async ``jax.device_put``), so batch
        k+1's upload overlaps batch k's device round-trip — the same
        discipline as bench.py's pipeline."""
        decode_mode = self._effective_decode_mode  # one read per batch
        coef_mode = decode_mode == "coefficients"
        ycbcr_mode = decode_mode == "ycbcr"
        # annotated viewers in a device-decode-tail mode ride the fused
        # annotate+encode program instead of forcing a host pixel
        # decode. In coefficients mode the SPLICE transcode applies:
        # blocks up, only overlay-touched blocks down, host splices
        # them into its original arrays (bit-exact elsewhere).
        splice_mode = (coef_mode and self._annotate_device_active
                       and hasattr(self._detector,
                                   "run_device_coefficients_annotated"))
        device_annot_ids = {
            id(j) for j in jobs
            if j.reply is not None and self._annotate_device_active
            and (coef_mode or ycbcr_mode)}
        # in coefficients mode every device-annotated job takes the
        # splice transcode; otherwise they take the ycbcr annotate tail
        splice_jobs = [j for j in jobs
                       if splice_mode and id(j) in device_annot_ids]
        annot_jobs = [] if splice_mode else [
            j for j in jobs if id(j) in device_annot_ids]
        pixel_jobs = [j for j in jobs
                      if id(j) not in device_annot_ids
                      and (j.reply is not None
                           or not (coef_mode or ycbcr_mode))]
        coef_jobs = [j for j in jobs
                     if j.reply is None and coef_mode]
        ycbcr_jobs = [j for j in jobs
                      if j.reply is None and ycbcr_mode]

        frames: list[tuple[InferJob, np.ndarray]] = []
        scale = self._cfg.decode_scale
        with STAGES.stage("decode"):
            if pixel_jobs:
                datas = [j.data for j in pixel_jobs]
                try:
                    decoded = codec.decode_batch(datas, scale=scale)
                    frames = list(zip(pixel_jobs, decoded))
                except ValueError:
                    for job in pixel_jobs:
                        try:
                            frames.append(
                                (job, codec.decode_rgb(job.data, scale)))
                        except ValueError:
                            log.warning(
                                "dropping corrupt frame on stream %x",
                                job.key)
                            self._meter.tick_dropped()

            def pixel_fallback(job, err):
                # a frame the device-tail path can't take (e.g. 4:4:4
                # chroma) still usually PIXEL-decodes fine — route it
                # through the pixels program instead of dropping it
                try:
                    frames.append((job, codec.decode_rgb(job.data,
                                                         scale)))
                    log.debug("stream %x: %s; pixel-decode fallback",
                              job.key, err)
                except ValueError:
                    log.warning("dropping corrupt frame on stream %x "
                                "(%s)", job.key, err)
                    self._meter.tick_dropped()

            # entropy-only decode, grouped by JPEG geometry
            def group_coefs(jlist):
                from infercam_onnx_tpu.ops.jpeg_device import (
                    read_coefficient_batch)

                by_geom: dict = {}
                for job in jlist:
                    try:
                        planes = read_coefficient_batch([job.data])
                        geom = (planes[4], planes[5],
                                planes[0].shape, planes[1].shape)
                        by_geom.setdefault(geom, []).append(
                            (job, planes))
                    except ValueError as e:
                        pixel_fallback(job, e)
                return list(by_geom.values())

            def untiled_only(groups, dims):
                """Keep groups below the tiling threshold; members at
                or above it host-annotate via the pixel path (their
                detections must come from the TILED program — same
                guard as pixels-mode annotate in _device_stage)."""
                out = []
                for group in groups:
                    w0, h0 = dims(group)
                    if self._is_tiled(w0, h0):
                        for job, _ in group[0] if isinstance(
                                group, tuple) else group:
                            pixel_fallback(
                                job, "tiled stream: host annotate")
                    else:
                        out.append(group)
                return out

            coef_groups = group_coefs(coef_jobs) if coef_jobs else []
            splice_groups = untiled_only(
                group_coefs(splice_jobs),
                lambda ms: ms[0][1][4]) if splice_jobs else []

            # entropy+IDCT decode to packed planes, grouped by geometry.
            # Fast path: ONE batched C call when all frames share
            # geometry (the common case — same cameras); fall back to
            # per-job decode + grouping on mixed/corrupt batches.
            def group_ycbcr(jlist):
                from infercam_onnx_tpu.native import jpeg as native_jpeg

                native = native_jpeg.load()
                groups = []
                try:
                    packed, geom = native.decode_ycbcr_batch(
                        [j.data for j in jlist], scale=scale)
                    groups.append((list(zip(jlist, packed)), geom))
                except ValueError:
                    yc_by_geom: dict = {}
                    for job in jlist:
                        try:
                            packed, geom = native.decode_ycbcr_batch(
                                [job.data], scale=scale)
                            key = tuple(sorted(
                                (k, tuple(v) if isinstance(v, tuple)
                                 else v)
                                for k, v in geom.items()))
                            yc_by_geom.setdefault(
                                key, ([], geom))[0].append(
                                (job, packed[0]))
                        except ValueError as e:
                            pixel_fallback(job, e)
                    for members, geom in yc_by_geom.values():
                        groups.append((members, geom))
                return groups

            # high-res streams tile even on the packed-plane path: split
            # the decoded groups by the tiling threshold
            ycbcr_groups, ycbcr_tiled_groups = [], []
            if ycbcr_jobs:
                for members, geom in group_ycbcr(ycbcr_jobs):
                    big = self._is_tiled(geom["width"], geom["height"])
                    (ycbcr_tiled_groups if big
                     else ycbcr_groups).append((members, geom))

            # annotated-viewer frames: same packed-plane decode, but the
            # device program also renders the overlay and produces the
            # output JPEG's quantized coefficients (non-8-aligned
            # scaled planes are edge-padded on device). High-res frames
            # above the tiling threshold fall back to the pixel path so
            # their detections keep coming from the TILED program (same
            # as the pixels-mode annotate guard in _device_stage).
            annot_groups = (untiled_only(
                group_ycbcr(annot_jobs),
                lambda g: (g[1]["width"], g[1]["height"]))
                if annot_jobs else [])

        # assemble padded batches + start async uploads (still on the
        # decode thread: overlaps the device thread's current dispatch).
        # On a mesh, leave arrays on the host: the sharded jit scatters
        # them itself (an eager device_put would pin them to one chip).
        import jax

        def put(arr):
            return jax.device_put(arr) if self._mesh is None else arr

        units: list[dict] = []
        with STAGES.stage("upload"):
            # group by shape AND by whether the frame needs the
            # annotated program: detection-only members must not pay
            # the annotate path's coefficient readback just because
            # another stream in the batch has a viewer
            by_shape: dict[tuple, list] = {}
            for job, frame in frames:
                needs_annot = bool(self._annotate_device_active
                                   and job.reply is not None)
                by_shape.setdefault(
                    (frame.shape[:2], needs_annot), []).append(
                    (job, frame))
            def overflow(members, bucket):
                # the gather window caps at the largest bucket so groups
                # should always fit; count (and log) any excess instead
                # of silently discarding if an invariant ever breaks
                extra = len(members) - bucket
                if extra > 0:
                    log.warning("batch group overflow: dropping %d "
                                "frames beyond bucket %d", extra, bucket)
                    for _ in range(extra):
                        self._meter.tick_dropped()

            for ((h, w), needs_annot), members in by_shape.items():
                bucket = self._bucket_size(len(members))
                overflow(members, bucket)
                batch = np.zeros((bucket, h, w, 3), np.uint8)
                for i, (_, frame) in enumerate(members[:bucket]):
                    batch[i] = frame
                units.append({
                    "kind": "pixels", "members": members[:bucket],
                    "n": min(len(members), bucket),
                    "batch": put(batch), "w": w, "h": h,
                    # pixels-mode annotated viewers get the device
                    # encode tail (RGB-input fused program)
                    "annotate": needs_annot,
                })

            for members in coef_groups:
                bucket = self._bucket_size(len(members))
                overflow(members, bucket)
                _, _, _, _, (w, h), sampling = members[0][1]
                pad = bucket - len(members)

                def cat(idx, members=members, pad=pad, bucket=bucket):
                    arrs = [m[1][idx] for m in members[:bucket]]
                    if pad > 0:
                        arrs.append(np.zeros(
                            (pad,) + arrs[0].shape[1:], arrs[0].dtype))
                    return put(np.concatenate(arrs))

                units.append({
                    "kind": "coef",
                    "members": members[:bucket],
                    "n": min(len(members), bucket),
                    "arrays": (cat(0), cat(1), cat(2), cat(3)),
                    "w": w, "h": h, "sampling": sampling,
                })

            for members in splice_groups:
                bucket = self._bucket_size(len(members))
                overflow(members, bucket)
                _, _, _, _, (w, h), sampling = members[0][1]
                pad = bucket - len(members)

                def cat2(idx, fill, members=members, pad=pad,
                         bucket=bucket):
                    arrs = [m[1][idx] for m in members[:bucket]]
                    if pad > 0:
                        arrs.append(np.full(
                            (pad,) + arrs[0].shape[1:], fill,
                            arrs[0].dtype))
                    return np.concatenate(arrs)

                # pack + start the upload HERE (decode thread), like
                # every other unit kind — the device thread stays
                # dispatch-only. quant pads with ONES so padded rows
                # stay finite through the dequant/requant round trip.
                from infercam_onnx_tpu.detector import (
                    pack_coefficient_batch)

                packed12, quant, shapes = pack_coefficient_batch(
                    cat2(0, 0), cat2(1, 0), cat2(2, 0), cat2(3, 1))
                units.append({
                    "kind": "coef_annot",
                    "members": members[:bucket],
                    "n": min(len(members), bucket),
                    "packed12": put(packed12), "quant": quant,
                    "shapes": shapes,
                    "w": w, "h": h, "sampling": sampling,
                })

            for kind, groups in (("ycbcr", ycbcr_groups),
                                 ("ycbcr_tiled", ycbcr_tiled_groups),
                                 ("ycbcr_annot", annot_groups)):
                for members, geom in groups:
                    bucket = self._bucket_size(len(members))
                    overflow(members, bucket)
                    rows = [m[1] for m in members[:bucket]]
                    if bucket > len(members):
                        rows.extend([np.zeros_like(rows[0])]
                                    * (bucket - len(members)))
                    if (kind == "ycbcr_tiled" and self._mesh is None
                            and self._effective_tiled_route == "rows"
                            and not hasattr(self._detector,
                                            "run_device_tiled_ycbcr")):
                        # chunked upload for the transfer-heaviest
                        # units: per-frame async device_puts issued
                        # back-to-back amortize the tunnel's fixed
                        # per-transfer cost that one large stacked copy
                        # pays in full (CLAUDE.md cost model); the
                        # batch is stacked ON DEVICE (HBM-local).
                        # Route is link-adaptive (tiled_upload "auto":
                        # rows on degraded links, stacked on healthy)
                        units.append({
                            "kind": "ycbcr_tiled_rows",
                            "members": members[:bucket],
                            "n": min(len(members), bucket),
                            "rows": tuple(jax.device_put(r)
                                          for r in rows),
                            "geom": geom,
                        })
                        continue
                    units.append({
                        "kind": kind,
                        "members": members[:bucket],
                        "n": min(len(members), bucket),
                        "packed": put(np.stack(rows)),
                        "geom": geom,
                    })
        return units

    # -- stage 2: device + draw + encode + publish (device thread) ---------

    def _publish(self, chan, item: bytes) -> None:
        assert self._loop is not None
        self._loop.call_soon_threadsafe(chan.publish, item)

    def _tick_e2e(self, job: InferJob) -> None:
        """Per-frame end-to-end latency (router enqueue -> publish) — the
        BASELINE 'p50 per-frame latency' metric, reported via /stats and
        the meter log."""
        if job.enqueued_at:
            STAGES.record("e2e", time.monotonic() - job.enqueued_at)

    def _detections_json(self, packed_row: np.ndarray, w: int,
                         h: int) -> bytes:
        import json

        count = int(packed_row[:, 5].sum())
        return (json.dumps({
            "ts": round(time.time(), 4),
            "width": w,
            "height": h,
            "detections": [
                {"bbox": [float(v) for v in packed_row[d, :4]],
                 "confidence": float(packed_row[d, 4])}
                for d in range(count)
            ],
        }) + "\n").encode()

    def _device_stage(self, units: list[dict]) -> list:
        """Dispatch the pre-uploaded batches; returns publish-stage
        entries {members, packed, w, h, coefs, geom}. Batch assembly +
        host->device upload already happened on the decode thread (see
        _decode), so this stage is dispatch + readback only. ``coefs``
        (annotated units) carries the output JPEG's quantized DCT
        blocks straight off the device — the publish stage only
        entropy-codes them."""
        results = []
        for unit in units:
            t0 = time.monotonic()
            coefs = geom = splice = None
            if unit["kind"] == "coef_annot":
                w, h = unit["w"], unit["h"]
                k = self._cfg.annotate_splice_blocks
                with STAGES.stage("device_annot"):
                    blocks, meta, packed = (
                        self._detector
                        .run_device_coefficients_annotated_packed(
                            unit["packed12"], unit["quant"],
                            wh=(w, h), shapes=unit["shapes"],
                            sampling=unit["sampling"], k=k,
                            disp_dims=self._server_cfg.assume_frame_dims))
                for arr in (blocks, meta):
                    if hasattr(arr, "copy_to_host_async"):
                        arr.copy_to_host_async()
                splice = {"blocks": blocks, "meta": meta, "k": k,
                          "wh": (w, h), "sampling": unit["sampling"]}
                members = unit["members"]  # (job, coef planes)
            elif unit["kind"] == "pixels":
                w, h = unit["w"], unit["h"]
                tiled = self._is_tiled(w, h)
                if unit.get("annotate") and not tiled:
                    from infercam_onnx_tpu.ops.jpeg_encode_device import (
                        SUBSAMPLING_FACTORS,
                        plane_geometry,
                    )

                    sub = self._server_cfg.jpeg_subsampling
                    with STAGES.stage("device"):
                        coefs, packed = self._detector.run_device_annotated(
                            unit["batch"],
                            quality=self._server_cfg.jpeg_quality,
                            subsampling=sub,
                            disp_dims=self._server_cfg.assume_frame_dims)
                    geom = plane_geometry(
                        w, h, SUBSAMPLING_FACTORS[sub])
                else:
                    with STAGES.stage("device"):
                        packed = self._run_detection(unit["batch"], h, w)
                members = unit["members"]
            elif unit["kind"] == "coef":
                w, h = unit["w"], unit["h"]
                with STAGES.stage("device_coef"):
                    packed = (
                        self._detector.run_device_coefficients_arrays(
                            *unit["arrays"], (w, h),
                            sampling=unit["sampling"], pack_output=True))
                members = [(job, None) for job, _ in unit["members"]]
            elif unit["kind"] == "ycbcr_annot":
                geom = unit["geom"]
                w, h = geom["width"], geom["height"]
                with STAGES.stage("device_annot"):
                    coefs, packed = (
                        self._detector.run_device_ycbcr_annotated(
                            unit["packed"], geom,
                            quality=self._server_cfg.jpeg_quality,
                            disp_dims=self._server_cfg.assume_frame_dims))
                members = [(job, None) for job, _ in unit["members"]]
            elif unit["kind"] == "ycbcr_tiled_rows":
                geom = unit["geom"]
                w, h = geom["width"], geom["height"]
                with STAGES.stage("device_tiled"):
                    packed = self._get_tiled(
                        w, h).run_device_ycbcr_rows(
                        unit["rows"], geom, pack_output=True)
                members = [(job, None) for job, _ in unit["members"]]
                geom = None  # detections only; no encode-tail coefs
            elif unit["kind"] == "ycbcr_tiled":
                geom = unit["geom"]
                w, h = geom["width"], geom["height"]
                with STAGES.stage("device_tiled"):
                    if hasattr(self._detector, "run_device_tiled_ycbcr"):
                        packed = self._detector.run_device_tiled_ycbcr(
                            unit["packed"], geom,
                            grid=self._cfg.tile_grid,
                            overlap=self._cfg.tile_overlap)
                    else:
                        packed = self._get_tiled(
                            w, h).run_device_ycbcr_packed(
                            unit["packed"], geom, pack_output=True)
                members = [(job, None) for job, _ in unit["members"]]
                geom = None  # detections only; no encode-tail coefs
            else:  # ycbcr
                geom = unit["geom"]
                w, h = geom["width"], geom["height"]
                with STAGES.stage("device_ycbcr"):
                    packed = self._detector.run_device_ycbcr_packed(
                        unit["packed"], geom, pack_output=True)
                members = [(job, None) for job, _ in unit["members"]]
            # start the device->host copies without blocking this
            # thread; the publish stage materializes them (np.asarray)
            # when it actually needs the numbers
            for arr in (packed, coefs):
                if hasattr(arr, "copy_to_host_async"):
                    arr.copy_to_host_async()
            self._meter.tick_batch(unit["n"], time.monotonic() - t0)
            results.append({"members": members, "packed": packed,
                            "w": w, "h": h, "coefs": coefs,
                            "geom": geom, "splice": splice})
        return results

    # -- stage 3: draw + encode + publish (publish thread) ------------------

    def _publish_results(self, results: list) -> None:
        dims = self._server_cfg.assume_frame_dims
        for entry in results:
            members, w, h = entry["members"], entry["w"], entry["h"]
            packed = np.asarray(entry["packed"])  # completes async D2H
            coefs = entry["coefs"]
            if coefs is not None:
                coefs = np.asarray(coefs)
            splice = entry.get("splice")
            if splice is not None:
                splice_blocks_arr = np.asarray(splice["blocks"])
                splice_meta = np.asarray(splice["meta"])
            n = len(members)
            for i, (job, frame) in enumerate(members):
                if job.det_reply is not None:
                    self._publish(job.det_reply,
                                  self._detections_json(packed[i], w, h))
                if job.reply is None:
                    self._tick_e2e(job)
                    continue
                if splice is not None:
                    jpeg = self._finish_splice(
                        job, frame, packed[i], splice_meta[i],
                        splice_blocks_arr[i], splice)
                    if jpeg is None:
                        self._tick_e2e(job)
                        continue
                    self._publish(job.reply, as_jpeg_stream_item(jpeg))
                    self._tick_e2e(job)
                    continue
                if coefs is not None:
                    # device-annotated path: the TPU already rendered
                    # the overlay and quantized the DCT blocks — finish
                    # with host entropy coding only
                    from infercam_onnx_tpu.native import jpeg as nj
                    from infercam_onnx_tpu.ops.jpeg_encode_device import (
                        split_coefs)

                    geom = entry["geom"]
                    with STAGES.stage("encode"):
                        yq, cbq, crq = split_coefs(coefs[i], geom)
                        jpeg = nj.load().encode_coefs(
                            yq, cbq, crq,
                            (geom["width"], geom["height"]),
                            geom["sampling"],
                            self._host_quant(
                                self._server_cfg.jpeg_quality))
                elif frame is not None:
                    count = int(packed[i, :, 5].sum())
                    dets = [(packed[i, d, :4], float(packed[i, d, 4]))
                            for d in range(count)]
                    with STAGES.stage("draw"):
                        annotated = draw_detections(frame, dets, dims)
                    with STAGES.stage("encode"):
                        jpeg = codec.encode_rgb(
                            annotated, self._server_cfg.jpeg_quality,
                            self._server_cfg.jpeg_subsampling)
                else:
                    self._tick_e2e(job)
                    continue
                self._publish(job.reply, as_jpeg_stream_item(jpeg))
                self._tick_e2e(job)
            self._meter.tick_inferred_unique(n)

    def _is_tiled(self, w: int, h: int) -> bool:
        """One definition of the high-res tiling threshold: frames at
        or above it get detections from the TILED program, so annotate
        paths must host-fallback for them (all call sites share this
        predicate)."""
        return bool(self._cfg.tile_min_pixels
                    and w * h >= self._cfg.tile_min_pixels)

    def _get_tiled(self, w: int, h: int):
        tiled = self._tiled.get((h, w))
        if tiled is None:
            from infercam_onnx_tpu.parallel.tiling import TiledDetector

            tiled = TiledDetector(
                self._detector, (w, h), grid=self._cfg.tile_grid,
                overlap=self._cfg.tile_overlap, mesh=self._mesh)
            self._tiled[(h, w)] = tiled
        return tiled

    def _finish_splice(self, job, planes, packed_row, meta, blocks,
                       splice) -> bytes | None:
        """Host tail of the splice-annotate path for one frame: scatter
        the device's overlay-touched blocks into the original
        entropy-decoded arrays and entropy-code. Overflowed budgets and
        mismatched chroma quant tables fall back to host annotation
        from the original JPEG bytes; None = frame dropped."""
        from infercam_onnx_tpu.native import jpeg as nj
        from infercam_onnx_tpu.ops.jpeg_encode_device import (
            splice_blocks)

        y_o, cb_o, cr_o, quant, wh, samp = planes
        n_touched = int(meta[0])
        with STAGES.stage("encode"):
            if (n_touched <= splice["k"]
                    and np.array_equal(quant[0, 1], quant[0, 2])):
                ys, cbs, crs = splice_blocks(
                    y_o[0], cb_o[0], cr_o[0], meta, blocks)
                return nj.load().encode_coefs(
                    ys, cbs, crs, wh, samp, quant[0, :2])
        # fallback: reference-style host annotate from the original
        # bytes (rare: overlay touched more than the block budget)
        log.debug("splice fallback on stream %x (%d blocks > %d)",
                  job.key, n_touched, splice["k"])
        try:
            img = codec.decode_rgb(job.data)
        except ValueError:
            return None
        count = int(packed_row[:, 5].sum())
        dets = [(packed_row[d, :4], float(packed_row[d, 4]))
                for d in range(count)]
        with STAGES.stage("draw"):
            annotated = draw_detections(
                img, dets, self._server_cfg.assume_frame_dims)
        with STAGES.stage("encode"):
            return codec.encode_rgb(
                annotated, self._server_cfg.jpeg_quality,
                self._server_cfg.jpeg_subsampling)

    def _run_detection(self, batch: np.ndarray, h: int, w: int):
        """Dispatch the right device program; returns packed [B, D, 6]
        as a DEVICE array (both plain and tiled paths) — the publish
        stage materializes it after the async host copy."""
        if self._is_tiled(w, h):
            if hasattr(self._detector, "run_device_tiled"):
                # lockstep detectors dispatch tiled units inside the
                # agreed cluster round instead of a local program
                return self._detector.run_device_tiled(
                    batch, (w, h), grid=self._cfg.tile_grid,
                    overlap=self._cfg.tile_overlap)
            return self._get_tiled(w, h).run_device(
                batch, pack_output=True)
        return self._detector.run_device(batch, pack_output=True)

    def warmup(self, resolutions: list[tuple[int, int]] | None = None):
        """Pre-compile device programs for common shape buckets.

        Resolutions are as-received from senders; the configured
        decode_scale is applied (frames reach the device post-decode).
        In coefficient mode the coefficient programs compile too (a
        synthetic JPEG of each resolution supplies exact block geometry).
        """
        import jax as _jax

        s = self._cfg.decode_scale
        for (h, w) in resolutions or [(480, 640)]:
            for b in self._buckets:
                self._detector.warmup(b, h // s, w // s, pack_output=True)
            if (self._annotate_device_active
                    and self._effective_decode_mode == "pixels"):
                for b in self._buckets:
                    dummy = np.zeros((b, h // s, w // s, 3), np.uint8)
                    _jax.block_until_ready(
                        self._detector.run_device_annotated(
                            dummy,
                            quality=self._server_cfg.jpeg_quality,
                            subsampling=self._server_cfg.jpeg_subsampling,
                            disp_dims=self._server_cfg.assume_frame_dims)
                        [0])
            if self._effective_decode_mode == "coefficients":
                import jax

                from infercam_onnx_tpu.ops.jpeg_device import (
                    read_coefficient_batch)

                probe = codec.encode_rgb(
                    np.zeros((h, w, 3), np.uint8), 90, "420")
                for b in self._buckets:
                    y, cb, cr, q, wh, samp = read_coefficient_batch(
                        [probe] * b)
                    jax.block_until_ready(
                        self._detector.run_device_coefficients_arrays(
                            y, cb, cr, q, wh, sampling=samp,
                            pack_output=True))
                    if self._annotate_device_active and hasattr(
                            self._detector,
                            "run_device_coefficients_annotated"):
                        jax.block_until_ready(
                            self._detector
                            .run_device_coefficients_annotated(
                                y, cb, cr, q, wh, sampling=samp,
                                k=self._cfg.annotate_splice_blocks,
                                disp_dims=(self._server_cfg
                                           .assume_frame_dims))[0])
            if self._effective_decode_mode == "ycbcr":
                import jax

                from infercam_onnx_tpu.native import jpeg as native_jpeg

                probe = codec.encode_rgb(
                    np.zeros((h, w, 3), np.uint8), 90, "420")
                for b in self._buckets:
                    packed, geom = native_jpeg.load().decode_ycbcr_batch(
                        [probe] * b, scale=s)
                    jax.block_until_ready(
                        self._detector.run_device_ycbcr_packed(
                            packed, geom, pack_output=True))
                    if self._annotate_device_active:
                        jax.block_until_ready(
                            self._detector.run_device_ycbcr_annotated(
                                packed, geom,
                                quality=self._server_cfg.jpeg_quality,
                                disp_dims=(
                                    self._server_cfg.assume_frame_dims))
                            [0])
