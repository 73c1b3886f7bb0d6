"""End-to-end serving tests: replay sender -> TCP ingest -> router ->
micro-batched inferer -> HTTP MJPEG endpoints.

Covers the behavioral contract the reference leaves untested (SURVEY.md
section 4: no router/data-socket/endpoint tests exist there): healthcheck,
raw and inferred streams, demand-driven inference, drop-when-busy, corrupt
frames, multi-stream fan-out, and ConnectReq-ignored semantics.
"""

import asyncio
import io

import numpy as np
import pytest

from infercam_onnx_tpu import codec
from infercam_onnx_tpu import protocol as proto
from infercam_onnx_tpu.config import (
    ClientConfig,
    DetectorConfig,
    EngineConfig,
    ServerConfig,
)
from infercam_onnx_tpu.detector import Detector
from infercam_onnx_tpu.serving.app import start_server
from infercam_onnx_tpu.client.sender import ReplaySource, send_stream


@pytest.fixture(scope="module")
def detector():
    # deterministic random weights, moderately sparse detections
    det = Detector(
        DetectorConfig(variant="RFB-320", compute_dtype="float32"),
        rng=0)
    # pre-compile the two bucket programs for the 64x48 test frames
    det.warmup(1, 48, 64)
    det.warmup(4, 48, 64)
    return det


@pytest.fixture()
def jpeg_dir(tmp_path):
    rng = np.random.default_rng(5)
    for i in range(3):
        frame = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
        (tmp_path / f"f{i}.jpg").write_bytes(codec.encode_rgb(frame))
    return tmp_path


async def _start(detector, http_port, sock_port, **engine_kw):
    cfg = ServerConfig(
        http_address=f"127.0.0.1:{http_port}",
        socket_address=f"127.0.0.1:{sock_port}")
    # small bucket list: CPU test compiles are slow (one per bucket+shape);
    # the persistent compile cache makes reruns fast. data_parallel off:
    # most tests exercise single-device semantics (the dedicated sharded
    # test below passes a pre-built ShardedDetector instead, avoiding a
    # recompile per start_server call on the 8-device mesh).
    engine_kw.setdefault("batch_buckets", (1, 4))
    server = await start_server(
        server_config=cfg,
        engine_config=EngineConfig(**engine_kw),
        detector=detector,
        data_parallel="off")
    return server, cfg


def _ndjson_lines(n):
    """_http_get stop predicate: n complete NDJSON body lines arrived.

    Without a stop, an NDJSON read with a large read_bytes waits out its
    FULL timeout (a few small records never fill the quota — the
    detections tests each burned a flat 60 s this way)."""
    def stop(data):
        if b"\r\n\r\n" not in data:
            return False
        return data.split(b"\r\n\r\n", 1)[1].count(b"\n") >= n
    return stop


async def _http_get(port, path, *, read_bytes=0, timeout=10.0, stop=None):
    reader, writer = await asyncio.open_connection("127.0.0.1", port)
    writer.write(f"GET {path} HTTP/1.1\r\nHost: x\r\n"
                 "Connection: close\r\n\r\n".encode())
    await writer.drain()
    if read_bytes:
        data = b""
        try:
            while len(data) < read_bytes:
                chunk = await asyncio.wait_for(reader.read(4096), timeout)
                if not chunk:
                    break
                data += chunk
                if stop is not None and stop(data):
                    break
        except asyncio.TimeoutError:
            pass
    else:
        data = await asyncio.wait_for(reader.read(65536), timeout)
    writer.close()
    return data


async def _until(cond, *, timeout=20.0, interval=0.02, desc=""):
    """Poll ``cond()`` until truthy (returns its value) — replaces the
    fixed pre-assert sleeps that made these tests load-sensitive."""
    import time as _time

    deadline = _time.monotonic() + timeout
    while True:
        v = cond()
        if v:
            return v
        if _time.monotonic() > deadline:
            raise AssertionError(
                f"condition never met within {timeout}s: {desc}")
        await asyncio.sleep(interval)


async def _until_async(get, pred, *, timeout=20.0, interval=0.1,
                       desc=""):
    """Re-fetch ``await get()`` until ``pred(value)``; returns value."""
    import time as _time

    deadline = _time.monotonic() + timeout
    while True:
        v = await get()
        if pred(v):
            return v
        if _time.monotonic() > deadline:
            raise AssertionError(
                f"condition never met within {timeout}s: {desc}")
        await asyncio.sleep(interval)


def _subscribed(server, name, kind="inferred", n=1):
    """True once an HTTP viewer's subscription reached the router (the
    observable the old 'sleep after opening the stream' waits for)."""
    from infercam_onnx_tpu.serving.router import stream_key

    table = {"raw": server.router._raw,
             "inferred": server.router._inferred,
             "detections": server.router._detections}[kind]
    chan = table.get(stream_key(name))
    return chan is not None and chan.receiver_count >= n


def test_healthcheck(detector):
    async def run():
        server, _ = await _start(detector, 18300, 18301)
        try:
            resp = await _http_get(18300, "/healthcheck")
            assert resp.startswith(b"HTTP/1.1 200 OK")
            assert resp.endswith(b"healthy")
        finally:
            await server.close()

    asyncio.run(run())


def test_unknown_route_404_and_post_405(detector):
    async def run():
        server, _ = await _start(detector, 18302, 18303)
        try:
            resp = await _http_get(18302, "/nope")
            assert resp.startswith(b"HTTP/1.1 404")
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", 18302)
            writer.write(b"POST /stream HTTP/1.1\r\nHost: x\r\n\r\n")
            await writer.drain()
            resp = await asyncio.wait_for(reader.read(65536), 5)
            assert resp.startswith(b"HTTP/1.1 405")
            writer.close()
        finally:
            await server.close()

    asyncio.run(run())


def test_raw_stream_end_to_end(detector, jpeg_dir):
    async def run():
        server, _ = await _start(detector, 18304, 18305)
        try:
            # subscribe first (demand-driven: router only forwards to
            # subscribed streams)
            stream_task = asyncio.create_task(
                _http_get(18304, "/stream?name=cam1", read_bytes=2000))
            await _until(lambda: _subscribed(server, "cam1", "raw"),
                         desc="cam1 raw viewer")
            sent = await send_stream(
                ReplaySource(str(jpeg_dir), fps=50),
                ClientConfig(address="127.0.0.1:18305", channel="cam1"),
                max_frames=10)
            assert sent == 10
            data = await stream_task
            assert b"multipart/x-mixed-replace; boundary=frame" in data
            assert data.count(b"--frame\r\nContent-Type: image/jpeg") >= 1
            # the MJPEG parts carry real JPEG bytes
            body = data.split(b"\r\n\r\n", 2)[2]
            assert b"\xff\xd8" in body  # JPEG SOI marker
        finally:
            await server.close()

    asyncio.run(run())


def test_face_stream_end_to_end(detector, jpeg_dir):
    async def run():
        server, _ = await _start(detector, 18306, 18307,
                                 batch_window_ms=5.0)
        try:
            stream_task = asyncio.create_task(
                _http_get(18306, "/face_stream?name=cam1",
                          read_bytes=1200, timeout=30.0))
            await _until(lambda: _subscribed(server, "cam1"),
                         desc="cam1 face viewer")
            await send_stream(
                ReplaySource(str(jpeg_dir), fps=20),
                ClientConfig(address="127.0.0.1:18307", channel="cam1"),
                max_frames=12)
            data = await stream_task
            assert data.count(b"--frame\r\nContent-Type: image/jpeg") >= 1
        finally:
            await server.close()

    asyncio.run(run())


def test_unwatched_stream_is_not_inferred(detector, jpeg_dir):
    async def run():
        server, _ = await _start(detector, 18308, 18309)
        try:
            submitted = []
            orig = server.worker.submit
            server.worker.submit = lambda job: (
                submitted.append(job), orig(job))[1]
            await send_stream(
                ReplaySource(str(jpeg_dir), fps=100),
                ClientConfig(address="127.0.0.1:18309", channel="nobody"),
                max_frames=8)
            await _until(lambda: "nobody" in server.router._seen,
                         desc="router saw the unwatched stream")
            assert submitted == []  # no viewer -> no inference
        finally:
            await server.close()

    asyncio.run(run())


def test_corrupt_frame_does_not_kill_worker(detector, jpeg_dir):
    async def run():
        server, _ = await _start(detector, 18310, 18311)
        try:
            stream_task = asyncio.create_task(
                _http_get(18310, "/face_stream?name=c", read_bytes=1200,
                          timeout=30.0))
            await _until(lambda: _subscribed(server, "c"),
                         desc="face viewer c")
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", 18311)
            # corrupt JPEG payload on a watched stream
            writer.write(proto.frame_encode(proto.encode_proto_msg(
                proto.FrameMsg("c", b"\xff\xd8 this is not a jpeg"))))
            # ConnectReq must be accepted and ignored
            writer.write(proto.frame_encode(proto.encode_proto_msg(
                proto.ConnectReq("c"))))
            # pure garbage frame must be skipped silently
            writer.write(proto.frame_encode(b"\x99garbage"))
            await writer.drain()
            # then a good frame still flows through the full path
            good = (jpeg_dir / "f0.jpg").read_bytes()
            for _ in range(5):
                writer.write(proto.frame_encode(proto.encode_proto_msg(
                    proto.FrameMsg("c", good))))
            await writer.drain()
            data = await stream_task
            assert data.count(b"--frame\r\nContent-Type: image/jpeg") >= 1
            writer.close()
        finally:
            await server.close()

    asyncio.run(run())


def test_multi_stream_fanout(detector, jpeg_dir):
    async def run():
        server, _ = await _start(detector, 18312, 18313)
        try:
            t1 = asyncio.create_task(
                _http_get(18312, "/stream?name=a", read_bytes=800))
            t2 = asyncio.create_task(
                _http_get(18312, "/stream?name=b", read_bytes=800))
            await _until(lambda: (_subscribed(server, "a", "raw")
                                  and _subscribed(server, "b", "raw")),
                         desc="both raw viewers")
            await asyncio.gather(
                send_stream(ReplaySource(str(jpeg_dir), fps=50),
                            ClientConfig(address="127.0.0.1:18313",
                                         channel="a"), max_frames=6),
                send_stream(ReplaySource(str(jpeg_dir), fps=50),
                            ClientConfig(address="127.0.0.1:18313",
                                         channel="b"), max_frames=6),
            )
            d1, d2 = await asyncio.gather(t1, t2)
            assert d1.count(b"--frame") >= 1
            assert d2.count(b"--frame") >= 1
        finally:
            await server.close()

    asyncio.run(run())


def test_submit_queue_drops_when_full(detector):
    from infercam_onnx_tpu.serving.inferer import InferenceWorker
    from infercam_onnx_tpu.serving.router import InferJob
    from infercam_onnx_tpu.serving.broadcast import Broadcast

    async def run():
        worker = InferenceWorker(
            detector, EngineConfig(queue_capacity=2))
        chan = Broadcast()
        ok = [worker.submit(InferJob(i, b"x", chan)) for i in range(4)]
        assert ok == [True, True, False, False]

    asyncio.run(run())


def test_stats_endpoint(detector, jpeg_dir):
    async def run():
        server, _ = await _start(detector, 18314, 18315)
        try:
            import json

            resp = await _http_get(18314, "/stats")
            body = resp.split(b"\r\n\r\n", 1)[1]
            stats = json.loads(body)
            assert "totals" in stats and "uptime_s" in stats
            topo = stats["topology"]
            assert topo["devices"] == 1 and not topo["lockstep"]
            assert topo["detector"] == "Detector"
            # drive some traffic, then stats must show totals
            t = asyncio.create_task(
                _http_get(18314, "/stream?name=s", read_bytes=500))
            await _until(lambda: _subscribed(server, "s", "raw"),
                         desc="raw viewer s")
            await send_stream(
                ReplaySource(str(jpeg_dir), fps=100),
                ClientConfig(address="127.0.0.1:18315", channel="s"),
                max_frames=5)
            await t

            async def fetch_stats():
                r = await _http_get(18314, "/stats")
                return json.loads(r.split(b"\r\n\r\n", 1)[1])

            # totals fill on the meter's drain cycle — poll, don't sleep
            stats = await _until_async(
                fetch_stats,
                lambda st: st["totals"].get("raw_unique", 0) >= 1,
                desc="meter drained raw totals")
        finally:
            await server.close()

    asyncio.run(run())


def test_tiled_high_res_serving_path(detector, tmp_path):
    # frames big enough to cross tile_min_pixels flow through the tiled
    # detector (BASELINE config 5) and still produce MJPEG parts
    rng = np.random.default_rng(11)
    frame = rng.integers(0, 256, size=(96, 128, 3), dtype=np.uint8)
    (tmp_path / "big.jpg").write_bytes(codec.encode_rgb(frame))

    async def run():
        server, _ = await _start(detector, 18316, 18317,
                                 tile_min_pixels=96 * 128,
                                 tile_grid=(2, 2))
        try:
            stream_task = asyncio.create_task(
                _http_get(18316, "/face_stream?name=t", read_bytes=800,
                          timeout=60.0))
            await _until(lambda: _subscribed(server, "t"),
                         desc="face viewer t")
            await send_stream(
                ReplaySource(str(tmp_path), fps=10),
                ClientConfig(address="127.0.0.1:18317", channel="t"),
                max_frames=6)
            data = await stream_task
            assert data.count(b"--frame\r\nContent-Type: image/jpeg") >= 1
            # the tiled detector was actually instantiated for this shape
            assert (96, 128) in server.worker._tiled
        finally:
            await server.close()

    asyncio.run(run())


def test_tiled_ycbcr_rows_serving_path(detector, tmp_path):
    """High-res streams in ycbcr mode take the chunked-row upload route
    on a single host (ycbcr_tiled_rows units: per-frame async
    device_puts issued back-to-back, stacked on device) — the tunnel
    transfer discipline for the most transfer-hungry unit kind."""
    import json

    rng = np.random.default_rng(21)
    frame = rng.integers(0, 256, size=(96, 128, 3), dtype=np.uint8)
    (tmp_path / "big.jpg").write_bytes(
        codec.encode_rgb(frame, 90, "420"))

    async def run():
        # tiled_upload pinned to "rows": under "auto" the startup probe
        # on the CPU backend measures a healthy link and picks the
        # stacked route (that flip is covered by test_link_adaptive.py)
        server, _ = await _start(detector, 18400, 18401,
                                 decode_mode="ycbcr",
                                 tile_min_pixels=96 * 128,
                                 tile_grid=(2, 2),
                                 tiled_upload="rows")
        try:
            kinds: list = []
            orig = server.worker._device_stage

            def spy(units):
                kinds.extend(u["kind"] for u in units)
                return orig(units)

            server.worker._device_stage = spy
            stream_task = asyncio.create_task(
                _http_get(18400, "/detections?name=r",
                          read_bytes=10000, timeout=60.0,
                          stop=_ndjson_lines(1)))
            await _until(lambda: _subscribed(server, "r", "detections"),
                         desc="detections viewer r")
            await send_stream(
                ReplaySource(str(tmp_path), fps=10),
                ClientConfig(address="127.0.0.1:18401", channel="r"),
                max_frames=6)
            data = await stream_task
            body = data.split(b"\r\n\r\n", 1)[1]
            lines = [ln for ln in body.split(b"\n")[:-1] if ln.strip()]
            assert lines
            rec = json.loads(lines[0])
            assert rec["width"] == 128 and rec["height"] == 96
            assert "ycbcr_tiled_rows" in kinds, kinds
        finally:
            await server.close()

    asyncio.run(run())


def test_detections_ndjson_endpoint(detector, jpeg_dir):
    import json

    async def run():
        server, _ = await _start(detector, 18318, 18319)
        try:
            stream_task = asyncio.create_task(
                _http_get(18318, "/detections?name=d",
                          read_bytes=8000, timeout=30.0,
                          stop=_ndjson_lines(2)))
            await _until(
                lambda: _subscribed(server, "d", "detections"),
                desc="detections viewer d")
            await send_stream(
                ReplaySource(str(jpeg_dir), fps=20),
                ClientConfig(address="127.0.0.1:18319", channel="d"),
                max_frames=8)
            data = await stream_task
            head, body = data.split(b"\r\n\r\n", 1)
            assert b"application/x-ndjson" in head
            # only complete lines (the read may stop mid-record)
            lines = body.split(b"\n")[:-1]
            lines = [l for l in lines if l.strip()]
            assert lines, "no complete detection records received"
            rec = json.loads(lines[0])
            assert {"ts", "width", "height", "detections"} <= set(rec)
            for det in rec["detections"]:
                assert len(det["bbox"]) == 4
                assert 0.0 <= det["confidence"] <= 1.0
        finally:
            await server.close()

    asyncio.run(run())


def test_detections_with_coefficient_mode(detector, tmp_path):
    """Zero-pixel path: detection-only viewers + decode_mode=coefficients
    (the serving integration of BASELINE config 4)."""
    import json

    rng = np.random.default_rng(12)
    yy, xx = np.mgrid[0:48, 0:64]
    img = np.clip(127 + 100 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
                  + rng.normal(0, 10, (48, 64)), 0, 255)
    frame = np.stack([img] * 3, axis=-1).astype(np.uint8)
    (tmp_path / "c.jpg").write_bytes(codec.encode_rgb(frame, 90, "420"))

    async def run():
        # link_adaptive off: this test exists to exercise the
        # coefficients serving path; a loaded-CPU probe reading
        # "degraded" would silently re-route it to ycbcr
        server, _ = await _start(detector, 18320, 18321,
                                 decode_mode="coefficients",
                                 link_adaptive=False)
        try:
            stream_task = asyncio.create_task(
                _http_get(18320, "/detections?name=z",
                          read_bytes=8000, timeout=60.0,
                          stop=_ndjson_lines(2)))
            await _until(
                lambda: _subscribed(server, "z", "detections"),
                desc="detections viewer z")
            await send_stream(
                ReplaySource(str(tmp_path), fps=10),
                ClientConfig(address="127.0.0.1:18321", channel="z"),
                max_frames=6)
            data = await stream_task
            body = data.split(b"\r\n\r\n", 1)[1]
            lines = [l for l in body.split(b"\n")[:-1] if l.strip()]
            assert lines
            rec = json.loads(lines[0])
            assert rec["width"] == 64 and rec["height"] == 48
        finally:
            await server.close()

    asyncio.run(run())


def test_sender_reconnects_after_server_restart(detector, jpeg_dir):
    """The client reconnect contract (reference socket_sender.rs:53-59):
    any server outage triggers retry with backoff, forever."""
    from infercam_onnx_tpu.client.sender import run_forever

    async def run():
        server, _ = await _start(detector, 18322, 18323)
        sender_task = asyncio.create_task(run_forever(
            ReplaySource(str(jpeg_dir), fps=50),
            ClientConfig(address="127.0.0.1:18323", channel="r",
                         reconnect_backoff_s=0.2)))
        try:
            t1 = asyncio.create_task(
                _http_get(18322, "/stream?name=r", read_bytes=500))
            d1 = await t1
            assert d1.count(b"--frame") >= 1

            # restart the server (same ports)
            await server.close()
            await asyncio.sleep(0.5)
            server, _ = await _start(detector, 18322, 18323)

            # the sender must reconnect on its own and frames flow again
            t2 = asyncio.create_task(
                _http_get(18322, "/stream?name=r", read_bytes=500,
                          timeout=20.0))
            d2 = await t2
            assert d2.count(b"--frame") >= 1
        finally:
            sender_task.cancel()
            await asyncio.gather(sender_task, return_exceptions=True)
            await server.close()

    asyncio.run(run())


def test_four_streams_form_real_batches(detector, jpeg_dir):
    """BASELINE config 3: concurrent streams coalesce into one batched
    device program (mean batch > 1)."""
    async def run():
        server, _ = await _start(detector, 18324, 18325,
                                 batch_window_ms=60.0)
        meter = server.worker._meter
        try:
            viewers = [asyncio.create_task(
                _http_get(18324, f"/face_stream?name=s{i}",
                          read_bytes=600, timeout=45.0))
                for i in range(4)]
            await _until(lambda: all(_subscribed(server, f"s{i}")
                                     for i in range(4)),
                         desc="all four face viewers")
            senders = [asyncio.create_task(send_stream(
                ReplaySource(str(jpeg_dir), fps=30),
                ClientConfig(address="127.0.0.1:18325",
                             channel=f"s{i}"), max_frames=40))
                for i in range(4)]
            await asyncio.gather(*senders)
            await asyncio.gather(*viewers)
            # batches formed across streams
            assert meter.batches >= 1 or meter.totals.get("batches", 0) >= 1
            mean = (meter.batched_frames / meter.batches
                    if meter.batches else
                    meter.last_window.get("mean_batch", 0))
            assert mean > 1.0, f"no cross-stream batching (mean={mean})"
        finally:
            await server.close()

    asyncio.run(run())


def test_core_task_supervision_restarts_crashed_worker(detector,
                                                       jpeg_dir):
    """A crash inside the inference worker must not kill inference
    permanently (the reference's inferer dies silently on a panic and
    /face_stream stops forever; here the supervisor restarts it)."""

    async def run():
        server, _ = await _start(detector, 18326, 18327)
        try:
            # sabotage one batch: first _decode call raises
            orig = server.worker._decode
            calls = {"n": 0}

            def bomb(jobs):
                calls["n"] += 1
                if calls["n"] == 1:
                    raise RuntimeError("injected decode crash")
                return orig(jobs)

            server.worker._decode = bomb

            stream_task = asyncio.create_task(
                _http_get(18326, "/face_stream?name=v", read_bytes=600,
                          timeout=40.0))
            await _until(lambda: _subscribed(server, "v"),
                         desc="face viewer v")
            await send_stream(
                ReplaySource(str(jpeg_dir), fps=20),
                ClientConfig(address="127.0.0.1:18327", channel="v"),
                max_frames=30)
            await _until(lambda: calls["n"] >= 2, timeout=30.0,
                         desc="worker restarted after injected crash")
            data = await stream_task
            assert calls["n"] >= 2, "worker was not restarted"
            assert data.count(b"--frame\r\nContent-Type: image/jpeg") >= 1
        finally:
            await server.close()

    asyncio.run(run())


def test_http_malformed_requests(detector):
    async def run():
        server, _ = await _start(detector, 18328, 18329)
        try:
            # garbage request line -> 400
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", 18328)
            writer.write(b"garbage\r\n\r\n")
            await writer.drain()
            resp = await asyncio.wait_for(reader.read(65536), 5)
            assert resp.startswith(b"HTTP/1.1 400")
            writer.close()
            # immediate disconnect must not wedge the server
            r2, w2 = await asyncio.open_connection("127.0.0.1", 18328)
            w2.close()
            resp = await _http_get(18328, "/healthcheck")
            assert resp.endswith(b"healthy")
        finally:
            await server.close()

    asyncio.run(run())


def test_data_parallel_serving_on_mesh(detector, jpeg_dir):
    """BASELINE config 5 serving integration: 8 concurrent streams shard
    their micro-batch across the 8-device mesh inside the serving worker
    and annotated MJPEG still flows to every viewer."""
    from infercam_onnx_tpu.parallel import ShardedDetector, make_mesh

    mesh = make_mesh(8)
    shard_det = ShardedDetector(detector, mesh)

    async def run():
        cfg = ServerConfig(http_address="127.0.0.1:18340",
                           socket_address="127.0.0.1:18341")
        server = await start_server(
            server_config=cfg,
            engine_config=EngineConfig(batch_buckets=(1, 8),
                                       batch_window_ms=60.0),
            detector=shard_det,
            mesh=mesh)
        # the worker must adopt the sharded detector as-is (no rewrap)
        assert server.worker._detector is shard_det
        try:
            viewers = [asyncio.create_task(
                _http_get(18340, f"/face_stream?name=m{i}",
                          read_bytes=600, timeout=60.0))
                for i in range(8)]
            await _until(lambda: all(_subscribed(server, f"m{i}")
                                     for i in range(8)),
                         desc="all eight face viewers")
            senders = [asyncio.create_task(send_stream(
                ReplaySource(str(jpeg_dir), fps=30),
                ClientConfig(address="127.0.0.1:18341",
                             channel=f"m{i}"), max_frames=30))
                for i in range(8)]
            await asyncio.gather(*senders)
            parts = await asyncio.gather(*viewers)
            # every stream's viewer received annotated MJPEG parts
            for i, data in enumerate(parts):
                assert data.count(b"--frame") >= 1, f"stream m{i} starved"
            # and the batches really went through the SHARDED programs
            assert shard_det.dispatches >= 1
        finally:
            await server.close()

    asyncio.run(run())


def test_sharded_detector_matches_single_device(detector, rng):
    """Padding path: batches NOT divisible by the mesh (e.g. 3 streams on
    8 chips) pad up, shard, and slice back to identical results."""
    from infercam_onnx_tpu.parallel import ShardedDetector, make_mesh

    shard_det = ShardedDetector(detector, make_mesh(8))
    frames = rng.integers(0, 256, size=(3, 48, 64, 3), dtype=np.uint8)
    packed_s = np.asarray(shard_det.run_device(frames, pack_output=True))
    packed_1 = np.asarray(detector.run_device(frames, pack_output=True))
    assert packed_s.shape == packed_1.shape  # sliced back to B=3
    np.testing.assert_allclose(packed_s, packed_1, atol=1e-5)

    b_s, c_s, n_s = (np.asarray(a) for a in shard_det.run_device(frames))
    b_1, c_1, n_1 = (np.asarray(a) for a in detector.run_device(frames))
    np.testing.assert_array_equal(n_s, n_1)
    np.testing.assert_allclose(b_s, b_1, atol=1e-5)


def test_sharded_coefficient_path_matches_single_device(detector, rng):
    from infercam_onnx_tpu.parallel import ShardedDetector, make_mesh

    yy, xx = np.mgrid[0:48, 0:64]
    img = np.clip(np.stack([
        127 + 100 * np.sin(xx / 7.0) * np.cos(yy / 5.0),
        127 + 90 * np.cos(xx / 4.0),
        127 + 80 * np.sin(yy / 6.0),
    ], axis=-1), 0, 255).astype(np.uint8)
    datas = [codec.encode_rgb(img, 90, "420") for _ in range(3)]

    from infercam_onnx_tpu.ops.jpeg_device import read_coefficient_batch

    y, cb, cr, q, wh, samp = read_coefficient_batch(datas)
    shard_det = ShardedDetector(detector, make_mesh(8))
    p_s = np.asarray(shard_det.run_device_coefficients_arrays(
        y, cb, cr, q, wh, sampling=samp, pack_output=True))
    p_1 = np.asarray(detector.run_device_coefficients_arrays(
        y, cb, cr, q, wh, sampling=samp, pack_output=True))
    np.testing.assert_allclose(p_s, p_1, atol=1e-5)


def test_http_keep_alive_multiple_requests(detector):
    """Non-streaming endpoints serve multiple requests per connection
    (HTTP/1.1 keep-alive, like the reference's axum server); a
    Connection: close request ends the connection."""

    async def read_response(reader):
        header = b""
        while b"\r\n\r\n" not in header:
            chunk = await asyncio.wait_for(reader.readline(), 5.0)
            assert chunk, "connection closed mid-headers"
            header += chunk
        length = None
        for line in header.split(b"\r\n"):
            if line.lower().startswith(b"content-length:"):
                length = int(line.split(b":")[1])
        body = await asyncio.wait_for(reader.readexactly(length), 5.0)
        return header, body

    async def run():
        server, _ = await _start(detector, 18350, 18351)
        try:
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", 18350)
            # three requests over ONE connection
            for path in ("/healthcheck", "/stats", "/healthcheck"):
                writer.write(
                    f"GET {path} HTTP/1.1\r\nHost: x\r\n\r\n".encode())
                await writer.drain()
                header, body = await read_response(reader)
                assert header.startswith(b"HTTP/1.1 200 OK")
                assert b"Connection: keep-alive" in header
            # explicit close is honored
            writer.write(b"GET /healthcheck HTTP/1.1\r\nHost: x\r\n"
                         b"Connection: close\r\n\r\n")
            await writer.drain()
            header, body = await read_response(reader)
            assert b"Connection: close" in header
            assert body == b"healthy"
            tail = await asyncio.wait_for(reader.read(64), 5.0)
            assert tail == b""  # server closed
            writer.close()

            # HTTP/1.0 requests close after one response
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", 18350)
            writer.write(b"GET /healthcheck HTTP/1.0\r\nHost: x\r\n\r\n")
            await writer.drain()
            data = await asyncio.wait_for(reader.read(-1), 5.0)
            assert data.endswith(b"healthy")
            writer.close()
        finally:
            await server.close()

    asyncio.run(run())


def test_detections_with_ycbcr_mode(detector, tmp_path):
    """Transfer-optimal zero-pixel path: detection-only viewers +
    decode_mode=ycbcr (host entropy+IDCT, device upsample+color+detect
    over one packed buffer)."""
    import json

    rng = np.random.default_rng(12)
    yy, xx = np.mgrid[0:48, 0:64]
    img = np.clip(127 + 100 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
                  + rng.normal(0, 10, (48, 64)), 0, 255)
    frame = np.stack([img] * 3, axis=-1).astype(np.uint8)
    (tmp_path / "y.jpg").write_bytes(codec.encode_rgb(frame, 90, "420"))

    async def run():
        server, _ = await _start(detector, 18360, 18361,
                                 decode_mode="ycbcr")
        try:
            stream_task = asyncio.create_task(
                _http_get(18360, "/detections?name=y",
                          read_bytes=8000, timeout=60.0,
                          stop=_ndjson_lines(2)))
            await _until(
                lambda: _subscribed(server, "y", "detections"),
                desc="detections viewer y")
            await send_stream(
                ReplaySource(str(tmp_path), fps=10),
                ClientConfig(address="127.0.0.1:18361", channel="y"),
                max_frames=6)
            data = await stream_task
            body = data.split(b"\r\n\r\n", 1)[1]
            lines = [ln for ln in body.split(b"\n")[:-1] if ln.strip()]
            assert lines
            rec = json.loads(lines[0])
            assert rec["width"] == 64 and rec["height"] == 48
        finally:
            await server.close()

    asyncio.run(run())


@pytest.mark.parametrize("kind", ["444", "422", "grayscale"])
def test_ycbcr_mode_serves_nonstandard_chroma(detector, tmp_path, kind):
    """4:4:4 and 4:2:2 JPEGs ride the packed-plane device tail natively
    (sampling (1,1) / (2,1) geometry — 4:2:2 is what UVC webcams
    typically emit); layouts the native path rejects outright
    (grayscale here) fall back to pixel decode instead of being dropped
    (regression: such streams previously lost every frame)."""
    import json

    rng = np.random.default_rng(13)
    frame = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    if kind == "grayscale":
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(frame[..., 0], "L").save(buf, "JPEG",
                                                 quality=90)
        (tmp_path / "f.jpg").write_bytes(buf.getvalue())
    else:
        (tmp_path / "f.jpg").write_bytes(
            codec.encode_rgb(frame, 90, kind))

    async def run():
        server, _ = await _start(detector, 18364, 18365,
                                 decode_mode="ycbcr")
        try:
            # noise frames + random weights emit up to max_detections
            # boxes, so one NDJSON record can be ~8 KB — read enough
            # for at least one COMPLETE newline-terminated record
            stream_task = asyncio.create_task(
                _http_get(18364, "/detections?name=q",
                          read_bytes=10000, timeout=30.0))
            await _until(
                lambda: _subscribed(server, "q", "detections"),
                desc="detections viewer q")
            await send_stream(
                ReplaySource(str(tmp_path), fps=10),
                ClientConfig(address="127.0.0.1:18365", channel="q"),
                max_frames=6)
            data = await stream_task
            body = data.split(b"\r\n\r\n", 1)[1]
            lines = [ln for ln in body.split(b"\n")[:-1] if ln.strip()]
            assert lines, "4:4:4 frames were dropped, not served"
            rec = json.loads(lines[0])
            assert rec["width"] == 64 and rec["height"] == 48
        finally:
            await server.close()

    asyncio.run(run())


def test_dashboard_lists_active_streams(detector, jpeg_dir):
    """GET / renders the zero-dep status page: active stream names with
    thumbnails/links appear once frames flow."""

    async def run():
        server, _ = await _start(detector, 18372, 18373)
        try:
            resp = await _http_get(18372, "/")
            assert b"200 OK" in resp and b"No active streams" in resp
            await send_stream(
                ReplaySource(str(jpeg_dir), fps=50),
                ClientConfig(address="127.0.0.1:18373", channel="cam-A"),
                max_frames=5)
            await _until(lambda: "cam-A" in server.router._seen,
                         desc="router registered cam-A")
            resp = await _http_get(18372, "/")
            assert b"cam-A" in resp
            assert b"/face_stream?name=cam-A" in resp
        finally:
            await server.close()

    asyncio.run(run())


def test_snapshot_keepalive_two_requests_one_connection(detector,
                                                        jpeg_dir):
    """/snapshot is a non-streaming endpoint: HTTP/1.1 keep-alive
    serves several snapshots over one socket."""

    async def run():
        server, _ = await _start(detector, 18376, 18377)
        try:
            sender = asyncio.create_task(send_stream(
                ReplaySource(str(jpeg_dir), fps=30),
                ClientConfig(address="127.0.0.1:18377", channel="k"),
                max_frames=200))
            await _until(lambda: "k" in server.router._seen,
                         desc="frames flowing on k")
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", 18376)
            bodies = []
            for _ in range(2):
                writer.write(b"GET /snapshot?name=k&raw=1&timeout=10 "
                             b"HTTP/1.1\r\nHost: x\r\n\r\n")
                await writer.drain()
                head = b""
                while b"\r\n\r\n" not in head:
                    head += await asyncio.wait_for(
                        reader.read(1), 20.0)
                headers = head.decode("latin-1")
                assert "200 OK" in headers
                assert "keep-alive" in headers
                n = int([ln.split(":")[1] for ln in headers.split("\r\n")
                         if ln.lower().startswith("content-length")][0])
                body = await asyncio.wait_for(
                    reader.readexactly(n), 20.0)
                bodies.append(body)
            sender.cancel()
            writer.close()
            assert all(b.startswith(b"\xff\xd8") for b in bodies)
        finally:
            await server.close()

    asyncio.run(run())


def test_stream_name_registry_bounded():
    """A sender minting unlimited distinct stream ids must not grow the
    router's name registry without bound."""
    from infercam_onnx_tpu.serving.router import FrameRouter

    router = FrameRouter(lambda job: True)
    for i in range(6000):
        router._seen[f"flood-{i}"] = float(i)
    router._prune_seen(now=float(6000), max_age_s=10**9, cap=4096)
    assert len(router._seen) == 4096
    assert "flood-5999" in router._seen  # freshest kept
    assert "flood-0" not in router._seen
    router._prune_seen(now=10**9, max_age_s=60.0)
    assert not router._seen  # stale entries age out


def test_snapshot_endpoint(detector, jpeg_dir):
    """/snapshot returns ONE JPEG (annotated by default, ?raw=1 for the
    raw stream) — demand-driven like the MJPEG endpoints."""

    async def run():
        server, _ = await _start(detector, 18368, 18369)
        try:
            snap_task = asyncio.create_task(
                _http_get(18368, "/snapshot?name=s", read_bytes=10**6,
                          timeout=30.0))
            await _until(lambda: _subscribed(server, "s"),
                         desc="annotated snapshot subscription")
            sender = asyncio.create_task(send_stream(
                ReplaySource(str(jpeg_dir), fps=20),
                ClientConfig(address="127.0.0.1:18369", channel="s"),
                max_frames=40))
            resp = await snap_task
            sender.cancel()
            head, body = resp.split(b"\r\n\r\n", 1)
            assert b"200 OK" in head and b"image/jpeg" in head
            assert body.startswith(b"\xff\xd8")  # a bare JPEG, no MJPEG framing
            # raw variant too
            snap_task = asyncio.create_task(
                _http_get(18368, "/snapshot?name=s&raw=1",
                          read_bytes=10**6, timeout=30.0))
            await _until(lambda: _subscribed(server, "s", "raw"),
                         desc="raw snapshot subscription")
            sender = asyncio.create_task(send_stream(
                ReplaySource(str(jpeg_dir), fps=20),
                ClientConfig(address="127.0.0.1:18369", channel="s"),
                max_frames=20))
            resp = await snap_task
            sender.cancel()
            assert resp.split(b"\r\n\r\n", 1)[1].startswith(b"\xff\xd8")
            # no traffic -> bounded 504, not a hang
            resp = await _http_get(
                18368, "/snapshot?name=idle&timeout=0.5",
                read_bytes=10**6, timeout=20.0)
            assert b"504" in resp.split(b"\r\n", 1)[0]
        finally:
            await server.close()

    asyncio.run(run())


def test_sharded_ycbcr_path_matches_single_device(detector):
    from infercam_onnx_tpu.native import jpeg as native_jpeg
    from infercam_onnx_tpu.parallel import ShardedDetector, make_mesh

    yy, xx = np.mgrid[0:48, 0:64]
    img = np.clip(127 + 90 * np.sin(xx / 6.0) * np.cos(yy / 4.0),
                  0, 255).astype(np.uint8)
    img = np.stack([img] * 3, axis=-1)
    datas = [codec.encode_rgb(img, 90, "420") for _ in range(3)]
    packed, geom = native_jpeg.load().decode_ycbcr_batch(datas)
    shard_det = ShardedDetector(detector, make_mesh(8))
    p_s = np.asarray(shard_det.run_device_ycbcr_packed(
        packed, geom, pack_output=True))
    p_1 = np.asarray(detector.run_device_ycbcr_packed(
        packed, geom, pack_output=True))
    np.testing.assert_allclose(p_s, p_1, atol=1e-5)


def test_no_coalesce_processes_every_frame(detector, jpeg_dir):
    """coalesce_streams=False: several frames of ONE stream share a
    batch and each produces a published result (lossless serving)."""
    import json

    async def run():
        server, _ = await _start(detector, 18370, 18371,
                                 batch_window_ms=80.0,
                                 coalesce_streams=False,
                                 queue_capacity=32)
        try:
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", 18370)
            writer.write(b"GET /detections?name=nc HTTP/1.1\r\n"
                         b"Host: x\r\n\r\n")
            await writer.drain()
            await _until(
                lambda: _subscribed(server, "nc", "detections"),
                desc="detections viewer nc")
            sent = await send_stream(
                ReplaySource(str(jpeg_dir), fps=100),
                ClientConfig(address="127.0.0.1:18371", channel="nc"),
                max_frames=8)
            assert sent == 8
            data = b""
            deadline = asyncio.get_running_loop().time() + 40.0
            # the header block itself carries 5 newlines; 8 records more
            while (data.count(b"\n") < 13
                   and asyncio.get_running_loop().time() < deadline):
                try:
                    data += await asyncio.wait_for(reader.read(4096),
                                                   5.0)
                except asyncio.TimeoutError:
                    pass
            body = data.split(b"\r\n\r\n", 1)[1]
            lines = [ln for ln in body.split(b"\n") if ln.strip()]
            # every frame produced a detection record (no coalescing
            # drops); at 100 fps into an 80 ms window they shared batches
            assert len(lines) >= 8, (len(lines), body[:200])
            json.loads(lines[0])
            writer.close()
        finally:
            await server.close()

    asyncio.run(run())


def test_mixed_resolution_streams_share_one_server(detector, tmp_path):
    """Two streams at DIFFERENT resolutions: the worker groups frames by
    decoded shape (one compiled program per shape) and both annotated
    streams flow."""
    rng = np.random.default_rng(21)
    small = tmp_path / "small"
    big = tmp_path / "big"
    small.mkdir(), big.mkdir()
    for i in range(2):
        (small / f"f{i}.jpg").write_bytes(codec.encode_rgb(
            rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)))
        (big / f"f{i}.jpg").write_bytes(codec.encode_rgb(
            rng.integers(0, 256, size=(96, 128, 3), dtype=np.uint8)))
    detector.warmup(1, 96, 128)  # second-shape program
    detector.warmup(2, 96, 128)

    async def run():
        server, _ = await _start(detector, 18390, 18391,
                                 batch_window_ms=20.0,
                                 batch_buckets=(1, 2, 4))
        try:
            viewers = [asyncio.create_task(
                _http_get(18390, f"/face_stream?name={name}",
                          read_bytes=600, timeout=45.0))
                for name in ("sm", "bg")]
            await _until(lambda: (_subscribed(server, "sm")
                                  and _subscribed(server, "bg")),
                         desc="both mixed-resolution viewers")
            senders = [asyncio.create_task(send_stream(
                ReplaySource(str(d), fps=20),
                ClientConfig(address="127.0.0.1:18391", channel=name),
                max_frames=16))
                for d, name in ((small, "sm"), (big, "bg"))]
            await asyncio.gather(*senders)
            parts = await asyncio.gather(*viewers)
            for name, data in zip(("sm", "bg"), parts):
                assert data.count(b"--frame") >= 1, f"{name} starved"
        finally:
            await server.close()

    asyncio.run(run())


def test_slim_variant_serves(jpeg_dir):
    """The slim model family serves end-to-end too (variant coverage at
    the serving tier, not just the model layer)."""

    async def run():
        det = Detector(DetectorConfig(variant="slim-320",
                                      compute_dtype="float32"), rng=0)
        det.warmup(1, 48, 64)
        server, _ = await _start(det, 18395, 18396,
                                 batch_buckets=(1, 2))
        try:
            stream_task = asyncio.create_task(
                _http_get(18395, "/face_stream?name=sl",
                          read_bytes=600, timeout=45.0))
            await _until(lambda: _subscribed(server, "sl"),
                         desc="face viewer sl")
            await send_stream(
                ReplaySource(str(jpeg_dir), fps=20),
                ClientConfig(address="127.0.0.1:18396", channel="sl"),
                max_frames=8)
            data = await stream_task
            assert data.count(b"--frame") >= 1
        finally:
            await server.close()

    asyncio.run(run())


def test_rss_watchdog_triggers_on_breach():
    from infercam_onnx_tpu.serving.app import rss_watchdog

    fired = []
    readings = iter([100.0, 200.0, 900.0])

    async def run():
        await rss_watchdog(
            500, period_s=0.01,
            read_rss=lambda: next(readings),
            on_breach=lambda: fired.append(True))

    asyncio.run(run())
    assert fired == [True]


def test_rss_watchdog_quiet_below_cap():
    from infercam_onnx_tpu.serving.app import rss_watchdog

    fired = []

    async def run():
        task = asyncio.ensure_future(rss_watchdog(
            10_000, period_s=0.01,
            read_rss=lambda: 100.0,
            on_breach=lambda: fired.append(True)))
        await asyncio.sleep(0.1)
        task.cancel()
        try:
            await task
        except asyncio.CancelledError:
            pass

    asyncio.run(run())
    assert fired == []


def test_rss_breach_action_lockstep_exits_not_reexec(detector,
                                                     monkeypatch):
    """Under lockstep the RSS watchdog must NOT re-exec in place —
    jax.distributed cannot re-admit a restarted process into a running
    incarnation — so a breach exits the member (distinct code 17) for
    the cluster supervisor to re-form the whole cluster
    (serving/app.py _exit_for_supervisor, tools/cluster_launch.py)."""
    from infercam_onnx_tpu.serving import app as app_mod

    calls: list[str] = []
    monkeypatch.setattr(app_mod, "_reexec",
                        lambda: calls.append("reexec"))
    monkeypatch.setattr(app_mod, "_exit_for_supervisor",
                        lambda: calls.append("exit"))

    async def run(server_cfg):
        server = await start_server(
            server_config=server_cfg,
            engine_config=EngineConfig(batch_buckets=(1,),
                                       annotate_mode="host"),
            detector=detector, data_parallel="off")
        try:
            # real /proc RSS is far above the 1 MiB cap: the watchdog
            # breaches on its first 10 ms check
            await asyncio.sleep(0.5)
        finally:
            await server.close()

    # lockstep-shaped detector (session_ended is the lockstep marker)
    detector.session_ended = False
    try:
        asyncio.run(run(ServerConfig(
            http_address="127.0.0.1:18481",
            socket_address="127.0.0.1:18482",
            max_rss_mb=1, rss_check_period_s=0.01)))
    finally:
        del detector.session_ended
    assert calls == ["exit"]

    # standalone server: same breach re-execs in place instead
    calls.clear()
    asyncio.run(run(ServerConfig(
        http_address="127.0.0.1:18483",
        socket_address="127.0.0.1:18484",
        max_rss_mb=1, rss_check_period_s=0.01)))
    assert calls == ["reexec"]


def test_warmup_async_listeners_open_before_warm(detector, jpeg_dir):
    """--warmup-async: the HTTP listener answers while the device
    warm-up is still running, and inference works once warm."""
    import threading

    release = threading.Event()
    orig_warmup = detector.warmup
    calls = []

    def slow_warmup(*a, **kw):
        calls.append(a)
        release.wait(10.0)
        orig_warmup(*a, **kw)

    detector.warmup = slow_warmup
    try:
        async def run():
            server = await start_server(
                server_config=ServerConfig(
                    http_address="127.0.0.1:18400",
                    socket_address="127.0.0.1:18401"),
                engine_config=EngineConfig(batch_buckets=(1, 4)),
                detector=detector, data_parallel="off",
                warmup_resolutions=[(48, 64)], warmup_async=True)
            try:
                # health answers while warm-up is BLOCKED
                resp = await _http_get(18400, "/healthcheck",
                                       timeout=5.0)
                assert resp.endswith(b"healthy")
                # /stats reports the warm-up in progress
                import json as _json

                st = _json.loads((await _http_get(
                    18400, "/stats")).split(b"\r\n\r\n", 1)[1])
                assert st["warming"] is True
                for _ in range(40):  # warm task scheduling is async
                    if calls:
                        break
                    await asyncio.sleep(0.05)
                assert calls, "warm-up never started"
                release.set()
                await _until_async(
                    lambda: _http_get(18400, "/stats"),
                    lambda r: _json.loads(
                        r.split(b"\r\n\r\n", 1)[1])["warming"] is False,
                    desc="warming flag cleared")
                # inference works after warm-up completes
                stream_task = asyncio.create_task(
                    _http_get(18400, "/face_stream?name=w",
                              read_bytes=600, timeout=30.0))
                await _until(lambda: _subscribed(server, "w"),
                             desc="face viewer w")
                await send_stream(
                    ReplaySource(str(jpeg_dir), fps=20),
                    ClientConfig(address="127.0.0.1:18401",
                                 channel="w"),
                    max_frames=8)
                data = await stream_task
                assert data.count(b"--frame") >= 1
            finally:
                await server.close()

        asyncio.run(run())
    finally:
        release.set()
        detector.warmup = orig_warmup


def test_metrics_prometheus_endpoint(detector, jpeg_dir):
    async def run():
        server, _ = await _start(detector, 18430, 18431)
        try:
            # generate a little traffic so counters are non-trivial
            stream_task = asyncio.create_task(
                _http_get(18430, "/face_stream?name=p",
                          read_bytes=600, timeout=30.0))
            await _until(lambda: _subscribed(server, "p"),
                         desc="face viewer p")
            await send_stream(
                ReplaySource(str(jpeg_dir), fps=30),
                ClientConfig(address="127.0.0.1:18431", channel="p"),
                max_frames=6)
            await stream_task

            async def fetch_metrics():
                return await _http_get(18430, "/metrics")

            # counters fill on the meter's drain cycle — poll
            resp = await _until_async(
                fetch_metrics,
                lambda r: b"infercam_inferred_unique_total" in r,
                desc="metrics drained")
            assert resp.startswith(b"HTTP/1.1 200 OK")
            body = resp.split(b"\r\n\r\n", 1)[1].decode()
            assert "infercam_uptime_seconds" in body
            assert "infercam_inferred_unique_total" in body
            assert "# TYPE" in body
            assert 'infercam_topology_info{' in body
            assert 'devices="1"' in body
        finally:
            await server.close()

    asyncio.run(run())
