"""Lockstep multi-host serving dispatch (parallel/lockstep.py).

Unit level: the merge that turns per-host proposals into one agreed
decision, and the full pump/coordinator round-trip on the virtual CPU
mesh in a single process (n_processes=1 degenerates to a local round).
Deployment level: TWO real `serve` CLI processes joined via
jax.distributed over localhost, each fed by its own sender, both
serving detections off ONE process-spanning mesh — the multi-host
topology the reference never had (its whole fabric is one process,
reference infer_server/src/data_socket.rs).
"""

import json
import os
import signal
import socket
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

from infercam_onnx_tpu import codec
from infercam_onnx_tpu.parallel.lockstep import (
    LockstepDetector,
    merge_proposals,
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_merge_proposals_union_and_buckets():
    ladder = (1, 2, 4, 8)
    a = [{"kind": "pixels", "h": 48, "w": 64, "pack": True, "n": 3}]
    b = [{"kind": "pixels", "h": 48, "w": 64, "pack": True, "n": 5},
         {"kind": "pixels", "h": 24, "w": 32, "pack": True, "n": 1}]
    out = merge_proposals([a, b], ladder, granularity=4)
    assert len(out) == 2
    big = next(u for u in out if u["h"] == 48)
    small = next(u for u in out if u["h"] == 24)
    assert big["rows"] == 8  # max(3,5) -> bucket 8 (already a multiple)
    assert small["rows"] == 4  # bucket 1 -> granularity 4
    # deterministic order regardless of proposal order
    assert out == merge_proposals([b, a], ladder, granularity=4)


def test_merge_empty_proposals_is_empty_decision():
    assert merge_proposals([[], []], (1, 2), 1) == []


def test_merge_sums_duplicate_units_per_host():
    # two same-geometry units from ONE host must be served by a single
    # decision sized for their SUM (not max), so neither is deferred a
    # full round-trip (ADVICE r2)
    ladder = (1, 2, 4, 8)
    a = [{"kind": "pixels", "h": 48, "w": 64, "pack": True, "n": 3},
         {"kind": "pixels", "h": 48, "w": 64, "pack": True, "n": 2}]
    out = merge_proposals([a], ladder, granularity=1)
    assert len(out) == 1
    assert out[0]["rows"] == 8  # sum 5 -> bucket 8
    # across hosts it is still max-of-sums
    b = [{"kind": "pixels", "h": 48, "w": 64, "pack": True, "n": 2}]
    out = merge_proposals([a, b], ladder, granularity=1)
    assert out[0]["rows"] == 8  # max(5, 2) -> 8


def test_merge_clamps_to_ladder_top():
    out = merge_proposals(
        [[{"kind": "pixels", "h": 8, "w": 8, "pack": True, "n": 40}]],
        (1, 2, 4, 8, 16), granularity=2)
    assert out[0]["rows"] == 16


@pytest.fixture(scope="module")
def lockstep_pair():
    """A lockstep detector (single-process session over the virtual
    mesh) plus a plain detector as the equality oracle."""
    from infercam_onnx_tpu.config import DetectorConfig
    from infercam_onnx_tpu.detector import Detector
    from infercam_onnx_tpu.parallel.mesh import make_mesh

    det = Detector(DetectorConfig(variant="RFB-320",
                                  compute_dtype="float32"), rng=0)
    mesh = make_mesh(8)
    lock = LockstepDetector(det, mesh, f"127.0.0.1:{_free_port()}",
                            coordinator=True, n_processes=1,
                            ladder=(1, 2, 4, 8, 16), tick_ms=5.0)
    yield det, lock
    lock.close()


def test_lockstep_matches_plain_detector(lockstep_pair):
    det, lock = lockstep_pair
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(3, 48, 64, 3), dtype=np.uint8)
    want = np.asarray(det.run_device(frames, pack_output=True))
    got = lock.run_device(frames, pack_output=True)
    assert got.shape == want.shape  # local rows sliced back to n
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lockstep_tuple_output_and_ycbcr(lockstep_pair):
    det, lock = lockstep_pair
    native = pytest.importorskip(
        "infercam_onnx_tpu.native.jpeg").load()
    rng = np.random.default_rng(1)
    datas = [codec.encode_rgb(
        rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8))
        for _ in range(2)]
    packed, geom = native.decode_ycbcr_batch(datas)
    want = det.run_device_ycbcr_packed(packed, geom, pack_output=True)
    got = lock.run_device_ycbcr_packed(packed, geom, pack_output=True)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)

    boxes, confs, counts = lock.run_device(
        rng.integers(0, 256, size=(2, 48, 64, 3), dtype=np.uint8))
    assert boxes.shape[0] == confs.shape[0] == counts.shape[0] == 2


def test_lockstep_coefficients_matches_plain_detector(lockstep_pair):
    det, lock = lockstep_pair
    from infercam_onnx_tpu.ops.jpeg_device import read_coefficient_batch

    rng = np.random.default_rng(2)
    datas = [codec.encode_rgb(
        rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8),
        90, "420") for _ in range(3)]
    y, cb, cr, q, wh, samp = read_coefficient_batch(datas)
    want = det.run_device_coefficients_arrays(
        y, cb, cr, q, wh, sampling=samp, pack_output=True)
    got = lock.run_device_coefficients_arrays(
        y, cb, cr, q, wh, sampling=samp, pack_output=True)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)


def test_lockstep_annotated_units_match_plain(lockstep_pair):
    """Annotated (device encode tail) dispatches ride lockstep rounds:
    coefficients + detections equal the plain sharded-detector path."""
    pytest.importorskip("infercam_onnx_tpu.native.jpeg").load()
    det, lock = lockstep_pair
    rng = np.random.default_rng(9)
    datas = [codec.encode_rgb(
        rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8), 90,
        "420") for _ in range(2)]
    from infercam_onnx_tpu.native import jpeg as nj

    packed, geom = nj.load().decode_ycbcr_batch(datas)
    want_c, want_d = det.run_device_ycbcr_annotated(packed, geom)
    got_c, got_d = lock.run_device_ycbcr_annotated(packed, geom)
    np.testing.assert_array_equal(got_c, np.asarray(want_c))
    np.testing.assert_allclose(got_d, np.asarray(want_d), atol=1e-5)

    frames = rng.integers(0, 256, size=(2, 48, 64, 3), dtype=np.uint8)
    want_c, want_d = det.run_device_annotated(frames)
    got_c, got_d = lock.run_device_annotated(frames)
    np.testing.assert_array_equal(got_c, np.asarray(want_c))
    np.testing.assert_allclose(got_d, np.asarray(want_d), atol=1e-5)


def test_lockstep_tiled_units_match_plain(lockstep_pair):
    """Tiled (high-res) dispatches ride lockstep rounds and match a
    worker-local tiled detector on the same mesh (closes the
    'tiling is single-host' gap from round 2, docs/PARITY.md)."""
    from infercam_onnx_tpu.parallel.mesh import make_mesh
    from infercam_onnx_tpu.parallel.tiling import TiledDetector

    det, lock = lockstep_pair
    rng = np.random.default_rng(8)
    frames = rng.integers(0, 256, size=(2, 270, 480, 3), dtype=np.uint8)
    plain = TiledDetector(det, (480, 270), grid=(2, 2),
                          mesh=make_mesh(8))
    want = np.asarray(plain.run_device(frames, pack_output=True))
    got = lock.run_device_tiled(frames, (480, 270), grid=(2, 2))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # packed-plane tiled unit
    native = pytest.importorskip(
        "infercam_onnx_tpu.native.jpeg").load()
    datas = [codec.encode_rgb(frames[i], 92, "420") for i in range(2)]
    packed, geom = native.decode_ycbcr_batch(datas)
    want = np.asarray(plain.run_device_ycbcr_packed(
        packed, geom, pack_output=True))
    got = lock.run_device_tiled_ycbcr(packed, geom, grid=(2, 2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lockstep_splice_units_match_plain(lockstep_pair):
    """Splice-transcode annotated dispatches ride lockstep rounds and
    equal the sharded-detector path bit-for-bit."""
    pytest.importorskip("infercam_onnx_tpu.native.jpeg").load()
    from infercam_onnx_tpu.ops.jpeg_device import read_coefficient_batch
    from infercam_onnx_tpu.parallel.data_parallel import ShardedDetector
    from infercam_onnx_tpu.parallel.mesh import make_mesh

    det, lock = lockstep_pair
    rng = np.random.default_rng(14)
    datas = [codec.encode_rgb(
        rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8), 90,
        "420") for _ in range(2)]
    y, cb, cr, quant, wh, samp = read_coefficient_batch(datas)
    sharded = ShardedDetector(det, make_mesh(8))
    want_b, want_m, want_d = sharded.run_device_coefficients_annotated(
        y, cb, cr, quant, wh, sampling=samp, k=256)
    got_b, got_m, got_d = lock.run_device_coefficients_annotated(
        y, cb, cr, quant, wh, sampling=samp, k=256)
    np.testing.assert_array_equal(got_b, np.asarray(want_b))
    np.testing.assert_array_equal(got_m, np.asarray(want_m))
    np.testing.assert_allclose(got_d, np.asarray(want_d), atol=1e-5)
    # and the sharded path equals the single-device path
    pb, pm, pd = det.run_device_coefficients_annotated(
        y, cb, cr, quant, wh, sampling=samp, k=256)
    np.testing.assert_array_equal(np.asarray(want_b), np.asarray(pb))
    np.testing.assert_array_equal(np.asarray(want_m), np.asarray(pm))


def test_lockstep_concurrent_same_geometry_units(lockstep_pair):
    # two same-geometry submissions racing into one session: both must
    # complete and match the plain detector (they may share one round —
    # the multi-match dispatch path — or land in adjacent rounds)
    det, lock = lockstep_pair
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, size=(2, 48, 64, 3), dtype=np.uint8)
              for _ in range(2)]
    results = [None, None]

    def run(i):
        results[i] = lock.run_device(frames[i], pack_output=True)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    for i in range(2):
        want = np.asarray(det.run_device(frames[i], pack_output=True))
        np.testing.assert_allclose(results[i], want, atol=1e-5)


def test_lockstep_execute_failure_ends_session():
    # a failed execute during an AGREED dispatch means peers already ran
    # the collective — the session must end promptly (bye + pump stop)
    # instead of leaving the cluster to hang until the socket timeout
    from infercam_onnx_tpu.config import DetectorConfig
    from infercam_onnx_tpu.detector import Detector
    from infercam_onnx_tpu.parallel.mesh import make_mesh

    det = Detector(DetectorConfig(variant="RFB-320",
                                  compute_dtype="float32"), rng=0)
    lock = LockstepDetector(det, make_mesh(8),
                            f"127.0.0.1:{_free_port()}",
                            coordinator=True, n_processes=1,
                            tick_ms=5.0)
    try:
        def boom(desc, rows, matches):
            raise ValueError("injected execute failure")

        lock._execute = boom
        with pytest.raises(ValueError, match="injected"):
            lock.run_device(np.zeros((1, 48, 64, 3), np.uint8),
                            pack_output=True)
        deadline = time.time() + 10
        while not lock._stopped.is_set() and time.time() < deadline:
            time.sleep(0.05)
        assert lock._stopped.is_set(), \
            "pump must stop after an agreed-dispatch failure"
        with pytest.raises(RuntimeError, match="ended"):
            lock.run_device(np.zeros((1, 48, 64, 3), np.uint8),
                            pack_output=True)
    finally:
        lock.close()


def test_lockstep_closed_session_raises(tmp_path):
    from infercam_onnx_tpu.config import DetectorConfig
    from infercam_onnx_tpu.detector import Detector
    from infercam_onnx_tpu.parallel.mesh import make_mesh

    det = Detector(DetectorConfig(variant="RFB-320",
                                  compute_dtype="float32"), rng=0)
    lock = LockstepDetector(det, make_mesh(8),
                            f"127.0.0.1:{_free_port()}",
                            coordinator=True, n_processes=1,
                            tick_ms=5.0)
    lock.close()
    with pytest.raises(RuntimeError, match="ended"):
        lock.run_device(np.zeros((1, 48, 64, 3), np.uint8),
                        pack_output=True)


def _wait_port(port, timeout=180.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with socket.create_connection(("127.0.0.1", port), 1):
                return True
        except OSError:
            time.sleep(0.5)
    return False


def _http_get(port, path, timeout=20.0, stop_after_frames=0):
    """Bounded read: an actively-publishing MJPEG stream never closes,
    so stop once enough multipart frames arrived (or on timeout)."""
    s = socket.create_connection(("127.0.0.1", port), timeout)
    s.sendall(f"GET {path} HTTP/1.1\r\nHost: x\r\n"
              "Connection: close\r\n\r\n".encode())
    s.settimeout(2.0)
    data = b""
    deadline = time.time() + timeout
    try:
        while time.time() < deadline:
            if (stop_after_frames
                    and data.count(b"--frame") >= stop_after_frames):
                break
            try:
                chunk = s.recv(4096)
            except socket.timeout:
                continue
            if not chunk:
                break
            data += chunk
    finally:
        s.close()
    return data


@pytest.mark.slow
def test_two_host_lockstep_deployment(tmp_path):
    """BASELINE config 5 beyond one host: two REAL serve processes on a
    2-process jax.distributed CPU 'cluster' (Gloo standing in for DCN),
    one global 2-device mesh, lockstep dispatch; each host ingests its
    own streams and serves its own detections."""
    # DIFFERENT resolutions per host: each round's agreed schedule must
    # union two pixel-batch geometries, with each host padding the
    # other's unit
    rng = np.random.default_rng(5)
    dirs = [tmp_path / "host0", tmp_path / "host1"]
    for d, size in zip(dirs, [(48, 64, 3), (32, 48, 3)]):
        d.mkdir()
        frame = rng.integers(0, 256, size=size, dtype=np.uint8)
        (d / "f.jpg").write_bytes(codec.encode_rgb(frame))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    # the parent test process runs on an 8-virtual-device mesh
    # (conftest); the cluster processes must NOT inherit that — one CPU
    # device per process, 2-device global mesh
    env["XLA_FLAGS"] = ""

    http = [_free_port(), _free_port()]
    sock = [_free_port(), _free_port()]
    coord, lockstep = _free_port(), _free_port()
    servers = []
    senders = []
    logs = [open(tmp_path / f"server{i}.log", "wb") for i in range(2)]
    try:
        for pid in range(2):
            servers.append(subprocess.Popen(
                [sys.executable, "-m", "infercam_onnx_tpu.serve",
                 "--server-address", f"127.0.0.1:{http[pid]}",
                 "--socket-address", f"127.0.0.1:{sock[pid]}",
                 "--distributed",
                 f"127.0.0.1:{coord},num_processes=2,process_id={pid}",
                 "--lockstep-address", f"127.0.0.1:{lockstep}",
                 "--data-parallel", "on",
                 "--max-batch", "2", "--decode-scale", "1",
                 "--batch-window-ms", "20"],
                env=env, stdout=logs[pid], stderr=logs[pid]))
        for pid in range(2):
            assert _wait_port(http[pid]), \
                f"host {pid} HTTP port never opened"
        for pid in range(2):
            senders.append(subprocess.Popen(
                [sys.executable, "-m", "infercam_onnx_tpu.client.sender",
                 "--address", f"127.0.0.1:{sock[pid]}",
                 "--channel", f"cam{pid}",
                 "--replay-dir", str(dirs[pid]), "--fps", "10"],
                env=env, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL))

        # each host must deliver ITS stream's annotated MJPEG — which
        # requires the cluster-wide lockstep round to complete on a
        # process-spanning mesh (first round compiles on both hosts)
        deadline = time.time() + 240
        got = [0, 0]
        while time.time() < deadline and not all(got):
            for pid in range(2):
                if not got[pid]:
                    face = _http_get(http[pid],
                                     f"/face_stream?name=cam{pid}",
                                     timeout=15.0,
                                     stop_after_frames=1)
                    got[pid] = face.count(b"--frame\r\nContent-Type")
        assert all(got), f"annotated frames per host: {got}"

        # the meter proves batches really dispatched on each host (its
        # totals drain on a 2 s cycle — retry until they catch up)
        for pid in range(2):
            count, deadline = 0, time.time() + 30
            while count < 1 and time.time() < deadline:
                stats = _http_get(http[pid], "/stats")
                payload = json.loads(stats.split(b"\r\n\r\n", 1)[1])
                count = payload["totals"].get("inferred_unique", 0)
                time.sleep(0.5)
            assert count >= 1, f"host {pid} stats: {payload['totals']}"

        # failure contract: hard-kill host 1 (ends the lockstep
        # session cluster-wide, no rejoin path). Host 0 must EXIT
        # non-zero promptly — not linger restart-looping a worker that
        # can never serve again — so supervisors/cluster_launch restart
        # the cluster as a unit (docs/OPERATIONS.md). The next frame
        # submission is what trips the ended session in host 0's
        # worker; the still-running sender provides it.
        servers[1].kill()
        deadline = time.time() + 60
        while servers[0].poll() is None and time.time() < deadline:
            time.sleep(0.5)
        assert servers[0].poll() is not None, \
            "surviving host must exit after the session ends"
        assert servers[0].returncode != 0, \
            "the exit must be non-zero so supervisors see a failure"
    finally:
        for p in senders:
            p.send_signal(signal.SIGINT)
        for p in servers:
            p.send_signal(signal.SIGTERM)
        for p in senders + servers:
            try:
                p.wait(20)
            except subprocess.TimeoutExpired:
                p.kill()
        for f in logs:
            f.close()


def test_lockstep_oversized_batch_rejected(lockstep_pair):
    """A single unit larger than the ladder top can never dispatch
    whole (merge_proposals clamps decisions to the top); it must fail
    the one caller loudly and leave the session alive."""
    det, lock = lockstep_pair
    rng = np.random.default_rng(9)
    big = rng.integers(0, 256, size=(17, 48, 64, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="ladder top"):
        lock.run_device(big, pack_output=True)
    # the session survives and keeps serving normal-sized units
    ok = rng.integers(0, 256, size=(2, 48, 64, 3), dtype=np.uint8)
    want = np.asarray(det.run_device(ok, pack_output=True))
    np.testing.assert_allclose(lock.run_device(ok, pack_output=True),
                               want, atol=1e-5)


def test_lockstep_capacity_is_granularity_rounded():
    """The serving worker rounds buckets up to the per-host device
    granularity and merge_proposals rounds decisions the same way, so
    a unit above the raw ladder top but within the rounded top MUST
    dispatch (a latency-preset ladder of (1, 2) on an 8-device host
    serves granularity-8 batches)."""
    from infercam_onnx_tpu.config import DetectorConfig
    from infercam_onnx_tpu.detector import Detector
    from infercam_onnx_tpu.parallel.mesh import make_mesh

    det = Detector(DetectorConfig(variant="RFB-320",
                                  compute_dtype="float32"), rng=0)
    lock = LockstepDetector(det, make_mesh(8),
                            f"127.0.0.1:{_free_port()}",
                            coordinator=True, n_processes=1,
                            ladder=(1, 2), tick_ms=5.0)
    try:
        rng = np.random.default_rng(15)
        frames = rng.integers(0, 256, size=(5, 48, 64, 3),
                              dtype=np.uint8)
        got = lock.run_device(frames, pack_output=True)
        want = np.asarray(det.run_device(frames, pack_output=True))
        np.testing.assert_allclose(got, want, atol=1e-5)
        with pytest.raises(ValueError, match="capacity"):
            lock.run_device(rng.integers(
                0, 256, size=(9, 48, 64, 3), dtype=np.uint8),
                pack_output=True)
    finally:
        lock.close()


def test_lockstep_session_end_is_terminal_for_server():
    """An ended session has no rejoin path: the serving supervisor must
    STOP (so the process exits non-zero) instead of restart-looping a
    worker that can never serve again."""
    import asyncio

    from infercam_onnx_tpu import codec as _codec
    from infercam_onnx_tpu.config import (
        DetectorConfig,
        EngineConfig,
        ServerConfig,
    )
    from infercam_onnx_tpu.detector import Detector
    from infercam_onnx_tpu.parallel.lockstep import LockstepSessionEnded
    from infercam_onnx_tpu.parallel.mesh import make_mesh
    from infercam_onnx_tpu.serving.app import start_server
    from infercam_onnx_tpu.serving.broadcast import Broadcast
    from infercam_onnx_tpu.serving.router import InferJob

    det = Detector(DetectorConfig(variant="RFB-320",
                                  compute_dtype="float32"), rng=0)
    lock = LockstepDetector(det, make_mesh(8),
                            f"127.0.0.1:{_free_port()}",
                            coordinator=True, n_processes=1,
                            tick_ms=5.0)
    jpeg = _codec.encode_rgb(np.zeros((48, 64, 3), np.uint8))

    async def run():
        server = await start_server(
            server_config=ServerConfig(
                http_address=f"127.0.0.1:{_free_port()}",
                socket_address=f"127.0.0.1:{_free_port()}"),
            engine_config=EngineConfig(batch_buckets=(1, 8),
                                       batch_window_ms=5.0,
                                       annotate_mode="host"),
            detector=lock, data_parallel="off")
        try:
            lock.close()  # the cluster session dies under the worker
            chan = Broadcast(4)
            assert server.worker.submit(InferJob(1, jpeg, chan))
            inferer = next(t for t in server.tasks
                           if t.get_name() == "inferer")
            with pytest.raises(LockstepSessionEnded):
                await asyncio.wait_for(inferer, 30)
        finally:
            await server.close()

    asyncio.run(run())


@pytest.mark.slow
def test_supervised_cluster_restart_streams_resume(tmp_path):
    """Kill one host -> the supervisor re-forms the WHOLE cluster as a
    new incarnation -> senders reconnect (reference 3 s retry contract,
    cam_sender/src/bin/socket_sender.rs:53-59) -> annotated streams
    resume. This is the lockstep rejoin story: jax.distributed cannot
    re-admit a process mid-incarnation, so recovery == supervised full
    re-formation (tools/cluster_launch.py)."""
    rng = np.random.default_rng(9)
    frames = tmp_path / "frames"
    frames.mkdir()
    (frames / "f.jpg").write_bytes(codec.encode_rgb(
        rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = ""

    # cluster_launch derives all serve ports from http_base; pick a
    # quiet base (collision just fails fast and loudly)
    base = 25820
    coord, lockstep = _free_port(), _free_port()
    state = tmp_path / "state.json"
    log = open(tmp_path / "supervisor.log", "wb")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sup = subprocess.Popen(
        [sys.executable, os.path.join(repo, "tools", "cluster_launch.py"),
         "--hosts", "2", "--cpu", "--http-base", str(base),
         "--coordinator-port", str(coord),
         "--lockstep-port", str(lockstep),
         "--state-file", str(state), "--max-restarts", "2",
         "--", "--max-batch", "2", "--decode-scale", "1",
         "--batch-window-ms", "20"],
        env=env, stdout=log, stderr=log)
    senders = []

    def read_state():
        try:
            return json.loads(state.read_text())
        except (OSError, json.JSONDecodeError):
            return None

    def wait_incarnation(n, timeout):
        deadline = time.time() + timeout
        while time.time() < deadline:
            st = read_state()
            if st and st["incarnation"] >= n:
                return st
            time.sleep(0.5)
        return None

    try:
        st = wait_incarnation(1, 60)
        assert st, "supervisor never wrote its state file"
        for pid in range(2):
            assert _wait_port(base + 10 * pid), \
                f"host {pid} HTTP port never opened"
        for pid in range(2):
            senders.append(subprocess.Popen(
                [sys.executable, "-m",
                 "infercam_onnx_tpu.client.sender",
                 "--address", f"127.0.0.1:{base + 10 * pid + 1}",
                 "--channel", f"cam{pid}",
                 "--replay-dir", str(frames), "--fps", "10"],
                env=env, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL))

        deadline = time.time() + 240
        got = 0
        while time.time() < deadline and not got:
            got = _http_get(base, "/face_stream?name=cam0",
                            timeout=15.0, stop_after_frames=1
                            ).count(b"--frame\r\nContent-Type")
        assert got, "no annotated frames before the kill"

        # hard-kill member 1 by pid (from the state file — no process
        # pattern matching)
        os.kill(st["pids"][1], signal.SIGKILL)

        st2 = wait_incarnation(2, 180)
        assert st2, "supervisor never re-formed the cluster"
        assert st2["pids"] != st["pids"]
        for pid in range(2):
            assert _wait_port(base + 10 * pid), \
                f"host {pid} HTTP port never reopened"

        # the still-running senders must have reconnected on their own;
        # annotated frames flow again in the new incarnation
        deadline = time.time() + 240
        got = 0
        while time.time() < deadline and not got:
            got = _http_get(base, "/face_stream?name=cam0",
                            timeout=15.0, stop_after_frames=1
                            ).count(b"--frame\r\nContent-Type")
        assert got, "streams did not resume after the restart"
        assert sup.poll() is None, "supervisor died during recovery"
    finally:
        for p in senders:
            p.send_signal(signal.SIGINT)
        sup.send_signal(signal.SIGTERM)
        for p in senders + [sup]:
            try:
                p.wait(30)
            except subprocess.TimeoutExpired:
                p.kill()
        log.close()


@pytest.mark.slow
def test_lockstep_member_rss_recycle_cluster_reforms(tmp_path):
    """--max-rss-mb under lockstep (allowed since round 5): a member
    crossing the RSS cap exits with the distinct recycle code 17
    (serving/app.py _exit_for_supervisor) instead of re-execing — the
    supervisor re-forms the WHOLE cluster, still-running senders
    reconnect (reference 3 s retry contract, socket_sender.rs:53-59),
    and annotated streams resume in the new incarnation. This is the
    leak-mitigation story for clusters on rigs whose runtime deps leak
    (docs/OPERATIONS.md). Cap 1 MiB = every member breaches ~20 s after
    start, so the cluster recycles continuously; --stable-uptime 5
    keeps the restart budget replenished throughout."""
    rng = np.random.default_rng(11)
    frames = tmp_path / "frames"
    frames.mkdir()
    (frames / "f.jpg").write_bytes(codec.encode_rgb(
        rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = ""

    base = 25920
    coord, lockstep = _free_port(), _free_port()
    state = tmp_path / "state.json"
    log_path = tmp_path / "supervisor.log"
    log = open(log_path, "wb")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sup = subprocess.Popen(
        [sys.executable, os.path.join(repo, "tools", "cluster_launch.py"),
         "--hosts", "2", "--cpu", "--http-base", str(base),
         "--coordinator-port", str(coord),
         "--lockstep-port", str(lockstep),
         "--state-file", str(state), "--max-restarts", "3",
         "--stable-uptime", "5",
         "--", "--max-batch", "2", "--decode-scale", "1",
         "--batch-window-ms", "20",
         "--max-rss-mb", "1", "--rss-check-period", "20"],
        env=env, stdout=log, stderr=log)
    senders = []

    def read_state():
        try:
            return json.loads(state.read_text())
        except (OSError, json.JSONDecodeError):
            return None

    def wait_incarnation(n, timeout):
        deadline = time.time() + timeout
        while time.time() < deadline:
            st = read_state()
            if st and st["incarnation"] >= n:
                return st
            time.sleep(0.5)
        return None

    def frames_flow(deadline_s):
        deadline = time.time() + deadline_s
        while time.time() < deadline:
            try:
                got = _http_get(base, "/face_stream?name=cam0",
                                timeout=10.0, stop_after_frames=1
                                ).count(b"--frame\r\nContent-Type")
            except OSError:  # mid-recycle: port momentarily closed
                got = 0
                time.sleep(1.0)
            if got:
                return True
        return False

    try:
        st = wait_incarnation(1, 60)
        assert st, "supervisor never wrote its state file"
        for pid in range(2):
            assert _wait_port(base + 10 * pid), \
                f"host {pid} HTTP port never opened"
        for pid in range(2):
            senders.append(subprocess.Popen(
                [sys.executable, "-m",
                 "infercam_onnx_tpu.client.sender",
                 "--address", f"127.0.0.1:{base + 10 * pid + 1}",
                 "--channel", f"cam{pid}",
                 "--replay-dir", str(frames), "--fps", "10"],
                env=env, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL))

        assert frames_flow(240), "no annotated frames in incarnation 1"

        # the RSS cap fires on its own (~20 s after member start); the
        # supervisor must observe the DISTINCT recycle code and re-form
        deadline = time.time() + 240
        recycled = False
        while time.time() < deadline and not recycled:
            recycled = b"exited with code 17" in log_path.read_bytes()
            time.sleep(1.0)
        assert recycled, \
            "no member exited with the RSS recycle code (17)"

        st2 = wait_incarnation(st["incarnation"] + 1, 180)
        assert st2, "supervisor never re-formed the cluster"
        assert st2["pids"] != st["pids"]

        # streams resume in a later incarnation (senders reconnect on
        # their own); tolerate further recycles during observation
        assert frames_flow(300), \
            "streams did not resume after the RSS recycle"
        assert sup.poll() is None, "supervisor died during recovery"
    finally:
        for p in senders:
            p.send_signal(signal.SIGINT)
        sup.send_signal(signal.SIGTERM)
        for p in senders + [sup]:
            try:
                p.wait(30)
            except subprocess.TimeoutExpired:
                p.kill()
        log.close()
