"""Micro-batcher unit tests (no device work): bucket selection, gather
window, per-stream coalescing, drop accounting."""

import asyncio

import pytest

from infercam_onnx_tpu.config import EngineConfig
from infercam_onnx_tpu.serving.broadcast import Broadcast
from infercam_onnx_tpu.serving.inferer import InferenceWorker
from infercam_onnx_tpu.serving.meter import Meter
from infercam_onnx_tpu.serving.router import InferJob


class _NullDetector:
    pass


def _worker(**kw):
    meter = Meter()
    w = InferenceWorker(_NullDetector(), EngineConfig(**kw), meter=meter)
    return w, meter


def test_bucket_selection():
    w, _ = _worker(batch_buckets=(1, 2, 4, 8, 16))
    assert w._bucket_size(1) == 1
    assert w._bucket_size(2) == 2
    assert w._bucket_size(3) == 4
    assert w._bucket_size(9) == 16
    assert w._bucket_size(16) == 16
    # above the largest bucket: clamp (batch is truncated downstream)
    assert w._bucket_size(40) == 16


def test_gather_coalesces_latest_per_stream_and_counts_drops():
    w, meter = _worker(batch_buckets=(1, 2, 4), batch_window_ms=30.0)
    processed = []

    async def run():
        # stub out the pipeline stages: capture what reaches stage 2
        w._decode = lambda jobs: jobs
        w._device_stage = lambda staged: processed.append(staged)
        chan = Broadcast()
        # 3 frames on stream 1 (two stale), 1 frame on stream 2
        for i, key in enumerate([1, 1, 1, 2]):
            w.submit(InferJob(key, f"frame{i}".encode(), chan))
        task = asyncio.create_task(w.run())
        await asyncio.sleep(0.4)
        task.cancel()
        await asyncio.gather(task, return_exceptions=True)

    asyncio.run(run())
    assert processed, "no batch reached the device stage"
    jobs = processed[0]
    datas = sorted(j.data for j in jobs)
    # newest frame per stream wins; stale ones dropped and counted
    assert datas == [b"frame2", b"frame3"]
    assert meter.dropped == 2


def test_submit_backpressure_is_nonblocking():
    w, _ = _worker(queue_capacity=3)
    chan = Broadcast()
    results = [w.submit(InferJob(i, b"x", chan)) for i in range(5)]
    assert results == [True, True, True, False, False]


def test_window_waits_for_more_frames():
    # a WIDE window + poll-until keeps this deterministic under a
    # loaded single core (a fixed 200 ms window vs 50 ms sleep flaked
    # when the full suite saturated the CPU)
    w, _ = _worker(batch_buckets=(1, 2, 4, 8), batch_window_ms=1500.0)
    processed = []

    async def run():
        w._decode = lambda jobs: jobs
        w._device_stage = lambda staged: processed.append(staged)
        chan = Broadcast()
        task = asyncio.create_task(w.run())
        w.submit(InferJob(1, b"a", chan))
        await asyncio.sleep(0.05)  # well inside the window
        w.submit(InferJob(2, b"b", chan))
        deadline = asyncio.get_running_loop().time() + 20.0
        while (not processed
               and asyncio.get_running_loop().time() < deadline):
            await asyncio.sleep(0.05)
        task.cancel()
        await asyncio.gather(task, return_exceptions=True)

    asyncio.run(run())
    # both frames landed in ONE batch thanks to the gather window
    assert processed, "no batch dispatched within the deadline"
    assert len(processed[0]) == 2


def test_bucket_ladder_caps_at_max_batch():
    from infercam_onnx_tpu.serve import bucket_ladder

    assert bucket_ladder(16) == [1, 2, 4, 8, 16]
    assert bucket_ladder(12) == [1, 2, 4, 8, 12]
    assert bucket_ladder(1) == [1]
    assert bucket_ladder(3) == [1, 2, 3]


def test_bucket_size_rounds_to_mesh_multiple():
    from infercam_onnx_tpu.config import DetectorConfig, EngineConfig
    from infercam_onnx_tpu.detector import Detector
    from infercam_onnx_tpu.parallel import make_mesh
    from infercam_onnx_tpu.serving.inferer import InferenceWorker

    det = Detector(DetectorConfig(variant="RFB-320",
                                  compute_dtype="float32"), rng=0)
    w = InferenceWorker(det, EngineConfig(batch_buckets=(1, 2, 4, 16)),
                        mesh=make_mesh(8))
    # buckets below the mesh size pad up to it; larger round to multiples
    assert w._bucket_size(1) == 8
    assert w._bucket_size(3) == 8
    assert w._bucket_size(5) == 16
    assert w._bucket_size(16) == 16


def test_serve_presets_apply_and_explicit_flags_win(monkeypatch):
    from infercam_onnx_tpu import serve

    captured = {}

    def fake_serve_forever(**kw):
        captured.update(kw)

    async def noop(**kw):
        captured.update(kw)

    monkeypatch.setattr("infercam_onnx_tpu.serving.app.serve_forever",
                        noop)
    monkeypatch.setattr("asyncio.run", lambda coro: coro.close())

    # capture parsed args by stubbing at the EngineConfig boundary
    import infercam_onnx_tpu.config as config

    orig = config.EngineConfig
    seen = {}

    def spy(**kw):
        seen.update(kw)
        return orig(**kw)

    monkeypatch.setattr(config, "EngineConfig", spy)
    serve.main(["--preset", "lossless"])
    assert seen["decode_mode"] == "ycbcr"
    assert seen["queue_capacity"] == 96
    assert seen["coalesce_streams"] is False
    assert max(seen["batch_buckets"]) == 32

    seen.clear()
    serve.main(["--preset", "lossless", "--decode-mode", "pixels",
                "--max-batch", "8"])
    assert seen["decode_mode"] == "pixels"  # explicit flag wins
    assert max(seen["batch_buckets"]) == 8
    assert seen["queue_capacity"] == 96  # preset still fills the rest
