"""StageTimer + meter integration tests."""

import time

from infercam_onnx_tpu.utils.profiling import StageTimer


def test_stage_timer_records_and_drains():
    t = StageTimer()
    with t.stage("decode"):
        time.sleep(0.01)
    with t.stage("decode"):
        time.sleep(0.02)
    t.record("device", 0.005)
    stats = t.drain()
    assert stats["decode"]["count"] == 2
    assert stats["decode"]["p50_ms"] >= 10
    assert stats["device"]["p50_ms"] == 5.0
    # drained -> empty
    assert t.drain() == {}


def test_stage_timer_format():
    t = StageTimer()
    t.record("x", 0.001)
    s = t.format_drain()
    assert "x p50" in s


def test_stage_timer_exception_safe():
    t = StageTimer()
    try:
        with t.stage("boom"):
            raise RuntimeError("x")
    except RuntimeError:
        pass
    assert t.drain()["boom"]["count"] == 1


def test_device_trace_noop():
    from infercam_onnx_tpu.utils.profiling import device_trace

    with device_trace(None):
        pass  # must be a no-op without a directory


def test_broadcast_threadsafe_publish_pattern():
    """The worker publishes from a thread via call_soon_threadsafe; a
    stress run must deliver every item without corruption (the closest
    analog to the reference's Rust-enforced channel safety, SURVEY.md
    section 5 'race detection')."""
    import asyncio
    import threading

    from infercam_onnx_tpu.serving.broadcast import Broadcast

    async def run():
        chan = Broadcast(capacity=10000)
        sub = chan.subscribe()
        loop = asyncio.get_running_loop()
        n = 500

        def producer():
            for i in range(n):
                loop.call_soon_threadsafe(chan.publish,
                                          f"item-{i}".encode())

        threads = [threading.Thread(target=producer) for _ in range(4)]
        for t in threads:
            t.start()
        got = []
        while len(got) < 4 * n:
            got.append(await asyncio.wait_for(sub.receive(), 10))
        for t in threads:
            t.join()
        # all items delivered exactly once
        from collections import Counter

        counts = Counter(got)
        assert len(counts) == n
        assert all(v == 4 for v in counts.values())

    asyncio.run(run())


def test_meter_prometheus_exposition_format():
    from infercam_onnx_tpu.serving.meter import Meter

    m = Meter()
    m.tick_raw()
    m.tick_batch(4, 0.01)
    m.drain()
    text = m.prometheus()
    lines = text.strip().splitlines()
    # every sample line is preceded by a TYPE comment and parses as
    # "name value"
    assert "infercam_uptime_seconds" in text
    assert any(ln.startswith("infercam_batches_total") for ln in lines)
    for ln in lines:
        if ln.startswith("#"):
            assert ln.startswith("# TYPE infercam_")
        else:
            name, value = ln.split()
            float(value)
            assert name.startswith("infercam_")
