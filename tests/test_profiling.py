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
