"""Link-adaptive transfer-path selection (serving/link.py).

The splice transcode (coefficients decode mode + device annotate)
collapses below the host fallback on a degraded H2D link
(docs/PERFORMANCE.md); the server must probe the link and re-route to
the packed-YCbCr path by default, expose the decision in /stats, and
restore the configured path when a later probe sees recovery.
"""

import asyncio
import json

import numpy as np
import pytest

from infercam_onnx_tpu import codec
from infercam_onnx_tpu.client.sender import ReplaySource, send_stream
from infercam_onnx_tpu.config import (
    ClientConfig,
    DetectorConfig,
    EngineConfig,
    ServerConfig,
)
from infercam_onnx_tpu.detector import Detector
from infercam_onnx_tpu.serving import link
from infercam_onnx_tpu.serving.app import start_server
from infercam_onnx_tpu.serving.inferer import InferenceWorker


def test_policy_reroutes_only_coefficients():
    healthy = 250.0
    # coefficients collapses on a slow link -> ycbcr
    mode, why = link.decide_decode_mode("coefficients", 45.0, healthy)
    assert mode == "ycbcr" and "degraded" in why
    # healthy link keeps the configured (bit-exact splice) path
    mode, _ = link.decide_decode_mode("coefficients", 1500.0, healthy)
    assert mode == "coefficients"
    # pixels (reference-parity default) and ycbcr are never re-routed
    for configured in ("pixels", "ycbcr"):
        for mbps in (45.0, 1500.0):
            mode, _ = link.decide_decode_mode(configured, mbps, healthy)
            assert mode == configured


def test_policy_tiled_route():
    # without an A/B measurement, "auto" falls back to the historical
    # crossover threshold (rows won at 30 MB/s, stacked at 49 —
    # docs/PERFORMANCE.md), NOT the generic healthy threshold (250)
    crossover = 40.0
    route, why = link.decide_tiled_route("auto", 30.0, crossover)
    assert route == "rows" and "crossover" in why
    for mbps in (49.0, 1500.0):
        route, why = link.decide_tiled_route("auto", mbps, crossover)
        assert route == "stacked" and "one large copy" in why
    # explicit configuration always wins
    for configured in ("rows", "stacked"):
        for mbps in (30.0, 1500.0):
            route, _ = link.decide_tiled_route(configured, mbps,
                                               crossover)
            assert route == configured


def test_policy_tiled_route_measured_ab():
    """With an A/B measurement the route follows the measured winner
    and IGNORES the bandwidth threshold — round-5 bench windows proved
    bandwidth cannot predict it (rows won at a 61-72 MB/s probe, 35.3
    vs 21.0 fps, where the 40 MB/s crossover mis-routed to stacked)."""
    crossover = 40.0
    # rows measured faster on a probe ABOVE the crossover: rows wins
    route, why = link.decide_tiled_route("auto", 70.0, crossover,
                                         ab_ms=(120.0, 80.0))
    assert route == "rows" and "measured A/B" in why
    assert "80.0" in why and "120.0" in why
    # stacked measured faster on a probe BELOW the crossover
    route, why = link.decide_tiled_route("auto", 30.0, crossover,
                                         ab_ms=(50.0, 90.0))
    assert route == "stacked" and "measured A/B" in why
    # tie goes to stacked (fewer transfer calls)
    route, _ = link.decide_tiled_route("auto", 30.0, crossover,
                                       ab_ms=(60.0, 60.0))
    assert route == "stacked"
    # explicit configuration still wins over a measurement
    route, _ = link.decide_tiled_route("rows", 70.0, crossover,
                                       ab_ms=(50.0, 90.0))
    assert route == "rows"


def test_policy_tiled_route_ab_tie_band():
    """A/B gaps inside the tie band are link noise (the one observed
    miss had a 5.8% gap; every correct call >= 25%): prefer stacked
    over the raw winner. 0 disables the band."""
    crossover = 40.0
    # rows nominally faster but only by ~5.7% -> inside the default
    # 10% band -> stacked, and the why says so
    route, why = link.decide_tiled_route("auto", 60.0, crossover,
                                         ab_ms=(53.0, 50.1))
    assert route == "stacked" and "tie band" in why
    # same measurement with the band disabled -> raw winner (rows)
    route, why = link.decide_tiled_route("auto", 60.0, crossover,
                                         ab_ms=(53.0, 50.1),
                                         tie_pct=0.0)
    assert route == "rows"
    # a 25%+ gap clears the band in both directions
    route, _ = link.decide_tiled_route("auto", 60.0, crossover,
                                       ab_ms=(100.0, 75.0))
    assert route == "rows"
    route, _ = link.decide_tiled_route("auto", 60.0, crossover,
                                       ab_ms=(75.0, 100.0))
    assert route == "stacked"


def test_policy_annotate_floor():
    floor = 10.0
    # device annotate is kept well into degraded territory (it is
    # measured faster than host down to ~38 MB/s)
    mode, _ = link.decide_annotate_mode("device", 38.0, floor)
    assert mode == "device"
    # only collapse-grade links re-route to the host draw path
    mode, why = link.decide_annotate_mode("device", 5.0, floor)
    assert mode == "host" and "collapsed" in why
    # a configured host mode is never upgraded
    for mbps in (5.0, 1500.0):
        mode, _ = link.decide_annotate_mode("host", mbps, floor)
        assert mode == "host"


def test_decision_table_covers_all_three_choices():
    cfg = EngineConfig(decode_mode="coefficients", tiled_upload="auto",
                       annotate_mode="device")
    table = link.decide(cfg, 5.0)
    assert table["decode_mode"]["effective"] == "ycbcr"
    assert table["tiled_upload"]["effective"] == "rows"
    assert table["annotate_mode"]["effective"] == "host"
    table = link.decide(cfg, 1500.0)
    assert table["decode_mode"]["effective"] == "coefficients"
    assert table["tiled_upload"]["effective"] == "stacked"
    assert table["annotate_mode"]["effective"] == "device"
    for entry in table.values():
        assert {"configured", "effective", "why"} <= set(entry)


def test_worker_adapts_all_choices_and_recovers():
    """One probe drives all three transfer-sensitive choices; a later
    healthy probe restores every configured path (VERDICT r04 item 6:
    the decision table covers decode mode, tiled upload route, and
    annotate mode — not just the coefficients re-route)."""
    det = Detector(
        DetectorConfig(variant="RFB-320", compute_dtype="float32"),
        rng=0)
    worker = InferenceWorker(
        det, EngineConfig(decode_mode="coefficients",
                          tiled_upload="auto", annotate_mode="device"))
    # pre-probe defaults: configured decode/annotate; rows for auto
    assert worker._effective_tiled_route == "rows"

    worker.probe_and_adapt(probe=lambda: 5.0)
    assert worker._effective_decode_mode == "ycbcr"
    assert worker._effective_tiled_route == "rows"
    assert worker._effective_annotate_mode == "host"
    assert worker._annotate_device_active is False
    table = worker.link_status["decisions"]
    assert set(table) == {"decode_mode", "tiled_upload",
                          "annotate_mode"}

    worker.probe_and_adapt(probe=lambda: 1500.0)
    assert worker._effective_decode_mode == "coefficients"
    assert worker._effective_tiled_route == "stacked"
    assert worker._effective_annotate_mode == "device"
    assert worker._annotate_device_active is worker._annotate_device
    # a fake bandwidth probe without a fake A/B probe means NO A/B ran
    assert worker.link_status["tiled_ab_ms"] is None


def test_worker_tiled_route_follows_measured_ab():
    """The A/B measurement overrides the bandwidth threshold in both
    directions, and /stats exposes the measured pair (the round-5
    mis-route: probe 61-72 MB/s >= crossover 40 picked stacked while
    rows measured 35.3 vs 21.0 fps)."""
    det = Detector(
        DetectorConfig(variant="RFB-320", compute_dtype="float32"),
        rng=0)
    worker = InferenceWorker(
        det, EngineConfig(tiled_upload="auto",
                          tile_min_pixels=500_000))

    # healthy-looking bandwidth, but rows measures faster -> rows
    worker.probe_and_adapt(probe=lambda: 70.0,
                           probe_tiled=lambda: (120.0, 80.0))
    assert worker._effective_tiled_route == "rows"
    assert worker.link_status["tiled_ab_ms"] == {"stacked": 120.0,
                                                 "rows": 80.0}
    assert "measured A/B" in (
        worker.link_status["decisions"]["tiled_upload"]["why"])

    # degraded-looking bandwidth, but stacked measures faster
    worker.probe_and_adapt(probe=lambda: 20.0,
                           probe_tiled=lambda: (50.0, 90.0))
    assert worker._effective_tiled_route == "stacked"

    # probe disabled by config: threshold fallback even with a fake
    worker_off = InferenceWorker(
        det, EngineConfig(tiled_upload="auto",
                          link_tiled_ab_probe=False))
    worker_off.probe_and_adapt(probe=lambda: 70.0,
                               probe_tiled=lambda: (120.0, 80.0))
    assert worker_off._effective_tiled_route == "stacked"
    assert worker_off.link_status["tiled_ab_ms"] is None

    # explicit route: the A/B is not even probed
    calls = []

    def counting_ab():
        calls.append(1)
        return (120.0, 80.0)

    worker_rows = InferenceWorker(
        det, EngineConfig(tiled_upload="stacked"))
    worker_rows.probe_and_adapt(probe=lambda: 20.0,
                                probe_tiled=counting_ab)
    assert worker_rows._effective_tiled_route == "stacked"
    assert not calls

    # tiling disabled (tile_min_pixels=0, the default): the ~12 MB A/B
    # transfer is never paid for a route that can't be exercised
    worker_notile = InferenceWorker(
        det, EngineConfig(tiled_upload="auto"))
    worker_notile.probe_and_adapt(probe=lambda: 20.0,
                                  probe_tiled=counting_ab)
    assert not calls
    assert worker_notile.link_status["tiled_ab_ms"] is None


def test_tiled_auto_without_adaptivity_defaults_healthy():
    """With link_adaptive off no probe ever runs, so tiled_upload
    "auto" must resolve to the healthy-link default (stacked), not the
    degraded-rig pre-probe default (rows) that a probe would correct."""
    det = Detector(
        DetectorConfig(variant="RFB-320", compute_dtype="float32"),
        rng=0)
    worker = InferenceWorker(
        det, EngineConfig(tiled_upload="auto", link_adaptive=False))
    assert worker._effective_tiled_route == "stacked"
    # adaptive on: pre-probe rows, awaiting the warm-up probe
    worker_on = InferenceWorker(
        det, EngineConfig(tiled_upload="auto", link_adaptive=True))
    assert worker_on._effective_tiled_route == "rows"


def test_worker_adapts_and_recovers():
    det = Detector(
        DetectorConfig(variant="RFB-320", compute_dtype="float32"),
        rng=0)
    worker = InferenceWorker(
        det, EngineConfig(decode_mode="coefficients"))
    assert worker._effective_decode_mode == "coefficients"
    assert worker.link_status["probed"] is False

    status = worker.probe_and_adapt(probe=lambda: 40.0)
    assert status["degraded"] is True
    assert worker._effective_decode_mode == "ycbcr"
    assert status["configured_decode_mode"] == "coefficients"

    # recovery restores the configured path
    status = worker.probe_and_adapt(probe=lambda: 1500.0)
    assert status["degraded"] is False
    assert worker._effective_decode_mode == "coefficients"


def test_timer_reprobe_flips_paths_both_directions(monkeypatch):
    """The periodic re-probe task (serving/app.py link-reprobe) is the
    recovery mechanism: a degraded startup probe re-routes the
    transfer-sensitive paths, and a later healthy probe must restore
    every configured path — and vice versa — without a restart."""
    reading = {"mbps": 5.0}
    monkeypatch.setattr(link, "probe_h2d_mbps",
                        lambda: reading["mbps"])
    # the timer path (probe=None) also runs the tiled A/B probe; fake
    # it consistently with the bandwidth reading so the tiled decision
    # flips with the link state like the other two choices
    monkeypatch.setattr(
        link, "probe_tiled_route_ms",
        lambda *a, **k: ((120.0, 80.0) if reading["mbps"] < 250.0
                         else (50.0, 90.0)))

    det = Detector(
        DetectorConfig(variant="RFB-320", compute_dtype="float32"),
        rng=0)

    async def stats():
        reader, writer = await asyncio.open_connection(
            "127.0.0.1", 18470)
        writer.write(b"GET /stats HTTP/1.1\r\nHost: x\r\n"
                     b"Connection: close\r\n\r\n")
        await writer.drain()
        body = (await asyncio.wait_for(reader.read(), 10.0)
                ).split(b"\r\n\r\n", 1)[1]
        writer.close()
        return json.loads(body)

    async def wait_effective(decode, tiled, annotate, timeout=15.0):
        deadline = asyncio.get_running_loop().time() + timeout
        last = None
        while asyncio.get_running_loop().time() < deadline:
            last = (await stats())["link"]["decisions"]
            got = (last["decode_mode"]["effective"],
                   last["tiled_upload"]["effective"],
                   last["annotate_mode"]["effective"])
            if got == (decode, tiled, annotate):
                return last
            await asyncio.sleep(0.2)
        raise AssertionError(
            f"decisions never became {(decode, tiled, annotate)}; "
            f"last: {last}")

    async def run():
        server = await start_server(
            server_config=ServerConfig(
                http_address="127.0.0.1:18470",
                socket_address="127.0.0.1:18471"),
            engine_config=EngineConfig(
                batch_buckets=(1,), decode_mode="coefficients",
                tiled_upload="auto", annotate_mode="device",
                link_probe_period_s=0.3),
            detector=det, data_parallel="off")
        try:
            # collapsed-link startup probe: everything re-routed
            await wait_effective("ycbcr", "rows", "host")
            # recovery: the TIMER re-probe restores all configured paths
            reading["mbps"] = 1500.0
            await wait_effective("coefficients", "stacked", "device")
            # degradation flips them back, same mechanism
            reading["mbps"] = 5.0
            await wait_effective("ycbcr", "rows", "host")
        finally:
            await server.close()

    asyncio.run(run())


def test_server_flips_path_on_slow_probe(tmp_path, monkeypatch):
    """A server configured for the splice path on a (faked) slow link
    must come up serving the ycbcr path, say so in /stats, and still
    detect (the collapse mode can no longer happen by default)."""
    monkeypatch.setattr(link, "probe_h2d_mbps", lambda: 42.0)

    rng = np.random.default_rng(7)
    for i in range(3):
        frame = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
        (tmp_path / f"f{i}.jpg").write_bytes(codec.encode_rgb(frame))

    det = Detector(
        DetectorConfig(variant="RFB-320", compute_dtype="float32"),
        rng=0)
    det.warmup(1, 48, 64)

    async def run():
        server = await start_server(
            server_config=ServerConfig(
                http_address="127.0.0.1:18460",
                socket_address="127.0.0.1:18461"),
            engine_config=EngineConfig(
                batch_buckets=(1,), decode_mode="coefficients",
                annotate_mode="device"),
            detector=det,
            # warm-up must compile the ADAPTED (ycbcr) programs, not
            # the configured coefficient ones
            warmup_resolutions=[(48, 64)],
            data_parallel="off")
        try:
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", 18460)
            writer.write(b"GET /stats HTTP/1.1\r\nHost: x\r\n"
                         b"Connection: close\r\n\r\n")
            await writer.drain()
            body = (await asyncio.wait_for(reader.read(), 10.0)
                    ).split(b"\r\n\r\n", 1)[1]
            writer.close()
            stats = json.loads(body)
            assert stats["link"]["probed"] is True
            assert stats["link"]["degraded"] is True
            assert stats["link"]["h2d_mbps"] == 42.0
            assert stats["link"]["decode_mode"] == "ycbcr"
            assert (stats["link"]["configured_decode_mode"]
                    == "coefficients")

            # the re-routed path must actually serve: stream detections
            async def get_detections():
                r, w = await asyncio.open_connection("127.0.0.1", 18460)
                w.write(b"GET /detections?name=s HTTP/1.1\r\nHost: x\r\n"
                        b"Connection: close\r\n\r\n")
                await w.drain()
                data = b""
                try:
                    while (b"\r\n\r\n" not in data
                           or data.split(b"\r\n\r\n", 1)[1].count(b"\n")
                           < 2):
                        chunk = await asyncio.wait_for(r.read(4096), 20.0)
                        if not chunk:
                            break
                        data += chunk
                finally:
                    w.close()
                return data

            viewer = asyncio.create_task(get_detections())
            await asyncio.sleep(0.2)  # let the subscription register
            await send_stream(
                ReplaySource(str(tmp_path), fps=30),
                ClientConfig(address="127.0.0.1:18461", channel="s"),
                max_frames=60)
            data = await viewer
            lines = [ln for ln in
                     data.split(b"\r\n\r\n", 1)[1].splitlines() if ln]
            assert lines, "no detections delivered on the adapted path"
            rec = json.loads(lines[0])
            assert "detections" in rec and rec["width"] == 64
        finally:
            await server.close()

    asyncio.run(run())
