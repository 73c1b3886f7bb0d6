"""Subprocess-level end-to-end test: real serve + sender CLIs + HTTP.

The strongest integration level — spawns the actual console entry points
as separate processes (the reference's two-binary deployment topology,
SURVEY.md section 1 'process topology') and drives them over real
sockets. CPU-forced via env config override in a sitecustomize-safe way
(the child processes run the same interpreter).
"""

import json
import os
import signal
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from infercam_onnx_tpu import codec

HTTP = 18500
SOCK = 18501


def _wait_port(port, timeout=120.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with socket.create_connection(("127.0.0.1", port), 1):
                return True
        except OSError:
            time.sleep(0.5)
    return False


def _http_get(port, path, read_bytes=0, timeout=20.0):
    s = socket.create_connection(("127.0.0.1", port), timeout)
    s.sendall(f"GET {path} HTTP/1.1\r\nHost: x\r\n"
              "Connection: close\r\n\r\n".encode())
    s.settimeout(timeout)
    data = b""
    try:
        while True:
            chunk = s.recv(4096)
            if not chunk:
                break
            data += chunk
            if read_bytes and len(data) >= read_bytes:
                break
    except socket.timeout:
        pass
    s.close()
    return data


def test_preset_flag_bundles(monkeypatch):
    """Preset bundles reach the engine config; explicitly passed flags
    win over their preset values (serve.py PRESETS contract)."""
    from infercam_onnx_tpu import serve
    from infercam_onnx_tpu.serving import app as app_mod

    captured = {}

    async def fake_serve_forever(**kw):
        captured.update(kw)

    monkeypatch.setattr(app_mod, "serve_forever", fake_serve_forever)

    assert serve.main(["--preset", "latency"]) == 0
    ec = captured["engine_config"]
    assert ec.batch_window_ms == 0.0
    assert ec.decode_scale == 1 and ec.decode_mode == "ycbcr"
    assert ec.queue_capacity == 4 and max(ec.batch_buckets) == 2

    captured.clear()
    assert serve.main(["--preset", "latency",
                       "--decode-scale", "2"]) == 0
    assert captured["engine_config"].decode_scale == 2  # explicit wins
    assert captured["engine_config"].batch_window_ms == 0.0

    captured.clear()
    assert serve.main(["--preset", "throughput",
                       "--annotate", "host"]) == 0
    ec = captured["engine_config"]
    assert ec.decode_mode == "ycbcr" and ec.annotate_mode == "host"

    # flag ALIASES count as explicitly passed: --warmup-sync shares
    # dest warmup_async with --warmup-async, and the throughput preset
    # sets warmup_async=True — the user's sync choice must survive
    captured.clear()
    assert serve.main(["--preset", "throughput", "--warmup-sync"]) == 0
    assert captured["warmup_async"] is False


@pytest.mark.slow
def test_two_process_deployment(tmp_path):
    rng = np.random.default_rng(3)
    for i in range(2):
        frame = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
        (tmp_path / f"f{i}.jpg").write_bytes(codec.encode_rgb(frame))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # children must also beat the tunnel sitecustomize; serve.py honors
    # JAX_PLATFORMS only if the sitecustomize is neutralized:
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.setdefault("XLA_FLAGS", "")

    server = subprocess.Popen(
        [sys.executable, "-m", "infercam_onnx_tpu.serve",
         "--server-address", f"127.0.0.1:{HTTP}",
         "--socket-address", f"127.0.0.1:{SOCK}",
         "--max-batch", "4"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    sender = None
    try:
        assert _wait_port(HTTP), "server HTTP port never opened"
        resp = _http_get(HTTP, "/healthcheck")
        assert resp.endswith(b"healthy")

        sender = subprocess.Popen(
            [sys.executable, "-m", "infercam_onnx_tpu.client.sender",
             "--address", f"127.0.0.1:{SOCK}", "--channel", "e2e",
             "--replay-dir", str(tmp_path), "--fps", "20"],
            env=env, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)

        raw = _http_get(HTTP, "/stream?name=e2e", read_bytes=1500,
                        timeout=30.0)
        assert raw.count(b"--frame\r\nContent-Type: image/jpeg") >= 1

        face = _http_get(HTTP, "/face_stream?name=e2e", read_bytes=800,
                         timeout=120.0)
        assert face.count(b"--frame\r\nContent-Type: image/jpeg") >= 1

        time.sleep(2.5)  # let the meter complete a drain cycle
        stats = _http_get(HTTP, "/stats")
        payload = json.loads(stats.split(b"\r\n\r\n", 1)[1])
        assert payload["totals"].get("raw_unique", 0) >= 1
    finally:
        if sender is not None:
            sender.send_signal(signal.SIGINT)
            sender.wait(10)
        server.send_signal(signal.SIGINT)
        try:
            server.wait(10)
        except subprocess.TimeoutExpired:
            server.kill()


@pytest.mark.slow
def test_sigterm_graceful_shutdown(tmp_path):
    """Production shutdown contract: SIGTERM closes listeners and
    established connections and the process exits cleanly."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    server = subprocess.Popen(
        [sys.executable, "-m", "infercam_onnx_tpu.serve",
         "--server-address", "127.0.0.1:18520",
         "--socket-address", "127.0.0.1:18521",
         "--max-batch", "2"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        assert _wait_port(18520), "server HTTP port never opened"
        server.send_signal(signal.SIGTERM)
        assert server.wait(30) == 0
    finally:
        if server.poll() is None:
            server.kill()


@pytest.mark.slow
def test_max_rss_recycles_server_and_clients_reconnect(tmp_path):
    """--max-rss-mb: the server re-execs itself when the cap is hit; the
    HTTP port comes back and a sender survives via its reconnect loop."""
    rng = np.random.default_rng(7)
    (tmp_path / "f.jpg").write_bytes(codec.encode_rgb(
        rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    server = subprocess.Popen(
        [sys.executable, "-m", "infercam_onnx_tpu.serve",
         "--server-address", "127.0.0.1:18550",
         "--socket-address", "127.0.0.1:18551",
         "--max-batch", "2",
         # any real jax process exceeds 64 MiB -> first check recycles
         "--max-rss-mb", "64"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    sender = None
    try:
        assert _wait_port(18550), "server never came up"
        sender = subprocess.Popen(
            [sys.executable, "-m", "infercam_onnx_tpu.client.sender",
             "--address", "127.0.0.1:18551", "--channel", "r",
             "--replay-dir", str(tmp_path), "--fps", "5"],
            env=env, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)
        # wait for the recycle (watchdog fires ~10 s in), then the port
        # must come BACK on the re-exec'd process
        time.sleep(14)
        assert _wait_port(18550, timeout=120), \
            "server did not come back after recycle"
        resp = _http_get(18550, "/healthcheck")
        assert resp.endswith(b"healthy")
        assert sender.poll() is None  # sender survived via reconnects
    finally:
        if sender is not None:
            sender.send_signal(signal.SIGINT)
            sender.wait(10)
        server.send_signal(signal.SIGTERM)
        try:
            server.wait(15)
        except subprocess.TimeoutExpired:
            server.kill()
