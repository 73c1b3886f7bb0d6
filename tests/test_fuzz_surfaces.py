"""Mutation-fuzz the remaining parse surfaces (round-4 hardening).

The ONNX reader is mutation-fuzzed in test_onnx_reader.py; this file
gives the two network-facing parsers the same treatment:

- the HTTP request parser (serving/http.py `_handle`): hostile request
  lines, oversized headers (past the asyncio 64 KiB stream limit),
  truncated bodies, hostile Content-Length values, chunked
  transfer-encoding, random binary garbage. Contract: no input may
  reach the handler's catch-all (`HTTP handler error` log record ==
  an unhandled exception escaped the parsing logic), and the server
  must keep serving well-formed requests afterwards. The reference's
  axum/hyper stack gives it this for free (reference
  infer_server/src/endpoints.rs); the dependency-free rebuild has to
  prove it.
- the length-delimited frame decoder + bincode message parser
  (protocol.py `FrameDecoder` / `decode_proto_msg`): arbitrary byte
  mutations and truncations must either parse, return None, or raise
  ValueError (the one error the data socket treats as a protocol
  violation, serving/data_socket.py:52) — never any other exception.
  The reference gets drop-not-die from `if let Ok(...)` around bincode
  (reference router.rs:56) and tokio's max-frame guard
  (data_socket.rs:38).
"""

import asyncio
import logging
import struct

import numpy as np
import pytest

from infercam_onnx_tpu.config import ServerConfig
from infercam_onnx_tpu.protocol import (
    ConnectReq,
    FrameDecoder,
    FrameMsg,
    decode_proto_msg,
    encode_proto_msg,
    frame_encode,
)
from infercam_onnx_tpu.serving.http import HttpServer
from infercam_onnx_tpu.serving.router import FrameRouter

HTTP_PORT = 18420


class _CatchAll(logging.Handler):
    """Records catch-all handler invocations (our-bug marker)."""

    def __init__(self):
        super().__init__()
        self.records = []

    def emit(self, record):
        if "HTTP handler error" in record.getMessage():
            self.records.append(record)


def _hostile_http_inputs(rng) -> list[bytes]:
    base = b"GET /healthcheck HTTP/1.1\r\nHost: x\r\n\r\n"
    inputs = [
        b"",
        b"\r\n",
        b"\x00\x01\x02\xff" * 16,
        b"GET\r\n\r\n",                       # request line too short
        b"GET /healthcheck\r\n\r\n",          # no version
        b"BOGUS /x HTTP/1.1\r\n\r\n",
        "GÉT /x HTTP/1.1\r\n\r\n".encode(),
        b"GET http://[ HTTP/1.1\r\n\r\n",     # urlsplit ValueError
        b"GET /x?name=%ff%fe HTTP/1.1\r\n\r\n",
        b"GET /snapshot?timeout=nan&name=a HTTP/1.1\r\n\r\n",
        b"GET /x HTTP/1.1\r\nContent-Length: -5\r\n\r\n",
        b"GET /x HTTP/1.1\r\nContent-Length: 99999999999999999999\r\n"
        b"\r\n",
        b"GET /x HTTP/1.1\r\nContent-Length: 0x10\r\n\r\n",
        b"GET /x HTTP/1.1\r\nContent-Length: 10\r\n\r\nab",  # truncated
        b"GET /x HTTP/1.1\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"5\r\nhello\r\n0\r\n\r\n",
        # header line far past the asyncio stream limit (64 KiB)
        b"GET /x HTTP/1.1\r\nX-Big: " + b"a" * (1 << 17) + b"\r\n\r\n",
        # request line past the limit
        b"GET /" + b"a" * (1 << 17) + b" HTTP/1.1\r\n\r\n",
        # many headers
        b"GET /x HTTP/1.1\r\n" + b"A: b\r\n" * 2000 + b"\r\n",
        # header without colon, empty header name, stray CR
        b"GET /x HTTP/1.1\r\nnocolon\r\n\r\n",
        b"GET /x HTTP/1.1\r\n: v\r\n\r\n",
        b"GET /x HTTP/1.1\rbroken\n\r\n",
    ]
    # random mutations of a valid request: flip bytes, truncate, splice
    for _ in range(60):
        buf = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        inputs.append(bytes(buf))
    for _ in range(20):
        inputs.append(bytes(base[:rng.integers(0, len(base))]))
    for _ in range(20):
        inputs.append(bytes(rng.integers(0, 256, size=rng.integers(
            1, 200), dtype=np.uint8)))
    return inputs


def test_http_parser_fuzz_never_hits_catch_all():
    rng = np.random.default_rng(41)
    catcher = _CatchAll()
    logging.getLogger("infercam.http").addHandler(catcher)

    async def run():
        router = FrameRouter(lambda job: False, ServerConfig())
        server = HttpServer(router)
        await server.start("127.0.0.1", HTTP_PORT)
        try:
            for payload in _hostile_http_inputs(rng):
                try:
                    reader, writer = await asyncio.open_connection(
                        "127.0.0.1", HTTP_PORT)
                except OSError:
                    pytest.fail("server stopped accepting connections")
                try:
                    writer.write(payload)
                    try:
                        await asyncio.wait_for(writer.drain(), 5.0)
                    except (ConnectionError, asyncio.TimeoutError):
                        pass
                    # read whatever response (or close) comes back; a
                    # short timeout is fine — inputs that leave the
                    # server legitimately waiting for more bytes (e.g.
                    # truncations) respond with nothing
                    try:
                        await asyncio.wait_for(reader.read(4096), 0.4)
                    except (asyncio.TimeoutError, ConnectionError):
                        pass
                finally:
                    writer.close()
            # the server must still serve a well-formed request
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", HTTP_PORT)
            writer.write(b"GET /healthcheck HTTP/1.1\r\nHost: x\r\n"
                         b"Connection: close\r\n\r\n")
            await writer.drain()
            data = await asyncio.wait_for(reader.read(4096), 10.0)
            writer.close()
            assert b"200 OK" in data and b"healthy" in data
        finally:
            await server.close()

    try:
        asyncio.run(run())
        assert not catcher.records, (
            "unhandled exception escaped the HTTP parser: "
            f"{catcher.records[0].getMessage()}\n"
            f"{catcher.records[0].exc_text}")
    finally:
        logging.getLogger("infercam.http").removeHandler(catcher)


def test_frame_decoder_fuzz_only_value_error():
    """Arbitrary bytes through FrameDecoder: every outcome is frames,
    needs-more-bytes, or ValueError — nothing else escapes, and a
    fresh decoder afterwards still reassembles valid traffic."""
    rng = np.random.default_rng(42)
    valid = b"".join(
        frame_encode(encode_proto_msg(FrameMsg(f"cam{i}", bytes(
            rng.integers(0, 256, size=rng.integers(0, 400),
                         dtype=np.uint8)))))
        for i in range(5))

    for trial in range(300):
        if trial % 3 == 0:
            data = bytes(rng.integers(0, 256, size=rng.integers(
                1, 600), dtype=np.uint8))
        elif trial % 3 == 1:
            buf = bytearray(valid)
            for _ in range(rng.integers(1, 8)):
                buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
            data = bytes(buf)
        else:
            data = valid[:rng.integers(0, len(valid))]
        dec = FrameDecoder(max_frame_len=1 << 20)
        pos = 0
        try:
            while pos < len(data):
                step = int(rng.integers(1, 64))
                for frame in dec.feed(data[pos:pos + step]):
                    assert isinstance(frame, bytes)
                    # the router layer must never raise on any payload
                    msg = decode_proto_msg(frame)
                    assert msg is None or isinstance(
                        msg, (ConnectReq, FrameMsg))
                pos += step
        except ValueError:
            pass  # oversize length prefix: the one legal protocol error


def test_frame_decoder_chunked_reassembly_exact():
    """Reassembly across adversarial chunk boundaries is byte-exact."""
    rng = np.random.default_rng(43)
    payloads = [bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
                for n in (0, 1, 3, 4, 5, 255, 4096)]
    stream = b"".join(frame_encode(p) for p in payloads)
    for _ in range(50):
        dec = FrameDecoder()
        got = []
        pos = 0
        while pos < len(stream):
            step = int(rng.integers(1, 9))
            got.extend(dec.feed(stream[pos:pos + step]))
            pos += step
        assert got == payloads


def test_decode_proto_msg_truncations_and_trailing():
    """Every truncation of a valid message returns None or a valid
    prefix-parse; trailing garbage after a full message is accepted
    (bincode 1.x AllowTrailing, reference router.rs:56)."""
    msg = encode_proto_msg(FrameMsg("simon", b"\xffJPEG\x00data"))
    for cut in range(len(msg)):
        out = decode_proto_msg(msg[:cut])
        assert out is None or isinstance(out, (ConnectReq, FrameMsg))
    assert decode_proto_msg(msg) == FrameMsg("simon", b"\xffJPEG\x00data")
    assert decode_proto_msg(msg + b"garbage") == FrameMsg(
        "simon", b"\xffJPEG\x00data")
    # huge claimed string length must not allocate or crash
    hostile = struct.pack("<I", 1) + struct.pack("<Q", 1 << 62) + b"x"
    assert decode_proto_msg(hostile) is None
