"""Byte-level golden tests for the bincode + length-delimited protocol.

Goldens derived from bincode 1.x's documented default encoding (fixed-int,
little-endian, u64 lengths; enum variant as u32) — the layout the
reference's serde derive produces (reference common/src/protocol.rs:6-29,
round-tripped by its own test at protocol.rs:31-51) — and tokio
LengthDelimitedCodec's default u32 big-endian prefix.
"""

import numpy as np
import pytest

from infercam_onnx_tpu import protocol as p


def test_frame_msg_golden_bytes():
    # FrameMsg { id: "bla", data: vec![1, 2, 3] } inside the enum
    msg = p.FrameMsg("bla", bytes([1, 2, 3]))
    want = (
        b"\x01\x00\x00\x00"                    # variant tag 1
        b"\x03\x00\x00\x00\x00\x00\x00\x00"    # id len u64 LE
        b"bla"
        b"\x03\x00\x00\x00\x00\x00\x00\x00"    # data len u64 LE
        b"\x01\x02\x03"
    )
    assert p.encode_proto_msg(msg) == want
    assert p.decode_proto_msg(want) == msg


def test_connect_req_golden_bytes():
    msg = p.ConnectReq("simon")  # the reference's default channel name
    want = (
        b"\x00\x00\x00\x00"
        b"\x05\x00\x00\x00\x00\x00\x00\x00"
        b"simon"
    )
    assert p.encode_proto_msg(msg) == want
    assert p.decode_proto_msg(want) == msg


def test_decode_malformed_returns_none():
    assert p.decode_proto_msg(b"") is None
    assert p.decode_proto_msg(b"\x07\x00\x00\x00rest") is None  # bad tag
    # truncated payload
    good = p.encode_proto_msg(p.FrameMsg("x", b"12345"))
    assert p.decode_proto_msg(good[:-1]) is None
    # invalid utf-8 in id
    bad = b"\x01\x00\x00\x00\x02\x00\x00\x00\x00\x00\x00\x00\xff\xfe" \
          b"\x00\x00\x00\x00\x00\x00\x00\x00"
    assert p.decode_proto_msg(bad) is None


def test_decode_accepts_trailing_bytes():
    # bincode 1.x legacy deserialize (reference router.rs:56) is
    # AllowTrailing: padding after a fully parsed message is ignored
    msg = p.FrameMsg("x", b"12345")
    assert p.decode_proto_msg(p.encode_proto_msg(msg) + b"zzz") == msg
    req = p.ConnectReq("simon")
    assert p.decode_proto_msg(p.encode_proto_msg(req) + b"\x00") == req


def test_length_framing_roundtrip():
    payloads = [b"", b"x", b"hello world" * 100]
    stream = b"".join(p.frame_encode(x) for x in payloads)
    dec = p.FrameDecoder()
    # feed in awkward chunk sizes
    got = []
    for i in range(0, len(stream), 7):
        got.extend(dec.feed(stream[i:i + 7]))
    assert got == payloads


def test_length_framing_prefix_is_u32_be():
    assert p.frame_encode(b"abc")[:4] == b"\x00\x00\x00\x03"


def test_frame_too_large_rejected():
    dec = p.FrameDecoder(max_frame_len=10)
    with pytest.raises(ValueError):
        dec.feed(b"\x00\x00\x00\x0b")
    with pytest.raises(ValueError):
        p.frame_encode(b"x" * (p.MAX_FRAME_LEN + 1))


def test_mjpeg_part_framing():
    # exact framing from reference lib.rs:48-57
    part = p.as_jpeg_stream_item(b"JPEGDATA")
    assert part == (b"--frame\r\nContent-Type: image/jpeg\r\n\r\n"
                    b"JPEGDATA\r\n\r\n")


def test_unicode_channel_roundtrip():
    msg = p.FrameMsg("caméra-1", b"\x00\x01\xff")
    assert p.decode_proto_msg(p.encode_proto_msg(msg)) == msg


def test_decode_fuzz_never_raises(rng):
    # the router feeds arbitrary network bytes straight into the
    # decoder; anything other than (ProtoMsg | None) is a bug
    for n in (0, 1, 3, 4, 11, 12, 64, 300):
        for _ in range(50):
            buf = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
            out = p.decode_proto_msg(buf)
            assert out is None or isinstance(
                out, (p.ConnectReq, p.FrameMsg))


def test_frame_decoder_fuzz_chunking(rng):
    # valid frames interleaved with arbitrary chunk boundaries always
    # reassemble exactly
    payloads = [bytes(rng.integers(0, 256, size=int(k), dtype=np.uint8))
                for k in rng.integers(0, 2000, size=20)]
    stream = b"".join(p.frame_encode(x) for x in payloads)
    dec = p.FrameDecoder()
    got = []
    i = 0
    while i < len(stream):
        step = int(rng.integers(1, 64))
        got.extend(dec.feed(stream[i:i + step]))
        i += step
    assert got == payloads
