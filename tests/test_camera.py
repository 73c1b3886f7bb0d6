"""Camera module tests: ioctl encoding, fake seam, sender integration.

Real /dev/video0 hardware is absent in CI (the reference has the same
gap: its hardware test is compiled out behind --cfg webcam, reference
sensors.rs:120-152); these tests cover the V4L2 ABI constants, the
Capturable seam, and the async CameraSource path with a FakeCamera.
"""

import asyncio

import pytest

from infercam_onnx_tpu.client import camera


def test_ioctl_codes_match_kernel_abi():
    # golden values from compiling against linux/videodev2.h on x86_64
    assert camera.VIDIOC_ENUM_FMT == 0xC0405602
    assert camera.VIDIOC_S_FMT == 0xC0D05605
    assert camera.VIDIOC_REQBUFS == 0xC0145608
    assert camera.VIDIOC_QUERYBUF == 0xC0585609
    assert camera.VIDIOC_QBUF == 0xC058560F
    assert camera.VIDIOC_DQBUF == 0xC0585611
    assert camera.VIDIOC_STREAMON == 0x40045612
    assert camera.VIDIOC_STREAMOFF == 0x40045613
    assert camera.VIDIOC_S_PARM == 0xC0CC5616
    assert camera.VIDIOC_ENUM_FRAMESIZES == 0xC02C564A
    assert camera.VIDIOC_ENUM_FRAMEINTERVALS == 0xC034564B
    assert camera.V4L2_PIX_FMT_MJPEG == 0x47504A4D


def test_struct_sizes_match_kernel_abi():
    import ctypes

    # golden sizes from linux/videodev2.h on x86_64 (the mmap offset
    # handshake depends on exact layout)
    assert ctypes.sizeof(camera.v4l2_buffer) == 88
    assert ctypes.sizeof(camera.v4l2_fmtdesc) == 64
    assert ctypes.sizeof(camera.v4l2_frmsizeenum) == 44
    assert ctypes.sizeof(camera.v4l2_frmivalenum) == 52
    assert ctypes.sizeof(camera.v4l2_format) == 208
    assert ctypes.sizeof(camera.v4l2_requestbuffers) == 20
    assert ctypes.sizeof(camera.v4l2_streamparm) == 204


def test_fake_camera_loops():
    cam = camera.FakeCamera([b"a", b"b"])
    assert [cam.get_frame() for _ in range(5)] == [b"a", b"b", b"a",
                                                  b"b", b"a"]


def test_camera_source_with_fake():
    src = camera.CameraSource(camera.FakeCamera([b"jpeg1", b"jpeg2"]))

    async def run():
        out = []
        async for f in src.frames():
            out.append(f)
            if len(out) == 3:
                break
        return out

    assert asyncio.run(run()) == [b"jpeg1", b"jpeg2", b"jpeg1"]


def test_missing_device_raises():
    with pytest.raises(OSError):
        camera.V4L2Camera("/dev/video_does_not_exist")


def test_sender_accepts_fake_camera_source(tmp_path):
    # the sender streams frames from a CameraSource over the wire
    from infercam_onnx_tpu.client.sender import send_stream
    from infercam_onnx_tpu.config import ClientConfig
    from infercam_onnx_tpu import protocol as proto

    received = []

    async def run():
        async def handler(reader, writer):
            try:
                while True:
                    received.append(await proto.read_frame(reader))
            except (asyncio.IncompleteReadError, ConnectionError):
                writer.close()

        server = await asyncio.start_server(handler, "127.0.0.1", 18440)
        src = camera.CameraSource(camera.FakeCamera([b"\xff\xd8fake"]))
        sent = await send_stream(
            src, ClientConfig(address="127.0.0.1:18440", channel="cam"),
            max_frames=3)
        server.close()
        await server.wait_closed()
        return sent

    sent = asyncio.run(run())
    assert sent == 3
    msgs = [proto.decode_proto_msg(r) for r in received]
    assert isinstance(msgs[0], proto.ConnectReq)
    frame_msgs = [m for m in msgs if isinstance(m, proto.FrameMsg)]
    assert len(frame_msgs) == 3
    assert frame_msgs[0].data == b"\xff\xd8fake"


def test_plan_channels_fanout_and_explicit():
    from infercam_onnx_tpu.client.sender import plan_channels

    assert plan_channels(1, ["simon"]) == ["simon"]
    assert plan_channels(3, ["cam"]) == ["cam", "cam-1", "cam-2"]
    assert plan_channels(2, ["front", "back"]) == ["front", "back"]
    with pytest.raises(ValueError, match="channel name"):
        plan_channels(3, ["a", "b"])


def test_multi_camera_sender_streams_every_channel():
    """One sender process fans several cameras out to their own
    channels (the reference runs one process per camera,
    socket_sender.rs; this is a capability extension for multi-camera
    edge boxes)."""
    from infercam_onnx_tpu.client.sender import run_forever, send_stream
    from infercam_onnx_tpu.config import ClientConfig
    from infercam_onnx_tpu import protocol as proto

    seen: dict[str, int] = {}

    async def run():
        async def handler(reader, writer):
            try:
                while True:
                    payload = await proto.read_frame(reader)
                    msg = proto.decode_proto_msg(payload)
                    if isinstance(msg, proto.FrameMsg):
                        seen[msg.id] = seen.get(msg.id, 0) + 1
            except (asyncio.IncompleteReadError, ConnectionError):
                writer.close()

        server = await asyncio.start_server(handler, "127.0.0.1", 18444)
        sources = [
            camera.CameraSource(camera.FakeCamera([b"\xff\xd8a"])),
            camera.CameraSource(camera.FakeCamera([b"\xff\xd8b"])),
        ]
        await asyncio.gather(*(
            send_stream(src,
                        ClientConfig(address="127.0.0.1:18444",
                                     channel=ch),
                        max_frames=3)
            for src, ch in zip(sources, ["cam", "cam-1"])))
        server.close()
        await server.wait_closed()

    asyncio.run(run())
    assert seen == {"cam": 3, "cam-1": 3}
