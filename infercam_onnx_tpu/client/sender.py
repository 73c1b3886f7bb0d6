"""Socket sender: streams JPEG frames to the inference server
(reference cam_sender/src/bin/socket_sender.rs).

Protocol-identical to the reference client: connect, send
``ProtoMsg::ConnectReq(channel)``, then a ``ProtoMsg::FrameMsg`` per
captured frame, all bincode-encoded inside u32-BE length-delimited frames
(reference socket_sender.rs:62-90). The whole send loop retries forever
with a 3 s backoff on any error (reference socket_sender.rs:53-59).

Frame sources:
- ``ReplaySource``: loops JPEG files from a directory at a fixed rate —
  the webcam-free test fixture SURVEY.md section 4 calls for;
- ``CameraSource``: V4L2 MJPG capture (client/camera.py), the equivalent
  of the reference's rscam path (reference sensors.rs:18-68).

Usage::

    python -m infercam_onnx_tpu.client.sender --channel simon \
        --replay-dir resources/pics --fps 30
    python -m infercam_onnx_tpu.client.sender --camera /dev/video0
"""

from __future__ import annotations

import argparse
import asyncio
import pathlib
import logging
import os
import sys
from typing import AsyncIterator, Protocol

from infercam_onnx_tpu.config import ClientConfig
from infercam_onnx_tpu.protocol import (
    ConnectReq,
    FrameMsg,
    encode_proto_msg,
    frame_encode,
)

log = logging.getLogger("infercam.sender")


class FrameSource(Protocol):
    def frames(self) -> AsyncIterator[bytes]: ...


class ReplaySource:
    """Loops JPEG files from a directory at ``fps`` frames per second."""

    def __init__(self, directory: str, fps: float = 30.0,
                 loop_forever: bool = True):
        self._files = sorted(
            os.path.join(directory, f) for f in os.listdir(directory)
            if f.lower().endswith((".jpg", ".jpeg")))
        if not self._files:
            raise FileNotFoundError(f"no JPEGs in {directory}")
        self._frames = [pathlib.Path(f).read_bytes()
                        for f in self._files]
        self._fps = fps
        self._loop_forever = loop_forever

    async def frames(self) -> AsyncIterator[bytes]:
        period = 1.0 / self._fps if self._fps > 0 else 0.0
        while True:
            for data in self._frames:
                yield data
                if period:
                    await asyncio.sleep(period)
            if not self._loop_forever:
                return


async def send_stream(
    source: FrameSource,
    config: ClientConfig = ClientConfig(),
    *,
    max_frames: int | None = None,
) -> int:
    """One connection lifetime: connect, ConnectReq, frame loop.
    Returns frames sent; raises on connection errors (caller retries)."""
    host, _, port = config.address.rpartition(":")
    reader, writer = await asyncio.open_connection(host, int(port))
    log.info("Client connected to %s", config.channel)
    sent = 0
    try:
        writer.write(frame_encode(
            encode_proto_msg(ConnectReq(config.channel))))
        await writer.drain()
        async for data in source.frames():
            writer.write(frame_encode(
                encode_proto_msg(FrameMsg(config.channel, data))))
            await writer.drain()
            sent += 1
            if max_frames is not None and sent >= max_frames:
                break
    finally:
        writer.close()
        try:
            await writer.wait_closed()
        except (ConnectionError, OSError):
            pass
    return sent


async def run_forever(source: FrameSource,
                      config: ClientConfig = ClientConfig()) -> None:
    """Infinite reconnect loop with backoff (reference
    socket_sender.rs:53-59)."""
    while True:
        try:
            await send_stream(source, config)
        except asyncio.CancelledError:
            raise
        except Exception as e:
            # the reference retries on ANY error (socket_sender.rs:55
            # matches every Err) — e.g. an oversized frame failing
            # protocol encode must reconnect, not kill every camera
            # loop in the process
            log.warning("Error in sender: %s. Reconnecting...", e)
        await asyncio.sleep(config.reconnect_backoff_s)


def plan_channels(n_sources: int, channels: list[str]) -> list[str]:
    """Per-source channel names: explicit list when it matches, else a
    single base name fans out to ``base``, ``base-1``, ``base-2``, ...
    (the first keeps the bare name so single-camera behavior is
    unchanged)."""
    if len(channels) == n_sources:
        return list(channels)
    if len(channels) == 1:
        base = channels[0]
        return [base if i == 0 else f"{base}-{i}"
                for i in range(n_sources)]
    raise ValueError(
        f"{len(channels)} channel name(s) for {n_sources} camera(s) — "
        "pass one --channel per --camera, or a single base name")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--address", default="127.0.0.1:3001")
    ap.add_argument("--channel", action="append", default=None,
                    help="stream name (repeatable; one per --camera, "
                         "or a single base name that fans out as "
                         "base, base-1, ...; default simon)")
    ap.add_argument("--replay-dir",
                    help="stream JPEG files from this directory")
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--camera", action="append", nargs="?",
                    const="/dev/video0",
                    help="capture from a V4L2 device (repeatable: one "
                         "edge process can stream several cameras, "
                         "each on its own channel with its own "
                         "reconnect loop; default /dev/video0)")
    ap.add_argument("--log-level", default="INFO")
    args = ap.parse_args(argv)

    logging.basicConfig(
        level=args.log_level.upper(),
        format="%(asctime)s.%(msecs)03d %(levelname)s %(name)s: "
               "%(message)s",
        datefmt="%Y-%m-%dT%H:%M:%S")

    channels = args.channel or ["simon"]
    sources: list[FrameSource] = []
    if args.camera:
        from infercam_onnx_tpu.client.camera import CameraSource

        sources = [CameraSource(dev) for dev in args.camera]
    elif args.replay_dir:
        sources = [ReplaySource(args.replay_dir, fps=args.fps)]
    else:
        ap.error("one of --replay-dir or --camera is required")
    try:
        channels = plan_channels(len(sources), channels)
    except ValueError as e:
        ap.error(str(e))

    configs = [ClientConfig(address=args.address, channel=ch)
               for ch in channels]
    log.info("Launching socket sender for channel(s) %s",
             ", ".join(channels))

    async def run_all():
        await asyncio.gather(*(run_forever(src, cfg)
                               for src, cfg in zip(sources, configs)))

    try:
        asyncio.run(run_all())
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
