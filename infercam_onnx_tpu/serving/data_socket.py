"""TCP ingest socket (reference infer_server/src/data_socket.rs).

Accept loop with one handler task per connection; each connection reads
length-delimited frames and pushes the raw payload into the bounded ingest
queue — ``await put`` blocks when the queue is full, propagating
backpressure to the TCP stream exactly like the reference's
``tx.send(...).await`` (reference data_socket.rs:40-44, channel cap 200,
reference lib.rs:23).
"""

from __future__ import annotations

import asyncio
import logging

from infercam_onnx_tpu.protocol import read_frame

log = logging.getLogger("infercam.data_socket")


async def handle_incoming(reader: asyncio.StreamReader,
                          writer: asyncio.StreamWriter,
                          queue: asyncio.Queue) -> None:
    peer = writer.get_extra_info("peername")
    log.info("%s: New TCP connection", peer)
    try:
        while True:
            frame = await read_frame(reader)
            await queue.put(frame)
    except (asyncio.IncompleteReadError, ConnectionError):
        pass
    except ValueError as e:
        log.warning("%s: protocol error: %s", peer, e)
    finally:
        writer.close()
        log.info("%s: connection closed", peer)


async def spawn_data_socket(queue: asyncio.Queue, host: str,
                            port: int) -> asyncio.AbstractServer:
    server = await asyncio.start_server(
        lambda r, w: handle_incoming(r, w, queue), host, port)
    log.info("data socket listening on %s:%d", host, port)
    return server
