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


class DataSocket:
    """Listener plus live-connection registry (Python < 3.13 has no
    Server.close_clients, and a clean server shutdown must drop existing
    sender connections so clients enter their reconnect loop)."""

    def __init__(self) -> None:
        self.server: asyncio.AbstractServer | None = None
        self._writers: set[asyncio.StreamWriter] = set()
        self._tasks: set[asyncio.Task] = set()

    async def _handle(self, reader: asyncio.StreamReader,
                      writer: asyncio.StreamWriter,
                      queue: asyncio.Queue) -> None:
        peer = writer.get_extra_info("peername")
        log.info("%s: New TCP connection", peer)
        self._writers.add(writer)
        task = asyncio.current_task()
        if task is not None:
            self._tasks.add(task)
        try:
            while True:
                frame = await read_frame(reader)
                await queue.put(frame)
        # OSError subsumes ConnectionError and also covers dead-link
        # errors that are NOT resets (TCP keepalive ETIMEDOUT,
        # EHOSTUNREACH, ...) — those used to escape as unretrieved
        # task exceptions
        except (asyncio.IncompleteReadError, OSError):
            pass
        except asyncio.CancelledError:
            pass  # shutdown while parked in queue.put
        except ValueError as e:
            log.warning("%s: protocol error: %s", peer, e)
        finally:
            self._writers.discard(writer)
            if task is not None:
                self._tasks.discard(task)
            writer.close()
            log.info("%s: connection closed", peer)

    async def start(self, queue: asyncio.Queue, host: str,
                    port: int) -> None:
        self.server = await asyncio.start_server(
            lambda r, w: self._handle(r, w, queue), host, port)
        log.info("data socket listening on %s:%d", host, port)

    def close(self) -> None:
        if self.server is not None:
            self.server.close()
        for w in list(self._writers):
            transport = w.transport
            if transport is not None:
                transport.abort()
        # a handler parked in `await queue.put()` (full ingest queue)
        # is not at a read, so the abort never wakes it — cancel
        # outstanding handler tasks so wait_closed() cannot hang on
        # them (3.12's Server.wait_closed waits for handlers)
        for t in list(self._tasks):
            t.cancel()

    async def wait_closed(self) -> None:
        if self.server is not None:
            await self.server.wait_closed()


async def handle_incoming(reader: asyncio.StreamReader,
                          writer: asyncio.StreamWriter,
                          queue: asyncio.Queue) -> None:
    """Single-connection entry point (kept for direct use/tests)."""
    sock = DataSocket()
    await sock._handle(reader, writer, queue)


async def spawn_data_socket(queue: asyncio.Queue, host: str,
                            port: int) -> DataSocket:
    sock = DataSocket()
    await sock.start(queue, host, port)
    return sock
