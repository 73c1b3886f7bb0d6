"""Minimal asyncio HTTP/1.1 server with MJPEG streaming endpoints.

Dependency-free equivalent of the reference's axum app (reference
infer_server/src/endpoints.rs, infer_server.rs:58-68):

- ``GET /healthcheck`` -> 200 ``healthy`` (reference endpoints.rs:20-22)
- ``GET /stream?name=X`` -> ``multipart/x-mixed-replace; boundary=frame``
  over the raw broadcast (reference endpoints.rs:25-48)
- ``GET /face_stream?name=X`` -> same over the inferred broadcast
  (reference endpoints.rs:50-73)

``name`` defaults to ``"unknown"`` (reference endpoints.rs:29,54). The
meter ticks once per delivered part per viewer (reference
endpoints.rs:35-38,60-63). MJPEG responses stream until the client
disconnects; subscriptions are closed on disconnect so the router's
demand-driven pruning stops inference when the last viewer leaves.
"""

from __future__ import annotations

import asyncio
import logging
import urllib.parse

from infercam_onnx_tpu.protocol import _MJPEG_HEADER, _MJPEG_TRAILER
from infercam_onnx_tpu.serving.meter import METER, Meter
from infercam_onnx_tpu.serving.router import FrameRouter


def _jpeg_from_part(part: bytes) -> bytes:
    """Payload of one MJPEG part (as_jpeg_stream_item framing)."""
    if part.startswith(_MJPEG_HEADER) and part.endswith(_MJPEG_TRAILER):
        return part[len(_MJPEG_HEADER):-len(_MJPEG_TRAILER)]
    return part

log = logging.getLogger("infercam.http")

_MJPEG_HEADERS = (
    b"HTTP/1.1 200 OK\r\n"
    b"Content-Type: multipart/x-mixed-replace; boundary=frame\r\n"
    b"Cache-Control: no-cache\r\n"
    b"Connection: close\r\n"
    b"\r\n"
)

_NDJSON_HEADERS = (
    b"HTTP/1.1 200 OK\r\n"
    b"Content-Type: application/x-ndjson\r\n"
    b"Cache-Control: no-cache\r\n"
    b"Connection: close\r\n"
    b"\r\n"
)


def _simple_response(status: str, body: bytes,
                     content_type: str = "text/plain",
                     keep_alive: bool = False) -> bytes:
    conn = "keep-alive" if keep_alive else "close"
    return (
        f"HTTP/1.1 {status}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n"
        f"Connection: {conn}\r\n\r\n"
    ).encode() + body


class HttpServer:
    def __init__(self, router: FrameRouter, meter: Meter = METER,
                 topology: dict | None = None,
                 warming=None, link=None):
        self._router = router
        self._meter = meter
        # serving topology (devices/processes/lockstep/runtime) shown
        # in /stats so operators can see what a deployment actually is
        self._topology = topology
        # callable -> bool: device warm-up still running (--warmup-async
        # on a slow link can take minutes; operators need to tell "not
        # ready yet" apart from "broken")
        self._warming = warming
        # callable -> dict | None: link probe verdict + the transfer
        # path actually in effect (serving/link.py adaptivity)
        self._link = link
        self._server: asyncio.AbstractServer | None = None

    async def start(self, host: str, port: int) -> None:
        self._server = await asyncio.start_server(
            self._handle, host, port)
        log.info("HTTP server listening on %s:%d", host, port)

    async def serve_forever(self) -> None:
        assert self._server is not None
        async with self._server:
            await self._server.serve_forever()

    async def close(self) -> None:
        if self._server is not None:
            self._server.close()
            # force-close active MJPEG streams (3.12's wait_closed waits
            # for all handlers)
            if hasattr(self._server, "close_clients"):
                self._server.close_clients()
            try:
                await asyncio.wait_for(self._server.wait_closed(), 5.0)
            except asyncio.TimeoutError:
                pass

    async def _handle(self, reader: asyncio.StreamReader,
                      writer: asyncio.StreamWriter) -> None:
        """Request loop: non-streaming endpoints serve multiple requests
        per connection (HTTP/1.1 keep-alive, like the reference's axum —
        /stats pollers reuse one socket); streaming endpoints hold the
        connection until the client disconnects, then close."""
        try:
            while True:
                # the request/header PARSE section has its own
                # ValueError scope: readline() raises it for header
                # lines over the stream limit (64 KiB), urlsplit for
                # malformed bracket hosts. Those are hostile input ->
                # drop the connection quietly. A ValueError raised by
                # endpoint/stream logic below must NOT be swallowed by
                # this bucket — it is OUR bug and belongs to the logged
                # catch-all (the fuzz suite relies on the distinction).
                try:
                    request_line = await asyncio.wait_for(
                        reader.readline(), 30.0)
                    if not request_line:
                        return
                    parts = request_line.decode("latin-1").split()
                    if len(parts) < 2:
                        writer.write(_simple_response("400 Bad Request",
                                                      b"bad"))
                        return
                    method, target = parts[0], parts[1]
                    version = (parts[2] if len(parts) >= 3
                               else "HTTP/1.0")
                    conn_hdr = ""
                    body_len = 0
                    chunked = False
                    while True:
                        line = await asyncio.wait_for(
                            reader.readline(), 30.0)
                        if line in (b"\r\n", b"\n", b""):
                            break
                        low = line.lower()
                        if low.startswith(b"connection:"):
                            conn_hdr = line.split(b":", 1)[1].strip(
                            ).decode("latin-1").lower()
                        elif low.startswith(b"content-length:"):
                            try:
                                body_len = int(line.split(b":", 1)[1])
                            except ValueError:
                                body_len = -1
                        elif low.startswith(b"transfer-encoding:"):
                            # a chunked body is not drained here;
                            # keeping the connection would parse
                            # leftover chunk data as the next request
                            # line
                            chunked = True
                    keep = (version == "HTTP/1.1" and conn_hdr != "close"
                            and not chunked)
                    # drain any request body so a keep-alive
                    # connection's next request line is not the
                    # leftover body bytes (bounded: nothing here
                    # accepts uploads)
                    if body_len < 0 or body_len > 1 << 20:
                        keep = False
                    elif body_len:
                        await asyncio.wait_for(
                            reader.readexactly(body_len), 30.0)

                    url = urllib.parse.urlsplit(target)
                    query = urllib.parse.parse_qs(url.query)
                    name = query.get("name", ["unknown"])[0]
                except ValueError as e:
                    log.debug("dropping connection on unparseable "
                              "request: %s", e)
                    return

                if method != "GET":
                    writer.write(_simple_response(
                        "405 Method Not Allowed", b"method not allowed",
                        keep_alive=keep))
                elif url.path in ("/", "/index.html"):
                    writer.write(_simple_response(
                        "200 OK", self._dashboard(),
                        "text/html; charset=utf-8", keep_alive=keep))
                elif url.path == "/healthcheck":
                    writer.write(_simple_response("200 OK", b"healthy",
                                                  keep_alive=keep))
                elif url.path == "/stats":
                    import json

                    payload = self._meter.stats()
                    if self._topology is not None:
                        payload["topology"] = self._topology
                    if self._warming is not None:
                        payload["warming"] = bool(self._warming())
                    if self._link is not None:
                        status = self._link()
                        if status is not None:
                            payload["link"] = status
                    body = json.dumps(payload).encode()
                    writer.write(_simple_response(
                        "200 OK", body, "application/json",
                        keep_alive=keep))
                elif url.path == "/metrics":
                    text = self._meter.prometheus()
                    if self._topology is not None:
                        labels = ",".join(
                            f'{k}="{v}"' for k, v in
                            sorted(self._topology.items()))
                        text += ("# TYPE infercam_topology_info gauge\n"
                                 f"infercam_topology_info{{{labels}}}"
                                 " 1\n")
                    writer.write(_simple_response(
                        "200 OK", text.encode(),
                        "text/plain; version=0.0.4",
                        keep_alive=keep))
                elif url.path == "/stream":
                    log.info("Stream for %s requested", name)
                    await self._stream(
                        reader, writer, self._router.subscribe_raw(name),
                        self._meter.tick_raw)
                    return
                elif url.path == "/face_stream":
                    log.info("Infered stream for %s requested", name)
                    await self._stream(
                        reader, writer,
                        self._router.subscribe_inferred(name),
                        self._meter.tick_inferred)
                    return
                elif url.path == "/snapshot":
                    # one-shot JPEG of the stream's next frame —
                    # dashboards/thumbnails without an MJPEG consumer.
                    # ?raw=1 snapshots the raw stream instead of the
                    # annotated one. Demand-driven like the streams: the
                    # subscription itself makes the router infer.
                    raw = query.get("raw", ["0"])[0] not in ("0", "")
                    try:
                        timeout_s = float(
                            query.get("timeout", ["10"])[0] or 10)
                    except ValueError:
                        writer.write(_simple_response(
                            "400 Bad Request", b"bad timeout",
                            keep_alive=keep))
                        await writer.drain()
                        if not keep:
                            return
                        continue
                    sub = (self._router.subscribe_raw(name) if raw
                           else self._router.subscribe_inferred(name))
                    try:
                        with sub:
                            part = await asyncio.wait_for(
                                sub.receive(), timeout_s)
                        jpeg = _jpeg_from_part(part)
                        (self._meter.tick_raw if raw
                         else self._meter.tick_inferred)()
                        writer.write(_simple_response(
                            "200 OK", jpeg, "image/jpeg",
                            keep_alive=keep))
                    except asyncio.TimeoutError:
                        writer.write(_simple_response(
                            "504 Gateway Timeout",
                            b"no frame within timeout",
                            keep_alive=keep))
                elif url.path == "/detections":
                    log.info("Detections stream for %s requested", name)
                    await self._stream(
                        reader, writer,
                        self._router.subscribe_detections(name),
                        self._meter.tick_inferred,
                        headers=_NDJSON_HEADERS)
                    return
                else:
                    writer.write(_simple_response("404 Not Found",
                                                  b"not found",
                                                  keep_alive=keep))
                await writer.drain()
                if not keep:
                    return
        except (asyncio.TimeoutError, ConnectionError,
                asyncio.IncompleteReadError):
            # transport-level client misbehavior: a stalled/broken
            # socket or a body truncated mid-drain -> drop the
            # connection, no stack trace. Parse-phase ValueErrors are
            # scoped to the parse section above; a ValueError escaping
            # endpoint/stream logic reaches the logged catch-all below
            # (it is OUR bug, and the fuzz suite asserts hostile bytes
            # never get that far)
            pass
        except Exception:
            log.exception("HTTP handler error")
        finally:
            try:
                await writer.drain()
            except (ConnectionError, asyncio.TimeoutError):
                pass
            writer.close()

    def _dashboard(self) -> bytes:
        """Zero-dependency status page: active streams with raw
        thumbnails + links to every per-stream surface. Auto-refreshes;
        browsers are the reference's first-class client (README.md)."""
        import html as _html

        names = self._router.active_streams()
        rows = []
        for n in names:
            q = urllib.parse.quote(n)
            e = _html.escape(n)
            rows.append(
                f'<div class="s"><h3>{e}</h3>'
                f'<a href="/face_stream?name={q}">'
                f'<img src="/snapshot?name={q}&raw=1&timeout=3" '
                f'alt="{e}" width="320"></a><p>'
                f'<a href="/stream?name={q}">raw</a> · '
                f'<a href="/face_stream?name={q}">annotated</a> · '
                f'<a href="/detections?name={q}">detections</a>'
                f'</p></div>')
        body = ("".join(rows)
                or "<p>No active streams. Point a sender at the "
                   "ingest socket.</p>")
        if self._warming is not None and self._warming():
            body = ("<p><b>Device warm-up in progress</b> — inference "
                    "starts when the programs finish compiling "
                    "(minutes on slow links).</p>") + body
        topo = ""
        if self._topology:
            topo = " · ".join(f"{k}: {v}" for k, v in
                              sorted(self._topology.items()))
        page = (
            "<!doctype html><html><head>"
            "<meta http-equiv='refresh' content='5'>"
            "<title>infercam_onnx_tpu</title><style>"
            "body{font-family:sans-serif;margin:2em}"
            ".s{display:inline-block;margin:1em;vertical-align:top}"
            "img{background:#eee;min-height:60px}"
            "</style></head><body>"
            f"<h1>infercam_onnx_tpu</h1><p>{topo}</p>"
            f"{body}"
            "<p><a href='/stats'>stats</a> · "
            "<a href='/metrics'>metrics</a> · "
            "<a href='/healthcheck'>healthcheck</a></p>"
            "</body></html>")
        return page.encode()

    async def _stream(self, reader: asyncio.StreamReader,
                      writer: asyncio.StreamWriter, sub, tick,
                      headers: bytes = _MJPEG_HEADERS) -> None:
        writer.write(headers)
        # watch the read side so a client disconnect ends the stream even
        # while no parts are flowing (prompt unsubscribe is what drives
        # the router's demand-driven inference shutdown)
        disconnect = asyncio.ensure_future(reader.read(1024))
        recv = None
        try:
            with sub:
                while True:
                    recv = asyncio.ensure_future(sub.receive())
                    done, _ = await asyncio.wait(
                        {recv, disconnect},
                        return_when=asyncio.FIRST_COMPLETED)
                    if disconnect in done:
                        # consume the result/exception: a reset
                        # connection completes this task with an error,
                        # and an unretrieved exception would be logged
                        # at GC for every abruptly-dropped viewer
                        disconnect.exception()
                        recv.cancel()
                        break
                    part = recv.result()
                    tick()
                    writer.write(part)
                    await writer.drain()
        except (ConnectionError, BrokenPipeError, asyncio.CancelledError):
            pass
        finally:
            for t in (disconnect, recv):
                if t is not None:
                    t.cancel()
                    if t.done() and not t.cancelled():
                        t.exception()  # retrieve, don't warn at GC
