"""Server application wiring (reference infer_server/src/bin/infer_server.rs).

Builds the full serving stack: ingest queue, data socket, router,
micro-batched inference worker, HTTP endpoints, meter logger — as asyncio
tasks in one process.
"""

from __future__ import annotations

import asyncio
import dataclasses
import logging

from infercam_onnx_tpu.config import (
    DetectorConfig,
    EngineConfig,
    ServerConfig,
)
from infercam_onnx_tpu.detector import Detector
from infercam_onnx_tpu.serving.data_socket import DataSocket, spawn_data_socket
from infercam_onnx_tpu.serving.http import HttpServer
from infercam_onnx_tpu.serving.inferer import InferenceWorker
from infercam_onnx_tpu.serving.meter import meter_logger
from infercam_onnx_tpu.serving.router import FrameRouter

log = logging.getLogger("infercam.app")


@dataclasses.dataclass
class InferServer:
    """Running server handle (owned tasks + listeners)."""

    router: FrameRouter
    worker: InferenceWorker
    http: HttpServer
    ingest_queue: asyncio.Queue
    tasks: list[asyncio.Task]
    data_server: "DataSocket"

    async def close(self) -> None:
        # closes the listener AND established sender connections, so
        # clients observe the shutdown and enter their reconnect loop
        # (reference socket_sender.rs:53-59)
        self.data_server.close()
        await self.http.close()
        for t in self.tasks:
            t.cancel()
        await asyncio.gather(*self.tasks, return_exceptions=True)
        # lockstep detectors hold a cluster session: leave it so the
        # other hosts' pumps unblock (ends the session cluster-wide)
        close_det = getattr(self.worker._detector, "close", None)
        if close_det is not None:
            await asyncio.get_running_loop().run_in_executor(
                None, close_det)
        try:
            await asyncio.wait_for(self.data_server.wait_closed(), 5.0)
        except asyncio.TimeoutError:
            pass


def _split_addr(addr: str) -> tuple[str, int]:
    host, _, port = addr.rpartition(":")
    return host or "127.0.0.1", int(port)


async def start_server(
    server_config: ServerConfig = ServerConfig(),
    detector_config: DetectorConfig = DetectorConfig(),
    engine_config: EngineConfig = EngineConfig(),
    detector: Detector | None = None,
    warmup_resolutions: list[tuple[int, int]] | None = None,
    data_parallel: str = "auto",
    mesh=None,
    warmup_async: bool = False,
    lockstep_address: str | None = None,
) -> InferServer:
    """``data_parallel``: "auto" shards batches across all visible
    devices when more than one is present, "on" requires a multi-device
    mesh, "off" always serves single-device (BASELINE config 5 wiring).
    An explicit ``mesh`` overrides the policy.

    ``warmup_async``: open the listeners IMMEDIATELY and run the
    device warm-up (transfer-latch trip + program compiles) on the
    worker's device thread instead of blocking startup — minimizes dark
    time on restarts/recycles (raw streams flow at once; inference
    starts when warm)."""
    if detector is None:
        detector = Detector(detector_config)

    if mesh is None and data_parallel != "off":
        import jax as _jax

        n = len(_jax.devices())
        if n > 1:
            from infercam_onnx_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(n)
            log.info("data-parallel serving over %d devices (%s)",
                     n, _jax.devices()[0].platform)
        elif data_parallel == "on":
            raise ValueError(
                "--data-parallel on requires >1 device, have 1")

    if (mesh is not None and not lockstep_address
            and getattr(detector, "mesh", None) is None
            and hasattr(detector, "to_mesh")):
        # graph-runtime detectors re-bind their own sharded programs
        detector = detector.to_mesh(mesh)

    if lockstep_address:
        # multi-host: one serve process per host over ONE global mesh
        # requires lockstep program dispatch (see parallel/lockstep.py)
        if mesh is None:
            raise ValueError("--lockstep-address requires a mesh "
                             "(--data-parallel must not be off)")
        import jax as _jax

        from infercam_onnx_tpu.parallel.lockstep import LockstepDetector

        detector = LockstepDetector(
            detector, mesh, lockstep_address,
            coordinator=_jax.process_index() == 0,
            n_processes=_jax.process_count(),
            ladder=engine_config.batch_buckets)
        log.info("lockstep dispatch joined: process %d/%d",
                 _jax.process_index(), _jax.process_count())

        async def lockstep_watch(lock=detector):
            # a dead session is terminal for the PROCESS (no rejoin
            # path), but demand-driven serving may never dispatch again
            # to notice — poll the session and raise so serve_forever
            # exits non-zero and supervisors restart the cluster
            from infercam_onnx_tpu.parallel.lockstep import (
                LockstepSessionEnded)

            while not lock.session_ended:
                await asyncio.sleep(0.5)
            raise LockstepSessionEnded(
                "lockstep session has ended (peer left or dispatch "
                "diverged); restart the cluster as a unit")

    def warm():
        # Trip the tunnel's transfer-mode latch on a 4-byte read FIRST:
        # the first device->host read after healthy-mode traffic can
        # stall for minutes on tunneled rigs, and serving reads
        # detections back every batch — take the hit during warm-up,
        # not on the first live frame (.claude/skills/verify/SKILL.md).
        import jax
        import numpy as _np

        try:
            _np.asarray(jax.numpy.zeros((1,), jax.numpy.float32))
            if engine_config.link_adaptive:
                # probe the H2D link and pick the effective transfer
                # path BEFORE compiling programs, so warm-up compiles
                # the path that will actually serve (serving/link.py)
                status = worker.probe_and_adapt()
                log.info("link probe: %.0f MB/s -> decode mode %s (%s)",
                         status["h2d_mbps"], status["decode_mode"],
                         status["why"])
            if warmup_resolutions:
                log.info("warming up device programs for %s",
                         warmup_resolutions)
                worker.warmup(warmup_resolutions)
                log.info("device warm-up complete")
        finally:
            worker.warming = False

    worker = InferenceWorker(detector, engine_config, server_config,
                             mesh=mesh)
    router = FrameRouter(worker.submit, server_config)
    queue: asyncio.Queue = asyncio.Queue(
        maxsize=server_config.ingest_capacity)

    # /stats reports "warming": true until the device programs exist —
    # on slow links warm-up can take minutes, and a server that drops
    # every frame while warming is otherwise indistinguishable from a
    # broken one
    worker.warming = True
    if warmup_async:
        # the worker's device executor is single-threaded, so the warm-up
        # strictly precedes any live batch's dispatch
        fut = worker._device_exec.submit(warm)

        def _warm_done(f):
            # concurrent.futures never reports unretrieved exceptions —
            # a failed warm-up (flaky tunnel, bad resolution) must not
            # leave the server silently claiming to be warm
            if f.exception() is not None:
                log.error("async device warm-up FAILED: %r",
                          f.exception())

        fut.add_done_callback(_warm_done)
    else:
        warm()

    host, port = _split_addr(server_config.socket_address)
    data_server = await spawn_data_socket(queue, host, port)

    import jax as _jax

    topology = {
        "devices": int(mesh.size) if mesh is not None else 1,
        "platform": _jax.devices()[0].platform,
        "processes": _jax.process_count(),
        "lockstep": bool(lockstep_address),
        "detector": type(worker._detector).__name__,
    }
    http = HttpServer(router, topology=topology,
                      warming=lambda: getattr(worker, "warming", False),
                      link=lambda: getattr(worker, "link_status", None))
    hhost, hport = _split_addr(server_config.http_address)
    await http.start(hhost, hport)

    async def supervised(name: str, factory, *, backoff_s: float = 1.0):
        """Restart a crashed core task with backoff — hardening over the
        reference, whose inference task dies silently on a panic and
        /face_stream just stops (reference inferer.rs:35-40, SURVEY.md
        section 5 'failure detection')."""
        while True:
            try:
                await factory()
                return  # clean exit
            except asyncio.CancelledError:
                raise
            except Exception as e:
                from infercam_onnx_tpu.parallel.lockstep import (
                    LockstepSessionEnded)

                if isinstance(e, LockstepSessionEnded):
                    # terminal: the cluster session cannot be rejoined;
                    # restarting the worker would spin forever serving
                    # nothing — surface the failure so the process
                    # exits non-zero and supervisors restart the
                    # cluster as a unit
                    log.error("%s: lockstep session ended — terminal, "
                              "stopping the server", name)
                    raise
                log.exception("%s task crashed; restarting in %.1fs",
                              name, backoff_s)
                await asyncio.sleep(backoff_s)

    tasks = [
        asyncio.create_task(
            supervised("router", lambda: router.run(queue)),
            name="router"),
        asyncio.create_task(
            supervised("inferer", worker.run), name="inferer"),
        asyncio.create_task(
            supervised("meter", lambda: meter_logger(
                server_config.meter_period_s)), name="meter"),
    ]
    if lockstep_address:
        tasks.append(asyncio.create_task(lockstep_watch(),
                                         name="lockstep-watch"))
    if engine_config.link_adaptive and engine_config.link_probe_period_s:
        async def link_reprobe():
            # periodic re-probe on the device executor (between
            # dispatches); a recovered link restores the configured
            # transfer path, a degraded one re-routes it
            loop = asyncio.get_running_loop()
            while True:
                await asyncio.sleep(engine_config.link_probe_period_s)
                await loop.run_in_executor(
                    worker._device_exec, worker.probe_and_adapt)

        tasks.append(asyncio.create_task(
            supervised("link-reprobe", link_reprobe),
            name="link-reprobe"))
    if server_config.max_rss_mb:
        # breach action depends on the dispatch tier: a lockstep member
        # cannot re-exec in place (jax.distributed cannot re-admit a
        # restarted process mid-incarnation) — it exits with a distinct
        # code so the cluster supervisor (tools/cluster_launch.py)
        # re-forms the WHOLE cluster; a standalone server re-execs
        # itself and clients ride their reconnect loop
        is_lockstep = bool(lockstep_address) or hasattr(
            worker._detector, "session_ended")
        tasks.append(asyncio.create_task(
            rss_watchdog(server_config.max_rss_mb,
                         server_config.rss_check_period_s,
                         on_breach=(_exit_for_supervisor if is_lockstep
                                    else _reexec)),
            name="rss-watchdog"))
    return InferServer(router=router, worker=worker, http=http,
                       ingest_queue=queue, tasks=tasks,
                       data_server=data_server)


def _read_rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def _reexec() -> None:
    """Replace this process with a fresh copy of itself. All fds close
    on exec (PEP 446 close-on-exec), so listeners free their ports and
    clients enter their reconnect loops."""
    import os
    import sys

    # sys.orig_argv is the EXACT interpreter command line (including
    # "-m module"), unlike sys.argv which loses the -m context. argv[0]
    # may be a bare "python" from PATH; execv needs an absolute path, so
    # substitute the running interpreter's.
    argv = [sys.executable] + list(sys.orig_argv[1:])
    log.warning("re-executing: %s", argv)
    os.execv(argv[0], argv)


# distinct from ordinary failures so supervisors/operators can tell an
# intentional RSS recycle from a crash in logs and state files
RSS_RECYCLE_EXIT_CODE = 17


def _exit_for_supervisor() -> None:
    """Lockstep-mode RSS-breach action: exit promptly with a distinct
    code. Survivors observe the death (parallel/lockstep.py
    LockstepSessionEnded) and exit too; the cluster supervisor
    (tools/cluster_launch.py) re-forms the whole cluster as a fresh
    incarnation and edge senders ride their reconnect-forever loop
    (reference cam_sender/src/bin/socket_sender.rs:53-59). os._exit is
    deliberate: the leaking runtime dependency this guard mitigates can
    SIGABRT during interpreter teardown, masking the intended code."""
    import os

    log.warning("exiting for cluster supervisor re-formation "
                "(exit code %d)", RSS_RECYCLE_EXIT_CODE)
    os._exit(RSS_RECYCLE_EXIT_CODE)


async def rss_watchdog(max_rss_mb: int, period_s: float = 10.0,
                       *, read_rss=_read_rss_mb,
                       on_breach=_reexec) -> None:
    """Self-recycling guard for leaky runtime dependencies (e.g. a TPU
    tunnel client that leaks host->device staging buffers): when the
    process RSS crosses the cap, re-exec for a fresh process. The edge
    protocol's reconnect contract makes this look like a short restart
    to clients; the persistent XLA compilation cache makes the re-warm
    cheap."""
    while True:
        await asyncio.sleep(period_s)
        rss = read_rss()
        if rss > max_rss_mb:
            log.warning("RSS %.0f MiB exceeds cap %d MiB; recycling "
                        "server process", rss, max_rss_mb)
            on_breach()
            return


async def serve_forever(**kwargs) -> None:
    server = await start_server(**kwargs)
    # graceful shutdown on SIGTERM (production deployments send TERM;
    # SIGINT is handled as KeyboardInterrupt by the CLI). Closing the
    # data socket drops established sender connections so clients enter
    # their reconnect loop, mirroring a restart.
    import signal

    loop = asyncio.get_running_loop()
    stop = asyncio.Event()
    try:
        loop.add_signal_handler(signal.SIGTERM, stop.set)
    except (NotImplementedError, RuntimeError):  # non-unix / nested loop
        pass
    try:
        waiter = asyncio.create_task(stop.wait())
        done, _ = await asyncio.wait(
            {waiter, *server.tasks},
            return_when=asyncio.FIRST_COMPLETED)
        if waiter in done:
            log.info("SIGTERM received; shutting down")
        waiter.cancel()
        for t in done - {waiter}:
            if not t.cancelled() and t.exception() is not None:
                # a core task died terminally (supervised() re-raised):
                # propagate so the CLI exits non-zero instead of
                # reporting a clean shutdown
                raise t.exception()
    finally:
        await server.close()
