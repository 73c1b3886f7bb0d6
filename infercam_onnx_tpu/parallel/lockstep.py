"""Lockstep dispatch: multi-host serving over one global mesh.

Under `jax.distributed` (one serve process per host of a pod slice)
every process must execute the SAME jitted programs in the SAME order —
independent micro-batchers on each host would deadlock the collective
runtime. This module adds the missing coordination tier, TPU-natively:

- a tiny TCP **coordinator** (process 0) runs dispatch rounds: each
  round it collects every host's proposal (the batch units its
  micro-batcher wants to run — possibly none), merges them into ONE
  agreed ordered list of (program, global batch) decisions, and
  broadcasts it;
- a **pump thread** in every process executes the decisions in order:
  hosts with frames for a unit contribute their rows, hosts without
  contribute padding, `jax.make_array_from_process_local_data`
  assembles the global batch, and each host reads back only its own
  detections via `addressable_shards` (per-host stream ownership —
  frames never cross DCN; only program dispatch is synchronized).

The reference has no multi-host tier at all (its fabric is one TCP
socket into one process, reference infer_server/src/data_socket.rs);
this is the BASELINE config-5 scale-out path beyond a single host.
Serving integration: ``serve --distributed ... --lockstep-address
host:port`` on every host (see serve.py). All three decode modes
(pixels, ycbcr, coefficients) dispatch through lockstep rounds.
Single-process meshes also work (n_processes=1 degenerates to a local
round-trip), which is how the unit tests drive the machinery on the
virtual CPU mesh.
"""

from __future__ import annotations

import json
import logging
import queue
import socket
import threading

import numpy as np

from infercam_onnx_tpu.parallel.data_parallel import ShardedDetector

log = logging.getLogger("infercam.lockstep")

_IO_TIMEOUT_S = 600.0  # must outlast the slowest member compile


class LockstepSessionEnded(RuntimeError):
    """The cluster-wide lockstep session has ended (a member left, or
    an agreed dispatch failed after peers ran the collective). There is
    no rejoin path — jax.distributed cannot re-admit a process — so the
    hosting process must exit and the cluster restart as a unit; the
    serving supervisor treats this as terminal instead of restarting
    the worker into a no-op loop."""


def _desc_key(desc: dict) -> str:
    return json.dumps(desc, sort_keys=True)


def merge_proposals(proposals: list[list[dict]], ladder: tuple[int, ...],
                    granularity: int) -> list[dict]:
    """One decision list from every host's proposals: the union of unit
    descriptors (keyed by kind/geometry/pack), each sized to the ladder
    bucket covering the LARGEST per-host row count — where a host's row
    count is the SUM over its duplicate-descriptor units, so one round
    serves every pending unit of a geometry instead of deferring
    duplicates a full round-trip — rounded up to the per-host device
    granularity. Deterministic order (sorted by key) so every process
    dispatches identically."""
    want: dict[str, dict] = {}
    for units in proposals:
        per_host: dict[str, int] = {}
        descs: dict[str, dict] = {}
        for unit in units:
            desc = dict(unit)
            n = desc.pop("n")
            key = _desc_key(desc)
            per_host[key] = per_host.get(key, 0) + n
            descs[key] = desc
        for key, n in per_host.items():
            cur = want.setdefault(key, {"desc": descs[key], "n": 0})
            cur["n"] = max(cur["n"], n)
    decisions = []
    for key in sorted(want):
        desc = dict(want[key]["desc"])
        n = want[key]["n"]
        bucket = next((b for b in ladder if b >= n), ladder[-1])
        bucket = ((bucket + granularity - 1) // granularity) * granularity
        desc["rows"] = bucket
        decisions.append(desc)
    return decisions


class _Lines:
    """Newline-delimited JSON over a socket."""

    def __init__(self, sock: socket.socket):
        self._sock = sock
        self._buf = b""
        sock.settimeout(_IO_TIMEOUT_S)

    def send(self, msg: dict) -> None:
        self._sock.sendall(json.dumps(msg).encode() + b"\n")

    def recv(self) -> dict:
        while b"\n" not in self._buf:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("lockstep peer closed")
            self._buf += chunk
        line, self._buf = self._buf.split(b"\n", 1)
        return json.loads(line)

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


class _Coordinator(threading.Thread):
    """Round broker on process 0: collect one proposal per member,
    broadcast the merged decision. Any member saying bye (or dying)
    ends the session for everyone."""

    def __init__(self, address: tuple[str, int], n_processes: int,
                 ladder: tuple[int, ...]):
        super().__init__(name="lockstep-coord", daemon=True)
        self._n = n_processes
        self._ladder = ladder
        self._listener = socket.create_server(
            address, reuse_port=False)
        self._listener.settimeout(_IO_TIMEOUT_S)

    def run(self) -> None:
        members: dict[int, _Lines] = {}
        granularity = None
        try:
            while len(members) < self._n:
                conn, _ = self._listener.accept()
                lines = _Lines(conn)
                hello = lines.recv()
                assert hello["t"] == "hello", hello
                if granularity is None:
                    granularity = hello["local_devices"]
                elif granularity != hello["local_devices"]:
                    raise ValueError(
                        "lockstep requires equal device counts per host:"
                        f" {granularity} != {hello['local_devices']}")
                members[hello["pid"]] = lines
            log.info("lockstep coordinator: %d member(s) joined",
                     self._n)
            while True:
                proposals = []
                for pid in sorted(members):
                    msg = members[pid].recv()
                    if msg["t"] == "bye":
                        raise ConnectionError(f"member {pid} left")
                    proposals.append(msg["units"])
                decision = merge_proposals(proposals, self._ladder,
                                           granularity)
                for lines in members.values():
                    lines.send({"t": "decision", "units": decision})
        except (ConnectionError, OSError, ValueError) as e:
            log.info("lockstep coordinator stopping: %s", e)
            for lines in members.values():
                try:
                    lines.send({"t": "bye"})
                except OSError:
                    pass
                lines.close()
        finally:
            self._listener.close()


class LockstepDetector(ShardedDetector):
    """ShardedDetector whose dispatches synchronize across processes.

    The serving worker calls ``run_device`` / ``run_device_ycbcr_packed``
    from its device thread exactly as on a single host; each call blocks
    until the cluster-wide round that includes it completes. Rounds with
    no local work still dispatch (padding shards) whenever any OTHER
    host has frames, so the collective program never deadlocks; fully
    idle rounds dispatch nothing.
    """

    def __init__(self, detector, mesh, address: str, *,
                 coordinator: bool, n_processes: int,
                 ladder: tuple[int, ...] = (1, 2, 4, 8, 16),
                 tick_ms: float = 20.0):
        super().__init__(detector, mesh)
        import jax

        host, _, port = address.rpartition(":")
        addr = (host or "127.0.0.1", int(port))
        self._local_devices = len(
            [d for d in mesh.devices.flat
             if d.process_index == jax.process_index()])
        # worker-side batches need only fill THIS host's shard
        self.batch_granularity = max(self._local_devices, 1)
        self._ladder = tuple(sorted(ladder))
        self._tick_s = tick_ms / 1e3
        self._requests: queue.Queue = queue.Queue()
        self._stopped = threading.Event()
        self._n_processes = n_processes

        if coordinator:
            self._coord = _Coordinator(addr, n_processes, self._ladder)
            self._coord.start()
        else:
            self._coord = None
        deadline = 30.0
        import time as _time

        t0 = _time.time()
        while True:
            try:
                self._conn = _Lines(socket.create_connection(addr, 5.0))
                break
            except OSError:
                if _time.time() - t0 > deadline:
                    raise
                _time.sleep(0.2)
        self._conn.send({"t": "hello", "pid": jax.process_index(),
                         "local_devices": self.batch_granularity})
        self._pump = threading.Thread(target=self._pump_loop,
                                      name="lockstep-pump", daemon=True)
        self._pump.start()

    # -- worker-facing API -------------------------------------------------

    def run_device(self, images, *, pack_output: bool = False):
        desc = {"kind": "pixels", "h": int(images.shape[1]),
                "w": int(images.shape[2]), "pack": pack_output}
        return self._submit(desc, int(images.shape[0]),
                            {"images": np.asarray(images)})

    def run_device_ycbcr_packed(self, packed, geom: dict, *,
                                pack_output: bool = False):
        jgeom = {k: (list(v) if isinstance(v, tuple) else v)
                 for k, v in geom.items()}
        desc = {"kind": "ycbcr", "geom": jgeom, "pack": pack_output}
        return self._submit(desc, int(packed.shape[0]),
                            {"packed": np.asarray(packed)})

    def run_device_ycbcr_annotated(self, packed, geom: dict, *,
                                   quality: int = 95,
                                   disp_dims: tuple | None = None):
        """Fused annotated path as a lockstep unit: every host runs the
        same sharded annotate+encode program in the agreed round;
        coefficient rows and detections read back per host."""
        jgeom = {k: (list(v) if isinstance(v, tuple) else v)
                 for k, v in geom.items()}
        desc = {"kind": "ycbcr_annot", "geom": jgeom,
                "quality": int(quality),
                "disp": list(disp_dims) if disp_dims else None}
        return self._submit(desc, int(packed.shape[0]),
                            {"packed": np.asarray(packed)})

    def run_device_annotated(self, images, *, quality: int = 95,
                             subsampling: str = "420",
                             disp_dims: tuple | None = None):
        """RGB-input fused annotated path as a lockstep unit."""
        desc = {"kind": "rgb_annot", "h": int(images.shape[1]),
                "w": int(images.shape[2]), "sub": subsampling,
                "quality": int(quality),
                "disp": list(disp_dims) if disp_dims else None}
        return self._submit(desc, int(images.shape[0]),
                            {"images": np.asarray(images)})

    def run_device_coefficients_annotated_packed(
            self, packed12, quant, *, wh: tuple, shapes: tuple,
            sampling: tuple = (2, 2), k: int = 768,
            disp_dims: tuple | None = None):
        """Splice-transcode annotated path as a lockstep unit."""
        quant = np.asarray(quant)
        desc = {"kind": "coef_splice", "w": int(wh[0]),
                "h": int(wh[1]), "sampling": list(sampling),
                "y_shape": [int(v) for v in shapes[0]],
                "c_shape": [int(v) for v in shapes[1]],
                "quant_dtype": str(quant.dtype),
                "k": int(k),
                "disp": list(disp_dims) if disp_dims else None}
        return self._submit(desc, int(packed12.shape[0]),
                            {"packed": np.asarray(packed12),
                             "quant": quant})

    def run_device_tiled(self, images, frame_size: tuple, *,
                         grid: tuple = (2, 2), overlap: float = 0.2):
        """High-res tiled detection as a lockstep unit: the agreed
        round runs the mesh-sharded tiled program (parallel/tiling.py)
        with batch-sharded outputs, each host reading back its own
        rows. Returns packed [n, D, 6]."""
        w, h = frame_size
        desc = {"kind": "tiled", "w": int(w), "h": int(h),
                "grid": list(grid), "overlap": float(overlap)}
        return self._submit(desc, int(images.shape[0]),
                            {"images": np.asarray(images)})

    def run_device_tiled_ycbcr(self, packed, geom: dict, *,
                               grid: tuple = (2, 2),
                               overlap: float = 0.2):
        """Packed-plane tiled detection as a lockstep unit."""
        jgeom = {k: (list(v) if isinstance(v, tuple) else v)
                 for k, v in geom.items()}
        desc = {"kind": "tiled_ycbcr", "geom": jgeom,
                "grid": list(grid), "overlap": float(overlap)}
        return self._submit(desc, int(packed.shape[0]),
                            {"packed": np.asarray(packed)})

    def _tiled_detector(self, frame_size: tuple, grid: tuple,
                        overlap: float):
        if not hasattr(self, "_tiled_cache"):
            self._tiled_cache = {}
        key = (tuple(frame_size), tuple(grid), overlap)
        tiled = self._tiled_cache.get(key)
        if tiled is None:
            from infercam_onnx_tpu.parallel.tiling import TiledDetector

            tiled = TiledDetector(self, frame_size, grid=tuple(grid),
                                  overlap=overlap, mesh=self.mesh,
                                  axis=self.axis,
                                  batch_sharded_out=True)
            self._tiled_cache[key] = tiled
        return tiled

    def run_device_coefficients_arrays(self, y, cb, cr, quant, wh, *,
                                       sampling=(2, 2),
                                       pack_output: bool = False):
        desc = {"kind": "coef", "w": int(wh[0]), "h": int(wh[1]),
                "sampling": list(sampling),
                "y_shape": [int(v) for v in y.shape[1:]],
                "c_shape": [int(v) for v in cb.shape[1:]],
                # dtypes must agree across hosts or padding hosts would
                # trace a DIFFERENT program for the same dispatch slot
                "dtypes": [str(np.asarray(y).dtype),
                           str(np.asarray(quant).dtype)],
                "pack": pack_output}
        return self._submit(desc, int(y.shape[0]),
                            {"y": np.asarray(y), "cb": np.asarray(cb),
                             "cr": np.asarray(cr),
                             "quant": np.asarray(quant)})

    @property
    def session_ended(self) -> bool:
        """True once the cluster session is over (a member left or an
        agreed dispatch failed); there is no rejoin path."""
        return self._stopped.is_set()

    def close(self) -> None:
        """Leave the session (ends it for the whole cluster)."""
        if not self._stopped.is_set():
            self._requests.put(None)
            self._pump.join(timeout=10.0)

    # -- pump ---------------------------------------------------------------

    def _submit(self, desc: dict, n: int, data: dict):
        if self._stopped.is_set():
            raise LockstepSessionEnded("lockstep session has ended")
        # merge_proposals clamps decisions to the ladder top and then
        # rounds UP to the per-host device granularity (the serving
        # worker's buckets round the same way), so the real dispatch
        # capacity is the granularity-rounded top. A single unit above
        # THAT could never dispatch whole — and the pump's first-match
        # slot would hand an oversized local share to the collective,
        # killing the session. Fail the one caller loudly instead.
        g = max(self._local_devices, 1)
        top = -(-self._ladder[-1] // g) * g
        if n > top:
            raise ValueError(
                f"batch of {n} rows exceeds the lockstep dispatch "
                f"capacity {top} (ladder top rounded to the {g}-device "
                f"granularity); split the submission or raise the "
                f"ladder")
        slot: queue.Queue = queue.Queue(1)
        self._requests.put((desc, n, data, slot))
        deadline = _IO_TIMEOUT_S
        while True:
            try:
                out = slot.get(timeout=1.0)
                break
            except queue.Empty:
                deadline -= 1.0
                if self._stopped.is_set():
                    # the pump may have died between our put and its
                    # shutdown drain — don't wait the full timeout
                    try:
                        out = slot.get_nowait()
                        break
                    except queue.Empty:
                        raise LockstepSessionEnded(
                            "lockstep session has ended") from None
                if deadline <= 0:
                    raise TimeoutError("lockstep round timed out")
        if isinstance(out, Exception):
            raise out
        return out

    def _pump_loop(self) -> None:
        pending: list = []
        try:
            while True:
                try:
                    item = self._requests.get(timeout=self._tick_s)
                    if item is None:
                        self._conn.send({"t": "bye"})
                        return
                    pending.append(item)
                except queue.Empty:
                    pass
                while True:  # drain whatever else is already queued
                    try:
                        item = self._requests.get_nowait()
                        if item is None:
                            self._conn.send({"t": "bye"})
                            return
                        pending.append(item)
                    except queue.Empty:
                        break
                units = [dict(desc, n=n) for desc, n, _, _ in pending]
                self._conn.send({"t": "propose", "units": units})
                msg = self._conn.recv()
                if msg["t"] == "bye":
                    raise ConnectionError("coordinator ended session")
                for decision in msg["units"]:
                    rows = decision.pop("rows")
                    key = _desc_key(decision)
                    # every pending unit of this geometry rides this
                    # dispatch (the coordinator sized it for the host's
                    # SUM), up to the decided capacity — any overflow
                    # stays pending for the next round
                    matches, total = [], 0
                    for p in list(pending):
                        if _desc_key(p[0]) != key:
                            continue
                        if matches and total + p[1] > rows:
                            break
                        matches.append(p)
                        total += p[1]
                        pending.remove(p)
                    try:
                        outs = self._execute(decision, rows, matches)
                        for p, out in zip(matches, outs):
                            p[3].put(out)
                    except Exception as e:
                        # peers executed (or are blocked inside) the
                        # agreed collective program for this slot; after
                        # such divergence the cluster would hang until
                        # the socket timeout — end the session promptly
                        # instead (ADVICE r2)
                        for p in matches:
                            p[3].put(e)
                        log.error("lockstep execute failed; ending "
                                  "session: %s", e)
                        try:
                            self._conn.send({"t": "bye"})
                        except OSError:
                            pass
                        return
        except (ConnectionError, OSError) as e:
            log.info("lockstep pump stopping: %s", e)
        finally:
            self._stopped.set()
            self._conn.close()
            err = LockstepSessionEnded("lockstep session has ended")
            for p in pending:
                p[3].put(err)
            while True:
                try:
                    item = self._requests.get_nowait()
                except queue.Empty:
                    break
                if item is not None:
                    item[3].put(err)

    # -- collective execution ----------------------------------------------

    def _global(self, local: np.ndarray, rows: int) -> object:
        """Per-host rows -> global batch array sharded over the mesh."""
        import jax

        n_local = local.shape[0]
        if n_local < rows:
            pad = np.zeros((rows - n_local,) + local.shape[1:],
                           local.dtype)
            local = np.concatenate([local, pad])
        global_shape = (rows * self._n_processes,) + local.shape[1:]
        return jax.make_array_from_process_local_data(
            self._batch_sharding, local, global_shape)

    def _readback(self, out, counts_per_unit: list[int], pack: bool):
        """Split this host's rows back into one result per served unit."""
        def host_rows(arr):
            shards = sorted(arr.addressable_shards,
                            key=lambda s: s.index[0].start or 0)
            return np.concatenate([np.asarray(s.data) for s in shards])

        def split(arr):
            outs, at = [], 0
            for n in counts_per_unit:
                outs.append(arr[at:at + n])
                at += n
            return outs

        if pack == "multi":
            # per-unit TUPLES across several batch-sharded arrays
            # (annotated units: coefficients + detections)
            return list(zip(*(split(host_rows(a)) for a in out)))
        if pack:
            return split(host_rows(out))
        boxes, confs, counts = out
        return list(zip(split(host_rows(boxes)), split(host_rows(confs)),
                        split(host_rows(counts))))

    def _execute(self, desc: dict, rows: int, matches: list):
        """Run one agreed collective dispatch, feeding the concatenated
        rows of every locally matched unit (possibly none — padding-only
        participation); returns one result per match, in order."""
        counts = [m[1] for m in matches]
        datas = [m[2] for m in matches]

        def local_concat(field, empty_shape, empty_dtype):
            if not datas:
                return np.zeros((0,) + empty_shape, empty_dtype)
            return np.concatenate([d[field] for d in datas])

        self.dispatches += 1
        if desc["kind"] == "coef_splice":
            w, h = desc["w"], desc["h"]
            y_bh, y_bw = desc["y_shape"]
            c_bh, c_bw = desc["c_shape"]
            n_coef = (y_bh * y_bw + 2 * c_bh * c_bw) * 64
            local = local_concat("packed", (n_coef * 3 // 2,), np.uint8)
            quant_dt = np.dtype(desc["quant_dtype"])
            localq = local_concat("quant", (3, 64), quant_dt)
            # padding hosts contribute unit quant tables (finite
            # dequant/requant for their zero rows)
            if localq.shape[0] < rows:
                localq = np.concatenate(
                    [localq, np.ones((rows - localq.shape[0], 3, 64),
                                     quant_dt)])
            garr = self._global(local, rows)
            gquant = self._global(localq, rows)
            r_h, r_w = self.preprocessor.matrices(w, h)
            disp = tuple(desc["disp"]) if desc["disp"] else None
            prog = self._splice_program(
                w, h, y_bw, y_bh, c_bw, c_bh,
                tuple(desc["sampling"]), desc["k"], disp)
            out = prog(self._params, self._priors, garr, gquant,
                       r_h, r_w)
            return self._readback(out, counts, "multi")
        if desc["kind"] == "tiled":
            h, w = desc["h"], desc["w"]
            local = local_concat("images", (h, w, 3), np.uint8)
            garr = self._global(local, rows)
            tiled = self._tiled_detector((w, h), desc["grid"],
                                         desc["overlap"])
            out = tiled.run_device(garr, pack_output=True)
            return self._readback(out, counts, True)
        if desc["kind"] == "tiled_ycbcr":
            geom = {k: (tuple(v) if isinstance(v, list) else v)
                    for k, v in desc["geom"].items()}
            plane_len = (geom["y_pw"] * geom["y_ph"]
                         + 2 * geom["c_pw"] * geom["c_ph"])
            local = local_concat("packed", (plane_len,), np.uint8)
            garr = self._global(local, rows)
            tiled = self._tiled_detector(
                (geom["width"], geom["height"]), desc["grid"],
                desc["overlap"])
            out = tiled.run_device_ycbcr_packed(garr, geom,
                                                pack_output=True)
            return self._readback(out, counts, True)
        if desc["kind"] == "ycbcr_annot":
            geom = {k: (tuple(v) if isinstance(v, list) else v)
                    for k, v in desc["geom"].items()}
            plane_len = (geom["y_pw"] * geom["y_ph"]
                         + 2 * geom["c_pw"] * geom["c_ph"])
            local = local_concat("packed", (plane_len,), np.uint8)
            garr = self._global(local, rows)
            r_h, r_w = self.preprocessor.matrices(geom["width"],
                                                  geom["height"])
            disp = tuple(desc["disp"]) if desc["disp"] else None
            prog = self._annot_ycbcr_program(geom, disp)
            out = prog(self._params, self._priors, garr, r_h, r_w,
                       self._encode_quant(desc["quality"]))
            return self._readback(out, counts, "multi")
        if desc["kind"] == "rgb_annot":
            h, w = desc["h"], desc["w"]
            local = local_concat("images", (h, w, 3), np.uint8)
            garr = self._global(local, rows)
            r_h, r_w = self.preprocessor.matrices(w, h)
            disp = tuple(desc["disp"]) if desc["disp"] else None
            from infercam_onnx_tpu.ops.jpeg_encode_device import (
                SUBSAMPLING_FACTORS)

            sampling = SUBSAMPLING_FACTORS[desc["sub"]]
            prog = self._annot_rgb_program(h, w, sampling, disp)
            out = prog(self._params, self._priors, garr, r_h, r_w,
                       self._encode_quant(desc["quality"]))
            return self._readback(out, counts, "multi")
        pack = desc["pack"]
        if desc["kind"] == "pixels":
            h, w = desc["h"], desc["w"]
            local = local_concat("images", (h, w, 3), np.uint8)
            garr = self._global(local, rows)
            r_h, r_w = self.preprocessor.matrices(w, h)
            prog = self._packed if pack else self._tuple
            out = prog(self._params, self._priors, garr, r_h, r_w)
            return self._readback(out, counts, pack)
        if desc["kind"] == "ycbcr":
            geom = {k: (tuple(v) if isinstance(v, list) else v)
                    for k, v in desc["geom"].items()}
            plane_len = (geom["y_pw"] * geom["y_ph"]
                         + 2 * geom["c_pw"] * geom["c_ph"])
            local = local_concat("packed", (plane_len,), np.uint8)
            garr = self._global(local, rows)
            r_h, r_w = self.preprocessor.matrices(geom["width"],
                                                  geom["height"])
            prog = self._ycbcr_program(geom, pack)
            out = prog(self._params, self._priors, garr, r_h, r_w)
            return self._readback(out, counts, pack)
        if desc["kind"] == "coef":
            w, h = desc["w"], desc["h"]
            y_shape = tuple(desc["y_shape"])
            c_shape = tuple(desc["c_shape"])
            coef_dt, quant_dt = (np.dtype(d) for d in desc["dtypes"])
            y = local_concat("y", y_shape, coef_dt)
            cb = local_concat("cb", c_shape, coef_dt)
            cr = local_concat("cr", c_shape, coef_dt)
            quant = local_concat("quant", (3, 64), quant_dt)
            args = tuple(self._global(a, rows)
                         for a in (y, cb, cr, quant))
            r_h, r_w = self.preprocessor.matrices(w, h)
            prog = self._coef_program(
                w, h, tuple(desc["sampling"]), pack)
            out = prog(self._params, self._priors, *args, r_h, r_w)
            return self._readback(out, counts, pack)
        raise ValueError(f"unknown lockstep unit kind {desc['kind']!r}")
