"""Data-parallel detection: batch (streams) sharded across the mesh.

The idiomatic TPU replacement for "more inference workers": one jitted
program whose batch dimension is sharded over the mesh's data axis via
`NamedSharding`. XLA partitions the conv trunk per-chip (the model
replicates; activations shard on batch) and the only communication is the
host-side scatter/gather of inputs/outputs — there is no cross-chip
dependence in per-image detection, so serving scales linearly over ICI-
connected chips (BASELINE.json config 5: 64 streams on v5e-4).

Two entry points:

- ``shard_detect(detector, mesh)``: the raw sharded program (batch must
  divide the mesh), used by tests and the driver dryrun.
- ``ShardedDetector(detector, mesh)``: a drop-in ``Detector`` replacement
  for the serving tier — same ``run_device`` /
  ``run_device_coefficients_arrays`` / ``warmup`` / ``detect_batch`` API,
  padding any batch up to a mesh multiple and slicing the results back,
  so the micro-batcher (serving/inferer.py) shards transparently.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from infercam_onnx_tpu.detector import (
    Detector,
    detect_annotate_from_ycbcr_impl,
    detect_annotate_impl,
    detect_annotate_splice_impl,
    detect_from_coefficients_impl,
    detect_from_ycbcr_impl,
    detect_program_impl,
)


def shard_detect(detector: Detector, mesh: Mesh, *, axis: str = "data"):
    """Returns ``run(images[B, H, W, 3]) -> (boxes, confs, counts)`` with
    B sharded over ``mesh[axis]`` (B must be divisible by the axis size).
    """
    n = mesh.shape[axis]
    sharded = ShardedDetector(detector, mesh, axis=axis)

    def run(images):
        b = images.shape[0]
        if b % n:
            raise ValueError(f"batch {b} not divisible by mesh size {n}")
        return sharded.run_device(images)

    return run


class ShardedDetector(Detector):
    """A Detector whose device programs shard the batch over a mesh.

    Constructed FROM a single-device Detector (weights load once); jit
    signatures carry explicit in/out shardings so XLA scatters inputs,
    replicates params, and runs per-chip conv trunks with no collectives
    in the hot loop. Batches that don't divide the mesh are zero-padded
    up (powers-of-two buckets pad to the mesh size at worst) and outputs
    sliced back, keeping the serving worker oblivious.

    Scope: single-process meshes (one host's chips over ICI). On a
    multi-PROCESS mesh the convenience slicing here would try to read
    non-addressable shards — multi-host callers consume
    ``out.addressable_shards`` per host instead (see
    parallel/multihost.py and tests/multihost_worker.py).
    """

    # pylint: disable=super-init-not-called  (adopts an existing
    # Detector's loaded state instead of re-loading weights)
    def __init__(self, detector: Detector, mesh: Mesh,
                 *, axis: str = "data"):
        self.config = detector.config
        self.model = detector.model
        self.preprocessor = detector.preprocessor
        self._compute_dtype = detector._compute_dtype
        self.mesh = mesh
        self.axis = axis
        self.n = mesh.shape[axis]
        # how many rows the serving worker must pad local batches to
        # (lockstep subclasses shrink this to the per-host device count)
        self.batch_granularity = self.n
        self.dispatches = 0  # sharded-program dispatch counter (tests)

        batch = NamedSharding(mesh, P(axis))
        repl = NamedSharding(mesh, P())
        c = detector.config
        static = dict(
            compute_dtype=detector._compute_dtype,
            min_confidence=c.min_confidence, max_iou=c.max_iou,
            top_k=c.top_k, max_detections=c.max_detections)

        self._packed = jax.jit(
            functools.partial(detect_program_impl, pack_output=True,
                              **static),
            in_shardings=(repl, repl, batch, repl, repl),
            out_shardings=batch)
        self._tuple = jax.jit(
            functools.partial(detect_program_impl, pack_output=False,
                              **static),
            in_shardings=(repl, repl, batch, repl, repl),
            out_shardings=(batch, batch, batch))
        # pjit rejects kwargs when in_shardings is given, so the static
        # geometry (width/height/sampling) is baked per-shape into a
        # cached closure instead of passed as static kwargs
        self._static = static
        self._batch_sharding = batch
        self._repl_sharding = repl
        self._coef_programs: dict[tuple, object] = {}

        self._params = jax.device_put(detector.model.params, repl)
        self._priors = jax.device_put(detector.model.priors, repl)

    def _ycbcr_program(self, geom: dict, pack: bool):
        key = ("ycbcr", tuple(sorted(
            (k, tuple(v) if isinstance(v, (tuple, list)) else v)
            for k, v in geom.items())), pack)
        prog = self._coef_programs.get(key)
        if prog is None:
            batch, repl = self._batch_sharding, self._repl_sharding
            fn = functools.partial(
                detect_from_ycbcr_impl,
                width=geom["width"], height=geom["height"],
                y_pw=geom["y_pw"], y_ph=geom["y_ph"],
                c_pw=geom["c_pw"], c_ph=geom["c_ph"],
                sampling=tuple(geom["sampling"]), pack_output=pack,
                **self._static)
            prog = jax.jit(
                fn,
                in_shardings=(repl, repl, batch, repl, repl),
                out_shardings=(batch if pack
                               else (batch, batch, batch)))
            self._coef_programs[key] = prog
        return prog

    def run_device_ycbcr_packed(self, packed, geom: dict, *,
                                pack_output: bool = False):
        b = packed.shape[0]
        r_h, r_w = self.preprocessor.matrices(geom["width"],
                                              geom["height"])
        prog = self._ycbcr_program(geom, pack_output)
        self.dispatches += 1
        args = (self._params, self._priors,
                jnp.asarray(self._pad(packed, b)), r_h, r_w)
        if pack_output:
            return prog(*args)[:b]
        boxes, confs, counts = prog(*args)
        return boxes[:b], confs[:b], counts[:b]

    def _coef_program(self, w: int, h: int, sampling: tuple,
                      pack: bool):
        key = (w, h, sampling, pack)
        prog = self._coef_programs.get(key)
        if prog is None:
            batch, repl = self._batch_sharding, self._repl_sharding
            fn = functools.partial(
                detect_from_coefficients_impl,
                width=w, height=h, sampling=sampling,
                pack_output=pack,
                **self._static)
            prog = jax.jit(
                fn,
                in_shardings=(repl, repl, batch, batch, batch, batch,
                              repl, repl),
                out_shardings=(batch if pack
                               else (batch, batch, batch)))
            self._coef_programs[key] = prog
        return prog

    def _annot_ycbcr_program(self, geom: dict, disp: tuple | None):
        key = ("annot_ycbcr", tuple(sorted(
            (k, tuple(v) if isinstance(v, (tuple, list)) else v)
            for k, v in geom.items())), disp)
        prog = self._coef_programs.get(key)
        if prog is None:
            batch, repl = self._batch_sharding, self._repl_sharding
            fn = functools.partial(
                detect_annotate_from_ycbcr_impl,
                width=geom["width"], height=geom["height"],
                y_pw=geom["y_pw"], y_ph=geom["y_ph"],
                c_pw=geom["c_pw"], c_ph=geom["c_ph"],
                sampling=tuple(geom["sampling"]), disp_dims=disp,
                **self._static)
            prog = jax.jit(
                fn,
                in_shardings=(repl, repl, batch, repl, repl, repl),
                out_shardings=(batch, batch))
            self._coef_programs[key] = prog
        return prog

    def _annot_rgb_program(self, h: int, w: int, sampling: tuple,
                           disp: tuple | None):
        key = ("annot_rgb", (h, w), sampling, disp)
        prog = self._coef_programs.get(key)
        if prog is None:
            batch, repl = self._batch_sharding, self._repl_sharding
            fn = functools.partial(
                detect_annotate_impl, out_sampling=sampling,
                disp_dims=disp, **self._static)
            prog = jax.jit(
                fn,
                in_shardings=(repl, repl, batch, repl, repl, repl),
                out_shardings=(batch, batch))
            self._coef_programs[key] = prog
        return prog

    def run_device_ycbcr_annotated(self, packed, geom: dict, *,
                                   quality: int = 95,
                                   disp_dims: tuple | None = None):
        """Sharded variant of the fused annotated pipeline
        (detector.detect_annotate_from_ycbcr_impl): batch shards over
        the mesh, coefficients and detections come back batch-sharded.
        """
        disp = tuple(disp_dims) if disp_dims else None
        prog = self._annot_ycbcr_program(geom, disp)
        b = packed.shape[0]
        r_h, r_w = self.preprocessor.matrices(geom["width"],
                                              geom["height"])
        self.dispatches += 1
        coefs, det = prog(self._params, self._priors,
                          jnp.asarray(self._pad(packed, b)), r_h, r_w,
                          self._encode_quant(quality))
        return coefs[:b], det[:b]

    def run_device_annotated(self, images, *, quality: int = 95,
                             subsampling: str = "420",
                             disp_dims: tuple | None = None):
        """Sharded RGB-input fused annotated pipeline."""
        from infercam_onnx_tpu.ops.jpeg_encode_device import (
            SUBSAMPLING_FACTORS)

        sampling = SUBSAMPLING_FACTORS[subsampling]
        _, h, w, _ = images.shape
        disp = tuple(disp_dims) if disp_dims else None
        prog = self._annot_rgb_program(h, w, sampling, disp)
        b = images.shape[0]
        r_h, r_w = self.preprocessor.matrices(w, h)
        self.dispatches += 1
        coefs, det = prog(self._params, self._priors,
                          jnp.asarray(self._pad(images, b)), r_h, r_w,
                          self._encode_quant(quality))
        return coefs[:b], det[:b]

    def _splice_program(self, w: int, h: int, y_bw: int, y_bh: int,
                        c_bw: int, c_bh: int, sampling: tuple, k: int,
                        disp: tuple | None):
        key = ("annot_splice", (w, h, y_bw, y_bh, c_bw, c_bh),
               sampling, k, disp)
        prog = self._coef_programs.get(key)
        if prog is None:
            batch, repl = self._batch_sharding, self._repl_sharding
            fn = functools.partial(
                detect_annotate_splice_impl,
                width=w, height=h, y_bw=y_bw, y_bh=y_bh, c_bw=c_bw,
                c_bh=c_bh, sampling=sampling, k=k, disp_dims=disp,
                **self._static)
            prog = jax.jit(
                fn,
                in_shardings=(repl, repl, batch, batch, repl, repl),
                out_shardings=(batch, batch, batch))
            self._coef_programs[key] = prog
        return prog

    def run_device_coefficients_annotated_packed(
            self, packed12, quant, *, wh: tuple[int, int],
            shapes: tuple, sampling: tuple[int, int] = (2, 2),
            k: int = 768, disp_dims: tuple | None = None):
        """Sharded splice-transcode annotated path (see
        Detector.run_device_coefficients_annotated_packed): the packed
        coefficient batch and per-frame quant tables shard over the
        mesh; touched blocks, meta and detections come back
        batch-sharded."""
        (y_bh, y_bw), (c_bh, c_bw) = shapes
        b = packed12.shape[0]
        packed = self._pad(packed12, b)
        # quant pads with ONES so padded rows stay finite through the
        # dequant/requant round trip
        pad = (-b) % self.n
        quant = np.asarray(quant)
        if pad:
            quant = np.concatenate(
                [quant, np.ones((pad,) + quant.shape[1:],
                                quant.dtype)])
        w, h = wh
        r_h, r_w = self.preprocessor.matrices(w, h)
        disp = tuple(disp_dims) if disp_dims else None
        prog = self._splice_program(w, h, y_bw, y_bh, c_bw, c_bh,
                                    tuple(sampling), k, disp)
        self.dispatches += 1
        blocks, meta, det = prog(self._params, self._priors,
                                 jnp.asarray(packed),
                                 jnp.asarray(quant), r_h, r_w)
        return blocks[:b], meta[:b], det[:b]

    def _pad(self, arr, b: int):
        pad = (-b) % self.n
        if pad == 0:
            return arr  # no copy (and no device->host for jax arrays)
        widths = [(0, pad)] + [(0, 0)] * (np.ndim(arr) - 1)
        if isinstance(arr, jax.Array):
            # keep device-resident batches on device: np.asarray here
            # would be a synchronous D2H of the whole frame batch (25+
            # ms fixed on the degraded tunnel) just to re-upload it
            return jnp.pad(arr, widths)
        return np.pad(np.asarray(arr), widths)

    def run_device(self, images, *, pack_output: bool = False):
        b = images.shape[0]
        _, h, w, _ = images.shape
        r_h, r_w = self.preprocessor.matrices(w, h)
        padded = self._pad(images, b)
        self.dispatches += 1
        if pack_output:
            return self._packed(self._params, self._priors,
                                jnp.asarray(padded), r_h, r_w)[:b]
        boxes, confs, counts = self._tuple(
            self._params, self._priors, jnp.asarray(padded), r_h, r_w)
        return boxes[:b], confs[:b], counts[:b]

    def run_device_coefficients_arrays(self, y, cb, cr, quant,
                                       wh, *, sampling=(2, 2),
                                       pack_output: bool = False):
        w, h = wh
        b = y.shape[0]
        r_h, r_w = self.preprocessor.matrices(w, h)
        args = (self._params, self._priors,
                jnp.asarray(self._pad(y, b)), jnp.asarray(self._pad(cb, b)),
                jnp.asarray(self._pad(cr, b)),
                jnp.asarray(self._pad(quant, b)), r_h, r_w)
        prog = self._coef_program(w, h, tuple(sampling), pack_output)
        self.dispatches += 1
        if pack_output:
            return prog(*args)[:b]
        boxes, confs, counts = prog(*args)
        return boxes[:b], confs[:b], counts[:b]
