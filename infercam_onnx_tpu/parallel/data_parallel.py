"""Data-parallel detection: batch (streams) sharded across the mesh.

The idiomatic TPU replacement for "more inference workers": one jitted
program whose batch dimension is sharded over the mesh's data axis via
`NamedSharding`. XLA partitions the conv trunk per-chip (the model
replicates; activations shard on batch) and the only communication is the
host-side scatter/gather of inputs/outputs — there is no cross-chip
dependence in per-image detection, so serving scales linearly over ICI-
connected chips (BASELINE.json config 5: 64 streams on v5e-4).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from infercam_onnx_tpu.detector import Detector, detect_program_impl


def shard_detect(detector: Detector, mesh: Mesh, *, axis: str = "data"):
    """Returns ``run(images[B, H, W, 3]) -> (boxes, confs, counts)`` with
    B sharded over ``mesh[axis]`` (B must be divisible by the axis size).
    """
    n = mesh.shape[axis]
    batch_sharded = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    c = detector.config
    program = functools.partial(
        detect_program_impl,
        compute_dtype=detector._compute_dtype,
        min_confidence=c.min_confidence, max_iou=c.max_iou,
        top_k=c.top_k, max_detections=c.max_detections)

    sharded = jax.jit(
        program,
        in_shardings=(replicated, replicated, batch_sharded,
                      replicated, replicated),
        out_shardings=(batch_sharded, batch_sharded, batch_sharded))

    params = jax.device_put(detector.model.params, replicated)
    priors = jax.device_put(detector.model.priors, replicated)

    def run(images):
        b = images.shape[0]
        if b % n:
            raise ValueError(f"batch {b} not divisible by mesh size {n}")
        _, h, w, _ = images.shape
        r_h, r_w = detector.preprocessor.matrices(w, h)
        return sharded(params, priors, images, r_h, r_w)

    return run
