"""On-chip microbenchmark: TRUE device time of the fused programs.

Per-dispatch timing through the development tunnel is dominated by a
~40 ms flat launch overhead, which hides everything the chip actually
does. This tool runs each program K times INSIDE one executable
(`lax.fori_loop`, input perturbed by the loop index so XLA cannot hoist
the body) and reports per-iteration time — the number that governs
production throughput ceilings and tells us where kernel-level work
would (or would not) pay off.

Usage::

    python tools/microbench.py [--batches 1,16,64] [--iters 100]

Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", default="1,16,64")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--variant", default="RFB-320")
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from infercam_onnx_tpu.config import DetectorConfig
    from infercam_onnx_tpu.detector import Detector
    from infercam_onnx_tpu.models import ultraface as uf
    from infercam_onnx_tpu.ops.postprocess import batched_postprocess
    from infercam_onnx_tpu.ops.preprocess import preprocess_images
    from infercam_onnx_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    np.asarray(jnp.zeros((1,), jnp.float32))  # trip the transfer latch

    det = Detector(DetectorConfig(variant=args.variant), rng=0)
    params, priors = det.model.params, det.model.priors
    h, w = det.model.height * 2, det.model.width * 2  # 640x480-style in
    r_h, r_w = det.preprocessor.matrices(w, h)
    k = args.iters

    def staged(stage):
        def run(images):
            def body(i, acc):
                x = images + i.astype(jnp.uint8)
                xp = preprocess_images(x, r_h, r_w)
                if stage == "preprocess":
                    return acc + xp.sum()
                s, b = uf.forward(params, xp, priors,
                                  compute_dtype=jnp.bfloat16)
                if stage == "preprocess+cnn":
                    return acc + s.sum() + b.sum()
                sb, sc, n = batched_postprocess(
                    s, b, min_confidence=0.5, max_iou=0.5,
                    top_k=256, max_detections=64)
                return acc + sc.sum() + n.sum()
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    for batch in (int(b) for b in args.batches.split(",")):
        images = jnp.asarray(np.zeros((batch, h, w, 3), np.uint8))
        row = {"batch": batch, "iters": k,
               "device": str(jax.devices()[0])}
        for stage in ("preprocess", "preprocess+cnn", "full"):
            fn = jax.jit(staged(stage))
            jax.block_until_ready(fn(images))
            t0 = time.perf_counter()
            jax.block_until_ready(fn(images))
            ms = (time.perf_counter() - t0) / k * 1e3
            row[f"{stage}_ms"] = round(ms, 4)
        row["fps_on_chip"] = round(batch / row["full_ms"] * 1e3, 1)
        print(json.dumps(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
