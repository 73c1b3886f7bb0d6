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

    def annotated(batch):
        """The fused detect+overlay+FDCT/quant program (round 3's
        annotated encode tail) on resident packed planes."""
        from infercam_onnx_tpu import codec
        from infercam_onnx_tpu.detector import (
            detect_annotate_from_ycbcr_impl)
        from infercam_onnx_tpu.native import jpeg as native_jpeg

        n = native_jpeg.load()
        probe = codec.encode_rgb(np.zeros((h, w, 3), np.uint8), 90,
                                 "420")
        packed, geom = n.decode_ycbcr_batch([probe] * batch)
        packed = jnp.asarray(packed)
        quant = jnp.asarray(n.quant_tables(95).astype(np.float32))
        static = dict(
            width=geom["width"], height=geom["height"],
            y_pw=geom["y_pw"], y_ph=geom["y_ph"],
            c_pw=geom["c_pw"], c_ph=geom["c_ph"],
            sampling=tuple(geom["sampling"]), disp_dims=None,
            compute_dtype=jnp.bfloat16, min_confidence=0.5,
            max_iou=0.5, top_k=256, max_detections=64)
        ra_h, ra_w = det.preprocessor.matrices(geom["width"],
                                               geom["height"])

        def run(p):
            def body(i, acc):
                coefs, pd = detect_annotate_from_ycbcr_impl(
                    params, priors, p + i.astype(jnp.uint8),
                    ra_h, ra_w, quant, **static)
                return acc + coefs.astype(jnp.float32).sum() + pd.sum()
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        return run, packed

    def splice(batch):
        """The coefficient splice-transcode program (detect + overlay +
        requant + touched-block top-K) on resident packed uploads."""
        from infercam_onnx_tpu import codec
        from infercam_onnx_tpu.detector import (
            detect_annotate_splice_impl,
            pack_coefficient_batch,
        )
        from infercam_onnx_tpu.native import jpeg as native_jpeg
        from infercam_onnx_tpu.ops.jpeg_device import (
            read_coefficient_batch)

        native_jpeg.load()
        probe = codec.encode_rgb(np.zeros((h, w, 3), np.uint8), 90,
                                 "420")
        y, cb, cr, quant, wh, samp = read_coefficient_batch(
            [probe] * batch)
        packed, quant, shapes = pack_coefficient_batch(y, cb, cr,
                                                       quant)
        packed = jnp.asarray(packed)
        quant = jnp.asarray(quant)
        (y_bh, y_bw), (c_bh, c_bw) = shapes
        static = dict(
            width=wh[0], height=wh[1], y_bw=y_bw, y_bh=y_bh,
            c_bw=c_bw, c_bh=c_bh, sampling=tuple(samp), k=768,
            disp_dims=None, compute_dtype=jnp.bfloat16,
            min_confidence=0.5, max_iou=0.5, top_k=256,
            max_detections=64)
        rs_h, rs_w = det.preprocessor.matrices(wh[0], wh[1])

        def run(p):
            def body(i, acc):
                blocks, meta, pd = detect_annotate_splice_impl(
                    params, priors, p + i.astype(jnp.uint8), quant,
                    rs_h, rs_w, **static)
                return (acc + blocks.astype(jnp.float32).sum()
                        + pd.sum())
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        return run, packed

    def tiled(batch):
        """2x2 tiled 1080p detection (resident input)."""
        from infercam_onnx_tpu.parallel.tiling import TiledDetector

        t = TiledDetector(det, (1920, 1080), grid=(2, 2))
        frames = jnp.asarray(
            np.zeros((batch, 1080, 1920, 3), np.uint8))
        prog = t._program("pixels", True)

        def run(f):
            def body(i, acc):
                out = prog(t._params, t._priors,
                           f + i.astype(jnp.uint8), t._r_h, t._r_w)
                return acc + out.sum()
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        return run, frames

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
        for name, builder in (("annotated", annotated),
                              ("splice", splice),
                              ("tiled_1080p", tiled)):
            if name == "tiled_1080p" and batch > 4:
                continue  # 1080p batches past 4 don't fit/matter
            run, arg = builder(batch)
            fn = jax.jit(run)
            jax.block_until_ready(fn(arg))
            t0 = time.perf_counter()
            jax.block_until_ready(fn(arg))
            row[f"{name}_ms"] = round(
                (time.perf_counter() - t0) / k * 1e3, 4)
        row["fps_on_chip"] = round(batch / row["full_ms"] * 1e3, 1)
        print(json.dumps(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
