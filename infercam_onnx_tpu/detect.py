"""Single-image detection CLI (BASELINE.json config 1).

Usage::

    python -m infercam_onnx_tpu.detect photo.jpg [-o out.jpg] \
        [--variant RFB-640] [--min-confidence 0.5] [--max-iou 0.5] \
        [--onnx model.onnx [--runtime native|graph]]

Decodes the JPEG on the host, runs the fused preprocess+CNN+NMS program on
the TPU, prints detections, and (with -o) writes the annotated JPEG.
Equivalent coverage to the reference's integration-test path (reference
infer_server/tests/integration_tests.rs:6-38: decode -> model.run ->
count).

``--onnx`` loads weights from an explicit ONNX file. ``--runtime graph``
serves through the interpreted graph executor (tract-parity: the
downloaded graph itself runs, jitted; no architecture assumptions) while
``native`` (default) validates the topology and converts structurally
into the hand-written JAX forward.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("image", help="input JPEG path")
    ap.add_argument("-o", "--output", help="annotated output JPEG path")
    ap.add_argument("--variant", default="RFB-320",
                    choices=["RFB-320", "RFB-640", "slim-320", "slim-640"])
    ap.add_argument("--min-confidence", type=float, default=0.5)
    ap.add_argument("--max-iou", type=float, default=0.5)
    ap.add_argument("--top-k", type=int, default=256,
                    help="candidates entering NMS (static shape)")
    ap.add_argument("--max-detections", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0,
                    help="rng seed for offline random-weight fallback")
    ap.add_argument("--onnx", default=None,
                    help="explicit ONNX file to load weights from")
    ap.add_argument("--runtime", default="native",
                    choices=["native", "graph"],
                    help="graph: run the ONNX graph itself through the "
                         "jitted interpreter (requires --onnx)")
    args = ap.parse_args(argv)

    from infercam_onnx_tpu import codec
    from infercam_onnx_tpu.config import DetectorConfig
    from infercam_onnx_tpu.detector import Detector
    from infercam_onnx_tpu.draw import draw_detections

    with open(args.image, "rb") as f:
        frame = codec.decode_rgb(f.read())

    config = DetectorConfig(
        variant=args.variant,
        min_confidence=args.min_confidence,
        max_iou=args.max_iou,
        top_k=args.top_k,
        max_detections=args.max_detections,
        compute_dtype=("float32" if args.runtime == "graph"
                       else DetectorConfig.compute_dtype),
    )
    if args.runtime == "graph":
        if not args.onnx:
            ap.error("--runtime graph requires --onnx")
        from infercam_onnx_tpu.models.onnx_exec import GraphDetector

        det = GraphDetector(args.onnx, config)
    elif args.onnx:
        from infercam_onnx_tpu.models.convert import params_from_onnx

        det = Detector(config, params=params_from_onnx(args.onnx))
    else:
        det = Detector(config, rng=args.seed)
    detections = det.detect(frame)

    print(json.dumps({
        "image": args.image,
        "faces": len(detections),
        "detections": [
            {"bbox": [float(v) for v in bbox], "confidence": conf}
            for bbox, conf in detections
        ],
    }))

    if args.output:
        annotated = draw_detections(frame, detections)
        with open(args.output, "wb") as f:
            f.write(codec.encode_rgb(annotated))
    return 0


if __name__ == "__main__":
    sys.exit(main())
