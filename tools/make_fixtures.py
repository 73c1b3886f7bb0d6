"""Regenerate the committed test fixtures (deterministic).

Produces three kinds of artifacts, all committed to the repo so the test
suite carries its own cross-implementation oracle (the reference ships
its oracle in-tree: resources/test_pics + hard-coded counts, reference
infer_server/tests/integration_tests.rs:20-34):

1. resources/test_pics_synthetic/*.jpg — deterministic synthetic photos
   (the suite stays self-contained when /root/reference is absent).
2. resources/weights/ultraface-twin.npz — a frozen state dict (upstream
   parameter names) shared by the torch twin and the JAX detector.
   Derived from the detector's deterministic He-normal init with
   background_bias=2.0 (torch-seeded twin weights saturate to spatially
   uniform confidences; this init responds to image content and yields
   sparse realistic counts, including a zero like the real oracle's
   ken-cheung photo). Freezing removes any RNG-stability dependence.
3. tests/fixtures/goldens_twin_*.json — per-box golden detections
   computed by the TORCH twin + the NumPy reference postprocess
   (tests/torch_twin.py + ops/reference_impl.py, the independent
   reimplementation of reference nn.rs:70-260). The test suite checks
   the JAX detector against these with the >=95% BASELINE fidelity gate.

Run from the repo root:  python tools/make_fixtures.py
"""

from __future__ import annotations

import io
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SYNTH_DIR = os.path.join(REPO, "resources", "test_pics_synthetic")
WEIGHTS = os.path.join(REPO, "resources", "weights", "ultraface-twin.npz")
FIXTURES = os.path.join(REPO, "tests", "fixtures")
REFERENCE_PICS = "/root/reference/resources/test_pics"


def make_synthetic_pics() -> None:
    """Four deterministic 640x480 photos: smooth gradients + textured
    blobs (JPEG of pure noise exercises nothing meaningful)."""
    from PIL import Image

    os.makedirs(SYNTH_DIR, exist_ok=True)
    rng = np.random.default_rng(2024)
    h, w = 480, 640
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    for i in range(4):
        base = np.stack([
            127 + 110 * np.sin(xx / (11 + 3 * i)) * np.cos(yy / (7 + i)),
            127 + 100 * np.cos((xx + yy) / (13 + 2 * i)),
            127 + 90 * np.sin(yy / (9 + i)),
        ], axis=-1)
        # a few elliptical blobs with distinct interiors
        for _ in range(6):
            cx, cy = rng.uniform(0.1, 0.9) * w, rng.uniform(0.1, 0.9) * h
            rx, ry = rng.uniform(20, 90), rng.uniform(20, 90)
            mask = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 < 1
            base[mask] = rng.uniform(30, 220, size=3)
        img = np.clip(base + rng.normal(0, 6, size=base.shape),
                      0, 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=92)
        with open(os.path.join(SYNTH_DIR, f"synthetic-{i}.jpg"),
                  "wb") as f:
            f.write(buf.getvalue())
    print(f"wrote 4 synthetic pics to {SYNTH_DIR}")


def make_twin_weights() -> None:
    from infercam_onnx_tpu.models import ultraface as uf
    from infercam_onnx_tpu.models.convert import state_dict_from_params

    params = uf.init_params(0, background_bias=2.0)
    sd = {k: np.asarray(v, np.float32)
          for k, v in state_dict_from_params(params).items()}
    os.makedirs(os.path.dirname(WEIGHTS), exist_ok=True)
    np.savez(WEIGHTS, **sd)
    print(f"wrote {len(sd)} tensors to {WEIGHTS}")


def _twin_for(variant: str):
    import torch
    from torch_twin import UltraFaceTwin

    from infercam_onnx_tpu.models import ultraface as uf

    size = {"RFB-320": (320, 240), "RFB-640": (640, 480)}[variant]
    twin = UltraFaceTwin(
        torch.from_numpy(uf.generate_priors(*size))).eval()
    sd = dict(np.load(WEIGHTS))
    twin.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
    return twin, size


def twin_detect(twin, size, frame: np.ndarray) -> list[list[float]]:
    """The CPU oracle pipeline: triangle-resize matrices + u8 rounding +
    normalize + torch forward + NumPy reference postprocess — mirroring
    reference nn.rs:70-140,198-260 semantics exactly."""
    import torch

    from infercam_onnx_tpu.ops import reference_impl as ref
    from infercam_onnx_tpu.ops.preprocess import (
        MEAN, STD, triangle_resize_matrix)

    mw, mh = size
    r_h = triangle_resize_matrix(frame.shape[0], mh)
    r_w = triangle_resize_matrix(frame.shape[1], mw)
    x = np.einsum("oH,HWc->oWc", r_h, frame.astype(np.float32))
    x = np.einsum("oW,hWc->hoc", r_w, x)
    x = (np.clip(np.floor(x + 0.5), 0, 255) / 255.0 - MEAN) / STD
    with torch.no_grad():
        scores, boxes = twin(torch.from_numpy(
            np.transpose(x[None], (0, 3, 1, 2)).astype(np.float32)))
    dets = ref.postprocess(scores[0].numpy(), boxes[0].numpy())
    return [[*map(float, bbox), float(conf)] for bbox, conf in dets]


def make_goldens(variant: str, pics_dir: str, out_name: str,
                 resize: tuple[int, int] | None) -> None:
    from infercam_onnx_tpu.eval.goldens import load_directory_frames

    twin, size = _twin_for(variant)
    frames = load_directory_frames(pics_dir, resize=resize)
    table = {name: twin_detect(twin, size, frame)
             for name, frame in frames.items()}
    os.makedirs(FIXTURES, exist_ok=True)
    out = os.path.join(FIXTURES, out_name)
    with open(out, "w") as f:
        json.dump({
            "variant": variant,
            "resize": list(resize) if resize else None,
            "weights": "resources/weights/ultraface-twin.npz",
            "oracle": "torch twin + NumPy reference postprocess "
                      "(tools/make_fixtures.py)",
            "detections": table,
        }, f, indent=1)
    total = sum(len(v) for v in table.values())
    print(f"wrote {len(table)} images / {total} detections to {out}")


def main() -> int:
    make_synthetic_pics()
    make_twin_weights()
    make_goldens("RFB-320", SYNTH_DIR,
                 "goldens_twin_rfb320_synthetic.json", resize=None)
    if os.path.isdir(REFERENCE_PICS):
        make_goldens("RFB-640", REFERENCE_PICS,
                     "goldens_twin_rfb640_testpics.json",
                     resize=(640, 480))
    else:
        print("reference test_pics absent; skipped RFB-640 goldens")
    return 0


if __name__ == "__main__":
    sys.exit(main())
