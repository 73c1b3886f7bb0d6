"""Parity metrics + goldens make/check harness tests.

Also hosts the real-weights integration oracle (the reference's exact
face counts, reference integration_tests.rs:20-29), which runs only when
the UltraFace ONNX file is present in the cache (offline CI skips it —
reference CI downloads it live, SURVEY.md section 4).
"""

import json
import os

import numpy as np
import pytest

from infercam_onnx_tpu.eval import parity
from infercam_onnx_tpu.eval import goldens as gld


def _det(x0, y0, x1, y1, conf):
    return (np.asarray([x0, y0, x1, y1], np.float32), conf)


def test_match_detections_greedy_by_iou():
    got = [_det(0, 0, 1, 1, 0.9), _det(0.5, 0.5, 1.5, 1.5, 0.8)]
    want = [_det(0.02, 0, 1.02, 1, 0.9)]
    m = parity.match_detections(got, want)
    assert len(m) == 1
    assert m[0][0] == 0 and m[0][1] == 0  # best-IoU pair wins


def test_parity_report_counts_misses_and_extras():
    a = [_det(0, 0, 1, 1, 0.9)]
    b = [_det(0, 0, 1, 1, 0.9), _det(2, 2, 3, 3, 0.8)]
    r = parity.parity_report([a], [b])
    assert r.box_matched == 1
    assert r.box_parity == 0.5  # one miss counts against
    r2 = parity.parity_report([b], [a])
    assert r2.box_parity == 0.5  # one extra counts against


def test_confidence_tolerance():
    a = [_det(0, 0, 1, 1, 0.90)]
    b = [_det(0, 0, 1, 1, 0.95)]
    r = parity.parity_report([a], [b], conf_tol=0.02)
    assert r.box_matched == 1 and r.conf_matched == 0
    r = parity.parity_report([a], [b], conf_tol=0.10)
    assert r.conf_matched == 1


def test_fidelity_gate():
    r = parity.ParityReport(images=1, want_total=20, got_total=20,
                            box_matched=19, conf_matched=19)
    assert parity.fidelity_gate(r)
    r2 = parity.ParityReport(images=1, want_total=20, got_total=20,
                             box_matched=18, conf_matched=18)
    assert not parity.fidelity_gate(r2)


@pytest.fixture(scope="module")
def pics_dir(tmp_path_factory):
    from infercam_onnx_tpu import codec

    d = tmp_path_factory.mktemp("pics")
    rng = np.random.default_rng(9)
    for i in range(3):
        frame = rng.integers(0, 256, size=(120, 160, 3), dtype=np.uint8)
        (d / f"p{i}.jpg").write_bytes(codec.encode_rgb(frame))
    return d


def test_goldens_roundtrip_self_parity(pics_dir, tmp_path):
    # make + check with the same deterministic detector -> 100% parity
    out = tmp_path / "g.json"
    rc = gld.main(["make", "--dir", str(pics_dir), "--out", str(out),
                   "--variant", "RFB-320"])
    assert rc == 0 and out.is_file()
    rc = gld.main(["check", "--dir", str(pics_dir), "--goldens",
                   str(out), "--variant", "RFB-320"])
    assert rc == 0


def test_goldens_check_fails_on_perturbed_goldens(pics_dir, tmp_path,
                                                  capsys):
    out = tmp_path / "g.json"
    gld.main(["make", "--dir", str(pics_dir), "--out", str(out),
              "--variant", "RFB-320"])
    data = json.load(open(out))
    # shift every stored box far away
    for rows in data["detections"].values():
        for row in rows:
            row[0] += 0.5
            row[2] += 0.5
    # add fake detections so the gate must fail even if originals are few
    first = next(iter(data["detections"].values()))
    first.extend([[0.1, 0.1, 0.2, 0.2, 0.9]] * 10)
    json.dump(data, open(out, "w"))
    rc = gld.main(["check", "--dir", str(pics_dir), "--goldens",
                   str(out), "--variant", "RFB-320"])
    assert rc == 1


# -- real-weights oracle (runs only with the cached ONNX model) -----------

REFERENCE_FACE_COUNTS = {
    "bruce-mars-ZXq7xoo98b0-unsplash.jpg": 3,
    "clarke-sanders-ybPJ47PMT_M-unsplash.jpg": 6,
    "helena-lopes-e3OUQGT9bWU-unsplash.jpg": 4,
    "kaleidico-d6rTXEtOclk-unsplash.jpg": 3,
    "michael-dam-mEZ3PoFGs_k-unsplash.jpg": 1,
    "mika-W0i1N6FdCWA-unsplash.jpg": 1,
    "omar-lopez-T6zu4jFhVwg-unsplash.jpg": 10,
    "ken-cheung-KonWFWUaAuk-unsplash.jpg": 0,
}


def test_real_weights_face_counts(test_pics_dir):
    from infercam_onnx_tpu.models.convert import cached_model_path

    if not os.path.isfile(cached_model_path("RFB-640")):
        pytest.skip("real UltraFace weights not cached (offline)")

    from infercam_onnx_tpu import codec
    from infercam_onnx_tpu.config import DetectorConfig
    from infercam_onnx_tpu.detector import Detector

    det = Detector(DetectorConfig(variant="RFB-640",
                                  compute_dtype="float32"))
    for name, want in REFERENCE_FACE_COUNTS.items():
        with open(test_pics_dir / name, "rb") as f:
            frame = codec.decode_rgb(f.read())
        got = det.detect(frame)
        assert len(got) == want, f"{name}: {len(got)} != {want}"
