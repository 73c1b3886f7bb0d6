"""End-to-end fused pipeline tests: uint8 frames -> detections.

The strongest check chains our preprocessing + the torch twin + the NumPy
oracle postprocessing (three independently-written stages) against the
single fused JAX program, at detection level — the same structure as the
reference's fidelity gate (>=95% box/confidence parity, BASELINE.md).
"""

import io

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from infercam_onnx_tpu.config import DetectorConfig
from infercam_onnx_tpu.detector import Detector
from infercam_onnx_tpu.models import ultraface as uf
from infercam_onnx_tpu.models.convert import params_from_state_dict
from infercam_onnx_tpu.ops import preprocess as prep
from infercam_onnx_tpu.ops import reference_impl as ref

from tests.torch_twin import UltraFaceTwin


@pytest.fixture(scope="module")
def twin_setup():
    import tests.test_torch_parity as tp

    width, height = uf.VARIANTS["RFB-320"]
    twin = tp._build_twin(width, height, seed=11)
    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    params = params_from_state_dict(sd)
    # sparsify detections so NMS has realistic work: bias background class
    # on every head (random weights otherwise pass ~half of all priors)
    for level in range(4):
        h = params["cls_heads"][level]
        tgt = h["pw"] if level < 3 else h
        b = np.asarray(tgt["b"]).copy()
        b[0::2] += 5.0
        tgt["b"] = jnp.asarray(b)
        with torch.no_grad():
            tm = twin.classification_headers[level]
            tconv = tm[2] if level < 3 else tm
            tconv.bias[0::2] += 5.0
    return twin, params


def _random_frame(rng, w=640, h=480):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_fused_pipeline_matches_three_stage_oracle(twin_setup, rng):
    twin, params = twin_setup
    det = Detector(DetectorConfig(variant="RFB-320",
                                  compute_dtype="float32"),
                   params=params)

    frame = _random_frame(rng)
    got = det.detect(frame)

    # oracle: our resize matrices in numpy -> torch twin -> numpy NMS
    r_h = prep.triangle_resize_matrix(480, 240)
    r_w = prep.triangle_resize_matrix(640, 320)
    x = np.einsum("oH,HWc->oWc", r_h, frame.astype(np.float32))
    x = np.einsum("oW,hWc->hoc", r_w, x)
    x = np.clip(np.round(x), 0, 255) / 255.0
    x = (x - prep.MEAN) / prep.STD
    with torch.no_grad():
        t_scores, t_boxes = twin(
            torch.from_numpy(np.transpose(x[None], (0, 3, 1, 2))
                             .astype(np.float32)))
    want = ref.postprocess(t_scores[0].numpy(), t_boxes[0].numpy(),
                           0.5, 0.5)

    assert len(got) == len(want)
    for (g_box, g_conf), (w_box, w_conf) in zip(got, want):
        np.testing.assert_allclose(g_box, w_box, rtol=1e-3, atol=1e-4)
        assert abs(g_conf - w_conf) < 1e-3


def test_detect_batch_consistent_with_single(twin_setup, rng):
    _, params = twin_setup
    det = Detector(DetectorConfig(variant="RFB-320",
                                  compute_dtype="float32"),
                   params=params)
    frames = np.stack([_random_frame(rng) for _ in range(3)])
    batched = det.detect_batch(frames)
    for i in range(3):
        single = det.detect(frames[i])
        assert len(single) == len(batched[i])
        for (b1, c1), (b2, c2) in zip(single, batched[i]):
            np.testing.assert_allclose(b1, b2, atol=1e-6)


def test_detector_random_fallback_runs(rng):
    # offline: Detector falls back to deterministic random weights
    det = Detector(DetectorConfig(variant="RFB-320",
                                  compute_dtype="float32"))
    out = det.detect(_random_frame(rng, 320, 240))
    assert isinstance(out, list)


def test_detect_cli(tmp_path, rng, monkeypatch):
    from infercam_onnx_tpu import codec
    from infercam_onnx_tpu import detect as cli

    frame = _random_frame(rng, 320, 240)
    src = tmp_path / "in.jpg"
    src.write_bytes(codec.encode_rgb(frame))
    dst = tmp_path / "out.jpg"

    import json
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main([str(src), "-o", str(dst)])
    assert rc == 0
    payload = json.loads(buf.getvalue())
    assert "faces" in payload and payload["faces"] >= 0
    assert dst.is_file() and dst.stat().st_size > 0
    decoded = codec.decode_rgb(dst.read_bytes())
    assert decoded.shape == frame.shape


def test_codec_roundtrip_and_corrupt(rng):
    from infercam_onnx_tpu import codec

    # smooth gradient (JPEG mangles pure noise regardless of codec)
    yy, xx = np.mgrid[0:48, 0:64]
    frame = np.stack([yy * 5 % 256, xx * 4 % 256, (yy + xx) * 3 % 256],
                     axis=-1).astype(np.uint8)
    enc = codec.encode_rgb(frame)
    dec = codec.decode_rgb(enc)
    assert dec.shape == frame.shape
    assert np.abs(dec.astype(int) - frame.astype(int)).mean() < 20
    with pytest.raises(ValueError):
        codec.decode_rgb(b"\xff\xd8 not a jpeg")
    outs = codec.decode_batch([enc, enc])
    assert len(outs) == 2 and outs[0].shape == frame.shape


def test_codec_pil_fallback(monkeypatch, rng):
    """Environments without a C++ toolchain fall back to PIL."""
    from infercam_onnx_tpu import codec as c

    monkeypatch.setattr(c, "_get_native", lambda: None)
    frame = _random_frame(rng, 64, 48)
    enc = c.encode_rgb(frame)
    dec = c.decode_rgb(enc)
    assert dec.shape == frame.shape
    half = c.decode_rgb(enc, scale=2)
    assert half.shape == (24, 32, 3)
    outs = c.decode_batch([enc, enc], scale=2)
    assert len(outs) == 2 and outs[0].shape == (24, 32, 3)
    with pytest.raises(ValueError):
        c.decode_rgb(b"junk")
