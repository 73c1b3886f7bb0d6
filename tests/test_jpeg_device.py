"""Device-side JPEG decode tail tests (BASELINE config 4).

Oracle: the host libjpeg full decode (C++ shim). The device pipeline
(dequant + IDCT + fancy chroma upsample + BT.601) must reconstruct RGB
within a couple of u8 steps, and the fully-fused coefficients->detections
program must agree with the standard frames->detections program at
detection level.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from infercam_onnx_tpu import codec
from infercam_onnx_tpu.ops import jpeg_device as jd


def _jpeg(rng, w=128, h=96, quality=90):
    # smooth-ish content: JPEG of pure noise stresses nothing meaningful
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([
        (127 + 120 * np.sin(xx / 9.0) * np.cos(yy / 7.0)),
        (127 + 120 * np.cos(xx / 13.0)),
        (127 + 120 * np.sin((xx + yy) / 11.0)),
    ], axis=-1)
    noise = rng.normal(0, 12, size=(h, w, 3))
    img = np.clip(base + noise, 0, 255).astype(np.uint8)
    return codec.encode_rgb(img, quality, "420")


def test_reconstruction_matches_host_decode(rng):
    data = _jpeg(rng)
    host = codec.decode_rgb(data).astype(np.float32)
    y, cb, cr, quant, (w, h), _ = jd.read_coefficient_batch([data])
    rgb = np.asarray(jd.decode_rgb_device(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
        jnp.asarray(quant), width=w, height=h))[0]
    diff = np.abs(rgb - host)
    assert diff.mean() < 1.0
    assert np.percentile(diff, 99) <= 3.0


def test_idct_basis_is_orthonormal():
    a = jd.idct_basis().astype(np.float64)
    np.testing.assert_allclose(a @ a.T, np.eye(8), atol=1e-6)


def test_dc_only_block_decodes_flat():
    # a single DC coefficient must produce a constant 8x8 block
    coefs = np.zeros((1, 1, 1, 64), np.int16)
    coefs[0, 0, 0, 0] = 32  # DC
    quant = np.full((1, 64), 2.0, np.float32)
    plane = np.asarray(jd.decode_plane(jnp.asarray(coefs),
                                       jnp.asarray(quant)))[0]
    # DC term: A[:,0] = 0.5/sqrt(2) -> pixel = dc*quant/8 + 128
    np.testing.assert_allclose(plane, 32 * 2 / 8 + 128, atol=1e-4)


def test_fused_coefficient_detection_matches_standard(rng):
    from infercam_onnx_tpu.config import DetectorConfig
    from infercam_onnx_tpu.detector import Detector
    from infercam_onnx_tpu.eval.parity import parity_report

    det = Detector(DetectorConfig(variant="RFB-320",
                                  compute_dtype="float32"), rng=0)
    datas = [_jpeg(rng, 160, 120) for _ in range(2)]

    # standard path: host full decode -> device detect
    frames = np.stack([codec.decode_rgb(d) for d in datas])
    std = det.detect_batch(frames)

    # fused path: host entropy decode -> device everything
    boxes, confs, counts = (
        np.asarray(a) for a in det.run_device_coefficients(datas))
    fused = [
        [(boxes[i, d], float(confs[i, d])) for d in range(int(counts[i]))]
        for i in range(2)
    ]

    report = parity_report(fused, std, iou_thresh=0.8, conf_tol=0.05)
    assert report.box_parity >= 0.9, report.as_dict()


def test_rejects_mixed_geometries(rng):
    a = _jpeg(rng, 128, 96)
    b = _jpeg(rng, 64, 96)
    with pytest.raises(ValueError, match="mixed"):
        jd.read_coefficient_batch([a, b])


def test_444_coefficients_reconstruct(rng):
    # 4:4:4 streams thread their sampling through to the device decode
    # (no spurious 2x chroma upsample; ADVICE round-1 item 4)
    yy, xx = np.mgrid[0:96, 0:128]
    img = np.clip(np.stack([
        127 + 100 * np.sin(xx / 9.0) * np.cos(yy / 6.0),
        127 + 90 * np.cos(xx / 5.0),
        127 + 80 * np.sin(yy / 7.0),
    ], axis=-1), 0, 255).astype(np.uint8)
    data = codec.encode_rgb(img, 92, "444")
    host = codec.decode_rgb(data).astype(np.float32)
    y, cb, cr, quant, (w, h), samp = jd.read_coefficient_batch([data])
    assert samp == (1, 1)
    rgb = np.asarray(jd.decode_rgb_device(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
        jnp.asarray(quant), width=w, height=h, sampling=(1, 1)))[0]
    assert np.abs(rgb - host).mean() < 1.0


def test_rejects_mixed_sampling(rng):
    yy, xx = np.mgrid[0:96, 0:128]
    img = np.clip(127 + 50 * np.sin(xx / 3.0) + 0 * yy,
                  0, 255).astype(np.uint8)
    img = np.stack([img] * 3, axis=-1)
    a = codec.encode_rgb(img, 90, "420")
    b = codec.encode_rgb(img, 90, "444")
    with pytest.raises(ValueError, match="mixed"):
        jd.read_coefficient_batch([a, b])


def test_progressive_jpeg_coefficients(rng):
    # jpeg_read_coefficients handles progressive streams too
    import io
    from PIL import Image

    yy, xx = np.mgrid[0:96, 0:128]
    img = np.clip(127 + 100 * np.sin(xx / 9.0) * np.cos(yy / 6.0),
                  0, 255).astype(np.uint8)
    img = np.stack([img] * 3, axis=-1)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90, progressive=True,
                              subsampling=2)
    data = buf.getvalue()
    host = codec.decode_rgb(data).astype(np.float32)
    y, cb, cr, quant, (w, h), _ = jd.read_coefficient_batch([data])
    rgb = np.asarray(jd.decode_rgb_device(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
        jnp.asarray(quant), width=w, height=h))[0]
    assert np.abs(rgb - host).mean() < 1.5


def test_ycbcr_raw_decode_reconstructs(rng):
    """Raw-plane host decode + device upsample/color == host RGB decode
    (within fixed-point-vs-float wiggle)."""
    data = _jpeg(rng, 128, 96)
    host = codec.decode_rgb(data).astype(np.float32)
    from infercam_onnx_tpu.native import jpeg as native_jpeg
    from infercam_onnx_tpu.ops.jpeg_device import (
        combine_ycbcr, unpack_ycbcr_planes)

    packed, geom = native_jpeg.load().decode_ycbcr_batch([data, data])
    y, cb, cr = unpack_ycbcr_planes(
        jnp.asarray(packed), y_pw=geom["y_pw"], y_ph=geom["y_ph"],
        c_pw=geom["c_pw"], c_ph=geom["c_ph"])
    rgb = np.asarray(combine_ycbcr(
        y, cb, cr, width=geom["width"], height=geom["height"],
        sampling=tuple(geom["sampling"])))
    assert np.abs(rgb[0] - host).mean() < 1.0
    np.testing.assert_array_equal(rgb[0], rgb[1])


def test_ycbcr_scaled_decode_folds_chroma(rng):
    """At IDCT scale 2 on 4:2:0, chroma folds back to half resolution
    (the 2x transfer saving) with bounded fidelity loss."""
    data = _jpeg(rng, 128, 96)
    from infercam_onnx_tpu.native import jpeg as native_jpeg
    from infercam_onnx_tpu.ops.jpeg_device import (
        combine_ycbcr, unpack_ycbcr_planes)

    packed, geom = native_jpeg.load().decode_ycbcr_batch([data], scale=2)
    assert geom["width"] == 64 and geom["height"] == 48
    assert geom["c_pw"] * 2 == geom["y_pw"]  # folded
    # packed bytes ~ 1.5 B/px, not 3
    assert packed.shape[1] <= geom["y_pw"] * geom["y_ph"] * 3 // 2
    host = codec.decode_rgb(data, scale=2).astype(np.float32)
    y, cb, cr = unpack_ycbcr_planes(
        jnp.asarray(packed), y_pw=geom["y_pw"], y_ph=geom["y_ph"],
        c_pw=geom["c_pw"], c_ph=geom["c_ph"])
    rgb = np.asarray(combine_ycbcr(
        y, cb, cr, width=geom["width"], height=geom["height"],
        sampling=(2, 2)))[0]
    # luma path is exact; chroma does a box-down + triangle-up roundtrip
    assert np.abs(rgb - host).mean() < 4.0


@pytest.mark.parametrize("scale", [1, 2])
def test_422_decode_tails_reconstruct(rng, scale):
    """4:2:2 (the usual UVC-webcam MJPEG layout) rides BOTH device
    decode tails: packed-plane and coefficient reconstructions match
    the host RGB decode within the fixed-point wiggle, at full and
    IDCT-scaled resolution."""
    from infercam_onnx_tpu.native import jpeg as native_jpeg
    from infercam_onnx_tpu.ops.jpeg_device import (
        combine_ycbcr,
        decode_rgb_device,
        read_coefficient_batch,
        unpack_ycbcr_planes,
    )

    img = rng.integers(0, 256, size=(96, 128, 3), dtype=np.uint8)
    data = codec.encode_rgb(img, 90, "422")
    host = codec.decode_rgb(data, scale=scale).astype(np.float32)

    packed, geom = native_jpeg.load().decode_ycbcr_batch([data],
                                                         scale=scale)
    assert tuple(geom["sampling"]) == (2, 1)
    assert geom["c_pw"] * 2 == geom["y_pw"]  # half-width chroma
    assert geom["c_ph"] == geom["y_ph"]
    y, cb, cr = unpack_ycbcr_planes(
        jnp.asarray(packed), y_pw=geom["y_pw"], y_ph=geom["y_ph"],
        c_pw=geom["c_pw"], c_ph=geom["c_ph"])
    rgb = np.asarray(combine_ycbcr(
        y, cb, cr, width=geom["width"], height=geom["height"],
        sampling=tuple(geom["sampling"])))[0]
    assert np.abs(rgb - host).mean() < 2.0

    if scale == 1:  # coefficients are always full-resolution
        yc, cbc, crc, q, wh, samp = read_coefficient_batch([data])
        assert samp == (2, 1)
        rgb2 = np.asarray(decode_rgb_device(
            jnp.asarray(yc), jnp.asarray(cbc), jnp.asarray(crc),
            jnp.asarray(q), width=wh[0], height=wh[1],
            sampling=samp))[0]
        assert np.abs(rgb2 - host).mean() < 2.0


def test_fused_ycbcr_detection_matches_standard(rng):
    from infercam_onnx_tpu.config import DetectorConfig
    from infercam_onnx_tpu.detector import Detector, unpack_detections
    from infercam_onnx_tpu.eval.parity import parity_report

    det = Detector(DetectorConfig(variant="RFB-320",
                                  compute_dtype="float32"), rng=0)
    datas = [_jpeg(rng, 160, 120) for _ in range(2)]
    frames = np.stack([codec.decode_rgb(d) for d in datas])
    std = det.detect_batch(frames)
    packed = np.asarray(det.run_device_ycbcr(datas, pack_output=True))
    fused = unpack_detections(packed)
    report = parity_report(fused, std, iou_thresh=0.8, conf_tol=0.05)
    assert report.box_parity >= 0.9, report.as_dict()


def test_huge_claimed_dims_rejected_not_allocated(rng):
    """A tiny JPEG whose SOF header claims 65500x65500 must raise
    ValueError (drop-not-die, serving treats it as corrupt) instead of
    driving a ~12.9 GB per-slot allocation that would OOM-kill the
    server. The 8 MiB wire cap (protocol.py) does not protect against
    this: the attack frame is 2 KB."""
    from infercam_onnx_tpu.native import jpeg as native_jpeg

    native = native_jpeg.load()
    data = bytearray(_jpeg(rng))
    # patch the SOF0 frame header dims: FF C0 len(2) prec(1) H(2) W(2)
    i = data.find(b"\xff\xc0")
    assert i > 0, "fixture JPEG has no baseline SOF0 marker"
    data[i + 5:i + 9] = (65500).to_bytes(2, "big") * 2
    huge = bytes(data)

    with pytest.raises(ValueError, match="too large"):
        native.decode_rgb(huge)
    with pytest.raises(ValueError, match="too large"):
        native.decode_batch([_jpeg(rng), huge])
    with pytest.raises(ValueError, match="too large"):
        native.decode_ycbcr_batch([huge])
    # huge frame NOT in slot 0: caught by the C-side capacity check
    with pytest.raises(ValueError):
        native.decode_ycbcr_batch([_jpeg(rng), huge])

    # the ycbcr clamp is sized to its packed-plane allocation (2x the
    # RGB budget): a real 12 MP 4:2:0 frame still decodes there even
    # though the RGB path's 4K cap rejects it
    big = np.full((3024, 4032, 3), 128, np.uint8)
    big_jpeg = codec.encode_rgb(big, 85, "420")
    packed, geom = native.decode_ycbcr_batch([big_jpeg])
    assert (geom["width"], geom["height"]) == (4032, 3024)
    with pytest.raises(ValueError, match="too large"):
        native.decode_rgb(big_jpeg)
