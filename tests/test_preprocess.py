"""Resize-as-matmul preprocessing vs PIL's Triangle/bilinear resampler.

PIL's BILINEAR uses the same antialiased triangle filter as image-rs
``FilterType::Triangle`` (the reference's resize, reference
infer_server/src/nn.rs:75-81), so it serves as the independent oracle.
"""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from infercam_onnx_tpu.ops import preprocess as prep


def _random_image(rng, w, h):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize(
    "in_wh,out_wh",
    [
        ((640, 480), (320, 240)),  # serve-time exact 2x downscale
        ((1280, 720), (320, 240)),  # the reference's assumed cam dims
        ((1280, 720), (640, 480)),  # 640 variant
        ((200, 100), (320, 240)),  # upscale path
    ],
)
def test_resize_matches_pil_bilinear(rng, in_wh, out_wh):
    (iw, ih), (ow, oh) = in_wh, out_wh
    img = _random_image(rng, iw, ih)

    want = np.asarray(
        Image.fromarray(img).resize((ow, oh), Image.BILINEAR),
        dtype=np.float32)

    r_h = jnp.asarray(prep.triangle_resize_matrix(ih, oh))
    r_w = jnp.asarray(prep.triangle_resize_matrix(iw, ow))
    x = jnp.einsum("oH,bHWc->boWc", r_h,
                   jnp.asarray(img[None], jnp.float32))
    x = jnp.einsum("oW,bhWc->bhoc", r_w, x)
    got = np.clip(np.round(np.asarray(x[0])), 0, 255)

    # identical filters; PIL quantizes coefficients to 8-bit fixed point
    # (we accumulate in f32 like image-rs), so allow +-1 u8 rounding steps
    diff = np.abs(got - want)
    assert diff.max() <= 1.0 + 1e-5
    assert (diff > 0.5).mean() < 0.25


def test_preprocess_matches_reference_normalization(rng):
    img = _random_image(rng, 320, 240)
    # identity resize (same size): matrix is identity
    r = prep.triangle_resize_matrix(240, 240)
    np.testing.assert_allclose(r, np.eye(240), atol=1e-6)

    out = prep.preprocess_images(
        jnp.asarray(img[None]),
        jnp.asarray(prep.triangle_resize_matrix(240, 240)),
        jnp.asarray(prep.triangle_resize_matrix(320, 320)))
    want = (img.astype(np.float32) / 255.0 - prep.MEAN) / prep.STD
    np.testing.assert_allclose(np.asarray(out[0]), want, atol=1e-5)


def test_preprocessor_caches_and_runs(rng):
    p = prep.Preprocessor(320, 240)
    img = _random_image(rng, 640, 480)
    out = p(jnp.asarray(img[None]))
    assert out.shape == (1, 240, 320, 3)
    out2 = p(jnp.asarray(img[None]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))
    assert len(p._cache) == 1
    # normalized output has plausible dynamic range
    arr = np.asarray(out)
    assert arr.min() > -3.0 and arr.max() < 3.0


def test_resize_matrix_rows_sum_to_one():
    for in_s, out_s in [(480, 240), (720, 240), (123, 77), (50, 100)]:
        m = prep.triangle_resize_matrix(in_s, out_s)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)
