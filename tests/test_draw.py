"""Drawing parity tests (reference infer_server/src/inferer.rs:57-101)."""

import numpy as np

from infercam_onnx_tpu.draw import GREEN, draw_detections


def test_hollow_rect_and_label():
    frame = np.zeros((100, 200, 3), np.uint8)
    det = (np.asarray([0.25, 0.2, 0.75, 0.8], np.float32), 0.9932)
    out = draw_detections(frame, [det])
    assert out.shape == frame.shape
    # scaled corners: x 50..150, y 20..80
    assert tuple(out[20, 100]) == GREEN  # top edge
    assert tuple(out[79, 100]) == GREEN  # bottom edge (inclusive x1-1)
    assert tuple(out[50, 50]) == GREEN   # left edge
    assert tuple(out[50, 149]) == GREEN  # right edge
    # interior stays untouched (hollow rect)
    assert tuple(out[50, 100]) == (0, 0, 0)
    # the confidence label ("99.32%") renders green pixels near the
    # top-left corner
    label_region = out[20:40, 50:120]
    assert (label_region == GREEN).all(axis=-1).sum() > 20


def test_assume_dims_scales_differently():
    # the reference scales by hard-coded dims (router.rs:66-67); passing
    # dims reproduces that behavior
    frame = np.zeros((100, 200, 3), np.uint8)
    det = (np.asarray([0.1, 0.1, 0.5, 0.5], np.float32), 0.8)
    out_true = draw_detections(frame, [det])
    out_assumed = draw_detections(frame, [det], dims=(100, 50))
    assert not np.array_equal(out_true, out_assumed)
    # with assumed dims (100, 50): x 10..50, y 5..25
    assert tuple(out_assumed[5, 30]) == GREEN


def test_no_detections_is_identity():
    frame = np.arange(100 * 200 * 3, dtype=np.uint8).reshape(100, 200, 3)
    out = draw_detections(frame, [])
    np.testing.assert_array_equal(out, frame)


def test_vendored_font_loads():
    from PIL import ImageFont

    from infercam_onnx_tpu.draw import _font

    _font.cache_clear()
    font = _font()
    # the package-bundled DejaVuSansMono must resolve (a FreeTypeFont,
    # not PIL's bitmap fallback), independent of matplotlib
    assert isinstance(font, ImageFont.FreeTypeFont)
    assert "DejaVu" in (font.getname()[0] or "")
