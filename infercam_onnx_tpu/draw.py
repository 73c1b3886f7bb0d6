"""Bounding-box annotation (reference infer_server/src/inferer.rs:57-101).

Reproduces the reference's drawing: hollow green Rgb(0,255,0) rectangles
from relative coords scaled by the frame dims, with a "{:.2}%" confidence
label in 16 px DejaVu Sans Mono at the box's top-left corner. The font
ships inside the package (resources/DejaVuSansMono.ttf + its license —
the reference embeds the same face via include_bytes!, reference
inferer.rs:94-101), with matplotlib's copy and PIL's default bitmap font
as fallbacks.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
from PIL import Image, ImageDraw, ImageFont

GREEN = (0, 255, 0)
FONT_SIZE = 16


@functools.lru_cache(maxsize=1)
def _font() -> ImageFont.ImageFont:
    import os

    vendored = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "resources", "DejaVuSansMono.ttf")
    try:
        return ImageFont.truetype(vendored, FONT_SIZE)
    except Exception:
        pass
    try:
        import matplotlib

        path = os.path.join(
            os.path.dirname(matplotlib.__file__),
            "mpl-data", "fonts", "ttf", "DejaVuSansMono.ttf")
        return ImageFont.truetype(path, FONT_SIZE)
    except Exception:
        return ImageFont.load_default()


def draw_detections(
    frame: np.ndarray,
    detections: Sequence[tuple[np.ndarray, float]],
    dims: tuple[int, int] | None = None,
) -> np.ndarray:
    """Draw boxes + confidence labels; returns a new [H, W, 3] uint8 array.

    ``dims``: (width, height) used to scale the relative coords. The
    reference hard-codes 1280x720 here regardless of the true frame size
    (reference router.rs:66-67) — passing None uses the decoded frame's
    real dims instead (documented divergence, strictly more correct).
    """
    img = Image.fromarray(frame)
    d = ImageDraw.Draw(img)
    width, height = dims if dims is not None else (img.width, img.height)
    font = _font()
    for bbox, confidence in detections:
        x_tl = int(bbox[0] * width)
        y_tl = int(bbox[1] * height)
        x_br = int(bbox[2] * width)
        y_br = int(bbox[3] * height)
        d.rectangle([x_tl, y_tl, x_br - 1, y_br - 1], outline=GREEN)
        d.text((x_tl, y_tl), f"{confidence * 100.0:.2f}%", fill=GREEN,
               font=font)
    return np.asarray(img)
