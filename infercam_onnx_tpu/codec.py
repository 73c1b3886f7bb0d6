"""JPEG codec facade: native libjpeg shim with PIL fallback.

The reference's hot path uses turbojpeg (Rust bindings over libjpeg-turbo,
reference infer_server/src/inferer.rs:35-40: decompress_image +
compress_image(quality=95, Sub2x2)). Here the equivalent native component
is a small C++ shim over the system libjpeg (built on first use, driven
via ctypes — see native/jpeg/), with batch decode parallelized across C++
threads. When the shim cannot be built, PIL is used (correct but slower).
"""

from __future__ import annotations

import io
import logging

import numpy as np

log = logging.getLogger(__name__)

_native = None
_native_tried = False


def _get_native():
    global _native, _native_tried
    if not _native_tried:
        _native_tried = True
        try:
            from infercam_onnx_tpu.native import jpeg as native_jpeg

            _native = native_jpeg.load()
        except Exception as e:  # pragma: no cover - env-dependent
            log.warning("native JPEG shim unavailable (%s); using PIL", e)
            _native = None
    return _native


def decode_rgb(data: bytes, scale: int = 1) -> np.ndarray:
    """JPEG bytes -> [H, W, 3] uint8 RGB. Raises ValueError on corrupt
    input (the reference panics its inference task on corrupt frames,
    reference inferer.rs:35-36 — we harden to an exception the caller
    drops, SURVEY.md section 5 'failure detection').

    ``scale`` in {1, 2, 4, 8}: decode at 1/scale resolution using
    libjpeg's IDCT scaling (native path only; cheap model-input decode).
    """
    native = _get_native()
    if native is not None:
        return native.decode_rgb(data, scale)
    return _pil_decode(data, scale)


def decode_batch(datas: list[bytes], scale: int = 1) -> list[np.ndarray]:
    """Decode many JPEGs (native path uses a C++ thread pool)."""
    native = _get_native()
    if native is not None:
        return native.decode_batch(datas, scale=scale)
    return [_pil_decode(d, scale) for d in datas]


def encode_rgb(frame: np.ndarray, quality: int = 95,
               subsampling: str = "420") -> bytes:
    """[H, W, 3] uint8 RGB -> JPEG bytes (reference output settings:
    quality 95, 4:2:0 chroma subsampling, reference inferer.rs:39)."""
    native = _get_native()
    if native is not None:
        return native.encode_rgb(frame, quality, subsampling)
    return _pil_encode(frame, quality, subsampling)


def _pil_decode(data: bytes, scale: int = 1) -> np.ndarray:
    from PIL import Image

    try:
        with Image.open(io.BytesIO(data)) as im:
            if scale > 1:
                im.draft("RGB", (im.width // scale, im.height // scale))
            return np.asarray(im.convert("RGB"))
    except Exception as e:
        raise ValueError(f"corrupt JPEG: {e}") from e


def _pil_encode(frame: np.ndarray, quality: int, subsampling: str) -> bytes:
    from PIL import Image

    sub = {"444": 0, "422": 1, "420": 2}.get(subsampling, 2)
    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, "JPEG", quality=quality,
                                subsampling=sub)
    return buf.getvalue()
