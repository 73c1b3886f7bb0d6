"""ctypes loader for the native JPEG shim (builds on first use).

The shared object is compiled from native/csrc/jpeg_shim.cpp with the
system g++ against libjpeg and cached next to the source keyed by a hash
of the source text. pybind11 is not available in this environment; the
shim exposes a C ABI and numpy arrays cross via raw pointers.
"""

from __future__ import annotations

import ctypes
import functools as _functools
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "csrc", "jpeg_shim.cpp")

# Default max decoded frame: 4K RGB (3840*2160*3 ~ 24 MB)
MAX_FRAME_BYTES = 3840 * 2160 * 3
_DEFAULT_THREADS = min(16, os.cpu_count() or 4)


def _build() -> str:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = os.path.join(_HERE, "csrc", f"_jpeg_shim_{tag}.so")
    if os.path.isfile(out):
        return out
    # per-process temp name: concurrent first-use builds (e.g.
    # cluster_launch spawning N serve processes with a cold cache)
    # must not write the same .tmp — one process's os.replace would
    # publish a file another's compiler is still writing
    tmp = f"{out}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", tmp, "-ljpeg",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, out)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return out


class NativeJpeg:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.ic_jpeg_decode_rgb_scaled.restype = ctypes.c_int
        lib.ic_jpeg_decode_rgb_scaled.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.ic_jpeg_probe_scaled.restype = ctypes.c_int
        lib.ic_jpeg_probe_scaled.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.ic_jpeg_encode_rgb.restype = ctypes.c_int64
        lib.ic_jpeg_encode_rgb.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        lib.ic_jpeg_read_coefs.restype = ctypes.c_int
        lib.ic_jpeg_read_coefs.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ic_jpeg_decode_batch.restype = None
        lib.ic_jpeg_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
        ]
        lib.ic_jpeg_decode_ycbcr_scaled.restype = ctypes.c_int
        lib.ic_jpeg_decode_ycbcr_scaled.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ic_jpeg_quant_tables.restype = ctypes.c_int
        lib.ic_jpeg_quant_tables.argtypes = [
            ctypes.c_int32, ctypes.POINTER(ctypes.c_uint16),
        ]
        lib.ic_jpeg_write_coefs.restype = ctypes.c_int64
        lib.ic_jpeg_write_coefs.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int16),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        lib.ic_jpeg_decode_ycbcr_batch.restype = None
        lib.ic_jpeg_decode_ycbcr_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32,
        ]

    @staticmethod
    def _check_claimed_dims(w: int, h: int, slot: int | None = None,
                            limit: int = MAX_FRAME_BYTES) -> None:
        """Reject frames whose HEADER claims more than ``limit`` bytes.

        A 2 KB JPEG whose SOF marker claims 65500x65500 passes the 8 MiB
        wire cap (protocol.py) but would otherwise drive a ~12.9 GB
        allocation per batch slot — an OOM-kill a single crafted frame
        could inflict on the serving process. ValueError keeps the
        drop-not-die contract (serving/inferer.py treats it as a corrupt
        frame); the reference would die here (panic on decode,
        reference inferer.rs:35-36)."""
        if w * h * 3 > limit:
            where = "" if slot is None else f" in batch slot {slot}"
            raise ValueError(f"frame too large{where}: {w}x{h}")

    def probe(self, data: bytes, scale: int = 1) -> tuple[int, int]:
        w = ctypes.c_int32()
        h = ctypes.c_int32()
        rc = self._lib.ic_jpeg_probe_scaled(data, len(data),
                                            ctypes.byref(w),
                                            ctypes.byref(h), scale)
        if rc != 0:
            raise ValueError("corrupt JPEG (probe failed)")
        return w.value, h.value

    def decode_rgb(self, data: bytes, scale: int = 1) -> np.ndarray:
        w, h = self.probe(data, scale)
        self._check_claimed_dims(w, h)
        need = w * h * 3
        out = np.empty(need, np.uint8)
        ow = ctypes.c_int32()
        oh = ctypes.c_int32()
        rc = self._lib.ic_jpeg_decode_rgb_scaled(
            data, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), need,
            ctypes.byref(ow), ctypes.byref(oh), scale)
        if rc != 0:
            raise ValueError(f"corrupt JPEG (decode rc={rc})")
        return out.reshape(oh.value, ow.value, 3)

    def decode_batch(self, datas: list[bytes],
                     threads: int | None = None,
                     scale: int = 1) -> list[np.ndarray]:
        n = len(datas)
        if n == 0:
            return []
        # probe sizes first so each slot gets a right-sized buffer
        dims = [self.probe(d, scale) for d in datas]
        for i, (w, h) in enumerate(dims):
            self._check_claimed_dims(w, h, i)
        max_bytes = max(w * h * 3 for w, h in dims)
        bufs = np.empty((n, max_bytes), np.uint8)
        arr_p = (ctypes.c_char_p * n)(*datas)
        arr_l = (ctypes.c_int64 * n)(*[len(d) for d in datas])
        ow = (ctypes.c_int32 * n)()
        oh = (ctypes.c_int32 * n)()
        st = (ctypes.c_int32 * n)()
        self._lib.ic_jpeg_decode_batch(
            arr_p, arr_l, n,
            bufs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), max_bytes,
            ow, oh, st, threads or _DEFAULT_THREADS, scale)
        out = []
        for i in range(n):
            if st[i] != 0:
                raise ValueError(f"corrupt JPEG in batch slot {i}")
            w, h = ow[i], oh[i]
            out.append(bufs[i, :w * h * 3].reshape(h, w, 3).copy())
        return out

    def decode_ycbcr_batch(self, datas: list[bytes],
                           threads: int | None = None,
                           scale: int = 1):
        """Raw-plane batch decode: host entropy+IDCT only, packed planes.

        Returns ``(packed[B, n_bytes] uint8, geom)`` where each row is
        Y[y_ph][y_pw] ++ Cb[c_ph][c_pw] ++ Cr[c_ph][c_pw] (iMCU-padded
        plane dims) and ``geom = dict(width, height, y_pw, y_ph, c_pw,
        c_ph, sampling)``. The device half (ops/jpeg_device.py) does
        chroma upsampling + color conversion fused with detection —
        ~half the host->device bytes of RGB for 4:2:0 and ONE transfer
        for the whole batch. All frames must share geometry.
        """
        n = len(datas)
        if n == 0:
            raise ValueError("empty batch")
        # capacity bound: padded planes are at most (dim + 2 iMCU) wide.
        # The claimed-dims clamp is sized to THIS path's allocation
        # (packed planes, <= ~3 B/px scaffold), i.e. twice the RGB
        # budget — a 12 MP 4:2:0 frame that fit here before the clamp
        # still decodes, while a crafted 65500x65500 header is rejected.
        # EVERY slot is probed+clamped (like decode_batch): rejection
        # must be uniform Python-level, never left to the C shim's
        # per-slot capacity status with its different error message
        dims_py = [self.probe(d, scale) for d in datas]
        for i, (w, h) in enumerate(dims_py):
            self._check_claimed_dims(w, h, i, limit=2 * MAX_FRAME_BYTES)
        w0, h0 = dims_py[0]
        max_each = 3 * (w0 + 32) * (h0 + 32)
        bufs = np.empty((n, max_each), np.uint8)
        dims = (ctypes.c_int32 * (8 * n))()
        st = (ctypes.c_int32 * n)()
        arr_p = (ctypes.c_char_p * n)(*datas)
        arr_l = (ctypes.c_int64 * n)(*[len(d) for d in datas])
        self._lib.ic_jpeg_decode_ycbcr_batch(
            arr_p, arr_l, n,
            bufs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            max_each, dims, st, threads or _DEFAULT_THREADS, scale)
        geom0 = tuple(dims[0:8])
        for i in range(n):
            if st[i] != 0:
                raise ValueError(
                    f"YCbCr decode failed in batch slot {i} (rc={st[i]})")
            if tuple(dims[8 * i:8 * i + 8]) != geom0:
                raise ValueError("mixed JPEG geometries in batch")
        # note: on scaled 4:2:0 decodes the shim folds chroma back to
        # half resolution in place (libjpeg's IDCT scaling would
        # otherwise emit chroma at luma resolution and forfeit the 2x
        # transfer saving); dims already reflect the folded planes
        w, h, y_pw, y_ph, c_pw, c_ph, hs, vs = geom0
        used = y_pw * y_ph + 2 * c_pw * c_ph
        return bufs[:, :used], {
            "width": w, "height": h, "y_pw": y_pw, "y_ph": y_ph,
            "c_pw": c_pw, "c_ph": c_ph, "sampling": (hs, vs),
        }

    def read_coefficients(self, data: bytes):
        """Entropy-decode only: quantized DCT blocks + quant tables.

        Returns (y[bh,bw,64] i16, cb, cr, quant[3,64] u16,
        (width, height), (h_samp, v_samp)). The device half
        (ops/jpeg_device.py) turns these into RGB on the TPU.
        """
        # generous initial bound: blocks for a frame up to 4K
        max_each = (3840 // 8 + 2) * (2160 // 8 + 2) * 64
        y = np.empty(max_each, np.int16)
        cb = np.empty(max_each, np.int16)
        cr = np.empty(max_each, np.int16)
        quant = np.empty(3 * 64, np.uint16)
        dims = (ctypes.c_int32 * 8)()
        rc = self._lib.ic_jpeg_read_coefs(
            data, len(data),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            cb.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            cr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            max_each,
            quant.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            dims)
        if rc == -3:
            raise ValueError("unsupported JPEG layout for coefficient "
                             "export (need 3-component YCbCr 4:2:0/4:2:2/4:4:4)")
        if rc != 0:
            raise ValueError(f"corrupt JPEG (coef rc={rc})")
        w, h, ybw, ybh, cbw, cbh, hs, vs = (dims[i] for i in range(8))
        return (
            y[:ybh * ybw * 64].reshape(ybh, ybw, 64).copy(),
            cb[:cbh * cbw * 64].reshape(cbh, cbw, 64).copy(),
            cr[:cbh * cbw * 64].reshape(cbh, cbw, 64).copy(),
            quant.reshape(3, 64).copy(),
            (w, h), (hs, vs),
        )

    def quant_tables(self, quality: int) -> np.ndarray:
        """[2, 64] uint16 quant tables (luma, chroma) in natural order —
        exactly what libjpeg would use at this quality (baseline). The
        device encode tail quantizes with these so the entropy encoder
        can embed them verbatim."""
        out = np.empty(2 * 64, np.uint16)
        rc = self._lib.ic_jpeg_quant_tables(
            quality, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
        if rc != 0:
            raise ValueError(f"quant table export failed (rc={rc})")
        return out.reshape(2, 64)

    def encode_coefs(self, y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                     wh: tuple[int, int], sampling: tuple[int, int],
                     quant: np.ndarray) -> bytes:
        """Entropy-encode pre-quantized DCT blocks into a baseline JPEG.

        ``y/cb/cr``: [bh, bw, 64] int16 natural-order blocks (iMCU-padded
        dims accepted — the device FDCT tail emits exactly these);
        ``quant``: [2, 64] natural-order tables (see quant_tables). This
        is the ONLY host compute on the annotated output path — the
        encode mirror of decode_ycbcr_batch's entropy+IDCT split.
        """
        w, h = wh
        hs, vs = sampling
        y = np.ascontiguousarray(y, np.int16)
        cb = np.ascontiguousarray(cb, np.int16)
        cr = np.ascontiguousarray(cr, np.int16)
        quant = np.ascontiguousarray(quant, np.uint16)
        def p16(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))

        # worst-case baseline Huffman output can exceed 3 B/px (dense
        # high-frequency coefficients + byte stuffing, bounded by ~5
        # B/px at 4:2:0); grow on -2 instead of failing the frame
        cap = w * h * 3 + (1 << 16)
        for _ in range(3):
            out = np.empty(cap, np.uint8)
            n = self._lib.ic_jpeg_write_coefs(
                p16(y), p16(cb), p16(cr),
                y.shape[1], y.shape[0], cb.shape[1], cb.shape[0],
                w, h, hs, vs,
                quant.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                cap)
            if n == -2:
                cap *= 4
                continue
            break
        if n < 0:
            raise ValueError(f"coefficient JPEG encode failed (rc={n})")
        return out[:n].tobytes()

    def encode_rgb(self, frame: np.ndarray, quality: int = 95,
                   subsampling: str = "420") -> bytes:
        frame = np.ascontiguousarray(frame, np.uint8)
        h, w, c = frame.shape
        assert c == 3
        sub = {"444": 0, "422": 1, "420": 2}[subsampling]
        cap = w * h * 3 + (1 << 16)
        for _ in range(3):
            out = np.empty(cap, np.uint8)
            n = self._lib.ic_jpeg_encode_rgb(
                frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                w, h, quality, sub,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                cap)
            if n == -2:  # worst-case Huffman output outgrew the buffer
                cap *= 4
                continue
            break
        if n < 0:
            raise ValueError(f"JPEG encode failed (rc={n})")
        return out[:n].tobytes()


_instance: NativeJpeg | None = None
_lock = threading.Lock()


def load() -> NativeJpeg:
    """Build (once) and load the shim; raises on any toolchain failure."""
    global _instance
    with _lock:
        if _instance is None:
            path = _build()
            _instance = NativeJpeg(ctypes.CDLL(path))
        return _instance


@_functools.lru_cache(maxsize=16)
def quant_tables_cached(quality: int) -> np.ndarray:
    """Process-wide cached [2, 64] encode quant tables (see
    NativeJpeg.quant_tables) — the single host-side cache the serving
    publish path and the device-program wrappers both use."""
    return load().quant_tables(quality)
