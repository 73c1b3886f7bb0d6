"""Device-side JPEG decode tail: dequant + IDCT + upsample + color.

BASELINE config 4 calls for "decode+preprocess+CNN+NMS in one XLA
program, zero host roundtrips". Full Huffman entropy decoding is
inherently serial/bit-granular and stays on the host (the C++ shim's
``ic_jpeg_read_coefs`` exports quantized DCT blocks); everything after it
runs on the TPU, fused with detection:

- dequantization: ``coef * quant`` (elementwise, VPU);
- the 8x8 inverse DCT as two small matmuls per block — batched over all
  blocks of all images, this is MXU work: ``P = A @ (C*Q) @ A^T`` with
  the orthonormal DCT-III basis A;
- block reassembly into planes (reshape/transpose, layout-only);
- 4:2:0 chroma upsampling with the triangle filter (equivalent to
  libjpeg's "fancy" h2v2 upsampling incl. edge replication) expressed as
  the same resize-matrix matmuls as ops/preprocess.py;
- BT.601 full-range YCbCr -> RGB (libjpeg's constants).

Numerics: libjpeg's fixed-point IDCT and our float IDCT agree to within
~1-2 u8 steps; tests gate the reconstruction and detection-level parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from infercam_onnx_tpu.ops.preprocess import triangle_resize_matrix


def idct_basis() -> np.ndarray:
    """A[8,8] with pixel = A @ coef @ A^T (orthonormal DCT-III)."""
    a = np.zeros((8, 8), np.float64)
    for x in range(8):
        for u in range(8):
            cu = np.sqrt(0.5) if u == 0 else 1.0
            a[x, u] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return a.astype(np.float32)


_IDCT_A = idct_basis()


def decode_plane(coefs: jax.Array, quant: jax.Array) -> jax.Array:
    """[B, bh, bw, 64] int16 + [B, 64] quant -> [B, bh*8, bw*8] f32
    samples (level-shifted to 0..255 range, unclamped)."""
    b, bh, bw, _ = coefs.shape
    c = (coefs.astype(jnp.float32)
         * quant.astype(jnp.float32)[:, None, None, :])
    c = c.reshape(b, bh, bw, 8, 8)
    a = jnp.asarray(_IDCT_A)
    # pixels = A @ C @ A^T for every block, batched on the MXU
    p = jnp.einsum("xu,nhwuv,yv->nhwxy", a, c, a,
                   preferred_element_type=jnp.float32)
    # [B, bh, bw, 8, 8] -> [B, bh*8, bw*8]
    p = p.transpose(0, 1, 3, 2, 4).reshape(b, bh * 8, bw * 8)
    return p + 128.0


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "sampling"))
def decode_rgb_device(
    y_coefs: jax.Array,  # [B, ybh, ybw, 64] int16
    cb_coefs: jax.Array,  # [B, cbh, cbw, 64] int16
    cr_coefs: jax.Array,
    quant: jax.Array,  # [B, 3, 64] uint16/float
    *,
    width: int,
    height: int,
    sampling: tuple[int, int] = (2, 2),
) -> jax.Array:
    """Coefficient blocks -> [B, height, width, 3] float32 RGB (0..255,
    rounded to the u8 grid like a host decode would produce)."""
    y = decode_plane(y_coefs, quant[:, 0])
    cb = decode_plane(cb_coefs, quant[:, 1])
    cr = decode_plane(cr_coefs, quant[:, 2])
    return combine_ycbcr(y, cb, cr, width=width, height=height,
                         sampling=sampling)


def combine_ycbcr(y: jax.Array, cb: jax.Array, cr: jax.Array, *,
                  width: int, height: int,
                  sampling: tuple[int, int]) -> jax.Array:
    """[B, h, w] float planes (0..255, chroma at subsampled res) ->
    [B, height, width, 3] RGB on the u8 grid. ``sampling``: luma
    (h, v) factors — (2, 2) = 4:2:0, (2, 1) = 4:2:2 (what UVC webcams
    typically emit), (1, 1) = 4:4:4. Chroma upsampling uses the
    triangle-filter matrices (equivalent to libjpeg's fancy
    upsampling incl. edge replication) as MXU matmuls; BT.601 full-range
    constants match libjpeg jdcolor."""
    hs, vs = sampling
    y = y[:, :height, :width]
    if hs == 2 or vs == 2:
        ch = (height + vs - 1) // vs
        cw = (width + hs - 1) // hs
        chroma = [c[:, :ch, :cw] for c in (cb, cr)]
        if vs == 2:
            up_h = jnp.asarray(triangle_resize_matrix(ch, ch * 2))
            chroma = [jnp.einsum("oH,bHW->boW", up_h, c)
                      for c in chroma]
        if hs == 2:
            up_w = jnp.asarray(triangle_resize_matrix(cw, cw * 2))
            chroma = [jnp.einsum("oW,bhW->bho", up_w, c)
                      for c in chroma]
        cb, cr = chroma
    cb = cb[:, :height, :width] - 128.0
    cr = cr[:, :height, :width] - 128.0

    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0.0, 255.0)


def unpack_ycbcr_planes(packed: jax.Array, *, y_pw: int, y_ph: int,
                        c_pw: int, c_ph: int):
    """[B, n] packed uint8 (native decode_ycbcr_batch layout) -> float
    (y, cb, cr) planes. One packed array = ONE host->device transfer."""
    b = packed.shape[0]
    ysz = y_pw * y_ph
    csz = c_pw * c_ph
    y = packed[:, :ysz].reshape(b, y_ph, y_pw).astype(jnp.float32)
    cb = packed[:, ysz:ysz + csz].reshape(
        b, c_ph, c_pw).astype(jnp.float32)
    cr = packed[:, ysz + csz:ysz + 2 * csz].reshape(
        b, c_ph, c_pw).astype(jnp.float32)
    return y, cb, cr


def read_coefficient_batch(datas: list[bytes]):
    """Host half: entropy-decode a batch of same-geometry JPEGs.

    Returns (y[B,...], cb[B,...], cr[B,...], quant[B,3,64],
    (width, height), (h_samp, v_samp)). The sampling factors (2, 2) =
    4:2:0 or (1, 1) = 4:4:4 must be passed through to the device decode
    so chroma upsampling matches the actual stream. Raises ValueError on
    corrupt/unsupported input or mixed geometries/samplings.
    """
    from infercam_onnx_tpu.native import jpeg as native_jpeg

    if not datas:
        raise ValueError("empty JPEG batch")
    n = native_jpeg.load()
    ys, cbs, crs, quants = [], [], [], []
    geom = None
    for d in datas:
        y, cb, cr, quant, (w, h), (hs, vs) = n.read_coefficients(d)
        if geom is None:
            geom = (w, h, y.shape, cb.shape, hs, vs)
        elif geom != (w, h, y.shape, cb.shape, hs, vs):
            raise ValueError("mixed JPEG geometries in batch")
        ys.append(y)
        cbs.append(cb)
        crs.append(cr)
        quants.append(quant)
    return (np.stack(ys), np.stack(cbs), np.stack(crs),
            np.stack(quants), (geom[0], geom[1]), (geom[4], geom[5]))
