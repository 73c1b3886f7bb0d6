"""Device-side annotated-JPEG encode tail: overlay + FDCT + quantize.

The reference annotates frames on the host (green hollow rectangles and
a confidence label, reference infer_server/src/inferer.rs:57-101) and
re-encodes with turbojpeg (reference inferer.rs:39). Here the whole
annotated-output path after entropy coding runs ON the TPU, fused with
detection:

- detection boxes are rendered directly into the YCbCr planes as hollow
  rectangles via two small matmuls per plane (row-edge x col-span +
  row-span x col-edge masks over the detection axis — MXU work, no
  scatter);
- confidence labels ("{:.2f}%" in 16 px DejaVu Sans Mono, the
  reference's face/size) are stamped from a pre-rendered glyph-atlas
  with per-detection dynamic-slice updates, alpha-blended like PIL's
  antialiased text;
- the forward 8x8 DCT runs as two matmuls per block (the exact mirror
  of ops/jpeg_device.py's IDCT tail) followed by quantization with
  libjpeg's exact tables for the configured quality;
- the host then performs entropy (Huffman) coding ONLY
  (native ic_jpeg_write_coefs) — the encode mirror of the decode
  split, so /face_stream viewers ride the packed-plane transfer in
  BOTH directions.

Documented divergences from the host (PIL) path: a label whose leading
digits are blank keeps the text left-anchored at the box corner (same as
PIL); labels that would overflow the frame edge are shifted fully inside
(PIL clips them); glyph antialiasing matches PIL's alpha compositing to
within a few u8 steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from infercam_onnx_tpu.ops.jpeg_device import _IDCT_A

# JPEG subsampling name -> (h_samp, v_samp) chroma factors; the ONE
# place this mapping lives (detector, sharded/lockstep/graph annotate
# paths, and the serving worker all import it).
SUBSAMPLING_FACTORS = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}

# BT.601 full-range YCbCr for pure green Rgb(0,255,0) (libjpeg jccolor
# constants; reference inferer.rs:62 draws Rgb([0, 255, 0])).
GREEN_Y = 0.587 * 255.0
GREEN_CB = 128.0 - 0.331264 * 255.0
GREEN_CR = 128.0 - 0.418688 * 255.0

_DOT, _PCT, _BLANK = 10, 11, 12


@functools.lru_cache(maxsize=1)
def glyph_atlas() -> tuple[np.ndarray, int, int]:
    """([13, gh, gw] float32 alpha in 0..1, gh, gw) for "0123456789.%"
    plus a blank cell, rendered with the same font object the host draw
    path uses (16 px DejaVu Sans Mono, draw.py). Cell dims are padded to
    even so 4:2:0 chroma stamps subsample cleanly."""
    from PIL import Image, ImageDraw

    from infercam_onnx_tpu.draw import FONT_SIZE, _font

    font = _font()
    chars = "0123456789.%"
    try:
        gw = int(np.ceil(font.getlength("0")))
        ascent, descent = font.getmetrics()
        gh = ascent + descent
    except AttributeError:  # bitmap fallback font
        left, top, right, bottom = font.getbbox("0")
        gw, gh = right - left, bottom + 2
    gh = max(gh, FONT_SIZE)
    gh += gh % 2
    gw += gw % 2
    atlas = np.zeros((13, gh, gw), np.float32)
    for i, ch in enumerate(chars):
        img = Image.new("L", (gw, gh), 0)
        ImageDraw.Draw(img).text((0, 0), ch, fill=255, font=font)
        atlas[i] = np.asarray(img, np.float32) / 255.0
    return atlas, gh, gw


def _label_indices(conf: jax.Array) -> jax.Array:
    """[...,] confidence -> [..., 7] glyph indices for "{:.2f}%" of
    confidence*100, left-aligned (blank-padded on the right), matching
    Python's format for values >= 1%. Rounding is half-UP: Python
    formats the float64 expansion of the score, which sits above the
    decimal tie for typical values (e.g. 0.12345 -> "12.35%"), while
    jnp.round's half-even would show "12.34%"; exact-tie float32
    products can still differ from the host label by 0.01 — cosmetic,
    and only on the last digit."""
    v = jnp.floor(conf * 10000.0 + 0.5).astype(jnp.int32)  # pct * 100
    hund = v // 10000
    tens = (v // 1000) % 10
    unit = (v // 100) % 10
    tenth = (v // 10) % 10
    hundredth = v % 10
    blank = jnp.full_like(v, _BLANK)
    dot = jnp.full_like(v, _DOT)
    pct = jnp.full_like(v, _PCT)
    # three layouts: "100.00%", "99.99%", "9.99%"
    a = jnp.stack([hund, tens, unit, dot, tenth, hundredth, pct], -1)
    b = jnp.stack([tens, unit, dot, tenth, hundredth, pct, blank], -1)
    c = jnp.stack([unit, dot, tenth, hundredth, pct, blank, blank], -1)
    out = jnp.where(hund[..., None] > 0, a,
                    jnp.where(tens[..., None] > 0, b, c))
    return out


def _label_strips(conf: jax.Array) -> jax.Array:
    """[B, D] confidences -> [B, D, gh, 7*gw] float alpha strips."""
    atlas, gh, gw = glyph_atlas()
    idx = _label_indices(conf)  # [B, D, 7]
    strips = jnp.asarray(atlas)[idx]  # [B, D, 7, gh, gw]
    b, d = conf.shape
    return strips.transpose(0, 1, 3, 2, 4).reshape(b, d, gh, 7 * gw)


def _border_mask(x0, y0, x1, y1, valid, ph: int, pw: int,
                 exists=None) -> jax.Array:
    """Hollow-rectangle mask [B, ph, pw] from per-detection corner
    coords [B, D] (inclusive), as two matmuls over the detection axis.

    ``exists``: optional (top, bottom, left, right) [B, D] flags — an
    edge whose true coordinate fell outside the frame is suppressed
    (PIL draws only the in-frame parts of a clipped rectangle)."""
    rows = jnp.arange(ph, dtype=jnp.float32)[None, :, None]  # [1,H,1]
    cols = jnp.arange(pw, dtype=jnp.float32)[None, :, None]
    y0e, y1e = y0[:, None, :], y1[:, None, :]
    x0e, x1e = x0[:, None, :], x1[:, None, :]
    v = valid[:, None, :]
    if exists is None:
        top = bot = left = right = jnp.ones_like(valid)
    else:
        top, bot, left, right = exists
    in_r = ((rows >= y0e) & (rows <= y1e)).astype(jnp.float32) * v
    edge_r = ((rows == y0e).astype(jnp.float32) * top[:, None, :]
              + (rows == y1e).astype(jnp.float32) * bot[:, None, :]) * v
    in_c = ((cols >= x0e) & (cols <= x1e)).astype(jnp.float32)
    edge_c = ((cols == x0e).astype(jnp.float32) * left[:, None, :]
              + (cols == x1e).astype(jnp.float32) * right[:, None, :])
    border = (jnp.einsum("bhd,bwd->bhw", edge_r, in_c,
                         preferred_element_type=jnp.float32)
              + jnp.einsum("bhd,bwd->bhw", in_r, edge_c,
                           preferred_element_type=jnp.float32))
    return border > 0.0


def _stamp_labels(plane: jax.Array, xs: jax.Array, ys: jax.Array,
                  strips: jax.Array, value: float) -> jax.Array:
    """Alpha-blend label strips into [B, ph, pw] planes at per-detection
    (ys, xs) (already validity-gated via zeroed strips and clamped
    in-bounds by the caller).

    Rendered as MXU matmuls, not scatters: translating a strip to
    (y, x) is a pair of one-hot shift matrices, so the composited label
    layer is one batched einsum chain over the detection axis —
    replacing the earlier per-detection dynamic_update_slice loop
    (B x D serial scatters), which dominated the fused annotated
    program's device time (~17 ms of 21 ms per batch-16 on a v5e).
    Overlapping labels compose by saturating-ADD of alpha rather than
    PIL's draw-order overwrite (visible only when labels overlap)."""
    gh, sw = strips.shape[2], strips.shape[3]
    if gh > plane.shape[1] or sw > plane.shape[2]:
        # frame smaller than one label — skip text (PIL would render a
        # clipped fragment; documented divergence for tiny frames)
        return plane, jnp.zeros(plane.shape, jnp.float32)
    h, w = plane.shape[1], plane.shape[2]
    rows = jnp.arange(h, dtype=jnp.int32)
    cols = jnp.arange(w, dtype=jnp.int32)
    # one-hot shifts: sy[b,d,h,g] = (h == ys[b,d] + g), sx likewise
    sy = (rows[None, None, :, None] - ys[:, :, None, None]
          == jnp.arange(gh, dtype=jnp.int32)[None, None, None, :]
          ).astype(jnp.float32)
    sx = (cols[None, None, None, :] - xs[:, :, None, None]
          == jnp.arange(sw, dtype=jnp.int32)[None, None, :, None]
          ).astype(jnp.float32)
    t = jnp.einsum("bdhg,bdgs->bdhs", sy,
                   strips.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    layer = jnp.einsum("bdhs,bdsw->bhw", t, sx,
                       preferred_element_type=jnp.float32)
    layer = jnp.clip(layer, 0.0, 1.0)
    return plane * (1.0 - layer) + value * layer, layer


def render_overlay_ycbcr(
    y: jax.Array,  # [B, y_ph, y_pw] float (0..255)
    cb: jax.Array,  # [B, c_ph, c_pw]
    cr: jax.Array,
    packed_det: jax.Array,  # [B, D, 6] (x0, y0, x1, y1, conf, valid)
    *,
    width: int,
    height: int,
    sampling: tuple[int, int],
    disp_dims: tuple[int, int] | None = None,
    return_masks: bool = False,
) -> tuple[jax.Array, ...]:
    """Draw the reference's annotation (hollow green rects + confidence
    labels, reference inferer.rs:57-101) into YCbCr planes on-device.

    ``disp_dims`` mirrors ServerConfig.assume_frame_dims: relative
    coords scale by these instead of the true frame dims when set
    (the reference hard-codes 1280x720, reference router.rs:66-67).
    ``return_masks`` additionally returns boolean TOUCHED masks for the
    luma and chroma planes — what the splice transcode path uses to
    ship only overlay-modified blocks back to the host.
    """
    hs, vs = sampling
    dw, dh = disp_dims if disp_dims is not None else (width, height)
    boxes = packed_det[..., :4]
    conf = packed_det[..., 4]
    valid = packed_det[..., 5]

    # pixel corners exactly like the host path (draw.py:62-66):
    # int() truncation, rectangle spans [x_tl, x_br - 1] inclusive
    x0 = jnp.floor(boxes[..., 0] * dw)
    y0 = jnp.floor(boxes[..., 1] * dh)
    x1 = jnp.floor(boxes[..., 2] * dw) - 1.0
    y1 = jnp.floor(boxes[..., 3] * dh) - 1.0
    # boxes entirely outside the visible frame draw NOTHING (PIL culls
    # off-canvas coords; without this, clipping would collapse them
    # into phantom 1-px edge lines) — can happen when assume_frame_dims
    # rescales coords beyond the decoded frame
    offscreen = ((x0 > width - 1.0) | (x1 < 0.0)
                 | (y0 > height - 1.0) | (y1 < 0.0))
    valid = valid * (1.0 - offscreen.astype(valid.dtype))
    # partially-clipped rectangles keep only their in-frame edges
    exists = tuple(f.astype(jnp.float32) for f in (
        y0 >= 0.0, y1 <= height - 1.0,  # top, bottom
        x0 >= 0.0, x1 <= width - 1.0))  # left, right
    # clip to the true image (the padded plane region must stay
    # untouched; PIL clips the same way)
    x0 = jnp.clip(x0, 0.0, width - 1.0)
    x1 = jnp.clip(x1, 0.0, width - 1.0)
    y0 = jnp.clip(y0, 0.0, height - 1.0)
    y1 = jnp.clip(y1, 0.0, height - 1.0)

    yb = _border_mask(x0, y0, x1, y1, valid, y.shape[1], y.shape[2],
                      exists)
    y = jnp.where(yb, GREEN_Y, y)
    cbb = _border_mask(jnp.floor(x0 / hs), jnp.floor(y0 / vs),
                       jnp.floor(x1 / hs), jnp.floor(y1 / vs),
                       valid, cb.shape[1], cb.shape[2], exists)
    # subsampled chroma of a 1-px line averages ~50% line / 50%
    # background in the host encoder's box downsampling — blend the
    # same way so the border's color saturation matches
    ca = 1.0 if (hs == 1 and vs == 1) else 0.5
    cb = jnp.where(cbb, ca * GREEN_CB + (1 - ca) * cb, cb)
    cr = jnp.where(cbb, ca * GREEN_CR + (1 - ca) * cr, cr)

    # labels: 16px mono "{conf*100:.2f}%" at the box top-left corner
    strips = _label_strips(conf) * valid[..., None, None]
    _, gh, sw = strips.shape[1], strips.shape[2], strips.shape[3]
    # map display coords onto the stored plane grid; shift fully inside
    # the VISIBLE frame so dynamic_slice never clamps asymmetrically
    # and edge labels never land in the invisible iMCU padding — which
    # viewers would never see, and which would burn splice block
    # budget on blocks that never display (divergence: PIL clips
    # edge-overflowing labels instead)
    lx = jnp.clip(x0, 0.0, max(min(width, y.shape[2]) - sw, 0)
                  ).astype(jnp.int32)
    ly = jnp.clip(y0, 0.0, max(min(height, y.shape[1]) - gh, 0)
                  ).astype(jnp.int32)
    y, ylab = _stamp_labels(y, lx, ly, strips, GREEN_Y)
    if hs == 2 or vs == 2:
        b, d = strips.shape[0], strips.shape[1]
        cstrips = strips.reshape(
            b, d, gh // vs, vs, sw // hs, hs).mean(axis=(3, 5))
        cw, chh = -(-width // hs), -(-height // vs)
        clx = jnp.clip(lx // hs, 0,
                       max(min(cw, cb.shape[2]) - sw // hs, 0))
        cly = jnp.clip(ly // vs, 0,
                       max(min(chh, cb.shape[1]) - gh // vs, 0))
        cb, clab = _stamp_labels(cb, clx, cly, cstrips, GREEN_CB)
        cr, _ = _stamp_labels(cr, clx, cly, cstrips, GREEN_CR)
    else:
        cb, clab = _stamp_labels(cb, lx, ly, strips, GREEN_CB)
        cr, _ = _stamp_labels(cr, lx, ly, strips, GREEN_CR)
    if not return_masks:
        return y, cb, cr
    my = yb | (ylab > 0.0)
    mc = cbb | (clab > 0.0)
    return y, cb, cr, my, mc


def fdct_quant(plane: jax.Array, qtable: jax.Array) -> jax.Array:
    """[B, ph, pw] float samples (0..255) + [64] quant -> [B, bh, bw, 64]
    int16 quantized DCT blocks (natural order) — the forward mirror of
    ops/jpeg_device.py decode_plane, batched over all blocks on the MXU.
    Plane dims must be multiples of 8 (iMCU-padded decode output is).

    Value range: the orthonormal 2D DCT of level-shifted samples in
    [-128, 127] is bounded by |c| <= 1024, and quant divisors are >= 1,
    so every quantized coefficient fits in 12 signed bits — which is
    what lets pack12 ship them at 1.5 B each."""
    b, ph, pw = plane.shape
    bh, bw = ph // 8, pw // 8
    p = (plane.reshape(b, bh, 8, bw, 8).transpose(0, 1, 3, 2, 4)
         - 128.0)
    a = jnp.asarray(_IDCT_A)
    # C = A^T P A (A orthonormal; decode is P = A C A^T)
    c = jnp.einsum("xu,nhwxy,yv->nhwuv", a, p, a,
                   preferred_element_type=jnp.float32)
    q = qtable.astype(jnp.float32)
    if q.ndim == 2:  # per-frame tables (splice path: input quant)
        q = q[:, None, None, :]
    c = c.reshape(b, bh, bw, 64) / q
    return jnp.clip(jnp.round(c), -2047.0, 2047.0).astype(jnp.int16)


def pack12(coefs: jax.Array) -> jax.Array:
    """[B, N] int16 quantized coefficients (N even, |v| <= 2047) ->
    [B, N*3//2] uint8: two 12-bit values per 3 bytes. Cuts the
    device->host coefficient transfer from 2 B to 1.5 B per
    coefficient — on transfer-bound links the annotated path's D2H is
    the dominant extra cost over detection-only serving."""
    v = (coefs.astype(jnp.int32) + 2048).astype(jnp.uint32)
    a, bb = v[:, 0::2], v[:, 1::2]
    b0 = a & 0xFF
    b1 = ((a >> 8) & 0x0F) | ((bb & 0x0F) << 4)
    b2 = (bb >> 4) & 0xFF
    n = coefs.shape[0]
    return (jnp.stack([b0, b1, b2], axis=-1)
            .reshape(n, -1).astype(jnp.uint8))


def unpack12(data: np.ndarray) -> np.ndarray:
    """Host-side inverse of pack12 for ONE frame: [M] uint8 ->
    [M*2//3] int16 (vectorized numpy; runs on the publish path)."""
    t = np.asarray(data, np.uint8).reshape(-1, 3).astype(np.int32)
    a = (t[:, 0] | ((t[:, 1] & 0x0F) << 8)) - 2048
    b = (((t[:, 1] >> 4) & 0x0F) | (t[:, 2] << 4)) - 2048
    out = np.empty(t.shape[0] * 2, np.int16)
    out[0::2] = a
    out[1::2] = b
    return out


def pack12_np(coefs: np.ndarray) -> np.ndarray:
    """Host-side pack12 (numpy): [B, N] int16 -> [B, N*3//2] uint8 —
    used to ship entropy-decoded coefficients UP the link at 1.5 B
    each on the splice-annotate path (values clamp to the 12-bit JPEG
    range; well-formed baseline streams never exceed it)."""
    v = (np.clip(np.asarray(coefs, np.int32), -2047, 2047)
         + 2048).astype(np.uint32)
    a, b = v[:, 0::2], v[:, 1::2]
    out = np.empty((v.shape[0], v.shape[1] // 2, 3), np.uint8)
    out[..., 0] = a & 0xFF
    out[..., 1] = ((a >> 8) & 0x0F) | ((b & 0x0F) << 4)
    out[..., 2] = (b >> 4) & 0xFF
    return out.reshape(v.shape[0], -1)


def unpack12_device(packed: jax.Array) -> jax.Array:
    """Device-side inverse of pack12_np: [B, M] uint8 -> [B, M*2//3]
    int16 (bit ops on the VPU, fused with the decode tail)."""
    b = packed.shape[0]
    t = packed.reshape(b, -1, 3).astype(jnp.int32)
    lo = (t[..., 0] | ((t[..., 1] & 0x0F) << 8)) - 2048
    hi = (((t[..., 1] >> 4) & 0x0F) | (t[..., 2] << 4)) - 2048
    return jnp.stack([lo, hi], axis=-1).reshape(b, -1).astype(jnp.int16)


def block_touch_mask(mask_plane: jax.Array) -> jax.Array:
    """[B, ph, pw] boolean pixel mask -> [B, bh*bw] boolean 8x8-block
    mask (a block is 'touched' if ANY of its pixels is)."""
    m = _pad8(mask_plane.astype(jnp.float32))
    b, ph, pw = m.shape
    return (m.reshape(b, ph // 8, 8, pw // 8, 8).max(axis=(2, 4))
            > 0.0).reshape(b, -1)


def select_changed_blocks(yq: jax.Array, cbq: jax.Array, crq: jax.Array,
                          my: jax.Array, mc: jax.Array,
                          k: int) -> tuple[jax.Array, jax.Array]:
    """The splice-transcode selection: of the re-quantized blocks, ship
    only those the overlay touched — everything else stays bit-exact in
    the host's original entropy-decoded coefficients (no generational
    loss outside the drawn regions, and a ~10-20x smaller D2H than the
    full coefficient array).

    Returns (pack12 blocks [B, K*64*3//2] uint8,
    meta int32 [B, K+1] = [n_touched, idx_0..idx_{K-1}]) where idx is
    the block's position in the concatenated (y ++ cb ++ cr) flat block
    space, or -1 for unused slots. n_touched > K means the static
    budget overflowed — the caller falls back to a full-frame path."""
    b = yq.shape[0]
    all_q = jnp.concatenate(
        [yq.reshape(b, -1, 64), cbq.reshape(b, -1, 64),
         crq.reshape(b, -1, 64)], axis=1)
    bm = jnp.concatenate(
        [block_touch_mask(my), block_touch_mask(mc),
         block_touch_mask(mc)], axis=1)  # [B, NB]
    nb = bm.shape[1]
    k = min(k, nb)
    # top_k over touched-first scores; the index penalty makes the
    # selection deterministic and ordered
    score = (bm.astype(jnp.float32) * 2.0
             - jnp.arange(nb, dtype=jnp.float32) / nb)
    _, idx = jax.lax.top_k(score, k)
    sel = jnp.take_along_axis(all_q, idx[..., None], axis=1)
    chosen = jnp.take_along_axis(bm, idx, axis=1)
    idx = jnp.where(chosen, idx, -1)
    count = bm.sum(axis=1).astype(jnp.int32)
    meta = jnp.concatenate([count[:, None], idx], axis=1)
    return pack12(sel.reshape(b, -1)), meta.astype(jnp.int32)


def splice_blocks(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                  meta: np.ndarray, blocks_packed: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host half of the splice path for ONE frame: scatter the device's
    touched blocks into copies of the ORIGINAL entropy-decoded block
    arrays ([bh, bw, 64] int16 each). Returns the spliced (y, cb, cr).
    The caller must have checked meta[0] <= K (no overflow)."""
    idx = np.asarray(meta[1:], np.int64)
    coefs = unpack12(blocks_packed).reshape(idx.shape[0], 64)
    flat = np.concatenate(
        [y.reshape(-1, 64), cb.reshape(-1, 64), cr.reshape(-1, 64)])
    out = flat.copy()
    valid = idx >= 0
    out[idx[valid]] = coefs[valid]
    y_n, c_n = y.shape[0] * y.shape[1], cb.shape[0] * cb.shape[1]
    return (out[:y_n].reshape(y.shape),
            out[y_n:y_n + c_n].reshape(cb.shape),
            out[y_n + c_n:].reshape(cr.shape))


def _pad8(plane: jax.Array) -> jax.Array:
    """Edge-replicate a [B, h, w] plane up to 8-multiples (scaled
    decodes can fold chroma to non-block-aligned dims)."""
    _, h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        plane = jnp.pad(plane, ((0, 0), (0, ph), (0, pw)), mode="edge")
    return plane


def encode_planes(y: jax.Array, cb: jax.Array, cr: jax.Array,
                  quant2: jax.Array) -> jax.Array:
    """Quantize all three planes and pack them into ONE 12-bit-packed
    uint8 array [B, (y_blocks + 2*c_blocks) * 64 * 3 // 2] — a single
    1.5 B/coefficient device->host transfer per batch; the host
    entropy encoder slices it back apart (split_coefs / native
    jpeg.py encode_coefs / serving inferer). Non-8-aligned plane dims
    are edge-padded first (split_coefs mirrors this)."""
    b = y.shape[0]
    yq = fdct_quant(_pad8(y), quant2[0])
    cbq = fdct_quant(_pad8(cb), quant2[1])
    crq = fdct_quant(_pad8(cr), quant2[1])
    coefs = jnp.concatenate(
        [yq.reshape(b, -1), cbq.reshape(b, -1), crq.reshape(b, -1)],
        axis=1)
    return pack12(coefs)


def rgb_to_ycbcr_planes(
    rgb: jax.Array,  # [B, H, W, 3] float/uint8 (0..255)
    *,
    sampling: tuple[int, int],
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """RGB frames -> (y, cb, cr) planes with iMCU padding (edge
    replication) and box-average chroma subsampling — the device-side
    equivalent of libjpeg's color conversion + h2v2 downsampling, so
    the pixels decode path can also ride the device encode tail."""
    hs, vs = sampling
    b, h, w, _ = rgb.shape
    rgb = rgb.astype(jnp.float32)
    r, g, bch = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * bch
    cb = -0.168736 * r - 0.331264 * g + 0.5 * bch + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * bch + 128.0

    mcu_w, mcu_h = 8 * hs, 8 * vs
    y_pw = -(-w // mcu_w) * mcu_w
    y_ph = -(-h // mcu_h) * mcu_h

    def pad(p, pw, ph):
        return jnp.pad(p, ((0, 0), (0, ph - p.shape[1]),
                           (0, pw - p.shape[2])), mode="edge")

    y = pad(y, y_pw, y_ph)
    cb = pad(cb, y_pw, y_ph)
    cr = pad(cr, y_pw, y_ph)
    if hs == 2 or vs == 2:
        c_pw, c_ph = y_pw // hs, y_ph // vs

        def down(p):
            return p.reshape(b, c_ph, vs, c_pw, hs).mean(axis=(2, 4))

        cb, cr = down(cb), down(cr)
    return y, cb, cr


def plane_geometry(width: int, height: int,
                   sampling: tuple[int, int]) -> dict:
    """The ycbcr-geom dict rgb_to_ycbcr_planes' output corresponds to
    (same keys as native decode_ycbcr_batch)."""
    hs, vs = sampling
    mcu_w, mcu_h = 8 * hs, 8 * vs
    y_pw = -(-width // mcu_w) * mcu_w
    y_ph = -(-height // mcu_h) * mcu_h
    return {"width": width, "height": height, "y_pw": y_pw,
            "y_ph": y_ph, "c_pw": y_pw // hs, "c_ph": y_ph // vs,
            "sampling": (hs, vs)}


def split_coefs(packed: np.ndarray, geom: dict) -> tuple[np.ndarray,
                                                         np.ndarray,
                                                         np.ndarray]:
    """Host-side inverse of encode_planes' packing for ONE frame:
    [n*3//2] packed uint8 -> ([y_bh, y_bw, 64], cb, cr) int16 block
    arrays (ceil block dims — encode_planes edge-pads non-aligned
    planes)."""
    coefs = unpack12(packed)
    y_bw, y_bh = -(-geom["y_pw"] // 8), -(-geom["y_ph"] // 8)
    c_bw, c_bh = -(-geom["c_pw"] // 8), -(-geom["c_ph"] // 8)
    y_n, c_n = y_bw * y_bh * 64, c_bw * c_bh * 64
    y = coefs[:y_n].reshape(y_bh, y_bw, 64)
    cb = coefs[y_n:y_n + c_n].reshape(c_bh, c_bw, 64)
    cr = coefs[y_n + c_n:y_n + 2 * c_n].reshape(c_bh, c_bw, 64)
    return y, cb, cr
