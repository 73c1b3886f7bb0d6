"""The fused detection pipeline: one jitted XLA program per input shape.

The reference runs decode -> preprocess -> CNN -> postprocess as separate
host-side stages in a single-threaded worker (reference
infer_server/src/inferer.rs:31-46, nn.rs:179-186). Here
preprocess (resize+normalize), the CNN forward, and filter+NMS execute as
ONE device program over a whole batch of frames — the raw uint8 frames are
the only host->device transfer and the padded detection arrays the only
device->host transfer.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from infercam_onnx_tpu.config import DetectorConfig
from infercam_onnx_tpu.models import ultraface as uf
from infercam_onnx_tpu.models.convert import load_or_download_params
from infercam_onnx_tpu.ops.postprocess import batched_postprocess
from infercam_onnx_tpu.ops.preprocess import Preprocessor, preprocess_images

log = logging.getLogger(__name__)

# A detection: (relative corner bbox [x_tl, y_tl, x_br, y_br], confidence)
Detection = tuple[np.ndarray, float]


def detect_program_impl(
    params,
    priors: jax.Array,
    images: jax.Array,  # [B, H, W, 3] uint8
    r_h: jax.Array,
    r_w: jax.Array,
    *,
    compute_dtype,
    min_confidence: float,
    max_iou: float,
    top_k: int,
    max_detections: int,
    pack_output: bool = False,
):
    """uint8 frames in, padded detections out — all on device.

    ``pack_output=True`` returns ONE array [B, max_detections, 6] with
    rows (x_tl, y_tl, x_br, y_br, confidence, valid) instead of the
    (boxes, confs, counts) tuple — a single device->host transfer per
    batch (per-transfer fixed cost dominates small reads on tunneled
    rigs; see bench.py).
    """
    x = preprocess_images(images, r_h, r_w)
    scores, boxes = uf.forward(params, x, priors,
                               compute_dtype=compute_dtype)
    sel_boxes, sel_conf, count = batched_postprocess(
        scores, boxes,
        min_confidence=min_confidence, max_iou=max_iou,
        top_k=top_k, max_detections=max_detections)
    if not pack_output:
        return sel_boxes, sel_conf, count
    return pack_detections(sel_boxes, sel_conf, count)


def pack_detections(sel_boxes, sel_conf, count):
    """(boxes [B,D,4], confs [B,D], count [B]) -> ONE [B, D, 6] array
    (x0, y0, x1, y1, conf, valid) — the single-transfer detection
    layout every packed program (plain, tiled, sharded, graph) emits;
    unpack_detections is the host-side inverse."""
    d = sel_boxes.shape[1]
    valid = (jnp.arange(d)[None, :] < count[:, None]).astype(jnp.float32)
    return jnp.concatenate(
        [sel_boxes, sel_conf[..., None], valid[..., None]], axis=-1)


detect_program = jax.jit(
    detect_program_impl,
    static_argnames=(
        "compute_dtype", "min_confidence", "max_iou", "top_k",
        "max_detections", "pack_output",
    ),
)


def detect_from_coefficients_impl(
    params,
    priors: jax.Array,
    y_coefs: jax.Array,  # [B, ybh, ybw, 64] int16 (entropy-decoded)
    cb_coefs: jax.Array,
    cr_coefs: jax.Array,
    quant: jax.Array,  # [B, 3, 64]
    r_h: jax.Array,
    r_w: jax.Array,
    *,
    width: int,
    height: int,
    sampling: tuple,
    compute_dtype,
    min_confidence: float,
    max_iou: float,
    top_k: int,
    max_detections: int,
    pack_output: bool = False,
):
    """The zero-host-roundtrip pipeline (BASELINE config 4): JPEG DCT
    coefficients in, detections out — dequant, 8x8 IDCT, chroma
    upsampling, color conversion, resize, CNN, and NMS in ONE XLA
    program. Host work is entropy decoding only. ``sampling`` is the
    luma (h, v) factor pair — (2,2)/(2,1)/(1,1) — and must match the
    stream."""
    from infercam_onnx_tpu.ops.jpeg_device import decode_rgb_device

    rgb = decode_rgb_device(y_coefs, cb_coefs, cr_coefs, quant,
                            width=width, height=height,
                            sampling=sampling)
    return detect_program_impl(
        params, priors, rgb, r_h, r_w,
        compute_dtype=compute_dtype, min_confidence=min_confidence,
        max_iou=max_iou, top_k=top_k, max_detections=max_detections,
        pack_output=pack_output)


detect_from_coefficients = jax.jit(
    detect_from_coefficients_impl,
    static_argnames=(
        "width", "height", "sampling", "compute_dtype", "min_confidence",
        "max_iou", "top_k", "max_detections", "pack_output",
    ),
)


def detect_from_ycbcr_impl(
    params,
    priors: jax.Array,
    packed: jax.Array,  # [B, n] uint8: Y ++ Cb ++ Cr padded planes
    r_h: jax.Array,
    r_w: jax.Array,
    *,
    width: int,
    height: int,
    y_pw: int,
    y_ph: int,
    c_pw: int,
    c_ph: int,
    sampling: tuple,
    compute_dtype,
    min_confidence: float,
    max_iou: float,
    top_k: int,
    max_detections: int,
    pack_output: bool = False,
):
    """The transfer-optimal pipeline: host does entropy decode + scaled
    IDCT (native decode_ycbcr_batch), the device gets ONE packed uint8
    buffer (~half the bytes of RGB for 4:2:0) and fuses chroma
    upsampling, color conversion, resize, CNN, and NMS. This is the
    serving headline path on transfer-bound links (the reference decodes
    fully on the host, reference inferer.rs:35-36)."""
    from infercam_onnx_tpu.ops.jpeg_device import (
        combine_ycbcr,
        unpack_ycbcr_planes,
    )

    y, cb, cr = unpack_ycbcr_planes(packed, y_pw=y_pw, y_ph=y_ph,
                                    c_pw=c_pw, c_ph=c_ph)
    rgb = combine_ycbcr(y, cb, cr, width=width, height=height,
                        sampling=sampling)
    return detect_program_impl(
        params, priors, rgb, r_h, r_w,
        compute_dtype=compute_dtype, min_confidence=min_confidence,
        max_iou=max_iou, top_k=top_k, max_detections=max_detections,
        pack_output=pack_output)


detect_from_ycbcr = jax.jit(
    detect_from_ycbcr_impl,
    static_argnames=(
        "width", "height", "y_pw", "y_ph", "c_pw", "c_ph", "sampling",
        "compute_dtype", "min_confidence", "max_iou", "top_k",
        "max_detections", "pack_output",
    ),
)


def detect_annotate_from_ycbcr_impl(
    params,
    priors: jax.Array,
    packed: jax.Array,  # [B, n] uint8 packed planes
    r_h: jax.Array,
    r_w: jax.Array,
    quant2: jax.Array,  # [2, 64] encode quant tables (luma, chroma)
    *,
    width: int,
    height: int,
    y_pw: int,
    y_ph: int,
    c_pw: int,
    c_ph: int,
    sampling: tuple,
    disp_dims: tuple | None,
    compute_dtype,
    min_confidence: float,
    max_iou: float,
    top_k: int,
    max_detections: int,
):
    """The fully-fused ANNOTATED pipeline: packed YCbCr planes in,
    (quantized JPEG coefficients, packed detections) out. Detection,
    overlay rendering (reference inferer.rs:57-101's green rects +
    labels) and the forward DCT/quantization all run in ONE XLA
    program; the host entropy-codes the coefficients
    (native ic_jpeg_write_coefs) and serves the JPEG. /face_stream
    viewers thus ride the packed-plane transfer in BOTH directions
    (~1.5 B/px up, 3 B/px of int16 coefficients down, zero host pixel
    work)."""
    from infercam_onnx_tpu.ops.jpeg_device import (
        combine_ycbcr,
        unpack_ycbcr_planes,
    )
    from infercam_onnx_tpu.ops.jpeg_encode_device import (
        encode_planes,
        render_overlay_ycbcr,
    )

    y, cb, cr = unpack_ycbcr_planes(packed, y_pw=y_pw, y_ph=y_ph,
                                    c_pw=c_pw, c_ph=c_ph)
    rgb = combine_ycbcr(y, cb, cr, width=width, height=height,
                        sampling=sampling)
    packed_det = detect_program_impl(
        params, priors, rgb, r_h, r_w,
        compute_dtype=compute_dtype, min_confidence=min_confidence,
        max_iou=max_iou, top_k=top_k, max_detections=max_detections,
        pack_output=True)
    y, cb, cr = render_overlay_ycbcr(
        y, cb, cr, packed_det, width=width, height=height,
        sampling=sampling, disp_dims=disp_dims)
    return encode_planes(y, cb, cr, quant2), packed_det


detect_annotate_from_ycbcr = jax.jit(
    detect_annotate_from_ycbcr_impl,
    static_argnames=(
        "width", "height", "y_pw", "y_ph", "c_pw", "c_ph", "sampling",
        "disp_dims", "compute_dtype", "min_confidence", "max_iou",
        "top_k", "max_detections",
    ),
)


def detect_annotate_splice_impl(
    params,
    priors: jax.Array,
    packed_coefs: jax.Array,  # [B, N*3//2] uint8 (pack12_np upload)
    quant: jax.Array,  # [B, 3, 64] the INPUT stream's quant tables
    r_h: jax.Array,
    r_w: jax.Array,
    *,
    width: int,
    height: int,
    y_bw: int,
    y_bh: int,
    c_bw: int,
    c_bh: int,
    sampling: tuple,
    k: int,
    disp_dims: tuple | None,
    compute_dtype,
    min_confidence: float,
    max_iou: float,
    top_k: int,
    max_detections: int,
):
    """The SPLICE-transcode annotated pipeline (coefficient decode
    mode): 12-bit-packed entropy-decoded DCT coefficients in; packed
    detections plus ONLY the overlay-touched blocks out (re-quantized
    with the input's own tables). The host splices those blocks into
    its original coefficient arrays and entropy-codes — so the
    annotated output JPEG is bit-exact to the input outside the drawn
    regions (no generational recompression, unlike the reference's
    full decode->draw->re-encode, reference inferer.rs:35-39), and the
    device->host traffic is bounded by K blocks instead of the whole
    frame."""
    from infercam_onnx_tpu.ops.jpeg_device import (
        combine_ycbcr,
        decode_plane,
    )
    from infercam_onnx_tpu.ops.jpeg_encode_device import (
        fdct_quant,
        render_overlay_ycbcr,
        select_changed_blocks,
        unpack12_device,
    )

    b = packed_coefs.shape[0]
    coefs = unpack12_device(packed_coefs)
    y_n, c_n = y_bw * y_bh * 64, c_bw * c_bh * 64
    yc = coefs[:, :y_n].reshape(b, y_bh, y_bw, 64)
    cbc = coefs[:, y_n:y_n + c_n].reshape(b, c_bh, c_bw, 64)
    crc = coefs[:, y_n + c_n:].reshape(b, c_bh, c_bw, 64)
    # dequant + IDCT on-device, then snap to the u8 grid the host
    # decoder would have produced (the overlay and the re-quantization
    # must both see pixel-domain data)
    y = jnp.clip(jnp.round(decode_plane(yc, quant[:, 0])), 0.0, 255.0)
    cb = jnp.clip(jnp.round(decode_plane(cbc, quant[:, 1])), 0.0, 255.0)
    cr = jnp.clip(jnp.round(decode_plane(crc, quant[:, 2])), 0.0, 255.0)
    rgb = combine_ycbcr(y, cb, cr, width=width, height=height,
                        sampling=sampling)
    packed_det = detect_program_impl(
        params, priors, rgb, r_h, r_w,
        compute_dtype=compute_dtype, min_confidence=min_confidence,
        max_iou=max_iou, top_k=top_k, max_detections=max_detections,
        pack_output=True)
    y, cb, cr, my, mc = render_overlay_ycbcr(
        y, cb, cr, packed_det, width=width, height=height,
        sampling=sampling, disp_dims=disp_dims, return_masks=True)
    yq = fdct_quant(y, quant[:, 0])
    cbq = fdct_quant(cb, quant[:, 1])
    crq = fdct_quant(cr, quant[:, 2])
    blocks, meta = select_changed_blocks(yq, cbq, crq, my, mc, k)
    return blocks, meta, packed_det


detect_annotate_splice = jax.jit(
    detect_annotate_splice_impl,
    static_argnames=(
        "width", "height", "y_bw", "y_bh", "c_bw", "c_bh", "sampling",
        "k", "disp_dims", "compute_dtype", "min_confidence", "max_iou",
        "top_k", "max_detections",
    ),
)


def detect_annotate_impl(
    params,
    priors: jax.Array,
    images: jax.Array,  # [B, H, W, 3] uint8
    r_h: jax.Array,
    r_w: jax.Array,
    quant2: jax.Array,
    *,
    out_sampling: tuple,
    disp_dims: tuple | None,
    compute_dtype,
    min_confidence: float,
    max_iou: float,
    top_k: int,
    max_detections: int,
):
    """RGB-input variant of the fused annotated pipeline (the default
    "pixels" decode mode): detect, convert to YCbCr planes on-device,
    render the overlay, FDCT+quantize — host does entropy coding only
    instead of draw + full JPEG encode."""
    from infercam_onnx_tpu.ops.jpeg_encode_device import (
        encode_planes,
        render_overlay_ycbcr,
        rgb_to_ycbcr_planes,
    )

    _, h, w, _ = images.shape
    packed_det = detect_program_impl(
        params, priors, images, r_h, r_w,
        compute_dtype=compute_dtype, min_confidence=min_confidence,
        max_iou=max_iou, top_k=top_k, max_detections=max_detections,
        pack_output=True)
    y, cb, cr = rgb_to_ycbcr_planes(images, sampling=out_sampling)
    y, cb, cr = render_overlay_ycbcr(
        y, cb, cr, packed_det, width=w, height=h,
        sampling=out_sampling, disp_dims=disp_dims)
    return encode_planes(y, cb, cr, quant2), packed_det


detect_annotate = jax.jit(
    detect_annotate_impl,
    static_argnames=(
        "out_sampling", "disp_dims", "compute_dtype", "min_confidence",
        "max_iou", "top_k", "max_detections",
    ),
)


def pack_coefficient_batch(y, cb, cr, quant):
    """Host-side upload prep for the splice path: concatenate + 12-bit
    pack the entropy-decoded block arrays. Returns
    (packed12 uint8 [B, N*3//2], quant, ((y_bh, y_bw), (c_bh, c_bw)))."""
    from infercam_onnx_tpu.ops.jpeg_encode_device import pack12_np

    y = np.asarray(y, np.int16)
    cb = np.asarray(cb, np.int16)
    cr = np.asarray(cr, np.int16)
    b = y.shape[0]
    flat = np.concatenate(
        [y.reshape(b, -1), cb.reshape(b, -1), cr.reshape(b, -1)],
        axis=1)
    return (pack12_np(flat), np.asarray(quant),
            (tuple(y.shape[1:3]), tuple(cb.shape[1:3])))


def unpack_detections(packed: np.ndarray) -> list[list[Detection]]:
    """Host-side inverse of ``pack_output=True``."""
    out: list[list[Detection]] = []
    for row in packed:
        n = int(row[:, 5].sum())
        out.append([(row[i, :4], float(row[i, 4])) for i in range(n)])
    return out


class Detector:
    """UltraFace detector with variant/threshold config and weight loading.

    Mirrors the reference's model lifecycle (reference nn.rs:55-67:
    UltrafaceModel::new(variant, max_iou, min_confidence) with
    download-on-miss weights) but batched and device-resident.
    """

    def __init__(self, config: DetectorConfig = DetectorConfig(),
                 params=None, *, rng: int = 0):
        self.config = config
        if params is None:
            params = self._load_weights(config.variant, rng)
        self.model = uf.UltraFace.create(config.variant, params)
        self.preprocessor = Preprocessor(self.model.width,
                                         self.model.height)
        self._compute_dtype = jnp.dtype(config.compute_dtype)

    @staticmethod
    def _load_weights(variant: str, rng: int):
        """Converted-npz cache -> ONNX download-on-miss -> random."""
        import os

        from infercam_onnx_tpu.models import checkpoint
        from infercam_onnx_tpu.utils.cache import cache_dir

        npz = os.path.join(cache_dir("weights"),
                           f"ultraface-{variant}.npz")
        if os.path.isfile(npz):
            try:
                return checkpoint.load_params(npz)
            except Exception as e:
                # a truncated/corrupt cache file must not wedge every
                # startup until someone deletes it by hand
                log.warning("corrupt weights cache %s (%s); rebuilding",
                            npz, e)
                os.unlink(npz)
        params = load_or_download_params(variant)
        if params is not None:
            checkpoint.save_params(params, npz)
            return params
        log.warning(
            "UltraFace %s weights unavailable (offline); using "
            "deterministic random weights", variant)
        arch = "slim" if variant.lower().startswith("slim") else "RFB"
        return uf.init_params(rng, background_bias=0.75, arch=arch)

    # -- device program ----------------------------------------------------

    def run_device(self, images: jax.Array | np.ndarray, *,
                   pack_output: bool = False):
        """[B, H, W, 3] uint8 -> (boxes [B,D,4], confs [B,D], counts [B])
        as device arrays (one fused program; retraces per input shape).
        With ``pack_output``, one [B, D, 6] array instead (see
        detect_program_impl)."""
        _, h, w, _ = images.shape
        r_h, r_w = self.preprocessor.matrices(w, h)
        c = self.config
        return detect_program(
            self.model.params, self.model.priors, jnp.asarray(images),
            r_h, r_w,
            compute_dtype=self._compute_dtype,
            min_confidence=c.min_confidence, max_iou=c.max_iou,
            top_k=c.top_k, max_detections=c.max_detections,
            pack_output=pack_output)

    def run_device_coefficients(self, datas: list[bytes], *,
                                pack_output: bool = False):
        """Zero-host-roundtrip path: entropy-decode on host, everything
        else (IDCT -> RGB -> resize -> CNN -> NMS) fused on device."""
        from infercam_onnx_tpu.ops.jpeg_device import (
            read_coefficient_batch)

        y, cb, cr, quant, wh, sampling = read_coefficient_batch(datas)
        return self.run_device_coefficients_arrays(
            y, cb, cr, quant, wh, sampling=sampling,
            pack_output=pack_output)

    def run_device_coefficients_arrays(self, y, cb, cr, quant,
                                       wh: tuple[int, int], *,
                                       sampling: tuple[int, int] = (2, 2),
                                       pack_output: bool = False):
        """Device half of the coefficient path (pre-stacked planes).
        ``sampling`` is the stream's luma sampling factors: (2, 2) for
        4:2:0, (1, 1) for 4:4:4."""
        w, h = wh
        r_h, r_w = self.preprocessor.matrices(w, h)
        c = self.config
        return detect_from_coefficients(
            self.model.params, self.model.priors,
            jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
            jnp.asarray(quant), r_h, r_w,
            width=w, height=h, sampling=tuple(sampling),
            compute_dtype=self._compute_dtype,
            min_confidence=c.min_confidence, max_iou=c.max_iou,
            top_k=c.top_k, max_detections=c.max_detections,
            pack_output=pack_output)

    def run_device_ycbcr(self, datas: list[bytes], *, scale: int = 1,
                         pack_output: bool = False):
        """Transfer-optimal path: host entropy+IDCT at 1/scale, device
        upsample+color+resize+CNN+NMS fused, ONE uint8 transfer/batch."""
        from infercam_onnx_tpu.native import jpeg as native_jpeg

        packed, geom = native_jpeg.load().decode_ycbcr_batch(
            datas, scale=scale)
        return self.run_device_ycbcr_packed(packed, geom,
                                            pack_output=pack_output)

    def run_device_ycbcr_packed(self, packed, geom: dict, *,
                                pack_output: bool = False):
        """Device half of the YCbCr path (packed planes from
        native decode_ycbcr_batch)."""
        w, h = geom["width"], geom["height"]
        r_h, r_w = self.preprocessor.matrices(w, h)
        c = self.config
        return detect_from_ycbcr(
            self.model.params, self.model.priors, jnp.asarray(packed),
            r_h, r_w,
            width=w, height=h,
            y_pw=geom["y_pw"], y_ph=geom["y_ph"],
            c_pw=geom["c_pw"], c_ph=geom["c_ph"],
            sampling=tuple(geom["sampling"]),
            compute_dtype=self._compute_dtype,
            min_confidence=c.min_confidence, max_iou=c.max_iou,
            top_k=c.top_k, max_detections=c.max_detections,
            pack_output=pack_output)

    @staticmethod
    @functools.lru_cache(maxsize=8)
    def _encode_quant(quality: int):
        """[2, 64] float32 device-side copy of libjpeg's quant tables
        for this quality (native shim; cached per quality)."""
        from infercam_onnx_tpu.native import jpeg as native_jpeg

        tables = native_jpeg.quant_tables_cached(quality)
        return jnp.asarray(tables.astype(np.float32))

    def run_device_ycbcr_annotated(self, packed, geom: dict, *,
                                   quality: int = 95,
                                   disp_dims: tuple | None = None):
        """Fused annotated path: packed planes in, ONE int16 coefficient
        array + packed detections out (see
        detect_annotate_from_ycbcr_impl). Host completes each frame
        with entropy coding only (native encode_coefs). Non-8-aligned
        plane dims (scaled decodes) are edge-padded on device."""
        w, h = geom["width"], geom["height"]
        r_h, r_w = self.preprocessor.matrices(w, h)
        c = self.config
        return detect_annotate_from_ycbcr(
            self.model.params, self.model.priors, jnp.asarray(packed),
            r_h, r_w, self._encode_quant(quality),
            width=w, height=h,
            y_pw=geom["y_pw"], y_ph=geom["y_ph"],
            c_pw=geom["c_pw"], c_ph=geom["c_ph"],
            sampling=tuple(geom["sampling"]),
            disp_dims=tuple(disp_dims) if disp_dims else None,
            compute_dtype=self._compute_dtype,
            min_confidence=c.min_confidence, max_iou=c.max_iou,
            top_k=c.top_k, max_detections=c.max_detections)

    def run_device_coefficients_annotated(
            self, y, cb, cr, quant, wh: tuple[int, int], *,
            sampling: tuple[int, int] = (2, 2), k: int = 768,
            disp_dims: tuple | None = None):
        """Splice-transcode annotated path (coefficient decode mode):
        entropy-decoded blocks up (12-bit packed), detections + ONLY
        the K overlay-touched re-quantized blocks down; the host
        splices them into its original arrays (splice_blocks) and
        entropy-codes. meta[i, 0] > k signals budget overflow — the
        caller must fall back to a full-frame annotate path for that
        frame. Returns (blocks_u8, meta_i32, packed_det)."""
        packed, quant, shapes = pack_coefficient_batch(y, cb, cr,
                                                       quant)
        return self.run_device_coefficients_annotated_packed(
            packed, quant, wh=wh, shapes=shapes,
            sampling=sampling, k=k, disp_dims=disp_dims)

    def run_device_coefficients_annotated_packed(
            self, packed12, quant, *, wh: tuple[int, int],
            shapes: tuple, sampling: tuple[int, int] = (2, 2),
            k: int = 768, disp_dims: tuple | None = None):
        """Device half of the splice path with the 12-bit packing
        already done (pack_coefficient_batch) — the serving decode
        thread packs and uploads so the device thread stays
        dispatch-only. ``shapes`` = ((y_bh, y_bw), (c_bh, c_bw))."""
        (y_bh, y_bw), (c_bh, c_bw) = shapes
        w, h = wh
        r_h, r_w = self.preprocessor.matrices(w, h)
        c = self.config
        return detect_annotate_splice(
            self.model.params, self.model.priors,
            jnp.asarray(packed12), jnp.asarray(quant), r_h, r_w,
            width=w, height=h, y_bw=y_bw, y_bh=y_bh, c_bw=c_bw,
            c_bh=c_bh, sampling=tuple(sampling), k=k,
            disp_dims=tuple(disp_dims) if disp_dims else None,
            compute_dtype=self._compute_dtype,
            min_confidence=c.min_confidence, max_iou=c.max_iou,
            top_k=c.top_k, max_detections=c.max_detections)

    def run_device_annotated(self, images, *, quality: int = 95,
                             subsampling: str = "420",
                             disp_dims: tuple | None = None):
        """RGB-input fused annotated path (pixels decode mode)."""
        from infercam_onnx_tpu.ops.jpeg_encode_device import (
            SUBSAMPLING_FACTORS)

        sampling = SUBSAMPLING_FACTORS[subsampling]
        _, h, w, _ = images.shape
        r_h, r_w = self.preprocessor.matrices(w, h)
        c = self.config
        return detect_annotate(
            self.model.params, self.model.priors, jnp.asarray(images),
            r_h, r_w, self._encode_quant(quality),
            out_sampling=sampling,
            disp_dims=tuple(disp_dims) if disp_dims else None,
            compute_dtype=self._compute_dtype,
            min_confidence=c.min_confidence, max_iou=c.max_iou,
            top_k=c.top_k, max_detections=c.max_detections)

    def warmup(self, batch_size: int, height: int, width: int, *,
               pack_output: bool = False) -> None:
        """Compile the program for one (B, H, W) bucket ahead of time."""
        dummy = np.zeros((batch_size, height, width, 3), np.uint8)
        jax.block_until_ready(
            self.run_device(dummy, pack_output=pack_output))

    # -- host API ----------------------------------------------------------

    def detect_batch(
        self, frames: np.ndarray
    ) -> list[list[Detection]]:
        """[B, H, W, 3] uint8 frames -> per-frame detection lists
        (relative corner bboxes + confidences, descending confidence,
        exactly like reference nn.rs postproc output)."""
        boxes, confs, counts = jax.device_get(self.run_device(frames))
        out: list[list[Detection]] = []
        for b in range(frames.shape[0]):
            n = int(counts[b])
            out.append([(boxes[b, i], float(confs[b, i]))
                        for i in range(n)])
        return out

    def detect(self, frame: np.ndarray) -> list[Detection]:
        """Single [H, W, 3] uint8 frame -> detections."""
        return self.detect_batch(frame[None])[0]
