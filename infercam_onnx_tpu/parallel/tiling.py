"""Tiled high-resolution detection with cross-tile NMS merge.

The reference caps detection at 640x480 model input; faces small relative
to a high-res frame (e.g. 1080p) fall below the detector's prior scales.
The TPU-native answer (BASELINE.json config 5) is spatial tiling — the
"long-context" analog for this workload (SURVEY.md section 5): the frame
splits into an overlapping tile grid, every tile runs the full detector as
one extra batch dimension, per-tile boxes map back into global frame
coordinates, and one global NMS merges duplicates from tile overlaps.

Everything (tile extraction, per-tile resize, CNN, merge NMS) is a single
jitted program. On a mesh, the flattened tile batch carries a sharding
constraint on the data axis so XLA splits tile compute across chips and
inserts the gather for the per-image merge itself — tiles of one image
ride ICI, not the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from infercam_onnx_tpu.detector import Detector
from infercam_onnx_tpu.models import ultraface as uf
from infercam_onnx_tpu.ops.postprocess import batched_nms
from infercam_onnx_tpu.ops.preprocess import (
    preprocess_images,
    triangle_resize_matrix,
)


def tile_grid_boxes(
    width: int,
    height: int,
    grid: tuple[int, int],
    overlap: float = 0.2,
) -> list[tuple[int, int, int, int]]:
    """Pixel boxes (x0, y0, x1, y1) of an overlapping cols x rows grid.

    Tiles are equally sized (so one resize matrix serves all) and overlap
    adjacent tiles by ``overlap`` of the tile extent, so a face on a seam
    is seen whole by at least one tile.
    """
    cols, rows = grid
    tile_w = int(np.ceil(width / (cols - (cols - 1) * overlap)))
    tile_h = int(np.ceil(height / (rows - (rows - 1) * overlap)))
    xs = (np.linspace(0, width - tile_w, cols).round().astype(int)
          if cols > 1 else np.array([0]))
    ys = (np.linspace(0, height - tile_h, rows).round().astype(int)
          if rows > 1 else np.array([0]))
    return [(int(x), int(y), int(x) + tile_w, int(y) + tile_h)
            for y in ys for x in xs]


def tiled_detect_program(
    params,
    priors: jax.Array,
    images: jax.Array,  # [B, H, W, 3] uint8
    r_h: jax.Array,  # [model_h, tile_h]
    r_w: jax.Array,  # [model_w, tile_w]
    *,
    tiles: tuple[tuple[int, int, int, int], ...],
    compute_dtype,
    min_confidence: float,
    max_iou: float,
    top_k: int,
    max_detections: int,
    flat_sharding: NamedSharding | None = None,
    pack_output: bool = False,
):
    b, height, width, _ = images.shape
    t = len(tiles)

    # static-slice tile extraction -> [B*T, th, tw, 3]
    tile_imgs = jnp.stack(
        [images[:, y0:y1, x0:x1, :] for (x0, y0, x1, y1) in tiles], axis=1)
    th = tiles[0][3] - tiles[0][1]
    tw = tiles[0][2] - tiles[0][0]
    flat = tile_imgs.reshape(b * t, th, tw, 3)
    if flat_sharding is not None:
        # shard the flattened (image x tile) batch across the mesh: tile
        # compute splits across chips and XLA inserts the gather needed by
        # the per-image merge below — cross-tile traffic rides ICI
        flat = jax.lax.with_sharding_constraint(flat, flat_sharding)

    x = preprocess_images(flat, r_h, r_w)
    scores, boxes = uf.forward(params, x, priors,
                               compute_dtype=compute_dtype)
    k = boxes.shape[1]

    # map per-tile relative boxes into global frame coordinates
    offs_x = jnp.asarray([t_[0] for t_ in tiles], jnp.float32)
    offs_y = jnp.asarray([t_[1] for t_ in tiles], jnp.float32)
    boxes = boxes.reshape(b, t, k, 4)
    conf = scores[:, :, 1].reshape(b, t, k)
    scale = jnp.asarray([tw / width, th / height,
                         tw / width, th / height], jnp.float32)
    shift = jnp.stack([offs_x / width, offs_y / height,
                       offs_x / width, offs_y / height],
                      axis=-1)  # [T, 4]
    boxes = boxes * scale + shift[None, :, None, :]

    merged_boxes = boxes.reshape(b, t * k, 4)
    merged_conf = conf.reshape(b, t * k)
    sel_boxes, sel_conf, count = batched_nms(
        merged_conf, merged_boxes,
        min_confidence=min_confidence, max_iou=max_iou,
        top_k=top_k, max_detections=max_detections)
    if not pack_output:
        return sel_boxes, sel_conf, count
    # ONE [B, D, 6] device->host transfer — the SAME pack helper the
    # plain program uses, so the layout can never desynchronize
    from infercam_onnx_tpu.detector import pack_detections

    return pack_detections(sel_boxes, sel_conf, count)


def tiled_detect_from_ycbcr_program(
    params,
    priors: jax.Array,
    packed: jax.Array,  # [B, n] uint8 packed planes
    r_h: jax.Array,
    r_w: jax.Array,
    *,
    geom_key: tuple,  # sorted geom items (static)
    tiles: tuple[tuple[int, int, int, int], ...],
    compute_dtype,
    min_confidence: float,
    max_iou: float,
    top_k: int,
    max_detections: int,
    flat_sharding: NamedSharding | None = None,
    pack_output: bool = False,
):
    """Packed-plane input variant: a 1080p frame crosses the link at
    ~1.5 B/px (4:2:0 planes) instead of 3 B/px RGB; chroma upsampling +
    color conversion fuse into the tiled program like the plain ycbcr
    path (detector.detect_from_ycbcr_impl)."""
    from infercam_onnx_tpu.ops.jpeg_device import (
        combine_ycbcr,
        unpack_ycbcr_planes,
    )

    geom = dict(geom_key)
    y, cb, cr = unpack_ycbcr_planes(
        packed, y_pw=geom["y_pw"], y_ph=geom["y_ph"],
        c_pw=geom["c_pw"], c_ph=geom["c_ph"])
    rgb = combine_ycbcr(y, cb, cr, width=geom["width"],
                        height=geom["height"],
                        sampling=tuple(geom["sampling"]))
    return tiled_detect_program(
        params, priors, rgb, r_h, r_w, tiles=tiles,
        compute_dtype=compute_dtype, min_confidence=min_confidence,
        max_iou=max_iou, top_k=top_k, max_detections=max_detections,
        flat_sharding=flat_sharding, pack_output=pack_output)


def tiled_detect_from_ycbcr_rows_program(
    params,
    priors: jax.Array,
    rows: tuple,  # B per-frame [n] uint8 packed planes
    r_h: jax.Array,
    r_w: jax.Array,
    **kw,
):
    """Chunked-upload variant: the batch arrives as B separate
    per-frame arrays (each the product of its own async ``device_put``,
    so uploads amortize the tunnel's fixed per-transfer cost
    back-to-back instead of paying one large synchronous copy) and is
    stacked ON DEVICE — an HBM-local copy, free next to the link."""
    return tiled_detect_from_ycbcr_program(
        params, priors, jnp.stack(rows), r_h, r_w, **kw)


class TiledDetector:
    """High-res detection via tiling, single-chip or mesh-sharded.

    ``batch_sharded_out``: shard outputs (and the image-batch input) on
    the mesh's data axis instead of replicating — what multi-host
    lockstep rounds need for per-host shard readback. Default (mesh
    given) replicates inputs and shard-constrains the flattened
    (image x tile) batch inside the program, so tile compute splits
    across chips even for a single 1080p frame.
    """

    def __init__(
        self,
        detector: Detector,
        frame_size: tuple[int, int],  # (width, height), e.g. (1920, 1080)
        grid: tuple[int, int] = (2, 2),
        overlap: float = 0.2,
        mesh: Mesh | None = None,
        axis: str = "data",
        batch_sharded_out: bool = False,
    ):
        self.detector = detector
        self.frame_w, self.frame_h = frame_size
        self.tiles = tuple(tile_grid_boxes(self.frame_w, self.frame_h,
                                           grid, overlap))
        th = self.tiles[0][3] - self.tiles[0][1]
        tw = self.tiles[0][2] - self.tiles[0][0]
        m = detector.model
        self._r_h = jnp.asarray(triangle_resize_matrix(th, m.height))
        self._r_w = jnp.asarray(triangle_resize_matrix(tw, m.width))
        self._mesh = mesh
        self._axis = axis
        self._batch_sharded_out = batch_sharded_out
        c = detector.config
        self._static = dict(
            tiles=self.tiles,
            compute_dtype=detector._compute_dtype,
            min_confidence=c.min_confidence, max_iou=c.max_iou,
            top_k=c.top_k, max_detections=c.max_detections)
        self._programs: dict = {}
        if mesh is not None:
            # reuse the wrapped detector's already-replicated copies
            # when it has them (ShardedDetector/LockstepDetector): a
            # fresh device_put per TiledDetector instance re-uploads
            # the full weight pytree — and this rig's tunnel client
            # leaks every H2D staging buffer (CLAUDE.md)
            if getattr(detector, "mesh", None) is mesh and hasattr(
                    detector, "_params"):
                self._params = detector._params
                self._priors = detector._priors
            else:
                repl = NamedSharding(mesh, P())
                self._params = jax.device_put(m.params, repl)
                self._priors = jax.device_put(m.priors, repl)
        else:
            self._params = m.params
            self._priors = m.priors

    def _program(self, kind: str, pack: bool, geom_key: tuple = ()):
        key = (kind, pack, geom_key)
        prog = self._programs.get(key)
        if prog is not None:
            return prog
        if kind == "ycbcr":
            base = functools.partial(tiled_detect_from_ycbcr_program,
                                     geom_key=geom_key, **self._static)
        elif kind == "ycbcr_rows":
            base = functools.partial(tiled_detect_from_ycbcr_rows_program,
                                     geom_key=geom_key, **self._static)
        else:
            base = functools.partial(tiled_detect_program,
                                     **self._static)
        if self._mesh is not None:
            repl = NamedSharding(self._mesh, P())
            batch = NamedSharding(self._mesh, P(self._axis))
            data_in = batch if self._batch_sharded_out else repl
            out = batch if self._batch_sharded_out else repl
            prog = jax.jit(
                functools.partial(
                    base, pack_output=pack,
                    flat_sharding=NamedSharding(self._mesh,
                                                P(self._axis))),
                in_shardings=(repl, repl, data_in, repl, repl),
                out_shardings=(out if pack else (out, out, out)))
        else:
            prog = jax.jit(functools.partial(base, pack_output=pack))
        self._programs[key] = prog
        return prog

    def run_device(self, images, *, pack_output: bool = False):
        """[B, frame_h, frame_w, 3] uint8 -> (boxes, confs, counts)
        in global relative coordinates ([B, D, 6] packed with
        ``pack_output``)."""
        h, w = int(images.shape[1]), int(images.shape[2])
        if (w, h) != (self.frame_w, self.frame_h):
            # the tile boxes are static per frame_size; mismatched
            # frames would silently cover only a corner (or crash in a
            # cryptic slice error)
            raise ValueError(
                f"frame {w}x{h} != tiled frame size "
                f"{self.frame_w}x{self.frame_h}")
        return self._program("pixels", pack_output)(
            self._params, self._priors, jnp.asarray(images),
            self._r_h, self._r_w)

    def run_device_ycbcr_packed(self, packed, geom: dict, *,
                                pack_output: bool = False):
        """Packed-plane input (native decode_ycbcr_batch layout): the
        transfer diet for high-res frames — ~1.5 B/px up instead of 3."""
        if (geom["width"], geom["height"]) != (self.frame_w,
                                               self.frame_h):
            raise ValueError(
                f"geometry {geom['width']}x{geom['height']} != tiled "
                f"frame {self.frame_w}x{self.frame_h}")
        geom_key = tuple(sorted(
            (k, tuple(v) if isinstance(v, (tuple, list)) else v)
            for k, v in geom.items()))
        return self._program("ycbcr", pack_output, geom_key)(
            self._params, self._priors, jnp.asarray(packed),
            self._r_h, self._r_w)

    def run_device_ycbcr_rows(self, rows, geom: dict, *,
                              pack_output: bool = False):
        """Chunked-upload packed-plane input: ``rows`` is a sequence of
        B per-frame [n] arrays, each ideally already the product of its
        own async ``jax.device_put`` issued back-to-back from the
        decode thread — on this rig's tunnel that amortizes the fixed
        per-transfer cost that a single large synchronous batch copy
        pays in full (CLAUDE.md cost model); the batch is stacked on
        device. Compiles one program per (row count, geometry)."""
        if self._batch_sharded_out:
            raise ValueError("per-row upload is a single-host transfer "
                             "optimization; lockstep batches use the "
                             "stacked path")
        if (geom["width"], geom["height"]) != (self.frame_w,
                                               self.frame_h):
            raise ValueError(
                f"geometry {geom['width']}x{geom['height']} != tiled "
                f"frame {self.frame_w}x{self.frame_h}")
        geom_key = tuple(sorted(
            (k, tuple(v) if isinstance(v, (tuple, list)) else v)
            for k, v in geom.items()))
        return self._program("ycbcr_rows", pack_output, geom_key)(
            self._params, self._priors, tuple(rows),
            self._r_h, self._r_w)

    def detect_batch(self, images) -> list[list[tuple[np.ndarray, float]]]:
        boxes, confs, counts = jax.device_get(self.run_device(images))
        out = []
        for i in range(images.shape[0]):
            n = int(counts[i])
            out.append([(boxes[i, d], float(confs[i, d]))
                        for d in range(n)])
        return out
