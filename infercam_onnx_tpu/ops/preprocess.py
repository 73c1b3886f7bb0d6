"""Preprocessing: resize + normalize as one MXU-friendly device program.

The reference preprocesses on the host with scalar loops: a Triangle-filter
resize to the variant dims followed by per-channel MobileNet normalization
mean [0.485, 0.456, 0.406] / std [0.229, 0.224, 0.225] over pixel/255
(reference infer_server/src/nn.rs:70-94). Here the whole step runs on
device inside the jitted program:

- The separable Triangle (bilinear-with-antialias) resize is expressed as
  two dense matrix multiplies: ``out = R_h @ img @ R_w^T`` per channel.
  Dense resize matrices map straight onto the TPU MXU and fuse with the
  normalize into a single XLA program — no gather, no dynamic shapes.
- The resize weights reproduce the image-rs Triangle filter exactly
  (triangle kernel, support scaled by the downscale ratio, edge-clamped
  taps, per-pixel weight normalization), including the final
  round-to-nearest-u8 the reference incurs because image-rs materializes
  a u8 image before normalization (reference nn.rs:75-81 resizes first,
  then reads u8 pixels at nn.rs:90).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# MobileNet normalization constants (reference nn.rs:87-88).
MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def triangle_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense [out_size, in_size] resample matrix for the Triangle filter.

    Matches image-rs ``FilterType::Triangle`` (and PIL BILINEAR): for each
    output pixel, the source center is ``(o + 0.5) * ratio``; the triangle
    kernel has support 1.0, scaled by ``max(ratio, 1)`` when minifying; at
    the borders the tap window is clipped to the image (out-of-range taps
    are dropped, not clamped) and weights are normalized over the
    remaining in-window taps.
    """
    ratio = in_size / out_size
    sratio = max(ratio, 1.0)
    support = 1.0 * sratio  # triangle kernel support, scaled when minifying

    m = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        center = (o + 0.5) * ratio
        left = max(int(np.floor(center - support)), 0)
        right = min(int(np.ceil(center + support)), in_size - 1)
        total = 0.0
        for i in range(left, right + 1):
            # triangle kernel evaluated at the scaled distance
            t = abs((i + 0.5 - center) / sratio)
            w = 1.0 - t if t < 1.0 else 0.0
            if w <= 0.0:
                continue
            m[o, i] += w
            total += w
        if total > 0:
            m[o] /= total
    return m.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("round_u8",))
def preprocess_images(
    images: jax.Array,
    r_h: jax.Array,
    r_w: jax.Array,
    *,
    round_u8: bool = True,
) -> jax.Array:
    """[B, H, W, 3] uint8/float frames -> [B, h, w, 3] float32 normalized.

    ``r_h``: [h, H] and ``r_w``: [w, W] resize matrices from
    `triangle_resize_matrix`. ``round_u8=True`` reproduces the reference's
    intermediate u8 materialization bit-for-bit (see module docstring).
    """
    x = images.astype(jnp.float32)
    # vertical then horizontal pass (image-rs order; separable => equal)
    x = jnp.einsum("oH,bHWc->boWc", r_h, x,
                   preferred_element_type=jnp.float32)
    x = jnp.einsum("oW,bhWc->bhoc", r_w, x,
                   preferred_element_type=jnp.float32)
    if round_u8:
        # half-AWAY-from-zero like image-rs' f32::round (and PIL) —
        # jnp.round's banker's rounding differs by 1 LSB on exact-.5
        # resample sums, which can flip a detection sitting right at
        # min_confidence (samples are >= 0 here, so floor(x+0.5) == it)
        x = jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)
    x = x / 255.0
    x = (x - jnp.asarray(MEAN)) / jnp.asarray(STD)
    return x


class Preprocessor:
    """Caches resize matrices per (input resolution -> model resolution)."""

    def __init__(self, out_width: int, out_height: int):
        self.out_width = out_width
        self.out_height = out_height
        self._cache: dict[tuple[int, int], tuple[jax.Array, jax.Array]] = {}

    def matrices(self, in_width: int, in_height: int):
        key = (in_width, in_height)
        if key not in self._cache:
            r_h = jnp.asarray(
                triangle_resize_matrix(in_height, self.out_height))
            r_w = jnp.asarray(
                triangle_resize_matrix(in_width, self.out_width))
            self._cache[key] = (r_h, r_w)
        return self._cache[key]

    def __call__(self, images: jax.Array) -> jax.Array:
        _, h, w, _ = images.shape
        r_h, r_w = self.matrices(w, h)
        return preprocess_images(images, r_h, r_w)
