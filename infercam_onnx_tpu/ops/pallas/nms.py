"""Greedy hard-NMS as a single Pallas TPU kernel.

The XLA formulation in ops/postprocess.py runs greedy suppression as a
`lax.fori_loop` of ``top_k`` steps, each a tiny masked reduction — XLA
executes those as ``top_k`` serialized HLO loop iterations with loop
overhead per step. This kernel does the whole job in ONE kernel launch
per image: the IoU matrix is computed into VMEM with vector ops, and the
sequential greedy scan runs entirely on-chip over VMEM-resident state.

Semantics are identical to ops/postprocess.py (and therefore to the
reference, reference infer_server/src/nn.rs:198-243): suppression iff
``iou > max_iou`` (strict), IoU with the ``EPS = 1e-7`` guard and
zero-area ill-formed overlap boxes, candidates visited in descending
confidence order.

Measured on a v5e chip (batch 16, K = 256 candidates from 4420 priors):
XLA's loop formulation executes in ~80 us/batch and this kernel in
~190 us/batch — XLA's HLO while-loop lowering is already excellent for
this shape, so ``impl="xla"`` stays the production default and this
kernel is kept as a verified alternative (both are semantically
identical; tests pin them against each other and the NumPy oracle).
The remaining gap is the (K, K) VMEM materialization + per-step 1x256
row reductions underutilizing the 8x128 VPU tile.

Layout notes (Pallas TPU):
- boxes are passed transposed as [4, K] so K sits on the 128-lane axis;
- the [K, K] IoU mask lives in a VMEM scratch (K = 256 -> 256 KB f32);
- the keep mask is a (1, K) f32 carry updated with a masked where()
  (lane-dimension dynamic scatter is a poor fit for the VPU);
- per-step scalars come from full-row reductions, not scalar loads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-7  # reference nn.rs:17-18


def _nms_kernel(boxes_ref, valid_ref, keep_ref, supp_ref, *,
                max_iou: float):
    k = boxes_ref.shape[-1]
    bx = boxes_ref[0]  # (4, K) — leading block dim squeezed
    x0 = bx[0:1, :]  # (1, K)
    y0 = bx[1:2, :]
    x1 = bx[2:3, :]
    y1 = bx[3:4, :]

    def area(w, h):
        return jnp.where((w < 0.0) | (h < 0.0), 0.0, w * h)

    areas = area(x1 - x0, y1 - y0)  # (1, K)

    # pairwise overlap: row index = already-kept candidate j, col = i
    tl_x = jnp.maximum(x0.reshape(k, 1), x0)  # (K, K)
    tl_y = jnp.maximum(y0.reshape(k, 1), y0)
    br_x = jnp.minimum(x1.reshape(k, 1), x1)
    br_y = jnp.minimum(y1.reshape(k, 1), y1)
    inter = area(br_x - tl_x, br_y - tl_y)
    union = areas.reshape(k, 1) + areas - inter
    iou = inter / (union + EPS)
    # suppression mask as f32 for cheap masked sums
    supp_ref[:, :] = (iou > max_iou).astype(jnp.float32)

    valid = valid_ref[0]  # (1, K)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, keep):
        row = supp_ref[pl.ds(i, 1), :]  # (1, K): iou[i, :] > thr
        overlapped = jnp.sum(row * keep)  # kept j with iou(i,j) > thr
        valid_i = jnp.sum(jnp.where(col_ids == i, valid, 0.0))
        keep_i = jnp.where(overlapped > 0.0, 0.0, valid_i)
        return jnp.where(col_ids == i, keep_i, keep)

    keep = jax.lax.fori_loop(
        0, k, body, jnp.zeros((1, k), jnp.float32))
    keep_ref[0] = keep


@functools.partial(jax.jit, static_argnames=("max_iou", "interpret"))
def greedy_suppress(
    boxes_t: jax.Array,  # [B, 4, K] corner boxes, descending confidence
    valid: jax.Array,  # [B, 1, K] float 0/1 candidate mask
    *,
    max_iou: float = 0.5,
    interpret: bool = False,
) -> jax.Array:
    """Returns keep mask [B, 1, K] float 0/1."""
    b, four, k = boxes_t.shape
    assert four == 4
    return pl.pallas_call(
        functools.partial(_nms_kernel, max_iou=max_iou),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 4, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, k), jnp.float32)],
        interpret=interpret,
    )(boxes_t, valid)
