"""UltraFace (version-RFB-320/640) reimplemented as a pure JAX function.

The reference loads the ONNX graphs "version-RFB-320" / "version-RFB-640"
from onnx/models into the tract CPU executor (reference
infer_server/src/nn.rs:143-175) with the input fact pinned to
``1x3xHxW`` float32 (reference nn.rs:166-167) and consumes two outputs:
``scores[1,K,2]`` (softmaxed, face prob at ``[:,:,1]``, reference
nn.rs:110-112) and ``boxes[1,K,4]`` relative corner coordinates (reference
nn.rs:114-120). K = 4420 for the 320 variant and 17640 for the 640 variant.

Those ONNX files are exports of the public
Ultra-Light-Fast-Generic-Face-Detector-1MB network (Mb_Tiny_RFB backbone +
SSD heads, referenced from the reference README.md:145). This module
reimplements that network from its published architecture as a pure
function over an explicit parameter pytree — TPU-first choices:

- NHWC activations (canonical TPU conv layout; the reference/ONNX is NCHW).
- BatchNorm folded to a per-channel affine (scale, bias) at load time, so
  inference is conv + fused multiply-add + relu — no running stats on the
  hot path.
- Arbitrary leading batch dimension (the reference pins batch=1, reference
  nn.rs:83,167; micro-batched serving needs batch=N).
- Optional bfloat16 conv compute with float32 accumulation (MXU-native).
- Priors baked as constants into the jitted program; box decoding and
  softmax run in float32 on device, matching the exported graph's test-mode
  tail (softmax + center-variance 0.1 / size-variance 0.2 decode).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# Variant name -> (width, height), mirroring reference nn.rs:36-41
# (UltrafaceVariant::{W320H240, W640H480}). Variant names are WxH of the
# *input image*; the tensor is HxW. The reference serves only the RFB
# variants; the slim family (Mb_Tiny backbone without the
# receptive-field block — same upstream repo, same priors/heads) is an
# additional capability here.
VARIANTS: dict[str, tuple[int, int]] = {
    "RFB-320": (320, 240),
    "RFB-640": (640, 480),
    "slim-320": (320, 240),
    "slim-640": (640, 480),
}

NUM_CLASSES = 2
BASE_CHANNEL = 16  # upstream Mb_Tiny_RFB base_channel = 8 * 2

# SSD prior-grid hyperparameters of the upstream network. These are what
# make K come out to 4420 / 17640 (SURVEY.md section 2 "model specifics").
MIN_BOXES = ((10, 16, 24), (32, 48), (64, 96), (128, 192, 256))
SHRINKAGE = (8, 16, 32, 64)
CENTER_VARIANCE = 0.1
SIZE_VARIANCE = 0.2
BN_EPS = 1e-5

Params = Any  # nested dict/list pytree of jnp arrays


# ---------------------------------------------------------------------------
# Priors
# ---------------------------------------------------------------------------


def feature_map_sizes(width: int, height: int) -> list[tuple[int, int]]:
    """(w, h) of each SSD source feature map for the given input size."""
    return [
        (math.ceil(width / s), math.ceil(height / s)) for s in SHRINKAGE
    ]


def generate_priors(width: int, height: int) -> np.ndarray:
    """SSD prior boxes in center form ``[cx, cy, w, h]``, shape [K, 4].

    Reproduces the upstream generator exactly, including the subtlety that
    cell centers are normalized by ``size / shrinkage`` (a float, e.g.
    240/32 = 7.5) while the number of cells uses ``ceil`` — so bottom/right
    edge priors of odd-sized maps sit beyond 1.0 before the final clamp.
    """
    priors = []
    fmaps = feature_map_sizes(width, height)
    for level, (fw, fh) in enumerate(fmaps):
        scale_w = width / SHRINKAGE[level]
        scale_h = height / SHRINKAGE[level]
        for j in range(fh):
            for i in range(fw):
                cx = (i + 0.5) / scale_w
                cy = (j + 0.5) / scale_h
                for mb in MIN_BOXES[level]:
                    priors.append([cx, cy, mb / width, mb / height])
    out = np.clip(np.asarray(priors, dtype=np.float32), 0.0, 1.0)
    return out


def num_priors(width: int, height: int) -> int:
    fmaps = feature_map_sizes(width, height)
    return sum(fw * fh * len(mb) for (fw, fh), mb in zip(fmaps, MIN_BOXES))


# ---------------------------------------------------------------------------
# Layer primitives (NHWC, HWIO)
# ---------------------------------------------------------------------------


def _conv(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """2D conv, NHWC x HWIO -> NHWC, accumulating in float32."""
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def _affine(x: jax.Array, p: dict) -> jax.Array:
    """Folded-BatchNorm per-channel affine."""
    return x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _cbr(p: dict, x: jax.Array, *, stride: int, padding: int = 1,
         dilation: int = 1, groups: int = 1, relu: bool = True) -> jax.Array:
    """conv (no bias) + folded BN + optional ReLU — upstream BasicConv /
    conv_bn / conv_dw halves."""
    x = _conv(x, p["w"], stride=stride, padding=padding, dilation=dilation,
              groups=groups)
    x = _affine(x, p)
    return jax.nn.relu(x) if relu else x


def _conv_dw(p: dict, x: jax.Array, *, stride: int) -> jax.Array:
    """Upstream conv_dw: depthwise 3x3 + BN + ReLU, pointwise 1x1 + BN + ReLU."""
    cin = x.shape[-1]
    x = _cbr(p["dw"], x, stride=stride, padding=1, groups=cin)
    x = _cbr(p["pw"], x, stride=1, padding=0)
    return x


def _rfb(p: dict, x: jax.Array, *, scale: float = 1.0) -> jax.Array:
    """Upstream BasicRFB (receptive-field block), stride 1, vision=1."""
    # branch0: 1x1 (no relu) -> 3x3 -> 3x3 dil 2 (no relu)
    b0 = _cbr(p["branch0"][0], x, stride=1, padding=0, relu=False)
    b0 = _cbr(p["branch0"][1], b0, stride=1, padding=1)
    b0 = _cbr(p["branch0"][2], b0, stride=1, padding=2, dilation=2,
              relu=False)
    # branch1: 1x1 (no relu) -> 3x3 -> 3x3 dil 3 (no relu)
    b1 = _cbr(p["branch1"][0], x, stride=1, padding=0, relu=False)
    b1 = _cbr(p["branch1"][1], b1, stride=1, padding=1)
    b1 = _cbr(p["branch1"][2], b1, stride=1, padding=3, dilation=3,
              relu=False)
    # branch2: 1x1 (no relu) -> 3x3 -> 3x3 -> 3x3 dil 5 (no relu)
    b2 = _cbr(p["branch2"][0], x, stride=1, padding=0, relu=False)
    b2 = _cbr(p["branch2"][1], b2, stride=1, padding=1)
    b2 = _cbr(p["branch2"][2], b2, stride=1, padding=1)
    b2 = _cbr(p["branch2"][3], b2, stride=1, padding=5, dilation=5,
              relu=False)
    out = jnp.concatenate([b0, b1, b2], axis=-1)
    out = _cbr(p["conv_linear"], out, stride=1, padding=0, relu=False)
    short = _cbr(p["shortcut"], x, stride=1, padding=0, relu=False)
    return jax.nn.relu(out * jnp.asarray(scale, out.dtype) + short)


def _biased_conv(p: dict, x: jax.Array, *, stride: int = 1, padding: int = 0,
                 groups: int = 1) -> jax.Array:
    x = _conv(x, p["w"], stride=stride, padding=padding, groups=groups)
    return x + p["b"].astype(x.dtype)


def _separable(p: dict, x: jax.Array, *, stride: int = 1) -> jax.Array:
    """Upstream SeperableConv2d: depthwise 3x3 (bias) + ReLU + 1x1 (bias)."""
    cin = x.shape[-1]
    x = _biased_conv(p["dw"], x, stride=stride, padding=1, groups=cin)
    x = jax.nn.relu(x)
    return _biased_conv(p["pw"], x, stride=1, padding=0)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

# Strides of the 13 base-net blocks (block 7 is the RFB, stride 1).
_BASE_STRIDES = (2, 1, 2, 1, 2, 1, 1, None, 2, 1, 1, 2, 1)


def forward(
    params: Params,
    x: jax.Array,
    priors: jax.Array,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """UltraFace forward pass.

    Args:
      params: parameter pytree (see `init_params` / models/convert.py).
      x: [B, H, W, 3] float32 normalized input (NHWC; the preprocessing in
        ops/preprocess.py produces this from raw frames).
      priors: [K, 4] center-form prior boxes (`generate_priors`).
      compute_dtype: dtype for conv compute (bfloat16 on TPU, float32 for
        parity tests). Accumulation is always float32.

    Returns:
      scores: [B, K, 2] float32 softmax class scores (face prob at [:,:,1],
        matching reference nn.rs:110-112).
      boxes: [B, K, 4] float32 relative corner coords
        [x_tl, y_tl, x_br, y_br] (matching reference nn.rs:114-120).
    """
    x = x.astype(compute_dtype)
    base = params["base"]

    feats = []
    x = _cbr(base[0], x, stride=2, padding=1)
    for i in range(1, 7):
        x = _conv_dw(base[i], x, stride=_BASE_STRIDES[i])
    # block 7: BasicRFB in the RFB family, plain conv_dw in slim —
    # dispatch on parameter structure so converted checkpoints of either
    # family run through the same function
    if "branch0" in base[7]:
        x = _rfb(base[7], x)
    else:
        x = _conv_dw(base[7], x, stride=1)
    feats.append(x)  # stride 8, 64ch
    for i in range(8, 11):
        x = _conv_dw(base[i], x, stride=_BASE_STRIDES[i])
    feats.append(x)  # stride 16, 128ch
    for i in range(11, 13):
        x = _conv_dw(base[i], x, stride=_BASE_STRIDES[i])
    feats.append(x)  # stride 32, 256ch

    # extras: 1x1 conv (bias) + ReLU + separable stride-2 + ReLU
    e = params["extras"]
    y = jax.nn.relu(_biased_conv(e["proj"], x, padding=0))
    y = jax.nn.relu(_separable(e["sep"], y, stride=2))
    feats.append(y)  # stride 64, 256ch

    batch = x.shape[0]
    confs, locs = [], []
    for level, feat in enumerate(feats):
        ch = params["cls_heads"][level]
        rh = params["reg_heads"][level]
        if level < 3:
            c = _separable(ch, feat)
            l = _separable(rh, feat)
        else:  # last level uses plain 3x3 convs
            c = _biased_conv(ch, feat, padding=1)
            l = _biased_conv(rh, feat, padding=1)
        # NHWC with channels = anchors*C: reshape directly gives the
        # y-major, x, anchor ordering that matches the prior generator.
        confs.append(c.reshape(batch, -1, NUM_CLASSES))
        locs.append(l.reshape(batch, -1, 4))

    conf = jnp.concatenate(confs, axis=1).astype(jnp.float32)
    loc = jnp.concatenate(locs, axis=1).astype(jnp.float32)

    scores = jax.nn.softmax(conf, axis=-1)
    boxes = decode_locations(loc, priors.astype(jnp.float32))
    return scores, boxes


def decode_locations(loc: jax.Array, priors: jax.Array) -> jax.Array:
    """SSD location decode -> relative corner-form boxes.

    centers = loc[..., :2] * center_variance * prior_wh + prior_cxcy
    wh      = exp(loc[..., 2:] * size_variance) * prior_wh
    """
    centers = loc[..., :2] * CENTER_VARIANCE * priors[..., 2:] + priors[..., :2]
    wh = jnp.exp(loc[..., 2:] * SIZE_VARIANCE) * priors[..., 2:]
    return jnp.concatenate([centers - wh / 2.0, centers + wh / 2.0], axis=-1)


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------


def _init_cbr(key, kh, kw, cin, cout, *, groups: int = 1) -> dict:
    fan_in = kh * kw * (cin // groups)
    w = key.standard_normal((kh, kw, cin // groups, cout), np.float32)
    w = w * np.float32(np.sqrt(2.0 / fan_in))
    return {
        "w": w,
        "scale": np.ones((cout,), np.float32),
        "bias": np.zeros((cout,), np.float32),
    }


def _init_biased(key, kh, kw, cin, cout, *, groups: int = 1) -> dict:
    fan_in = kh * kw * (cin // groups)
    w = key.standard_normal((kh, kw, cin // groups, cout), np.float32)
    w = w * np.float32(np.sqrt(2.0 / fan_in))
    return {"w": w, "b": np.zeros((cout,), np.float32)}


def _init_separable(key, cin, cout) -> dict:
    return {
        "dw": _init_biased(key, 3, 3, cin, cin, groups=cin),
        "pw": _init_biased(key, 1, 1, cin, cout),
    }


def _init_rfb_block(nk, c: int) -> dict:
    # BasicRFB(64, 64), inter = 64 // 8 = 8
    inter = (4 * c) // 8
    return {
        "branch0": [
            _init_cbr(nk(), 1, 1, 4 * c, inter),
            _init_cbr(nk(), 3, 3, inter, 2 * inter),
            _init_cbr(nk(), 3, 3, 2 * inter, 2 * inter),
        ],
        "branch1": [
            _init_cbr(nk(), 1, 1, 4 * c, inter),
            _init_cbr(nk(), 3, 3, inter, 2 * inter),
            _init_cbr(nk(), 3, 3, 2 * inter, 2 * inter),
        ],
        "branch2": [
            _init_cbr(nk(), 1, 1, 4 * c, inter),
            _init_cbr(nk(), 3, 3, inter, (inter // 2) * 3),
            _init_cbr(nk(), 3, 3, (inter // 2) * 3, 2 * inter),
            _init_cbr(nk(), 3, 3, 2 * inter, 2 * inter),
        ],
        "conv_linear": _init_cbr(nk(), 1, 1, 6 * inter, 4 * c),
        "shortcut": _init_cbr(nk(), 1, 1, 4 * c, 4 * c),
    }


def init_params(
    rng: int = 0,
    *,
    background_bias: float = 0.0,
    arch: str = "RFB",
) -> Params:
    """Random (He-normal) parameters with the exact UltraFace structure.

    Pure NumPy on purpose: parameter init must not touch the device (no
    tiny device programs, no device->host reads — the latter permanently
    degrades transfer bandwidth on tunneled TPU rigs; see
    .claude/skills/verify/SKILL.md). Leaves are converted to device
    arrays lazily by the first jitted call.

    `background_bias` is added to the background-class logits of every
    classification head; tests use it to make random-weight detections
    sparse and realistic (softmax face prob concentrates below threshold).
    `arch` is "RFB" (BasicRFB at block 7) or "slim" (conv_dw).
    """
    gen = np.random.default_rng(rng)
    c = BASE_CHANNEL

    def nk():
        return gen

    base: list[dict] = []
    base.append(_init_cbr(nk(), 3, 3, 3, c))  # block 0: conv_bn
    dw_plan = [  # (cin, cout, )
        (c, 2 * c), (2 * c, 2 * c), (2 * c, 2 * c), (2 * c, 4 * c),
        (4 * c, 4 * c), (4 * c, 4 * c),
    ]
    for cin, cout in dw_plan:  # blocks 1..6
        base.append({
            "dw": _init_cbr(nk(), 3, 3, cin, cin, groups=cin),
            "pw": _init_cbr(nk(), 1, 1, cin, cout),
        })
    if arch == "slim":
        base.append({
            "dw": _init_cbr(nk(), 3, 3, 4 * c, 4 * c, groups=4 * c),
            "pw": _init_cbr(nk(), 1, 1, 4 * c, 4 * c),
        })
    else:
        base.append(_init_rfb_block(nk, c))
    dw_plan2 = [
        (4 * c, 8 * c), (8 * c, 8 * c), (8 * c, 8 * c),
        (8 * c, 16 * c), (16 * c, 16 * c),
    ]
    for cin, cout in dw_plan2:  # blocks 8..12
        base.append({
            "dw": _init_cbr(nk(), 3, 3, cin, cin, groups=cin),
            "pw": _init_cbr(nk(), 1, 1, cin, cout),
        })


    extras = {
        "proj": _init_biased(nk(), 1, 1, 16 * c, 4 * c),
        "sep": _init_separable(nk(), 4 * c, 16 * c),
    }

    head_in = (4 * c, 8 * c, 16 * c, 16 * c)
    anchors = tuple(len(mb) for mb in MIN_BOXES)  # (3, 2, 2, 3)
    cls_heads, reg_heads = [], []
    for level in range(4):
        cout_c = anchors[level] * NUM_CLASSES
        cout_r = anchors[level] * 4
        if level < 3:
            cls_heads.append(_init_separable(nk(), head_in[level], cout_c))
            reg_heads.append(_init_separable(nk(), head_in[level], cout_r))
        else:
            cls_heads.append(_init_biased(nk(), 3, 3, head_in[level], cout_c))
            reg_heads.append(_init_biased(nk(), 3, 3, head_in[level], cout_r))

    if background_bias:
        for level in range(4):
            h = cls_heads[level]
            tgt = h["pw"] if level < 3 else h
            tgt["b"] = tgt["b"].copy()
            tgt["b"][0::NUM_CLASSES] += background_bias

    return {
        "base": base,
        "extras": extras,
        "cls_heads": cls_heads,
        "reg_heads": reg_heads,
    }


# ---------------------------------------------------------------------------
# Convenience wrapper
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class UltraFace:
    """Bundles params + priors + variant geometry for one model instance."""

    variant: str
    params: Params
    priors: jax.Array
    width: int
    height: int

    @classmethod
    def create(
        cls,
        variant: str = "RFB-320",
        params: Params | None = None,
        *,
        rng: int = 0,
        background_bias: float = 0.0,
    ) -> "UltraFace":
        if variant not in VARIANTS:
            raise ValueError(f"unknown variant {variant!r}; have {list(VARIANTS)}")
        width, height = VARIANTS[variant]
        if params is None:
            arch = "slim" if variant.startswith("slim") else "RFB"
            params = init_params(rng, background_bias=background_bias,
                                 arch=arch)
        priors = jnp.asarray(generate_priors(width, height))
        return cls(variant=variant, params=params, priors=priors,
                   width=width, height=height)

    @property
    def num_priors(self) -> int:
        return int(self.priors.shape[0])

    def __call__(self, x: jax.Array, *,
                 compute_dtype: jnp.dtype = jnp.float32):
        return forward(self.params, x, self.priors,
                       compute_dtype=compute_dtype)
