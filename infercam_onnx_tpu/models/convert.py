"""Weight conversion: upstream checkpoints -> JAX parameter pytree.

Two sources are supported:

1. A torch-style state dict (parameter name -> numpy array) using the
   upstream Ultra-Light-Fast-Generic-Face-Detector-1MB naming scheme
   (``base_net.0.0.weight``, ``base_net.7.branch0.0.conv.weight``, ...).
   PyTorch's ONNX export preserves these names for graph initializers, so
   the same mapping serves both checkpoints and ONNX files.

2. The ONNX files the reference downloads (version-RFB-320/640 from
   onnx/models, reference infer_server/src/nn.rs:21-22,143-162) via a
   minimal, dependency-free protobuf wire parser (models/onnx_reader.py) —
   the `onnx` package is not available in this environment.

Conversions performed:
- NCHW conv weights (O, I/g, H, W) -> HWIO (H, W, I/g, O).
- BatchNorm (gamma, beta, mean, var) folded into a per-channel affine:
  scale = gamma / sqrt(var + eps), bias = beta - mean * scale. The forward
  pass then computes conv(x) * scale + bias, numerically identical to
  inference-mode BN (eps = 1e-5, upstream default).

The downloaded-model cache contract mirrors the reference
(reference nn.rs:149-162): files live under the user cache dir in an
``infercam_onnx_tpu`` folder and are fetched on miss (when the environment
has network access).
"""

from __future__ import annotations

from typing import Callable, Mapping

import numpy as np

from infercam_onnx_tpu.models.ultraface import BN_EPS

Array = np.ndarray
StateDict = Mapping[str, Array]

# Download links used by the reference (reference nn.rs:21-22) plus the
# slim family from the same upstream project.
ULTRAFACE_URLS = {
    "RFB-640": "https://github.com/onnx/models/raw/main/vision/body_analysis/ultraface/models/version-RFB-640.onnx",
    "RFB-320": "https://github.com/onnx/models/raw/main/vision/body_analysis/ultraface/models/version-RFB-320.onnx",
    "slim-640": "https://github.com/Linzaer/Ultra-Light-Fast-Generic-Face-Detector-1MB/raw/master/models/onnx/version-slim-640.onnx",
    "slim-320": "https://github.com/Linzaer/Ultra-Light-Fast-Generic-Face-Detector-1MB/raw/master/models/onnx/version-slim-320.onnx",
}


def _oihw_to_hwio(w: Array) -> Array:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _fold_bn(gamma: Array, beta: Array, mean: Array, var: Array,
             eps: float = BN_EPS) -> tuple[Array, Array]:
    scale = gamma / np.sqrt(var + eps)
    bias = beta - mean * scale
    return scale.astype(np.float32), bias.astype(np.float32)


class _Getter:
    """Fetches tensors from a state dict, tracking what was consumed."""

    def __init__(self, sd: StateDict):
        self.sd = dict(sd)
        self.used: set[str] = set()

    def __call__(self, name: str) -> Array:
        if name not in self.sd:
            raise KeyError(
                f"missing parameter {name!r}; available keys start with: "
                f"{sorted(self.sd)[:8]}"
            )
        self.used.add(name)
        return np.asarray(self.sd[name], dtype=np.float32)

    def unused(self) -> list[str]:
        return [k for k in self.sd if k not in self.used
                and "num_batches_tracked" not in k and k != "priors"]


def _cbr(g: _Getter, conv: str, bn: str) -> dict:
    scale, bias = _fold_bn(
        g(f"{bn}.weight"), g(f"{bn}.bias"),
        g(f"{bn}.running_mean"), g(f"{bn}.running_var"))
    return {"w": _oihw_to_hwio(g(f"{conv}.weight")),
            "scale": scale, "bias": bias}


def _basic_conv(g: _Getter, prefix: str) -> dict:
    return _cbr(g, f"{prefix}.conv", f"{prefix}.bn")


def _conv_dw(g: _Getter, prefix: str) -> dict:
    return {
        "dw": _cbr(g, f"{prefix}.0", f"{prefix}.1"),
        "pw": _cbr(g, f"{prefix}.3", f"{prefix}.4"),
    }


def _biased(g: _Getter, prefix: str) -> dict:
    return {"w": _oihw_to_hwio(g(f"{prefix}.weight")),
            "b": g(f"{prefix}.bias")}


def _separable(g: _Getter, prefix: str) -> dict:
    # upstream SeperableConv2d = Sequential(dw conv, ReLU, pw conv)
    return {"dw": _biased(g, f"{prefix}.0"), "pw": _biased(g, f"{prefix}.2")}


def params_from_state_dict(sd: StateDict, *, strict: bool = True) -> dict:
    """Build the JAX parameter pytree from upstream-named tensors."""
    import jax.numpy as jnp

    g = _Getter(sd)

    # block 7: BasicRFB (RFB family) or conv_dw (slim family) — detect
    # by checkpoint key
    if "base_net.7.branch0.0.conv.weight" in g.sd:
        block7 = {
            "branch0": [_basic_conv(g, f"base_net.7.branch0.{j}")
                        for j in range(3)],
            "branch1": [_basic_conv(g, f"base_net.7.branch1.{j}")
                        for j in range(3)],
            "branch2": [_basic_conv(g, f"base_net.7.branch2.{j}")
                        for j in range(4)],
            "conv_linear": _basic_conv(g, "base_net.7.ConvLinear"),
            "shortcut": _basic_conv(g, "base_net.7.shortcut"),
        }
    else:
        block7 = _conv_dw(g, "base_net.7")
    base: list[dict] = [
        _cbr(g, "base_net.0.0", "base_net.0.1"),
        *(_conv_dw(g, f"base_net.{i}") for i in range(1, 7)),
        block7,
        *(_conv_dw(g, f"base_net.{i}") for i in range(8, 13)),
    ]

    extras = {
        "proj": _biased(g, "extras.0.0"),
        "sep": _separable(g, "extras.0.2"),
    }

    cls_heads, reg_heads = [], []
    for level in range(4):
        if level < 3:
            cls_heads.append(
                _separable(g, f"classification_headers.{level}"))
            reg_heads.append(_separable(g, f"regression_headers.{level}"))
        else:
            cls_heads.append(_biased(g, f"classification_headers.{level}"))
            reg_heads.append(_biased(g, f"regression_headers.{level}"))

    if strict:
        leftovers = g.unused()
        if leftovers:
            raise ValueError(f"unconsumed parameters: {leftovers[:10]}")

    import jax

    params = {"base": base, "extras": extras,
              "cls_heads": cls_heads, "reg_heads": reg_heads}
    return jax.tree.map(jnp.asarray, params)


def params_from_onnx(path: str, *, strict: bool = True) -> dict:
    """Load an UltraFace ONNX file and convert its initializers.

    Uses the minimal protobuf reader in models/onnx_reader.py. Expects
    torch-export initializer naming (see module docstring).
    """
    from infercam_onnx_tpu.models.onnx_reader import read_onnx_initializers

    inits = read_onnx_initializers(path)
    return params_from_state_dict(inits, strict=strict)


def cached_model_path(variant: str) -> str:
    """Cache path for a downloaded ONNX file (reference nn.rs:149-156)."""
    import os

    cache = os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache"))
    d = os.path.join(cache, "infercam_onnx_tpu")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"ultraface-{variant}.onnx")


def load_or_download_params(
    variant: str,
    *,
    download: Callable[[str, str], None] | None = None,
) -> dict | None:
    """Download-on-miss load of real UltraFace weights.

    Returns None when the file is absent and no/failing downloader — callers
    fall back to random weights (this environment has no network egress;
    reference behavior is download-on-miss, reference nn.rs:157-162).
    """
    import os

    path = cached_model_path(variant)
    if not os.path.isfile(path):
        if download is None:
            from infercam_onnx_tpu.utils.download import download_file
            download = download_file
        try:
            download(ULTRAFACE_URLS[variant], path)
        except Exception:
            return None
    if not os.path.isfile(path):
        return None
    return params_from_onnx(path)
