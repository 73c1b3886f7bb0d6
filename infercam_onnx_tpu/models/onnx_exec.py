"""Execute an ONNX graph directly with JAX — the tract-equivalent path.

The reference never assumes the downloaded model's topology: it loads the
ONNX graph and *runs* it (reference infer_server/src/nn.rs:166-174: tract
onnx -> into_optimized -> into_runnable -> run). This module provides the
same capability TPU-natively: a small interpreter that maps the ONNX op
set used by UltraFace-style exports onto jax.numpy / lax ops. The whole
interpreted forward is jittable — tracing flattens the graph walk into one
XLA program, so an interpreted graph compiles to the same fused executable
a hand-written forward would.

It serves three roles:
1. an independent oracle: detection outputs of the native model
   (models/ultraface.py) are tested for equality against this executor
   running a real torch-exported graph (tests/test_onnx_graph.py);
2. a fallback runtime for real downloaded weights whose export style
   defeats name-based conversion (BN-folded exports rename initializers);
3. the loud-failure point for unsupported topologies: an unknown op or
   attribute raises immediately at build time, not silently at runtime.

Static-shape discipline: values that are numpy arrays stay concrete
through shape-manipulation chains (Shape -> Gather -> Unsqueeze ->
Concat -> Reshape), so dynamic-looking reshapes in the export resolve to
static shapes under jit — no data-dependent shapes reach XLA.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from infercam_onnx_tpu.models.onnx_reader import OnnxGraph, OnnxNode

_ONNX_DTYPES = {
    1: jnp.float32, 2: jnp.uint8, 3: jnp.int8, 4: jnp.uint16,
    5: jnp.int16, 6: jnp.int32, 7: jnp.int64, 9: jnp.bool_,
    10: jnp.float16, 11: jnp.float64, 12: jnp.uint32, 13: jnp.uint64,
}


def _is_concrete(*vals) -> bool:
    return all(isinstance(v, (np.ndarray, np.generic, int, float))
               for v in vals)


def _xp(*vals):
    """numpy for all-concrete inputs (keeps shape math static), else jnp."""
    return np if _is_concrete(*vals) else jnp


def _auto_pads(node: OnnxNode, spatial: tuple[int, ...],
               kernel, strides, dilations) -> list[int]:
    """Resolve pads for the explicit or auto_pad forms. Returns ONNX
    layout [begin..., end...]. SAME_UPPER puts the odd pad at the end,
    SAME_LOWER at the start (keras-lineage exports use these)."""
    mode = node.attrs.get("auto_pad", b"NOTSET")
    n = len(kernel)
    if mode in (b"", b"NOTSET"):
        return list(node.attrs.get("pads", [0] * (2 * n)))
    if mode == b"VALID":
        return [0] * (2 * n)
    if mode not in (b"SAME_UPPER", b"SAME_LOWER"):
        raise ValueError(
            f"auto_pad {mode!r} unsupported ({node.name})")
    begin, end = [], []
    for i in range(n):
        eff = dilations[i] * (kernel[i] - 1) + 1
        out_dim = -(-spatial[i] // strides[i])  # ceil
        total = max((out_dim - 1) * strides[i] + eff - spatial[i], 0)
        small, big = total // 2, total - total // 2
        if mode == b"SAME_UPPER":
            begin.append(small)
            end.append(big)
        else:
            begin.append(big)
            end.append(small)
    return begin + end


def _conv(node: OnnxNode, x, w, b=None):
    strides = node.attrs.get("strides", [1, 1])
    dilations = node.attrs.get("dilations", [1, 1])
    group = node.attrs.get("group", 1)
    pads = _auto_pads(node, x.shape[2:], w.shape[2:], strides,
                      dilations)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w),
        window_strides=tuple(strides),
        padding=((pads[0], pads[2]), (pads[1], pads[3])),
        rhs_dilation=tuple(dilations),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=int(group))
    if b is not None:
        out = out + jnp.asarray(b).reshape(1, -1, 1, 1)
    return out


def _batch_norm(node: OnnxNode, x, scale, bias, mean, var):
    # dtype-module-agnostic: the stats may be concrete numpy OR traced
    # jit arguments (GraphDetector passes weights as arguments)
    if not node.attrs.get("spatial", 1):
        raise ValueError(
            f"BatchNormalization spatial=0 unsupported ({node.name})")
    eps = node.attrs.get("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = scale * (var + eps) ** -0.5
    return (x - mean.reshape(shape)) * inv.reshape(shape) \
        + bias.reshape(shape)


def _pool_geometry(node: OnnxNode, x):
    """Shared window geometry for the pool family: kernel/stride/
    dilation/pads plus output dims and the ceil_mode right-extension
    (windows starting entirely in the right padding are dropped — the
    torch/ONNX rule). One definition so the values path (_pool) and
    the indices path (_max_pool_indices) can never drift."""
    ks = node.attrs["kernel_shape"]
    n = len(ks)
    strides = node.attrs.get("strides", [1] * n)
    dilations = node.attrs.get("dilations", [1] * n)
    pads = list(_auto_pads(node, x.shape[2:], ks, strides, dilations))
    ceil = node.attrs.get("ceil_mode", 0)
    out_dims, extra = [], []
    for i in range(n):
        span = (ks[i] - 1) * dilations[i] + 1
        total = int(x.shape[2 + i]) + pads[i] + pads[i + n]
        if ceil:
            o = -((span - total) // strides[i]) + 1
            if (o - 1) * strides[i] >= int(x.shape[2 + i]) + pads[i]:
                o -= 1
            extra.append(max((o - 1) * strides[i] + span - total, 0))
        else:
            o = (total - span) // strides[i] + 1
            extra.append(0)
        out_dims.append(o)
    return ks, strides, dilations, pads, out_dims, extra


def _max_pool_indices(node: OnnxNode, x):
    """MaxPool's second output (torch return_indices=True exports):
    ONNX-convention GLOBAL flat indices (row-major over [N, C, *D],
    storage_order=0) of each window's max. Built from statically
    shifted slices over the kernel offsets (prod(ks) slices — tiny for
    real kernels), so the argmax is one reduction under jit."""
    if node.attrs.get("storage_order", 0):
        raise ValueError(
            f"MaxPool storage_order=1 unsupported ({node.name})")
    import itertools

    idt = jax.dtypes.canonicalize_dtype(jnp.int64)
    ks, strides, dilations, pads, out_dims, extra = _pool_geometry(
        node, x)
    n = len(ks)
    spatial = [int(s) for s in x.shape[2:]]
    # pad with the dtype's own identity so padding never wins the
    # argmax — and compare in the INPUT dtype: a float32 downcast would
    # make values that differ only below f32 precision (float64, large
    # ints) tie and pick an index disagreeing with the values output
    xc = jnp.asarray(x)
    if jnp.issubdtype(xc.dtype, jnp.floating):
        pad_val = -jnp.inf
    elif jnp.issubdtype(xc.dtype, jnp.integer):
        pad_val = jnp.iinfo(xc.dtype).min
    else:  # bool
        pad_val = False
    xp = jnp.pad(
        xc,
        ((0, 0), (0, 0)) + tuple(
            (pads[i], pads[i + n] + extra[i]) for i in range(n)),
        constant_values=pad_val)
    slabs, flat_pos, valid = [], [], []
    for offs in itertools.product(*(range(k) for k in ks)):
        sl = [slice(None), slice(None)]
        for i in range(n):
            start = offs[i] * dilations[i]
            sl.append(slice(start,
                            start + (out_dims[i] - 1) * strides[i] + 1,
                            strides[i]))
        slabs.append(xp[tuple(sl)])
        # input coordinate of this tap for every output cell, as the
        # per-axis contribution to the global flat index + validity
        pos = jnp.zeros((1, 1) + tuple(out_dims), idt)
        ok = jnp.ones((1, 1) + tuple(out_dims), bool)
        mult = 1
        for i in reversed(range(n)):
            coord = (jnp.arange(out_dims[i], dtype=idt)
                     * strides[i] - pads[i] + offs[i] * dilations[i])
            shape = [1] * (n + 2)
            shape[2 + i] = out_dims[i]
            coord = coord.reshape(shape)
            ok = ok & (coord >= 0) & (coord < spatial[i])
            pos = pos + coord * mult
            mult *= spatial[i]
        flat_pos.append(pos)
        valid.append(ok)
    stack = jnp.stack(slabs)  # [K, N, C, *out]
    # first VALID tap among the maxima: torch's tie rule, and the only
    # correct answer when every real value is -inf (padding taps then
    # compare equal to the max but must never be chosen — a plain
    # argmax would return a padding position, which MaxUnpool's
    # negative indexing would wrap into unrelated cells)
    m = jnp.max(stack, axis=0, keepdims=True)
    is_best = (stack == m) & jnp.stack(valid)
    best = jnp.argmax(is_best, axis=0)
    pos = jnp.take_along_axis(jnp.stack(flat_pos), best[None],
                              axis=0)[0]
    plane = int(np.prod(spatial))
    nb, c = x.shape[0], x.shape[1]
    base = (jnp.arange(nb, dtype=idt)[:, None] * c
            + jnp.arange(c, dtype=idt)[None, :]) * plane
    return pos + base.reshape((nb, c) + (1,) * n)


def _max_pool(node: OnnxNode, x):
    out = _pool(node, x, jax.lax.max, -jnp.inf, indices_ok=True)
    if len(node.outputs) < 2:
        return out
    return out, _max_pool_indices(node, x)


def _max_unpool(node: OnnxNode, x, idx, output_shape=None):
    """MaxUnpool: scatter pooled values back to the indices' positions
    (indices are ONNX global flat, which makes this one .at[].set)."""
    ks = node.attrs["kernel_shape"]
    n = len(ks)
    strides = node.attrs.get("strides", [1] * n)
    pads = node.attrs.get("pads", [0] * (2 * n))
    if output_shape is not None:
        if not _is_concrete(output_shape):
            raise ValueError(
                f"MaxUnpool with traced output_shape ({node.name})")
        shape = tuple(int(v) for v in np.asarray(output_shape)
                      .reshape(-1))
    else:
        shape = tuple(x.shape[:2]) + tuple(
            (int(x.shape[2 + i]) - 1) * strides[i] - pads[i]
            - pads[i + n] + ks[i] for i in range(n))
    x = jnp.asarray(x)
    idx = jnp.asarray(idx)
    flat = jnp.zeros((int(np.prod(shape)),), x.dtype)
    flat = flat.at[idx.reshape(-1)].set(x.reshape(-1))
    return flat.reshape(shape)


def _pool(node: OnnxNode, x, reducer, init, is_avg=False,
          indices_ok=False):
    if len(node.outputs) > 1 and not indices_ok:
        raise ValueError(
            f"pool with indices output unsupported ({node.name})")
    # ceil_mode's `extra` = right padding with the reduction's identity
    # (so padded cells never affect the result); see _pool_geometry
    ks, strides, dilations, pads, _, extra = _pool_geometry(node, x)
    n = len(ks)
    window = (1, 1) + tuple(ks)
    strd = (1, 1) + tuple(strides)
    padding = ((0, 0), (0, 0)) + tuple(
        (pads[i], pads[i + n] + extra[i]) for i in range(n))
    out = jax.lax.reduce_window(
        jnp.asarray(x), init, reducer, window, strd, padding,
        window_dilation=(1, 1) + tuple(dilations))
    if is_avg:
        include_pad = node.attrs.get("count_include_pad", 0)
        if include_pad and not any(extra):
            out = out / float(np.prod(ks))
        elif not include_pad and not any(pads) and not any(extra):
            out = out / float(np.prod(ks))
        else:
            # divisor = elements each window actually covers: real
            # cells only (count_include_pad=0), or real + EXPLICIT
            # padding but never the ceil_mode extension
            # (count_include_pad=1, torch semantics)
            if include_pad:
                ones = jnp.ones(
                    (1, 1) + tuple(int(x.shape[2 + i]) + pads[i]
                                   + pads[i + n] for i in range(n)),
                    jnp.float32)
                div_padding = ((0, 0), (0, 0)) + tuple(
                    (0, extra[i]) for i in range(n))
            else:
                ones = jnp.ones((1, 1) + x.shape[2:], jnp.float32)
                div_padding = padding
            div = jax.lax.reduce_window(ones, 0.0, jax.lax.add,
                                        window, strd, div_padding)
            out = out / div.astype(out.dtype)
    return out


def _instance_norm(node: OnnxNode, x, scale, bias):
    eps = node.attrs.get("epsilon", 1e-5)
    axes = tuple(range(2, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return (scale.reshape(shape) * (x - mean)
            / jnp.sqrt(var + eps) + bias.reshape(shape))


def _layer_norm(node: OnnxNode, x, scale, bias=None):
    eps = node.attrs.get("epsilon", 1e-5)
    axis = node.attrs.get("axis", -1)
    axes = tuple(range(axis % x.ndim, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    inv_std = 1.0 / jnp.sqrt(var + eps)
    out = (x - mean) * inv_std * scale
    if bias is not None:
        out = out + bias
    if len(node.outputs) == 1:
        return out
    # spec: optional Mean and InvStdDev outputs (kept reduced-rank
    # with keepdims, the shape the spec's "reduced" wording implies)
    outs = (out, mean, inv_std)
    return outs[:len(node.outputs)]


def _group_norm(node: OnnxNode, x, scale, bias):
    eps = node.attrs.get("epsilon", 1e-5)
    groups = int(node.attrs["num_groups"])
    b, c = x.shape[0], x.shape[1]
    g = jnp.reshape(x, (b, groups, c // groups) + x.shape[2:])
    axes = tuple(range(2, g.ndim))
    mean = jnp.mean(g, axis=axes, keepdims=True)
    var = jnp.var(g, axis=axes, keepdims=True)
    g = (g - mean) / jnp.sqrt(var + eps)
    out = g.reshape(x.shape)
    # opset 18 passes per-GROUP scale/bias [num_groups]; opset 21 (and
    # torch) per-CHANNEL [C] — broadcast the per-group form up
    if scale.shape[0] == groups and groups != c:
        scale = jnp.repeat(jnp.asarray(scale), c // groups)
        bias = jnp.repeat(jnp.asarray(bias), c // groups)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return scale.reshape(shape) * out + bias.reshape(shape)


def _global_pool(node: OnnxNode, x, is_avg: bool):
    axes = tuple(range(2, x.ndim))
    xp = _xp(x)
    if is_avg:
        return xp.mean(x, axis=axes, keepdims=True)
    return xp.max(x, axis=axes, keepdims=True)


def _gemm(node: OnnxNode, a, b, c=None):
    alpha = node.attrs.get("alpha", 1.0)
    beta = node.attrs.get("beta", 1.0)
    if node.attrs.get("transA", 0):
        a = a.T
    if node.attrs.get("transB", 0):
        b = b.T
    out = alpha * (a @ b)
    if c is not None:
        out = out + beta * c
    return out


def _conv_transpose(node: OnnxNode, x, w, b=None):
    """ONNX ConvTranspose as an input-dilated regular conv. Kernel
    layout is (C_in, C_out/group, kH, kW); flip spatially and swap the
    io axes (per group) to express it with conv_general_dilated."""
    group = int(node.attrs.get("group", 1))
    kh, kw = w.shape[2], w.shape[3]
    strides = node.attrs.get("strides", [1, 1])
    dil = node.attrs.get("dilations", [1, 1])
    pads = node.attrs.get("pads", [0, 0, 0, 0])
    opad = node.attrs.get("output_padding", [0, 0])
    auto = node.attrs.get("auto_pad", b"NOTSET") or b"NOTSET"
    oshape = node.attrs.get("output_shape")
    if oshape is not None or auto in (b"SAME_UPPER", b"SAME_LOWER"):
        # spec: pads are DERIVED from the requested output size
        # (output_shape overrides pads; SAME_* implies out = in*stride),
        # split per the SAME_UPPER/other distribution rule
        if oshape is not None:
            osp = [int(v) for v in np.asarray(oshape).reshape(-1)][-2:]
        else:
            osp = [int(x.shape[2 + i]) * strides[i] for i in range(2)]
        pads = [0, 0, 0, 0]
        for i in range(2):
            k = (kh, kw)[i]
            total = (strides[i] * (int(x.shape[2 + i]) - 1) + opad[i]
                     + (k - 1) * dil[i] + 1 - osp[i])
            if auto == b"SAME_UPPER":
                pads[i], pads[i + 2] = total // 2, total - total // 2
            else:
                pads[i], pads[i + 2] = total - total // 2, total // 2
    elif auto not in (b"", b"NOTSET", b"VALID"):
        raise ValueError(
            f"ConvTranspose auto_pad {auto!r} unsupported "
            f"({node.name})")
    w = jnp.asarray(w)[:, :, ::-1, ::-1]
    cin, cog = w.shape[0], w.shape[1]
    # (C_in, C_out/g, kH, kW) -> (g, C_in/g, C_out/g, ...) -> (C_out, C_in/g, ...)
    w = w.reshape(group, cin // group, cog, kh, kw)
    w = w.transpose(0, 2, 1, 3, 4).reshape(group * cog, cin // group,
                                           kh, kw)
    eff = (dil[0] * (kh - 1), dil[1] * (kw - 1))
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x), w,
        window_strides=(1, 1),
        padding=((eff[0] - pads[0], eff[0] - pads[2] + opad[0]),
                 (eff[1] - pads[1], eff[1] - pads[3] + opad[1])),
        lhs_dilation=tuple(strides),
        rhs_dilation=tuple(dil),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=group)
    if b is not None:
        out = out + jnp.asarray(b).reshape(1, -1, 1, 1)
    return out


def _pad(node: OnnxNode, x, pads=None, value=None, axes=None):
    mode = node.attrs.get("mode", b"constant").decode()
    if pads is None:  # opset < 11: attributes (plain int lists)
        pads = node.attrs["pads"]
        value = node.attrs.get("value", 0.0)
    elif not _is_concrete(pads):
        raise ValueError(f"Pad with traced pads ({node.name})")
    pads = np.asarray(pads).reshape(-1).tolist()
    ax = (list(range(x.ndim)) if axes is None
          else np.asarray(axes).reshape(-1).tolist())
    n = len(pads) // 2
    width = [(0, 0)] * x.ndim
    for i, a in enumerate(ax):
        width[a] = (int(pads[i]), int(pads[i + n]))
    # negative pads mean CROPPING (ONNX spec); slice those off first
    if any(lo < 0 or hi < 0 for lo, hi in width):
        sl = tuple(
            slice(max(-lo, 0), x.shape[d] - max(-hi, 0))
            for d, (lo, hi) in enumerate(width))
        x = x[sl]
        width = [(max(lo, 0), max(hi, 0)) for lo, hi in width]
    xp = _xp(x)
    if mode == "constant":
        cval = 0.0 if value is None else float(np.asarray(value))
        return xp.pad(x, width, constant_values=cval)
    # ONNX "edge"/"reflect"/"wrap" match the numpy mode names
    return xp.pad(x, width, mode=mode)


def _reduce(node: OnnxNode, x, axes=None, *, kind: str):
    if axes is None:
        axes = node.attrs.get("axes")
    elif not _is_concrete(axes):
        raise ValueError(f"Reduce with traced axes ({node.name})")
    if axes is not None:
        axes = tuple(int(a) for a in np.asarray(axes).reshape(-1))
    if not axes and node.attrs.get("noop_with_empty_axes", 0):
        return x
    axes = axes or None
    keep = bool(node.attrs.get("keepdims", 1))
    return getattr(_xp(x), kind)(x, axis=axes, keepdims=keep)


def _split(node: OnnxNode, x, split=None):
    axis = node.attrs.get("axis", 0)
    if split is None:
        split = node.attrs.get("split")
    if split is None:
        k = node.attrs.get("num_outputs", len(node.outputs))
        # opset-18 semantics: chunk = ceil(dim/k), last chunk smaller
        # (possibly zero) when the axis does not divide evenly
        dim = x.shape[axis]
        chunk = -(-dim // k) if dim else 0
        split = [min(chunk, max(0, dim - i * chunk)) for i in range(k)]
    else:
        split = np.asarray(split).reshape(-1).tolist()
    offsets = np.cumsum([0] + [int(s) for s in split])
    sl = [slice(None)] * x.ndim
    outs = []
    for lo, hi in zip(offsets[:-1], offsets[1:]):
        sl[axis] = slice(int(lo), int(hi))
        outs.append(x[tuple(sl)])
    return tuple(outs) if len(outs) > 1 else outs[0]


def _dropout(node: OnnxNode, x, *_ignored):
    # inference mode: identity (+ all-true mask if the export kept it)
    if len(node.outputs) > 1:
        return x, _xp(x).ones(x.shape, bool)
    return x


def _resize_matrix(n_in: int, n_out: int, mode: str, coord: str,
                   nearest_mode: str, cubic_a: float = -0.75,
                   antialias: bool = False,
                   exclude_outside: bool = False) -> np.ndarray:
    """[n_out, n_in] interpolation matrix for one axis — resize becomes
    two MXU matmuls (same scheme as ops/preprocess.py). Supports the
    coordinate transforms torch exports emit."""
    i = np.arange(n_out, dtype=np.float64)
    scale = n_in / n_out
    if coord == "half_pixel":
        src = (i + 0.5) * scale - 0.5
    elif coord == "asymmetric":
        src = i * scale
    elif coord == "align_corners":
        src = i * ((n_in - 1) / max(n_out - 1, 1))
    elif coord == "pytorch_half_pixel":
        src = (i + 0.5) * scale - 0.5 if n_out > 1 else np.zeros_like(i)
    else:
        raise ValueError(f"Resize coordinate mode {coord!r} unsupported")
    if antialias and mode in ("linear", "cubic") and n_in > n_out:
        # antialias=1 downscale (torch interpolate(antialias=True) /
        # PIL): stretch the filter support by the scale factor, drop
        # out-of-range taps, renormalize each row. torch emits
        # cubic_coeff_a=-0.5 for AA bicubic — honored via the attr.
        # torch's truncated [xmin, xmax) tap window equals this dense
        # form: every tap it excludes has exactly zero filter weight.
        # torch/PIL AA convention: the tap argument is always
        # (j + 0.5 - fscale*(i + 0.5)) / fscale — only the SCALE
        # follows align_corners ((in-1)/(out-1) vs in/out), never the
        # center origin. (The onnx reference centers on the
        # coordinate-transformed source instead; for half_pixel the
        # two coincide exactly, and torch eager is the convention any
        # torch-exported model was trained against.)
        if coord == "align_corners":
            fscale = max((n_in - 1) / max(n_out - 1, 1), 1.0)
        else:
            fscale = scale
        radius = 1.0 if mode == "linear" else 2.0
        src_aa = fscale * (i + 0.5) - 0.5
        d = np.abs(np.arange(n_in)[None, :] - src_aa[:, None]) / fscale
        if mode == "linear":
            w = np.maximum(0.0, 1.0 - d)
        else:
            a = cubic_a
            w = np.where(
                d <= 1, (a + 2) * d**3 - (a + 3) * d**2 + 1,
                np.where(d < 2,
                         a * d**3 - 5 * a * d**2 + 8 * a * d - 4 * a,
                         0.0))
        w[d >= radius] = 0.0
        w /= np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
        return w.astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    if mode == "nearest":
        if nearest_mode == "floor":
            idx = np.floor(src)
        elif nearest_mode == "ceil":
            idx = np.ceil(src)
        elif nearest_mode == "round_prefer_ceil":
            idx = np.floor(src + 0.5)
        else:  # round_prefer_floor
            idx = np.ceil(src - 0.5)
        idx = np.clip(idx, 0, n_in - 1).astype(np.int64)
        m[np.arange(n_out), idx] = 1.0
    elif mode == "cubic":
        # 4-tap Keys kernel; the ONNX default cubic_coeff_a = -0.75
        # matches torch bicubic, but any coefficient works (e.g. -0.5,
        # the Catmull-Rom spline some exporters emit)
        a = cubic_a
        base = np.floor(src).astype(np.int64)
        frac = src - base
        for tap in range(-1, 3):
            d = np.abs(frac - tap)
            w = np.where(
                d <= 1, (a + 2) * d**3 - (a + 3) * d**2 + 1,
                np.where(d < 2,
                         a * d**3 - 5 * a * d**2 + 8 * a * d - 4 * a,
                         0.0))
            raw = base + tap
            if exclude_outside:
                # spec: out-of-range taps get weight 0 and each row
                # renormalizes (tf2onnx-style exports), instead of the
                # default clamp-to-edge accumulation
                w = np.where((raw < 0) | (raw >= n_in), 0.0, w)
            idx = np.clip(raw, 0, n_in - 1)
            np.add.at(m, (np.arange(n_out), idx), w.astype(np.float32))
        if exclude_outside:
            m /= np.maximum(m.sum(axis=1, keepdims=True), 1e-12)
    else:  # linear
        lo = np.floor(src).astype(np.int64)
        hi = lo + 1
        frac = np.clip(src - lo, 0.0, 1.0).astype(np.float32)
        w_lo, w_hi = 1.0 - frac, frac
        if exclude_outside:
            w_lo = np.where((lo < 0) | (lo >= n_in), 0.0, w_lo)
            w_hi = np.where((hi < 0) | (hi >= n_in), 0.0, w_hi)
        m[np.arange(n_out), np.clip(lo, 0, n_in - 1)] += w_lo
        m[np.arange(n_out), np.clip(hi, 0, n_in - 1)] += w_hi
        if exclude_outside:
            m /= np.maximum(m.sum(axis=1, keepdims=True), 1e-12)
    return m


def _resize(node: OnnxNode, x, roi=None, scales=None, sizes=None):
    legacy = node.attrs.get("_opset", 13) < 11
    if legacy and scales is None and sizes is None \
            and roi is not None:
        # opset-10 Resize has inputs (X, scales) — no roi slot
        roi, scales = None, roi
    mode = node.attrs.get("mode", b"nearest").decode()
    if legacy:
        # opset-10 semantics: asymmetric coordinates, floor rounding
        coord, nearest = "asymmetric", "floor"
    else:
        coord = node.attrs.get(
            "coordinate_transformation_mode", b"half_pixel").decode()
        nearest = node.attrs.get(
            "nearest_mode", b"round_prefer_floor").decode()
    if mode not in ("nearest", "linear", "cubic"):
        raise ValueError(f"Resize mode {mode!r} unsupported ({node.name})")
    cubic_a = float(node.attrs.get("cubic_coeff_a", -0.75))
    # antialias=1 affects only linear/cubic downscale axes (the spec
    # defines it as a no-op otherwise); exclude_outside=1 zeroes
    # out-of-range taps and renormalizes (tf2onnx-style exports) —
    # both handled in _resize_matrix
    antialias = bool(node.attrs.get("antialias", 0))
    exclude = bool(node.attrs.get("exclude_outside", 0))
    if scales is not None and np.asarray(scales).size == 0:
        scales = None
    if not _is_concrete(scales if sizes is None else sizes):
        raise ValueError(f"Resize with traced geometry ({node.name})")
    # opset 18+: scales/sizes may cover only the named axes
    axes = node.attrs.get("axes")
    axes = (list(range(x.ndim)) if axes is None
            else [int(a) % x.ndim for a in axes])
    if sizes is not None:
        out_shape = list(x.shape)
        for a, s in zip(axes, np.asarray(sizes).reshape(-1)):
            out_shape[a] = int(s)
    elif scales is not None:
        sc = np.asarray(scales, np.float64).reshape(-1)
        out_shape = list(x.shape)
        for a, s in zip(axes, sc):
            out_shape[a] = int(np.floor(x.shape[a] * s))
    else:
        raise ValueError(f"Resize without scales/sizes ({node.name})")
    if list(out_shape[:2]) != list(x.shape[:2]):
        raise ValueError(
            f"Resize over batch/channel axes unsupported ({node.name})")
    out = jnp.asarray(x)
    for ax in range(2, x.ndim):
        if out_shape[ax] == x.shape[ax]:
            continue
        m = _resize_matrix(x.shape[ax], out_shape[ax], mode, coord,
                           nearest, cubic_a, antialias, exclude)
        out = jnp.moveaxis(
            jnp.tensordot(out, m.astype(out.dtype), axes=((ax,), (1,))),
            -1, ax)
    return out


def _upsample(node: OnnxNode, x, scales=None):
    if scales is None:  # opset <= 8: attribute (plain float list)
        scales = np.asarray(node.attrs["scales"], np.float64)
    node = OnnxNode("Resize", node.name, node.inputs, node.outputs,
                    {"mode": node.attrs.get("mode", b"nearest"),
                     "coordinate_transformation_mode": b"asymmetric",
                     "nearest_mode": b"floor"})
    return _resize(node, x, None, scales, None)


def _depth_to_space(node: OnnxNode, x):
    b, c, h, w = x.shape
    k = int(node.attrs["blocksize"])
    if node.attrs.get("mode", b"DCR") == b"DCR":
        y = x.reshape(b, k, k, c // (k * k), h, w)
        y = y.transpose(0, 3, 4, 1, 5, 2)
    else:  # CRD
        y = x.reshape(b, c // (k * k), k, k, h, w)
        y = y.transpose(0, 1, 4, 2, 5, 3)
    return y.reshape(b, c // (k * k), h * k, w * k)


def _space_to_depth(node: OnnxNode, x):
    b, c, h, w = x.shape
    k = int(node.attrs["blocksize"])
    y = x.reshape(b, c, h // k, k, w // k, k)
    return y.transpose(0, 3, 5, 1, 2, 4).reshape(
        b, c * k * k, h // k, w // k)


def _lrn(node: OnnxNode, x):
    alpha = node.attrs.get("alpha", 1e-4)
    beta = node.attrs.get("beta", 0.75)
    bias = node.attrs.get("bias", 1.0)
    size = int(node.attrs["size"])
    sq = jnp.asarray(x) ** 2
    # sum over a size-window along C, centered (ONNX: floor((size-1)/2)
    # before, the rest after)
    lo = (size - 1) // 2
    acc = jax.lax.reduce_window(
        sq, 0.0, jax.lax.add, (1, size, 1, 1), (1, 1, 1, 1),
        ((0, 0), (lo, size - 1 - lo), (0, 0), (0, 0)))
    return x / (bias + (alpha / size) * acc) ** beta


def _constant_of_shape(node: OnnxNode, shape):
    if not _is_concrete(shape):
        raise ValueError(f"ConstantOfShape traced shape ({node.name})")
    val = node.attrs.get("value")
    val = np.zeros(1, np.float32) if val is None else np.asarray(val)
    return np.full([int(s) for s in np.asarray(shape).reshape(-1)],
                   val.reshape(-1)[0], val.dtype)


def _expand(node: OnnxNode, x, shape):
    if not _is_concrete(shape):
        raise ValueError(f"Expand with traced shape ({node.name})")
    target = [int(s) for s in np.asarray(shape).reshape(-1)]
    # ONNX Expand = numpy broadcasting, but dims of 1 in `shape` keep
    # the input's size
    xs = list(x.shape)
    while len(xs) < len(target):
        xs.insert(0, 1)
    out = [max(a, b) for a, b in zip(xs, target)]
    return _xp(x).broadcast_to(x.reshape(xs), out)


def _reshape(node: OnnxNode, x, shape):
    if not _is_concrete(shape):
        raise ValueError(f"Reshape with traced shape ({node.name})")
    shape = np.asarray(shape).reshape(-1).tolist()
    out = []
    for i, s in enumerate(shape):
        out.append(x.shape[i] if s == 0 else int(s))
    return x.reshape(out)


def _slice(node: OnnxNode, x, starts=None, ends=None, axes=None,
           steps=None):
    if starts is None:  # opset < 10: attributes
        starts = node.attrs["starts"]
        ends = node.attrs["ends"]
        axes = node.attrs.get("axes")
    starts = np.asarray(starts).tolist()
    ends = np.asarray(ends).tolist()
    axes = (list(range(len(starts))) if axes is None
            else np.asarray(axes).tolist())
    steps = ([1] * len(starts) if steps is None
             else np.asarray(steps).tolist())
    slices = [slice(None)] * x.ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        # ONNX clamps out-of-range ends (INT_MAX idiom)
        en = min(en, np.iinfo(np.int32).max)
        slices[ax] = slice(int(st), int(en), int(sp))
    return x[tuple(slices)]


def _softmax(node: OnnxNode, x, log: bool = False):
    # opset < 13: flattened-2D semantics — softmax over ALL dims from
    # `axis` on (default axis 1), not just one axis. Identical when
    # axis is the last dim (the common export shape), different
    # otherwise. The reader records the model opset; subgraph nodes
    # inherit it via the build-time annotation pass.
    opset = node.attrs.get("_opset", 13)
    if opset < 13:
        axis = int(node.attrs.get("axis", 1)) % max(x.ndim, 1)
        shape = x.shape
        lead = int(np.prod(shape[:axis])) if axis else 1
        flat = x.reshape(lead, -1)
        out = (jax.nn.log_softmax(jnp.asarray(flat), axis=-1) if log
               else jax.nn.softmax(jnp.asarray(flat), axis=-1))
        return out.reshape(shape)
    axis = node.attrs.get("axis", -1)
    if log:
        return jax.nn.log_softmax(jnp.asarray(x), axis=axis)
    xp = _xp(x)
    if xp is np:
        e = np.exp(x - x.max(axis=axis, keepdims=True))
        return e / e.sum(axis=axis, keepdims=True)
    return jax.nn.softmax(x, axis=axis)


def _div(a, b):
    """ONNX Div: true division for floats, C-style TRUNCATING integer
    division for integer tensors (exporters lean on this for shape
    math — e.g. torch.chunk emits (size+k-1) Div k on int64)."""
    a_int = np.issubdtype(np.asarray(a).dtype
                          if _is_concrete(a) else a.dtype,
                          np.integer)
    b_int = np.issubdtype(np.asarray(b).dtype
                          if _is_concrete(b) else b.dtype,
                          np.integer)
    if not (a_int and b_int):
        return a / b
    q = a // b
    # floor -> trunc adjustment for mixed signs with a remainder
    return q + ((a - q * b != 0) & ((a < 0) != (b < 0)))


def _gather(node: OnnxNode, x, idx):
    axis = node.attrs.get("axis", 0)
    return _xp(x, idx).take(
        x, np.asarray(idx) if _is_concrete(idx) else idx, axis=axis)


def _unsqueeze(node: OnnxNode, x, axes=None):
    axes = (node.attrs["axes"] if axes is None
            else np.asarray(axes).tolist())
    for ax in sorted(axes):
        x = _xp(x).expand_dims(x, ax)
    return x


def _squeeze(node: OnnxNode, x, axes=None):
    axes = (node.attrs.get("axes") if axes is None
            else np.asarray(axes).tolist())
    if axes is None:
        return x.squeeze()
    return x.squeeze(tuple(int(a) for a in axes))


def _clip(node: OnnxNode, x, lo=None, hi=None):
    lo = node.attrs.get("min") if lo is None else lo
    hi = node.attrs.get("max") if hi is None else hi
    return _xp(x).clip(x, lo, hi)


_OPS: dict[str, Callable] = {
    "Conv": _conv,
    "BatchNormalization": _batch_norm,
    "Relu": lambda n, x: _xp(x).maximum(x, 0),
    "Add": lambda n, a, b: a + b,
    "Sub": lambda n, a, b: a - b,
    "Mul": lambda n, a, b: a * b,
    "Div": lambda n, a, b: _div(a, b),
    "Exp": lambda n, x: _xp(x).exp(x),
    "Sqrt": lambda n, x: _xp(x).sqrt(x),
    "Sigmoid": lambda n, x: jax.nn.sigmoid(x),
    "Identity": lambda n, x: x,
    "Concat": lambda n, *xs: _xp(*xs).concatenate(
        xs, axis=n.attrs.get("axis", 0)),
    "Transpose": lambda n, x: _xp(x).transpose(
        x, n.attrs.get("perm")),
    "Reshape": _reshape,
    "Flatten": lambda n, x: x.reshape(
        int(np.prod(x.shape[:n.attrs.get("axis", 1)]) or 1), -1),
    # opset 15+: optional start/end attrs slice the shape (negatives
    # clamp per spec)
    "Shape": lambda n, x: np.asarray(
        x.shape[slice(n.attrs.get("start", 0), n.attrs.get("end"))],
        np.int64),
    "Gather": _gather,
    "Unsqueeze": _unsqueeze,
    "Squeeze": _squeeze,
    "Cast": lambda n, x: _xp(x).asarray(x).astype(
        _ONNX_DTYPES[n.attrs["to"]] if _xp(x) is jnp
        else np.dtype(jnp.dtype(_ONNX_DTYPES[n.attrs["to"]]).name)),
    "Softmax": _softmax,
    "Slice": _slice,
    "MaxPool": _max_pool,
    "MaxUnpool": _max_unpool,
    "AveragePool": lambda n, x: _pool(n, x, jax.lax.add, 0.0,
                                      is_avg=True),
    "Clip": _clip,
    "Constant": lambda n: n.attrs["value"],
    # -- general small-model coverage beyond the UltraFace export (the
    # reference's runtime is a general ONNX executor, nn.rs:166-174) --
    "Gemm": _gemm,
    "MatMul": lambda n, a, b: a @ b,
    "GlobalAveragePool": lambda n, x: _global_pool(n, x, True),
    "GlobalMaxPool": lambda n, x: _global_pool(n, x, False),
    "ConvTranspose": _conv_transpose,
    "Pad": _pad,
    "Resize": _resize,
    "Upsample": _upsample,
    "Split": _split,
    "Dropout": _dropout,
    "LRN": _lrn,
    "DepthToSpace": _depth_to_space,
    "SpaceToDepth": _space_to_depth,
    "ConstantOfShape": _constant_of_shape,
    "Expand": _expand,
    "ReduceMean": lambda n, x, axes=None: _reduce(n, x, axes,
                                                 kind="mean"),
    "ReduceSum": lambda n, x, axes=None: _reduce(n, x, axes, kind="sum"),
    "ReduceMax": lambda n, x, axes=None: _reduce(n, x, axes, kind="max"),
    "ReduceMin": lambda n, x, axes=None: _reduce(n, x, axes, kind="min"),
    "ReduceProd": lambda n, x, axes=None: _reduce(n, x, axes,
                                                  kind="prod"),
    "LeakyRelu": lambda n, x: jnp.where(
        x >= 0, x, n.attrs.get("alpha", 0.01) * x),
    "PRelu": lambda n, x, slope: _prelu(x, slope),
    "Elu": lambda n, x: jnp.where(
        x >= 0, x, n.attrs.get("alpha", 1.0) * (jnp.exp(x) - 1)),
    "Selu": lambda n, x: n.attrs.get("gamma", 1.0507009873554805) *
    jnp.where(x >= 0, x,
              n.attrs.get("alpha", 1.6732632423543772) *
              (jnp.exp(x) - 1)),
    "Tanh": lambda n, x: _xp(x).tanh(x),
    "Erf": lambda n, x: jax.lax.erf(jnp.asarray(x)),
    "HardSigmoid": lambda n, x: jnp.clip(
        n.attrs.get("alpha", 0.2) * x + n.attrs.get("beta", 0.5), 0, 1),
    "HardSwish": lambda n, x: x * jnp.clip(x / 6.0 + 0.5, 0, 1),
    "Softplus": lambda n, x: jax.nn.softplus(jnp.asarray(x)),
    "Pow": lambda n, a, b: a ** b,
    "Neg": lambda n, x: -x,
    "Abs": lambda n, x: _xp(x).abs(x),
    "Floor": lambda n, x: _xp(x).floor(x),
    "Ceil": lambda n, x: _xp(x).ceil(x),
    "Reciprocal": lambda n, x: 1.0 / x,
    "Log": lambda n, x: _xp(x).log(x),
    "Min": lambda n, *xs: _min_max(xs, "minimum"),
    "Max": lambda n, *xs: _min_max(xs, "maximum"),
    "Where": lambda n, c, a, b: _xp(c, a, b).where(c, a, b),
    "Equal": lambda n, a, b: a == b,
    "Greater": lambda n, a, b: a > b,
    "GreaterOrEqual": lambda n, a, b: a >= b,
    "Less": lambda n, a, b: a < b,
    "LessOrEqual": lambda n, a, b: a <= b,
    "Not": lambda n, x: ~x,
    "And": lambda n, a, b: a & b,
    "Or": lambda n, a, b: a | b,
    "ArgMax": lambda n, x: _argminmax(n, x, "argmax"),
    "ArgMin": lambda n, x: _argminmax(n, x, "argmin"),
    # defined below the table (late-bound via lambda)
    "TopK": lambda n, x, k=None: _topk(n, x, k),
    "NonMaxSuppression": lambda n, *a: _nms_onnx(n, *a),
    "InstanceNormalization": _instance_norm,
    "GroupNormalization": _group_norm,
    "LayerNormalization": lambda n, x, scale, b=None: _layer_norm(
        n, x, scale, b),
    "Einsum": lambda n, *xs: jnp.einsum(
        n.attrs["equation"].decode(), *xs),
    "Shrink": lambda n, x: jnp.where(
        x > n.attrs.get("lambd", 0.5),
        x - n.attrs.get("bias", 0.0),
        jnp.where(x < -n.attrs.get("lambd", 0.5),
                  x + n.attrs.get("bias", 0.0), 0.0)),
    "IsNaN": lambda n, x: _xp(x).isnan(x),
    "IsInf": lambda n, x: (
        _xp(x).isinf(x)
        & ((x > 0) if not n.attrs.get("detect_negative", 1)
           else (x == x))
        & ((x < 0) if not n.attrs.get("detect_positive", 1)
           else (x == x))),
    "EyeLike": lambda n, x: _xp(x).eye(
        x.shape[0], x.shape[1], k=n.attrs.get("k", 0),
        dtype=(_ONNX_DTYPES[n.attrs["dtype"]] if "dtype" in n.attrs
               else x.dtype)),
    "Trilu": lambda n, x, k=None: (
        _xp(x).tril if not n.attrs.get("upper", 1)
        else _xp(x).triu)(
            x, int(np.asarray(k).reshape(())) if k is not None else 0),
    "OneHot": lambda n, idx, depth, values: _one_hot(
        n, idx, depth, values),
    "GridSample": lambda n, x, grid: _grid_sample(n, x, grid),
    "RoiAlign": lambda n, x, rois, bi: _roi_align(n, x, rois, bi),
    "LSTM": lambda n, *a: _lstm(n, *a),
    "GRU": lambda n, *a: _gru(n, *a),
    "RNN": lambda n, *a: _rnn(n, *a),
    # -- sequence ops: sequences are plain Python lists in the
    # interpreter env (torchscript list-append loops export these,
    # typically as Loop-carried values) --
    "SequenceEmpty": lambda n: [],
    "SequenceConstruct": lambda n, *xs: list(xs),
    "SequenceInsert": lambda n, seq, x, pos=None: _seq_insert(
        n, seq, x, pos),
    "SequenceErase": lambda n, seq, pos=None: _seq_erase(n, seq, pos),
    "SequenceAt": lambda n, seq, pos: seq[_seq_pos(n, pos)],
    "SequenceLength": lambda n, seq: np.int64(len(seq)),
    "ConcatFromSequence": lambda n, seq: (
        _xp(*seq).stack(seq, axis=n.attrs.get("axis", 0))
        if n.attrs.get("new_axis", 0)
        else _xp(*seq).concatenate(seq, axis=n.attrs.get("axis", 0))),
    "GatherElements": lambda n, x, idx: _xp(x, idx).take_along_axis(
        _xp(x, idx).asarray(x), _norm_indices(idx, x, n),
        axis=n.attrs.get("axis", 0)),
    "GatherND": lambda n, x, idx: _gather_nd(n, x, idx),
    "ScatterElements": lambda n, x, idx, upd: _scatter_elements(
        n, x, idx, upd),
    "ScatterND": lambda n, x, idx, upd: _scatter_nd(n, x, idx, upd),
    "LogSoftmax": lambda n, x: _softmax(n, x, log=True),
    "CumSum": lambda n, x, axis: _cumsum(n, x, axis),
    "ReduceL1": lambda n, x, axes=None: _reduce(
        n, _xp(x).abs(x), axes, kind="sum"),
    "ReduceL2": lambda n, x, axes=None: _xp(x).sqrt(_reduce(
        n, x * x, axes, kind="sum")),
    "ReduceLogSumExp": lambda n, x, axes=None: _logsumexp(n, x, axes),
    "LpNormalization": lambda n, x: x / _lp_norm(n, x),
    "Mod": lambda n, a, b: (_xp(a, b).fmod(a, b)
                            if n.attrs.get("fmod", 0)
                            else _xp(a, b).mod(a, b)),
    "Sign": lambda n, x: _xp(x).sign(x),
    "Round": lambda n, x: _xp(x).round(x),
    "Softsign": lambda n, x: x / (1 + _xp(x).abs(x)),
    "Mish": lambda n, x: x * jnp.tanh(jax.nn.softplus(
        jnp.asarray(x))),
    "Gelu": lambda n, x: jax.nn.gelu(
        jnp.asarray(x),
        approximate=n.attrs.get("approximate", b"none") == b"tanh"),
    "Celu": lambda n, x: jax.nn.celu(jnp.asarray(x),
                                     n.attrs.get("alpha", 1.0)),
    "ThresholdedRelu": lambda n, x: jnp.where(
        x > n.attrs.get("alpha", 1.0), x, 0.0),
    "Range": lambda n, lo, hi, step: _range(n, lo, hi, step),
    "Tile": lambda n, x, reps: _tile(n, x, reps),
}


def _range(node: OnnxNode, lo, hi, step):
    if not _is_concrete(lo, hi, step):
        raise ValueError(f"Range with traced bounds ({node.name})")
    return np.arange(np.asarray(lo).item(), np.asarray(hi).item(),
                     np.asarray(step).item())


def _tile(node: OnnxNode, x, reps):
    if not _is_concrete(reps):
        raise ValueError(f"Tile with traced reps ({node.name})")
    return _xp(x).tile(
        x, tuple(int(r) for r in np.asarray(reps).reshape(-1)))


def _topk(node: OnnxNode, x, k=None):
    if k is None:  # opset <= 9: k as attribute
        k = node.attrs["k"]
    elif not _is_concrete(k):
        raise ValueError(f"TopK with traced K ({node.name})")
    k = int(np.asarray(k).reshape(()))
    axis = node.attrs.get("axis", -1)
    largest = bool(node.attrs.get("largest", 1))
    if _is_concrete(x):
        xs = np.asarray(x)
        # negation of unsigned dtypes wraps instead of reversing order
        key = (xs.astype(np.int64)
               if np.issubdtype(xs.dtype, np.unsignedinteger) else xs)
        order = np.argsort(-key if largest else key, axis=axis,
                           kind="stable")
        idx = np.take(order, np.arange(k), axis=axis)
        return (np.take_along_axis(xs, idx, axis=axis),
                idx.astype(np.int64))
    moved = jnp.moveaxis(jnp.asarray(x), axis, -1)
    skey = (moved.astype(jnp.int64)
            if jnp.issubdtype(moved.dtype, jnp.unsignedinteger)
            else moved)
    _, idx = jax.lax.top_k(skey if largest else -skey, k)
    vals = jnp.take_along_axis(moved, idx, axis=-1)
    return (jnp.moveaxis(vals, -1, axis),
            jnp.moveaxis(idx, -1, axis).astype(jnp.int64))


def _nms_onnx(node: OnnxNode, boxes, scores, max_out=None,
              iou_thresh=None, score_thresh=None):
    """ONNX NonMaxSuppression: dynamic-length selected_indices [S, 3]
    (batch, class, box). The output SHAPE depends on the data, so this
    op is concrete-only — real detection exports run it at the graph
    tail where everything is host-side anyway; under jit it fails
    loudly (the framework's own fixed-shape NMS is the jittable path,
    ops/postprocess.py)."""
    if not _is_concrete(boxes, scores):
        raise ValueError(
            f"NonMaxSuppression under jit is unsupported ({node.name}) "
            "— dynamic output shape; use the fixed-shape NMS "
            "(ops/postprocess.py) for on-device pipelines")
    max_out = (0 if max_out is None
               else int(np.asarray(max_out).reshape(())))
    if max_out == 0:
        # spec: max_output_boxes_per_class defaults to 0 = NO output
        return np.zeros((0, 3), np.int64)
    iou_thresh = (0.0 if iou_thresh is None
                  else float(np.asarray(iou_thresh).reshape(())))
    score_thresh = (None if score_thresh is None
                    else float(np.asarray(score_thresh).reshape(())))
    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)
    if node.attrs.get("center_point_box", 0):
        cx, cy, w, h = (boxes[..., i] for i in range(4))
        boxes = np.stack([cy - h / 2, cx - w / 2,
                          cy + h / 2, cx + w / 2], axis=-1)
    else:
        # corners may be flipped per spec; canonicalize
        y1 = np.minimum(boxes[..., 0], boxes[..., 2])
        y2 = np.maximum(boxes[..., 0], boxes[..., 2])
        x1 = np.minimum(boxes[..., 1], boxes[..., 3])
        x2 = np.maximum(boxes[..., 1], boxes[..., 3])
        boxes = np.stack([y1, x1, y2, x2], axis=-1)
    selected = []
    for b in range(scores.shape[0]):
        for c in range(scores.shape[1]):
            s = scores[b, c]
            order = np.argsort(-s, kind="stable")
            if score_thresh is not None:
                order = order[s[order] > score_thresh]
            kept: list[int] = []
            for i in order:
                if len(kept) >= max_out:
                    break
                bi = boxes[b, i]
                ok = True
                for j in kept:
                    bj = boxes[b, j]
                    yy1 = max(bi[0], bj[0])
                    xx1 = max(bi[1], bj[1])
                    yy2 = min(bi[2], bj[2])
                    xx2 = min(bi[3], bj[3])
                    inter = max(0.0, yy2 - yy1) * max(0.0, xx2 - xx1)
                    area_i = (bi[2] - bi[0]) * (bi[3] - bi[1])
                    area_j = (bj[2] - bj[0]) * (bj[3] - bj[1])
                    union = area_i + area_j - inter
                    if union > 0 and inter / union > iou_thresh:
                        ok = False
                        break
                if ok:
                    kept.append(int(i))
            selected.extend([b, c, i] for i in kept)
    return np.asarray(selected, np.int64).reshape(-1, 3)


def _one_hot(node: OnnxNode, idx, depth, values):
    if not _is_concrete(depth):
        raise ValueError(f"OneHot with traced depth ({node.name})")
    d = int(np.asarray(depth).reshape(()))
    axis = node.attrs.get("axis", -1)
    xp = _xp(idx, values)
    idx = xp.asarray(idx)
    idx = xp.where(idx < 0, idx + d, idx)  # negative indices per spec
    off_on = xp.asarray(values)
    hot = xp.arange(d)
    # broadcast compare along a new trailing axis, then move into place
    eye = (idx[..., None] == hot)
    out = xp.where(eye, off_on[1], off_on[0])
    if axis != -1:
        out = xp.moveaxis(out, -1, axis % (idx.ndim + 1))
    return out


def _roi_align(node: OnnxNode, x, rois, batch_idx):
    """RoiAlign (two-stage detector exports): average/max pooling of
    bilinear samples over each ROI bin (Mask R-CNN-style)."""
    mode = node.attrs.get("mode", b"avg")
    oh = int(node.attrs.get("output_height", 1))
    ow = int(node.attrs.get("output_width", 1))
    ratio = int(node.attrs.get("sampling_ratio", 0))
    scale = float(node.attrs.get("spatial_scale", 1.0))
    coord = node.attrs.get("coordinate_transformation_mode",
                           b"half_pixel")
    aligned = coord == b"half_pixel"
    offset = 0.5 if aligned else 0.0
    adaptive = False
    if ratio > 0:
        rh = rw = ratio
    else:
        rhw = node.attrs.get("_ratio_hw")
        if rhw is not None:
            rh, rw = rhw
        elif not _is_concrete(rois, batch_idx):
            # adaptive ratio = ceil(roi_size / output) PER AXIS is
            # per-ROI dynamic. Under trace, run a STATIC upper-bound
            # sample grid sized for an ROI spanning the whole feature
            # map, and mask each ROI's unused sample rows/cols — fixed
            # shapes for XLA, exact reference averages via masked sums.
            # DOCUMENTED DIVERGENCE: an ROI whose scaled extent exceeds
            # the ENTIRE feature map (degenerate — detector proposals
            # are image-clipped) clamps to this grid, sampling coarser
            # than the reference; the concrete-ROI path below is exact
            # for any extent.
            adaptive = True
            rh = max(-(-int(x.shape[2]) // oh), 1)
            rw = max(-(-int(x.shape[3]) // ow), 1)
        else:
            # concrete-ROI path: group ROIs by their resolved (gh, gw)
            # grid and run one batched call per distinct grid (one
            # dispatch + readback per group, not per ROI)
            rois_np = np.asarray(rois, np.float32)
            bi_np = np.asarray(batch_idx)
            n = rois_np.shape[0]
            c = x.shape[1]
            if n == 0:
                return np.zeros((0, c, oh, ow),
                                np.asarray(x[:0]).dtype
                                if hasattr(x, "dtype") else np.float32)
            sizes = (rois_np[:, 2:4] - rois_np[:, 0:2]) * scale
            gw_all = np.maximum(np.ceil(sizes[:, 0] / ow), 1
                                ).astype(int)
            gh_all = np.maximum(np.ceil(sizes[:, 1] / oh), 1
                                ).astype(int)
            out = [None] * n
            for key in {(int(gh_all[k]), int(gw_all[k]))
                        for k in range(n)}:
                idx = [k for k in range(n)
                       if (gh_all[k], gw_all[k]) == key]
                sub = OnnxNode(node.op_type, node.name, node.inputs,
                               node.outputs,
                               dict(node.attrs, _ratio_hw=key))
                grp = np.asarray(_roi_align(sub, x, rois_np[idx],
                                            bi_np[idx]))
                for j, k in enumerate(idx):
                    out[k] = grp[j]
            return np.stack(out)
    x = jnp.asarray(x)
    h, w = x.shape[2], x.shape[3]

    def one_roi(roi, b):
        x1, y1, x2, y2 = (roi[k] * scale - offset for k in range(4))
        roi_h, roi_w = y2 - y1, x2 - x1
        if not aligned:
            # legacy (output_half_pixel) mode clamps thin ROIs to 1px
            roi_h = jnp.maximum(roi_h, 1.0)
            roi_w = jnp.maximum(roi_w, 1.0)
        bin_h = roi_h / oh
        bin_w = roi_w / ow
        # sample grid: rh x rw points per bin, at bin-relative offsets
        # (i + 0.5)/ratio per axis. In adaptive mode the PER-ROI ratio
        # (ceil(roi_extent / output), traced) replaces the static one
        # and samples beyond it are masked out of the reduction.
        sub_y = jnp.arange(oh * rh) % rh
        sub_x = jnp.arange(ow * rw) % rw
        if adaptive:
            rh_d = jnp.clip(jnp.ceil(roi_h / oh), 1, rh)
            rw_d = jnp.clip(jnp.ceil(roi_w / ow), 1, rw)
        else:
            rh_d = jnp.float32(rh)
            rw_d = jnp.float32(rw)
        bins_y = jnp.arange(oh * rh) // rh
        bins_x = jnp.arange(ow * rw) // rw
        iy = y1 + (bins_y + (sub_y + 0.5) / rh_d) * bin_h
        ix = x1 + (bins_x + (sub_x + 0.5) / rw_d) * bin_w
        grid_ok = ((sub_y < rh_d)[:, None] & (sub_x < rw_d)[None, :])
        # samples more than 1px outside the image contribute ZERO
        # (ONNX/torchvision reference kernel), inside ones clamp
        ok = (((iy >= -1.0) & (iy <= h))[:, None]
              & ((ix >= -1.0) & (ix <= w))[None, :])
        gy = jnp.clip(iy, 0.0, h - 1.0)
        gx = jnp.clip(ix, 0.0, w - 1.0)
        y0 = jnp.floor(gy).astype(jnp.int32)
        x0 = jnp.floor(gx).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, h - 1)
        x1i = jnp.minimum(x0 + 1, w - 1)
        wy = gy - y0
        wx = gx - x0
        img = x[b]  # [C, H, W]
        v00 = img[:, y0[:, None], x0[None, :]]
        v01 = img[:, y0[:, None], x1i[None, :]]
        v10 = img[:, y1i[:, None], x0[None, :]]
        v11 = img[:, y1i[:, None], x1i[None, :]]
        wy_ = wy[None, :, None]
        wx_ = wx[None, None, :]
        w00 = (1 - wy_) * (1 - wx_)
        w01 = (1 - wy_) * wx_
        w10 = wy_ * (1 - wx_)
        w11 = wy_ * wx_
        okc = ok[None, :, :]
        gokc = grid_ok[None, :, :]
        c = img.shape[0]
        if mode == b"max":
            # Caffe2-lineage quirk the ONNX reference keeps: per
            # sample, max over the four WEIGHTED corner contributions
            v = jnp.maximum(jnp.maximum(w00 * v00, w01 * v01),
                            jnp.maximum(w10 * v10, w11 * v11))
            v = jnp.where(okc, v, 0.0)
            v = jnp.where(gokc, v, -jnp.inf)  # grid-masked: excluded
            return v.reshape(c, oh, rh, ow, rw).max(axis=(2, 4))
        v = w00 * v00 + w01 * v01 + w10 * v10 + w11 * v11
        v = jnp.where(okc & gokc, v, 0.0)
        s = v.reshape(c, oh, rh, ow, rw).sum(axis=(2, 4))
        return s / (rh_d * rw_d)

    return jax.vmap(one_roi)(jnp.asarray(rois, jnp.float32),
                             jnp.asarray(batch_idx, jnp.int32))


def _grid_sample(node: OnnxNode, x, grid):
    """GridSample (opset 16+): bilinear/nearest sampling of x[B,C,H,W]
    at grid[B,Ho,Wo,2] locations in [-1,1] xy order — spatial
    transformers and flow-warping exports."""
    mode = node.attrs.get("mode", b"bilinear")
    if mode == b"linear":
        mode = b"bilinear"  # opset-20 rename
    if mode == b"cubic":
        mode = b"bicubic"  # opset-20 rename
    pad = node.attrs.get("padding_mode", b"zeros")
    align = bool(node.attrs.get("align_corners", 0))
    if mode not in (b"bilinear", b"nearest", b"bicubic"):
        raise ValueError(
            f"GridSample mode {mode!r} unsupported ({node.name})")
    if pad not in (b"zeros", b"border", b"reflection"):
        raise ValueError(
            f"GridSample padding_mode {pad!r} unsupported "
            f"({node.name})")
    if len(x.shape) == 5:
        if mode == b"bicubic":
            raise ValueError(
                f"GridSample cubic is 4-D only per spec ({node.name})")
        return _grid_sample_3d(node, x, grid, mode, pad, align)
    if len(x.shape) != 4:
        raise ValueError(
            f"GridSample expects 4-D [B,C,H,W] or 5-D [B,C,D,H,W] "
            f"input, got rank {len(x.shape)} ({node.name})")
    x = jnp.asarray(x)
    grid = jnp.asarray(grid)
    h, w = x.shape[2], x.shape[3]

    def reflect(coord, size):
        # reflect about [0, size-1] (align) or [-0.5, size-0.5]: fold
        # into a doubled period, mirror the upper half
        if align:
            span = 2.0 * max(size - 1, 1)
            c = jnp.abs(coord) % span
            return jnp.where(c > span / 2, span - c, c)
        span = 2.0 * size
        c = jnp.mod(coord + 0.5, span)
        c = jnp.where(c > size, span - c, c)
        return jnp.clip(c - 0.5, 0.0, size - 1.0)

    def unnormalize(coord, size):
        if align:
            c = (coord + 1) * (size - 1) / 2
        else:
            c = ((coord + 1) * size - 1) / 2
        # bilinear/nearest reflect the CENTER coordinate (torch's
        # compute_source_index); bicubic leaves the center untouched
        # and folds each tap instead (torch's get_value_bounded)
        if pad == b"reflection" and mode != b"bicubic":
            c = reflect(c, size)
        return c

    gx = unnormalize(grid[..., 0], w)  # [B, Ho, Wo]
    gy = unnormalize(grid[..., 1], h)

    def sample(iy, ix):
        """x at integer (iy, ix) with the padding mode; [B,C,Ho,Wo]."""
        inside = ((iy >= 0) & (iy < h) & (ix >= 0) & (ix < w))
        cy = jnp.clip(iy, 0, h - 1)
        cx = jnp.clip(ix, 0, w - 1)
        v = jax.vmap(
            lambda xb, yb, xbi: xb[:, yb, xbi])(x, cy, cx)
        # [B, C, Ho, Wo]: ':' keeps C in place, the advanced index
        # pair contributes the [Ho, Wo] block after it
        if pad == b"zeros":
            # select, don't multiply: 0 * inf/nan at a clamped border
            # pixel must still yield exact 0 like torch
            v = jnp.where(inside[:, None, :, :], v, 0.0)
        return v

    if mode == b"nearest":
        iy = jnp.round(gy).astype(jnp.int32)
        ix = jnp.round(gx).astype(jnp.int32)
        return sample(iy, ix)
    y0 = jnp.floor(gy)
    x0 = jnp.floor(gx)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    if mode == b"bicubic":
        # 4x4 Keys cubic (a = -0.75, torch's grid_sampler kernel).
        # Padding is applied PER TAP: taps reach 2 past the floor cell,
        # so border/reflection must fold each integer tap coordinate
        # (reflecting only the pre-floor coordinate under-reflects the
        # outer taps); zeros keeps sample()'s inside-mask per tap.
        a = -0.75

        def cubic_weights(t):
            # tap offsets -1..2 -> distances 1+t, t, 1-t, 2-t
            d0, d1, d2, d3 = 1.0 + t, t, 1.0 - t, 2.0 - t
            w0 = a * d0 ** 3 - 5 * a * d0 ** 2 + 8 * a * d0 - 4 * a
            w1 = (a + 2) * d1 ** 3 - (a + 3) * d1 ** 2 + 1
            w2 = (a + 2) * d2 ** 3 - (a + 3) * d2 ** 2 + 1
            w3 = a * d3 ** 3 - 5 * a * d3 ** 2 + 8 * a * d3 - 4 * a
            return (w0, w1, w2, w3)

        wys = cubic_weights((gy - y0)[:, None, :, :])
        wxs = cubic_weights((gx - x0)[:, None, :, :])

        def tap(iy, ix):
            if pad == b"reflection":
                iy = jnp.round(reflect(iy.astype(gy.dtype), h)
                               ).astype(jnp.int32)
                ix = jnp.round(reflect(ix.astype(gx.dtype), w)
                               ).astype(jnp.int32)
            return sample(iy, ix)

        out = 0.0
        for jy in range(4):
            row = 0.0
            for jx in range(4):
                row = row + wxs[jx] * tap(y0i + jy - 1, x0i + jx - 1)
            out = out + wys[jy] * row
        return out
    wy = (gy - y0)[:, None, :, :]
    wx = (gx - x0)[:, None, :, :]
    return ((1 - wy) * (1 - wx) * sample(y0i, x0i)
            + (1 - wy) * wx * sample(y0i, x0i + 1)
            + wy * (1 - wx) * sample(y0i + 1, x0i)
            + wy * wx * sample(y0i + 1, x0i + 1))


def _grid_sample_3d(node: OnnxNode, x, grid, mode, pad, align):
    """Volumetric GridSample (opset 16+/20): x[B,C,D,H,W] sampled at
    grid[B,Do,Ho,Wo,3] xyz locations — trilinear/nearest with the same
    padding semantics as the 4-D path."""
    x = jnp.asarray(x)
    grid = jnp.asarray(grid)
    d, h, w = x.shape[2], x.shape[3], x.shape[4]

    def reflect(coord, size):
        if align:
            span = 2.0 * max(size - 1, 1)
            c = jnp.abs(coord) % span
            return jnp.where(c > span / 2, span - c, c)
        span = 2.0 * size
        c = jnp.mod(coord + 0.5, span)
        c = jnp.where(c > size, span - c, c)
        return jnp.clip(c - 0.5, 0.0, size - 1.0)

    def unnormalize(coord, size):
        if align:
            c = (coord + 1) * (size - 1) / 2
        else:
            c = ((coord + 1) * size - 1) / 2
        if pad == b"reflection":
            c = reflect(c, size)
        return c

    gx = unnormalize(grid[..., 0], w)  # [B, Do, Ho, Wo]
    gy = unnormalize(grid[..., 1], h)
    gz = unnormalize(grid[..., 2], d)

    def sample(iz, iy, ix):
        inside = ((iz >= 0) & (iz < d) & (iy >= 0) & (iy < h)
                  & (ix >= 0) & (ix < w))
        cz = jnp.clip(iz, 0, d - 1)
        cy = jnp.clip(iy, 0, h - 1)
        cx = jnp.clip(ix, 0, w - 1)
        v = jax.vmap(lambda xb, zb, yb, xbi: xb[:, zb, yb, xbi])(
            x, cz, cy, cx)
        if pad == b"zeros":
            v = jnp.where(inside[:, None], v, 0.0)
        return v

    if mode == b"nearest":
        return sample(jnp.round(gz).astype(jnp.int32),
                      jnp.round(gy).astype(jnp.int32),
                      jnp.round(gx).astype(jnp.int32))
    z0, y0, x0 = jnp.floor(gz), jnp.floor(gy), jnp.floor(gx)
    wz = (gz - z0)[:, None]
    wy = (gy - y0)[:, None]
    wx = (gx - x0)[:, None]
    z0i, y0i, x0i = (v.astype(jnp.int32) for v in (z0, y0, x0))
    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                wgt = ((wz if dz else 1 - wz)
                       * (wy if dy else 1 - wy)
                       * (wx if dx else 1 - wx))
                out = out + wgt * sample(z0i + dz, y0i + dy, x0i + dx)
    return out


def _rnn_directions(node: OnnxNode):
    d = node.attrs.get("direction", b"forward")
    if d == b"forward":
        return [False]
    if d == b"reverse":
        return [True]
    if d == b"bidirectional":
        return [False, True]
    raise ValueError(f"direction {d!r} unsupported ({node.name})")


def _rnn_seq_prep(x, seq_lens, reverse: bool):
    """Per-batch variable-length handling for the RNN family: returns
    (xs, mask[S,B], gidx) where ``xs`` is the per-batch-reversed input
    for reverse directions (ONNX reverses only the valid prefix of each
    sequence, not the padded tail), ``mask[t, b]`` = step t is within
    batch b's length (the scan carries state through and zeroes Y at
    masked steps), and ``gidx`` scatters reverse outputs back."""
    s = x.shape[0]
    if seq_lens is None:
        xs = x[::-1] if reverse else x
        return xs, jnp.ones((s, x.shape[1]), bool), None
    lens = jnp.asarray(seq_lens, jnp.int32)
    t_idx = jnp.arange(s, dtype=jnp.int32)[:, None]
    mask = t_idx < lens[None, :]
    if reverse:
        gidx = jnp.clip(lens[None, :] - 1 - t_idx, 0, s - 1)
        xs = jnp.take_along_axis(x, gidx[:, :, None], axis=0)
    else:
        gidx = None
        xs = x
    return xs, mask, gidx


def _rnn_seq_finish(y, reverse: bool, seq_lens, mask, gidx):
    """Undo the per-batch reversal on the stacked outputs."""
    if seq_lens is None:
        return y[::-1] if reverse else y
    if reverse:
        y = jnp.take_along_axis(y, gidx[:, :, None], axis=0)
        y = jnp.where(mask[:, :, None], y, 0)
    return y


def _rnn_common_checks(node: OnnxNode,
                       default_acts: tuple[bytes, ...]):
    acts = node.attrs.get("activations")
    if acts:
        # exporters often spell out the defaults; only NON-default
        # activations are unsupported
        want = list(default_acts) * (len(acts) // len(default_acts)
                                     or 1)
        if [a.capitalize() for a in acts] != want:
            raise ValueError(
                f"{node.op_type} custom activations {acts} "
                f"unsupported ({node.name})")
    if node.attrs.get("layout", 0):
        raise ValueError(
            f"{node.op_type} layout=1 unsupported ({node.name})")


def _lstm(node: OnnxNode, x, w, r, b=None, seq_lens=None, h0=None,
          c0=None, p=None):
    """ONNX LSTM (gate order iofc), default activations, no peepholes.
    One lax.scan per direction — the recurrences stay MXU matmuls."""
    _rnn_common_checks(node, (b"Sigmoid", b"Tanh", b"Tanh"))
    if p is not None:
        raise ValueError(f"LSTM peepholes unsupported ({node.name})")
    clip = float(node.attrs.get("clip", 0.0))
    if node.attrs.get("input_forget", 0):
        raise ValueError(
            f"LSTM input_forget (CIFG) unsupported ({node.name})")
    hs = int(node.attrs["hidden_size"])
    x = jnp.asarray(x)
    bsz = x.shape[1]
    dirs = _rnn_directions(node)
    ys, hs_out, cs_out = [], [], []
    for d, reverse in enumerate(dirs):
        wd = jnp.asarray(w)[d]
        rd = jnp.asarray(r)[d]
        bias = (jnp.asarray(b)[d, :4 * hs] + jnp.asarray(b)[d, 4 * hs:]
                if b is not None else jnp.zeros(4 * hs, x.dtype))
        h = (jnp.asarray(h0)[d] if h0 is not None
             else jnp.zeros((bsz, hs), x.dtype))
        c = (jnp.asarray(c0)[d] if c0 is not None
             else jnp.zeros((bsz, hs), x.dtype))
        xs, mask, gidx = _rnn_seq_prep(x, seq_lens, reverse)
        gx = jnp.einsum("sbi,gi->sbg", xs, wd) + bias

        def step(carry, inp, rd=rd, hs=hs):
            h, c = carry
            g, m = inp
            g = g + h @ rd.T
            if clip:  # spec: applied to the activations' input
                g = jnp.clip(g, -clip, clip)
            i = jax.nn.sigmoid(g[:, 0 * hs:1 * hs])
            o = jax.nn.sigmoid(g[:, 1 * hs:2 * hs])
            f = jax.nn.sigmoid(g[:, 2 * hs:3 * hs])
            ct = jnp.tanh(g[:, 3 * hs:4 * hs])
            cn = f * c + i * ct
            hn = o * jnp.tanh(cn)
            m = m[:, None]
            # past a batch row's length the state freezes and Y is 0
            return ((jnp.where(m, hn, h), jnp.where(m, cn, c)),
                    jnp.where(m, hn, 0))

        (h, c), y = jax.lax.scan(step, (h, c), (gx, mask))
        ys.append(_rnn_seq_finish(y, reverse, seq_lens, mask, gidx))
        hs_out.append(h)
        cs_out.append(c)
    y = jnp.stack(ys, axis=1)  # [seq, dirs, batch, hidden]
    outs = (y, jnp.stack(hs_out), jnp.stack(cs_out))
    return outs[:len(node.outputs)] if len(node.outputs) > 1 \
        else outs[0]


def _rnn(node: OnnxNode, x, w, r, b=None, seq_lens=None, h0=None):
    """ONNX vanilla RNN (tanh recurrence; custom activations raise)."""
    _rnn_common_checks(node, (b"Tanh",))
    clip = float(node.attrs.get("clip", 0.0))
    hs = int(node.attrs["hidden_size"])
    x = jnp.asarray(x)
    bsz = x.shape[1]
    ys, hs_out = [], []
    for d, reverse in enumerate(_rnn_directions(node)):
        wd = jnp.asarray(w)[d]
        rd = jnp.asarray(r)[d]
        bias = (jnp.asarray(b)[d, :hs] + jnp.asarray(b)[d, hs:]
                if b is not None else jnp.zeros(hs, x.dtype))
        h = (jnp.asarray(h0)[d] if h0 is not None
             else jnp.zeros((bsz, hs), x.dtype))
        xs, mask, gidx = _rnn_seq_prep(x, seq_lens, reverse)
        gx = jnp.einsum("sbi,gi->sbg", xs, wd) + bias

        def step(h, inp, rd=rd):
            g, m = inp
            pre = g + h @ rd.T
            if clip:
                pre = jnp.clip(pre, -clip, clip)
            hn = jnp.tanh(pre)
            m = m[:, None]
            return jnp.where(m, hn, h), jnp.where(m, hn, 0)

        h, y = jax.lax.scan(step, h, (gx, mask))
        ys.append(_rnn_seq_finish(y, reverse, seq_lens, mask, gidx))
        hs_out.append(h)
    outs = (jnp.stack(ys, axis=1), jnp.stack(hs_out))
    return outs[:len(node.outputs)] if len(node.outputs) > 1 \
        else outs[0]


def _gru(node: OnnxNode, x, w, r, b=None, seq_lens=None, h0=None):
    """ONNX GRU (gate order zrh), default activations."""
    _rnn_common_checks(node, (b"Sigmoid", b"Tanh"))
    clip = float(node.attrs.get("clip", 0.0))
    lbr = int(node.attrs.get("linear_before_reset", 0))
    hs = int(node.attrs["hidden_size"])
    x = jnp.asarray(x)
    bsz = x.shape[1]
    dirs = _rnn_directions(node)
    ys, hs_out = [], []
    for d, reverse in enumerate(dirs):
        wd = jnp.asarray(w)[d]
        rd = jnp.asarray(r)[d]
        wb = (jnp.asarray(b)[d, :3 * hs] if b is not None
              else jnp.zeros(3 * hs, x.dtype))
        rb = (jnp.asarray(b)[d, 3 * hs:] if b is not None
              else jnp.zeros(3 * hs, x.dtype))
        h = (jnp.asarray(h0)[d] if h0 is not None
             else jnp.zeros((bsz, hs), x.dtype))
        xs, mask, gidx = _rnn_seq_prep(x, seq_lens, reverse)
        gx = jnp.einsum("sbi,gi->sbg", xs, wd) + wb

        def step(h, inp, rd=rd, rb=rb, hs=hs, lbr=lbr):
            g, m = inp
            gh = h @ rd.T + rb

            def cl(v):
                return jnp.clip(v, -clip, clip) if clip else v

            z = jax.nn.sigmoid(cl(g[:, :hs] + gh[:, :hs]))
            rt = jax.nn.sigmoid(cl(g[:, hs:2 * hs]
                                   + gh[:, hs:2 * hs]))
            if lbr:
                ht = jnp.tanh(cl(g[:, 2 * hs:] + rt * gh[:, 2 * hs:]))
            else:
                ht = jnp.tanh(cl(g[:, 2 * hs:]
                                 + (rt * h) @ rd[2 * hs:].T
                                 + rb[2 * hs:]))
            hn = (1 - z) * ht + z * h
            m = m[:, None]
            return jnp.where(m, hn, h), jnp.where(m, hn, 0)

        h, y = jax.lax.scan(step, h, (gx, mask))
        ys.append(_rnn_seq_finish(y, reverse, seq_lens, mask, gidx))
        hs_out.append(h)
    y = jnp.stack(ys, axis=1)
    outs = (y, jnp.stack(hs_out))
    return outs[:len(node.outputs)] if len(node.outputs) > 1 \
        else outs[0]


def _seq_pos(node: OnnxNode, pos) -> int:
    if not _is_concrete(pos):
        raise ValueError(
            f"sequence op with traced position ({node.name})")
    return int(np.asarray(pos).reshape(()))


def _seq_insert(node: OnnxNode, seq, x, pos=None):
    out = list(seq)
    if pos is None:
        out.append(x)
    else:
        out.insert(_seq_pos(node, pos), x)
    return out


def _seq_erase(node: OnnxNode, seq, pos=None):
    out = list(seq)
    del out[-1 if pos is None else _seq_pos(node, pos)]
    return out


def _norm_indices(idx, x, node: OnnxNode):
    """ONNX allows negative gather/scatter indices; normalize."""
    axis = node.attrs.get("axis", 0)
    dim = x.shape[axis]
    xp = _xp(x, idx)
    idx = xp.asarray(idx)
    return xp.where(idx < 0, idx + dim, idx)


def _gather_nd(node: OnnxNode, x, idx):
    b = int(node.attrs.get("batch_dims", 0))
    if b == 0:
        xp = _xp(x, idx)
        x = xp.asarray(x)
        idx = (np.asarray(idx) if _is_concrete(idx)
               else jnp.asarray(idx))
        r = idx.shape[-1]
        parts = tuple(idx[..., k] for k in range(r))
        return x[parts]

    def core(xb, ib):
        r = ib.shape[-1]
        return xb[tuple(ib[..., k] for k in range(r))]

    fn = core
    for _ in range(b):
        fn = jax.vmap(fn)
    return fn(jnp.asarray(x), jnp.asarray(idx))


# ONNX scatter `reduction` attr -> (np.ufunc for the concrete path,
# jax .at[...] method name for the traced path)
_SCATTER_REDUCTIONS = {
    b"add": (np.add, "add"),
    b"mul": (np.multiply, "multiply"),
    b"min": (np.minimum, "min"),
    b"max": (np.maximum, "max"),
}


def _scatter_reduction(node: OnnxNode):
    red = node.attrs.get("reduction", b"none")
    if red == b"none":
        return None
    if red not in _SCATTER_REDUCTIONS:
        raise ValueError(
            f"{node.op_type} reduction {red!r} unsupported "
            f"({node.name})")
    return _SCATTER_REDUCTIONS[red]


def _scatter_elements(node: OnnxNode, x, idx, upd):
    red = _scatter_reduction(node)
    axis = node.attrs.get("axis", 0)
    idx = _norm_indices(idx, x, node)
    if _is_concrete(x, idx, upd):
        out = np.asarray(x).copy()
        if red is None:
            np.put_along_axis(out, np.asarray(idx), np.asarray(upd),
                              axis=axis)
            return out
        # unbuffered accumulate: duplicate indices each apply
        grids = list(np.meshgrid(*(np.arange(s) for s in idx.shape),
                                 indexing="ij"))
        grids[axis] = np.asarray(idx)
        red[0].at(out, tuple(grids), np.asarray(upd))
        return out
    # jax: scatter via .at with explicit index grids along `axis`
    x = jnp.asarray(x)
    idx = jnp.asarray(idx)
    grids = jnp.meshgrid(*(jnp.arange(s) for s in idx.shape),
                         indexing="ij")
    grids[axis] = idx
    at = x.at[tuple(grids)]
    method = "set" if red is None else red[1]
    return getattr(at, method)(jnp.asarray(upd))


def _scatter_nd(node: OnnxNode, x, idx, upd):
    red = _scatter_reduction(node)
    r = idx.shape[-1]
    if _is_concrete(x, idx, upd):
        out = np.asarray(x).copy()
        parts = tuple(np.asarray(idx)[..., k] for k in range(r))
        if red is None:
            out[parts] = upd
        else:
            red[0].at(out, parts, np.asarray(upd))
        return out
    x = jnp.asarray(x)
    idx = jnp.asarray(idx)
    parts = tuple(idx[..., k] for k in range(r))
    at = x.at[parts]
    method = "set" if red is None else red[1]
    return getattr(at, method)(jnp.asarray(upd))


def _cumsum(node: OnnxNode, x, axis):
    if not _is_concrete(axis):
        raise ValueError(f"CumSum with traced axis ({node.name})")
    axis = int(np.asarray(axis).reshape(()))
    if node.attrs.get("exclusive", 0) or node.attrs.get("reverse", 0):
        xp = _xp(x)
        if node.attrs.get("reverse", 0):
            x = xp.flip(x, axis)
        out = xp.cumsum(x, axis=axis)
        if node.attrs.get("exclusive", 0):
            out = xp.roll(out, 1, axis)
            sl = [slice(None)] * out.ndim
            sl[axis] = 0
            if xp is np:
                out[tuple(sl)] = 0
            else:
                out = out.at[tuple(sl)].set(0)
        if node.attrs.get("reverse", 0):
            out = xp.flip(out, axis)
        return out
    return _xp(x).cumsum(x, axis=axis)


def _logsumexp(node: OnnxNode, x, axes=None):
    """Max-shifted (overflow-stable) logsumexp via the _reduce axis
    plumbing: compute in shifted space, add the shift back."""
    xp = _xp(x)
    if axes is None:
        axes_attr = node.attrs.get("axes")
    else:
        axes_attr = np.asarray(axes).reshape(-1).tolist()
    keep = bool(node.attrs.get("keepdims", 1))
    ax = (None if axes_attr in (None, [])
          else tuple(int(a) for a in axes_attr))
    m = xp.max(x, axis=ax, keepdims=True)
    m = xp.where(xp.isfinite(m), m, 0.0)  # all -inf slices stay finite
    out = xp.log(xp.sum(xp.exp(x - m), axis=ax, keepdims=True)) + m
    if not keep:
        out = out.squeeze(ax) if ax is not None else out.reshape(())
    return out


def _lp_norm(node: OnnxNode, x):
    axis = node.attrs.get("axis", -1)
    p = node.attrs.get("p", 2)
    xp = _xp(x)
    if p == 1:
        return xp.sum(xp.abs(x), axis=axis, keepdims=True)
    return xp.sqrt(xp.sum(x * x, axis=axis, keepdims=True))


def _prelu(x, slope):
    slope = jnp.asarray(slope)
    if slope.size > 1 and slope.ndim < x.ndim:
        # unidirectional broadcast from the channel axis (ONNX PRelu:
        # slope broadcastable to x; exporters emit (C,), (C,1,1), ...)
        want = slope.shape + (1,) * (x.ndim - 1 - slope.ndim)
        slope = slope.reshape(want)
    return jnp.where(x >= 0, x, slope * x)


def _min_max(xs, kind: str):
    xp = _xp(*xs)
    out = xs[0]
    for x in xs[1:]:
        out = getattr(xp, kind)(out, x)
    return out


def _argminmax(node: OnnxNode, x, kind: str):
    axis = node.attrs.get("axis", 0)
    keep = bool(node.attrs.get("keepdims", 1))
    if node.attrs.get("select_last_index", 0):
        # argmin/argmax return the FIRST winner; flipping the axis and
        # re-indexing yields the last occurrence instead
        xp = _xp(x)
        flipped = getattr(xp, kind)(xp.flip(x, axis), axis=axis)
        out = x.shape[axis] - 1 - flipped
        out = xp.asarray(out, dtype=np.int64 if xp is np
                         else jnp.int64)
        if keep:
            out = xp.expand_dims(out, axis)
        return out
    out = getattr(_xp(x), kind)(x, axis=axis)
    out = _xp(x).asarray(out, dtype=np.int64 if _xp(x) is np
                         else jnp.int64)
    if keep:
        out = _xp(x).expand_dims(out, axis)
    return out


# -- quantized op family -------------------------------------------------
# int8/uint8 exports are what real edge detectors ship; tract's general
# "load and run whatever graph the file contains" contract (reference
# infer_server/src/nn.rs:166-174) therefore includes them. Semantics
# follow the ONNX spec exactly: round-half-to-even everywhere
# (jnp.round/np.round are both banker's rounding), saturating casts to
# the zero-point dtype, int32 accumulation for the integer matmul/conv
# cores (XLA's preferred_element_type keeps the MXU-friendly int8 x
# int8 -> int32 form available on TPU).

def _q_info(zp, default=np.uint8):
    """(numpy dtype, qmin, qmax) for a zero-point tensor (or default)."""
    dt = np.dtype(default) if zp is None else np.dtype(
        np.asarray(zp).dtype if _is_concrete(zp) else zp.dtype.name)
    info = np.iinfo(dt)
    return dt, info.min, info.max


def _q_per_axis(p, ndim: int, axis: int):
    """Broadcast a quantization parameter: scalars stay scalar, 1-D
    per-axis tensors reshape to broadcast along `axis`."""
    xp = _xp(p)
    arr = xp.asarray(p)
    if arr.ndim == 0 or arr.size == 1:
        return arr.reshape(())
    shape = [1] * ndim
    shape[axis % ndim] = -1
    return arr.reshape(shape)


def _q_no_blocks(node: OnnxNode):
    if node.attrs.get("block_size", 0):
        raise ValueError(
            f"blocked quantization unsupported ({node.name})")


def _quantize_linear(node: OnnxNode, x, scale, zp=None):
    _q_no_blocks(node)
    axis = node.attrs.get("axis", 1)
    dt, lo, hi = _q_info(zp)
    xp = _xp(x, scale, zp)
    s = _q_per_axis(scale, np.ndim(x), axis)
    z = 0 if zp is None else _q_per_axis(zp, np.ndim(x), axis)
    z = xp.asarray(z, np.float32 if xp is np else jnp.float32)
    y = xp.clip(xp.round(xp.asarray(x, s.dtype) / s) + z, lo, hi)
    return y.astype(dt)


def _dequantize_linear(node: OnnxNode, x, scale, zp=None):
    _q_no_blocks(node)
    axis = node.attrs.get("axis", 1)
    xp = _xp(x, scale, zp)
    i32 = np.int32 if xp is np else jnp.int32
    xi = xp.asarray(x, i32)  # widen BEFORE subtracting (int8 - int8
    #                          overflows at -255)
    if zp is not None:
        xi = xi - xp.asarray(_q_per_axis(zp, np.ndim(x), axis), i32)
    s = _q_per_axis(scale, np.ndim(x), axis)
    return xi.astype(s.dtype) * s


def _q_requant(acc_i32, multiplier, y_zp, xp):
    """int32 accumulator -> quantized output: y = saturate(
    round(acc * m) + y_zp) with banker's rounding, matching the
    QLinear* output stage.

    Precision envelope: the accumulator is cast to float32 before
    scaling (the same float requant path onnxruntime's reference
    QLinear* kernels use), so accumulators whose magnitude exceeds
    2^24 lose low bits in the cast and the requantized value can land
    ±1 output quantum away from integer-exact requantization. Reaching
    2^24 needs a fan-in x max|x-x_zp| x max|w-w_zp| product above
    ~16.7M (e.g. 3x3x512 int8 channels near full scale) — real
    QDQ-quantized conv nets sit orders of magnitude below it on
    typical activations. The envelope is characterized by a pinned
    test against a float64 oracle
    (tests/test_onnx_exec.py::test_q_requant_large_accumulator_envelope).
    TPU has no native f64, so computing the scale in f64 would fall
    back to emulation; the ±1-quantum f32 path is the deliberate
    trade."""
    dt, lo, hi = _q_info(y_zp)
    f32 = np.float32 if xp is np else jnp.float32
    y = xp.round(acc_i32.astype(f32) * xp.asarray(multiplier, f32))
    y = y + xp.asarray(y_zp, f32).reshape(())
    return xp.clip(y, lo, hi).astype(dt)


def _int_conv_core(node: OnnxNode, x, x_zp, w, w_zp):
    """(x - x_zp) conv (w - w_zp) with exact int32 accumulation.
    w_zp may be per-output-channel (1-D of size M): subtracting it from
    w directly is exact because each output channel convolves only its
    own filters."""
    strides = node.attrs.get("strides", [1, 1])
    dilations = node.attrs.get("dilations", [1, 1])
    group = int(node.attrs.get("group", 1))
    pads = _auto_pads(node, x.shape[2:], w.shape[2:], strides,
                      dilations)
    xi = jnp.asarray(x, jnp.int32)
    wi = jnp.asarray(w, jnp.int32)
    if x_zp is not None:
        xi = xi - jnp.asarray(x_zp, jnp.int32).reshape(())
    if w_zp is not None:
        z = jnp.asarray(w_zp, jnp.int32)
        wi = wi - (z.reshape(()) if z.size == 1
                   else z.reshape(-1, 1, 1, 1))
    return jax.lax.conv_general_dilated(
        xi, wi, window_strides=tuple(strides),
        padding=((pads[0], pads[2]), (pads[1], pads[3])),
        rhs_dilation=tuple(dilations),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=group,
        preferred_element_type=jnp.int32)


def _qlinear_conv(node: OnnxNode, x, x_s, x_zp, w, w_s, w_zp,
                  y_s, y_zp, b=None):
    acc = _int_conv_core(node, x, x_zp, w, w_zp)
    if b is not None:  # int32 bias at scale x_s*w_s, zero point 0
        acc = acc + jnp.asarray(b, jnp.int32).reshape(1, -1, 1, 1)
    m = (jnp.asarray(x_s, jnp.float32).reshape(())
         * jnp.asarray(w_s, jnp.float32).reshape(-1)
         / jnp.asarray(y_s, jnp.float32).reshape(()))
    m = m.reshape(()) if m.size == 1 else m.reshape(1, -1, 1, 1)
    return _q_requant(acc, m, y_zp, jnp)


def _int_matmul_core(a, a_zp, b, b_zp):
    ai = jnp.asarray(a, jnp.int32)
    bi = jnp.asarray(b, jnp.int32)
    if a_zp is not None:
        z = jnp.asarray(a_zp, jnp.int32)
        # per-row a_zp (1-D of size K rows) broadcasts over the last
        # axis of a's row dimension
        ai = ai - (z.reshape(()) if z.size == 1 else z.reshape(-1, 1))
    if b_zp is not None:
        z = jnp.asarray(b_zp, jnp.int32)
        bi = bi - (z.reshape(()) if z.size == 1 else z.reshape(1, -1))
    return ai @ bi


def _matmul_integer(node: OnnxNode, a, b, a_zp=None, b_zp=None):
    return _int_matmul_core(a, a_zp, b, b_zp)


def _conv_integer(node: OnnxNode, x, w, x_zp=None, w_zp=None):
    return _int_conv_core(node, x, x_zp, w, w_zp)


def _qlinear_matmul(node: OnnxNode, a, a_s, a_zp, b, b_s, b_zp,
                    y_s, y_zp):
    for s in (a_s, b_s, y_s):
        if np.ndim(s) and np.size(s) > 1:
            raise ValueError(
                f"QLinearMatMul per-axis scales unsupported "
                f"({node.name})")
    acc = _int_matmul_core(a, a_zp, b, b_zp)
    m = (jnp.asarray(a_s).reshape(()) * jnp.asarray(b_s).reshape(())
         / jnp.asarray(y_s).reshape(()))
    return _q_requant(acc, m, y_zp, jnp)


def _dynamic_quantize_linear(node: OnnxNode, x):
    """DynamicQuantizeLinear: uint8 range [0,255], scale from the
    zero-including min/max, zero point saturate(round(-xmin/scale))."""
    xp = _xp(x)
    f32 = np.float32 if xp is np else jnp.float32
    xf = xp.asarray(x, f32)
    xmin = xp.minimum(xp.min(xf), f32(0.0))
    xmax = xp.maximum(xp.max(xf), f32(0.0))
    scale = ((xmax - xmin) / f32(255.0)).astype(f32)
    # all-zero input: scale 0 would divide by zero; the spec's y is
    # then uniformly the zero point — any nonzero scale yields that
    safe = xp.where(scale > 0, scale, f32(1.0))
    zp = xp.clip(xp.round(-xmin / safe), 0, 255)
    y = xp.clip(xp.round(xf / safe) + zp, 0, 255)
    u8 = np.uint8 if xp is np else jnp.uint8
    return y.astype(u8), scale.reshape(()), zp.astype(u8).reshape(())


_OPS.update({
    "QuantizeLinear": _quantize_linear,
    "DequantizeLinear": _dequantize_linear,
    "QLinearConv": _qlinear_conv,
    "QLinearMatMul": _qlinear_matmul,
    "MatMulInteger": _matmul_integer,
    "ConvInteger": _conv_integer,
    "DynamicQuantizeLinear": _dynamic_quantize_linear,
})


class GraphExecutor:
    """Callable ONNX graph: ``executor(*inputs) -> tuple(outputs)``.

    Build-time validation: every node's op must be implemented, every
    node input must be producible — unknown topology fails loudly here,
    mirroring tract's load-time graph check (reference nn.rs:166-172).
    """

    def __init__(self, graph: OnnxGraph):
        self.graph = graph
        self.input_names = [i.name for i in graph.inputs]
        self.output_names = [o.name for o in graph.outputs]
        known = set(self.input_names) | set(graph.initializers) | {""}
        self._annotate_opset(graph.nodes, graph.opset)
        self._validate(graph.nodes, known)
        absent = [o for o in self.output_names if o not in known]
        if absent:
            raise ValueError(f"graph outputs never produced: {absent}")

    def _annotate_opset(self, nodes, opset: int) -> None:
        """Ops whose SEMANTICS changed across opsets need the model's
        opset at run time; record it on the node (subgraphs inherit)."""
        for node in nodes:
            if node.op_type in ("Softmax", "LogSoftmax", "Resize"):
                node.attrs.setdefault("_opset", opset)
            for v in node.attrs.values():
                if isinstance(v, OnnxGraph):
                    self._annotate_opset(v.nodes, opset)

    def _validate(self, nodes, known: set) -> None:
        for node in nodes:
            if (node.op_type not in ("If", "Loop", "Scan")
                    and node.op_type not in _OPS):
                raise ValueError(
                    f"unsupported ONNX op {node.op_type!r} "
                    f"(node {node.name!r}) — extend models/onnx_exec.py")
            missing = [i for i in node.inputs if i not in known]
            if missing:
                raise ValueError(
                    f"node {node.name!r} consumes unknown values "
                    f"{missing} (graph not topologically ordered?)")
            if node.op_type == "If":
                for key in ("then_branch", "else_branch"):
                    sub = node.attrs.get(key)
                    if not isinstance(sub, OnnxGraph):
                        raise ValueError(
                            f"If node {node.name!r} missing {key}")
                    # ONNX subgraphs see the outer lexical scope
                    sub_known = (set(known) | set(sub.initializers)
                                 | {i.name for i in sub.inputs})
                    self._validate(sub.nodes, sub_known)
                    if len(sub.outputs) != len(node.outputs):
                        raise ValueError(
                            f"If node {node.name!r}: {key} yields "
                            f"{len(sub.outputs)} outputs, node declares "
                            f"{len(node.outputs)}")
                    absent = [o.name for o in sub.outputs
                              if o.name not in sub_known]
                    if absent:
                        raise ValueError(
                            f"If node {node.name!r}: {key} outputs "
                            f"never produced: {absent}")
            if node.op_type == "Scan":
                body = node.attrs.get("body")
                if not isinstance(body, OnnxGraph):
                    raise ValueError(
                        f"Scan node {node.name!r} missing body")
                n_scan_in = int(node.attrs.get("num_scan_inputs", 0))
                n_states = len(node.inputs) - n_scan_in
                if n_scan_in < 1 or n_states < 0:
                    raise ValueError(
                        f"Scan node {node.name!r}: bad num_scan_inputs")
                if len(body.inputs) != n_states + n_scan_in:
                    raise ValueError(
                        f"Scan node {node.name!r}: body declares "
                        f"{len(body.inputs)} inputs, expected "
                        f"{n_states + n_scan_in}")
                n_scan_out = len(body.outputs) - n_states
                if n_scan_out < 0 \
                        or len(node.outputs) != n_states + n_scan_out:
                    raise ValueError(
                        f"Scan node {node.name!r}: output arity "
                        f"mismatch")
                body_known = (set(known) | set(body.initializers)
                              | {i.name for i in body.inputs})
                self._validate(body.nodes, body_known)
                absent = [o.name for o in body.outputs
                          if o.name not in body_known]
                if absent:
                    raise ValueError(
                        f"Scan node {node.name!r}: body outputs "
                        f"never produced: {absent}")
            if node.op_type == "Loop":
                body = node.attrs.get("body")
                if not isinstance(body, OnnxGraph):
                    raise ValueError(
                        f"Loop node {node.name!r} missing body")
                n_carried = max(len(node.inputs) - 2, 0)
                if len(body.inputs) != 2 + n_carried:
                    raise ValueError(
                        f"Loop node {node.name!r}: body declares "
                        f"{len(body.inputs)} inputs, expected "
                        f"{2 + n_carried}")
                n_scan = len(body.outputs) - 1 - n_carried
                if n_scan < 0 or len(node.outputs) != n_carried + n_scan:
                    raise ValueError(
                        f"Loop node {node.name!r}: output arity "
                        f"mismatch (body {len(body.outputs)}, node "
                        f"{len(node.outputs)}, carried {n_carried})")
                body_known = (set(known) | set(body.initializers)
                              | {i.name for i in body.inputs})
                self._validate(body.nodes, body_known)
                absent = [o.name for o in body.outputs
                          if o.name not in body_known]
                if absent:
                    raise ValueError(
                        f"Loop node {node.name!r}: body outputs "
                        f"never produced: {absent}")
            known.update(node.outputs)

    def __call__(self, *inputs, initializers=None):
        """Run the graph. ``initializers`` (optional dict) substitutes
        the weights — pass them as jit ARGUMENTS to keep multi-MB
        weights out of the compiled executable's constant pool."""
        if len(inputs) != len(self.input_names):
            raise ValueError(
                f"expected {len(self.input_names)} inputs "
                f"({self.input_names}), got {len(inputs)}")
        env: dict[str, object] = dict(self.graph.initializers)
        if initializers is not None:
            env.update(initializers)
        env.update(zip(self.input_names, inputs))
        self._exec_nodes(self.graph.nodes, env)
        return tuple(env[name] for name in self.output_names)

    def _exec_nodes(self, nodes, env: dict) -> None:
        for node in nodes:
            if node.op_type == "If":
                results = self._run_if(node, env)
            elif node.op_type == "Loop":
                results = self._run_loop(node, env)
            elif node.op_type == "Scan":
                results = self._run_scan(node, env)
            else:
                # optional inputs are empty-named and may sit in the
                # MIDDLE of the list (torch: Resize(X, "", scales)) —
                # keep their position as None, strip the trailing ones
                args = [env[name] if name != "" else None
                        for name in node.inputs]
                while args and args[-1] is None:
                    args.pop()
                results = _OPS[node.op_type](node, *args)
            if len(node.outputs) == 1:
                env[node.outputs[0]] = results
            else:
                if len(results) != len(node.outputs):
                    raise ValueError(
                        f"node {node.name!r} ({node.op_type}) produced "
                        f"{len(results)} results for "
                        f"{len(node.outputs)} declared outputs")
                for out_name, val in zip(node.outputs, results):
                    env[out_name] = val

    def _run_loop(self, node: OnnxNode, env: dict):
        """Loop with a trace-time-resolvable trip count/condition,
        executed by unrolling (torchscript-scripted modules export
        Python loops this way). Carried deps thread through iterations;
        scan outputs stack along a new axis 0. Data-dependent
        termination fails loudly — under jit the loop SHAPE must be
        static (the same rule as If and Reshape)."""
        body = node.attrs["body"]
        args = [env[name] if name != "" else None
                for name in node.inputs]
        m = args[0] if len(args) > 0 else None
        cond = args[1] if len(args) > 1 else None
        carried = list(args[2:])
        n_carried = len(carried)
        n_scan = len(body.outputs) - 1 - n_carried
        if m is None and cond is None:
            raise ValueError(f"Loop without trip count or condition "
                             f"({node.name})")
        if m is not None and not _is_concrete(m):
            raise ValueError(
                f"Loop with traced (data-dependent) trip count "
                f"({node.name}) is unsupported")
        trip = (None if m is None
                else int(np.asarray(m).reshape(())))
        if trip is not None and trip >= 2**31 - 1:
            # torchscript exports `while cond:` as trip=INT64_MAX;
            # treat it as unbounded (and keep int32-safe under jit)
            trip = None

        class _Traced(Exception):
            pass

        def as_bool(v, what):
            if not _is_concrete(v):
                raise _Traced(what)
            return bool(np.asarray(v).reshape(()))

        names = [i.name for i in body.inputs]
        try:
            cond_val = (True if cond is None
                        else as_bool(cond, "condition"))
        except _Traced:
            return self._run_loop_traced(node, env, trip, cond,
                                         carried, n_scan)
        scans: list[list] = [[] for _ in range(n_scan)]
        i = 0
        while (trip is None or i < trip) and cond_val:
            if trip is None and i >= 100_000:
                raise ValueError(
                    f"Loop ran 100000 iterations ({node.name})")
            sub_env = dict(env)
            sub_env.update(body.initializers)
            sub_env[names[0]] = np.int64(i)
            sub_env[names[1]] = np.asarray(cond_val)
            for nm, v in zip(names[2:], carried):
                sub_env[nm] = v
            self._exec_nodes(body.nodes, sub_env)
            outs = [sub_env[o.name] for o in body.outputs]
            try:
                cond_val = as_bool(outs[0], "loop-exit condition")
            except _Traced:
                # the body makes the exit condition data-dependent:
                # restart on the lax.while_loop path (the unrolled
                # iterations had no side effects — env was copied)
                return self._run_loop_traced(
                    node, env, trip, cond, list(args[2:]), n_scan)
            carried = outs[1:1 + n_carried]
            for k in range(n_scan):
                scans[k].append(outs[1 + n_carried + k])
            i += 1
        if n_scan and i == 0:
            raise ValueError(
                f"Loop with zero iterations and scan outputs "
                f"({node.name}): result shape is unknowable")
        results = carried + [_xp(*s).stack(s) for s in scans]
        return tuple(results) if len(node.outputs) > 1 else results[0]

    def _run_loop_traced(self, node: OnnxNode, env: dict, trip,
                         cond, carried, n_scan: int):
        """Loop whose exit condition is genuinely data-dependent:
        lowers to lax.while_loop (carried deps only — scan outputs
        would have data-dependent shape, so they fail loudly; carried
        shapes/dtypes must be invariant across iterations)."""
        if n_scan:
            raise ValueError(
                f"Loop with a data-dependent condition AND scan "
                f"outputs ({node.name}): scan output shape would be "
                f"data-dependent")
        body = node.attrs["body"]
        names = [i.name for i in body.inputs]
        n_carried = len(carried)

        def cond_fn(carry):
            i, c = carry[0], carry[1]
            ok = c
            if trip is not None:
                ok = ok & (i < trip)
            return ok

        def body_fn(carry):
            i, c = carry[0], carry[1]
            sub_env = dict(env)
            sub_env.update(body.initializers)
            sub_env[names[0]] = i
            sub_env[names[1]] = c
            for nm, v in zip(names[2:], carry[2:]):
                sub_env[nm] = v
            self._exec_nodes(body.nodes, sub_env)
            outs = [sub_env[o.name] for o in body.outputs]
            return (i + 1,
                    jnp.asarray(outs[0]).reshape(()).astype(bool),
                    *(jnp.asarray(o) for o in outs[1:1 + n_carried]))

        init = (jnp.asarray(0, jnp.int32),
                (jnp.asarray(True) if cond is None
                 else jnp.asarray(cond).reshape(()).astype(bool)),
                *(jnp.asarray(c) for c in carried))
        try:
            out = jax.lax.while_loop(cond_fn, body_fn, init)
        except TypeError as e:
            raise ValueError(
                f"Loop with a data-dependent condition requires "
                f"iteration-invariant carried shapes/dtypes "
                f"({node.name}): {e}") from e
        results = out[2:]
        return (tuple(results) if len(node.outputs) > 1
                else results[0])

    def _run_scan(self, node: OnnxNode, env: dict):
        """Scan: iterate the body over slices of the scan inputs (the
        trip count is a SHAPE, so this unrolls statically and works
        under jit — unlike Loop's data-dependent trip counts). States
        thread through; scan outputs stack along their output axis."""
        body = node.attrs["body"]
        n_scan_in = int(node.attrs["num_scan_inputs"])
        args = [env[name] for name in node.inputs]
        n_states = len(args) - n_scan_in
        states = list(args[:n_states])
        xs = args[n_states:]
        in_axes = node.attrs.get("scan_input_axes", [0] * n_scan_in)
        in_dirs = node.attrs.get("scan_input_directions",
                                 [0] * n_scan_in)
        n_scan_out = len(body.outputs) - n_states
        out_axes = node.attrs.get("scan_output_axes",
                                  [0] * n_scan_out)
        out_dirs = node.attrs.get("scan_output_directions",
                                  [0] * n_scan_out)
        # preserve the concrete-numpy convention (like _run_loop):
        # concrete scan results must stay usable as static shape math
        xs = [_xp(x).moveaxis(_xp(x).asarray(x), int(a), 0)
              for x, a in zip(xs, in_axes)]
        xs = [x[::-1] if d else x for x, d in zip(xs, in_dirs)]
        trip = xs[0].shape[0]
        if trip == 0 and n_scan_out:
            raise ValueError(
                f"Scan over a zero-length sequence with scan outputs "
                f"({node.name}): result shape is unknowable")
        names = [i.name for i in body.inputs]
        scans: list[list] = [[] for _ in range(n_scan_out)]
        for t in range(trip):
            sub_env = dict(env)
            sub_env.update(body.initializers)
            for nm, v in zip(names[:n_states], states):
                sub_env[nm] = v
            for nm, x in zip(names[n_states:], xs):
                sub_env[nm] = x[t]
            self._exec_nodes(body.nodes, sub_env)
            outs = [sub_env[o.name] for o in body.outputs]
            states = outs[:n_states]
            for k in range(n_scan_out):
                scans[k].append(outs[n_states + k])
        stacked = []
        for k in range(n_scan_out):
            s = scans[k][::-1] if out_dirs[k] else scans[k]
            xp = _xp(*s)
            stacked.append(xp.moveaxis(xp.stack(s, axis=0), 0,
                                       int(out_axes[k])))
        results = tuple(states) + tuple(stacked)
        return results if len(node.outputs) > 1 else results[0]

    def _run_if(self, node: OnnxNode, env: dict):
        """If: a trace-time-resolvable condition (the common case —
        conditions in real exports derive from concrete shape math)
        flattens the branch choice at trace time, with no
        same-shape-both-branches constraint. A genuinely DATA-DEPENDENT
        condition lowers to lax.cond — both branches trace, so their
        output shapes/dtypes must match (a mismatch fails loudly)."""

        def run_branch(branch, env):
            # ONNX subgraph scoping: the branch sees the outer scope;
            # its own values must not leak back out
            sub_env = dict(env)
            sub_env.update(branch.initializers)
            self._exec_nodes(branch.nodes, sub_env)
            return tuple(sub_env[o.name] for o in branch.outputs)

        cond = env[node.inputs[0]]
        if _is_concrete(cond):
            branch = (node.attrs["then_branch"]
                      if bool(np.asarray(cond).reshape(()))
                      else node.attrs["else_branch"])
            outs = run_branch(branch, env)
            return outs if len(node.outputs) > 1 else outs[0]
        try:
            outs = jax.lax.cond(
                jnp.asarray(cond).reshape(()),
                lambda: run_branch(node.attrs["then_branch"], env),
                lambda: run_branch(node.attrs["else_branch"], env))
        except TypeError as e:
            raise ValueError(
                f"If with a data-dependent condition requires both "
                f"branches to produce matching shapes/dtypes "
                f"({node.name}): {e}") from e
        return outs if len(node.outputs) > 1 else outs[0]


def load_graph_executor(path: str) -> GraphExecutor:
    """Parse + validate an ONNX file into a jittable executor."""
    from infercam_onnx_tpu.models.onnx_reader import read_onnx_graph

    return GraphExecutor(read_onnx_graph(path))


class GraphDetector:
    """A full detector whose CNN is the INTERPRETED ONNX graph.

    The tract-parity runtime (reference nn.rs:166-186: load the
    downloaded graph, optimize, run): preprocess (triangle resize +
    normalize), the graph executor, and the reference postprocess
    (filter + greedy NMS) fuse into ONE jitted program, so the
    interpreted graph costs the same as the hand-written forward after
    compilation. Works with any export that consumes ``1x3xHxW`` float
    and yields ``(scores[1,K,2], boxes[1,K,4])`` — no initializer-name
    or graph-structure assumptions beyond that IO contract (the batch
    dimension is vmapped over, so exports with batch-1 constants in
    their Reshape chains still serve batched traffic).

    Float weights are passed as jit arguments (not baked constants);
    integer shape tensors stay concrete so dynamic-looking reshapes
    resolve statically. Compute is float32 (the graph's own dtype).
    API-compatible with detector.Detector for the host-level calls
    (run_device / detect_batch / detect / warmup).

    ``mesh``: shard the batch (stream) axis over a `jax.sharding.Mesh`
    — data-parallel serving for ARBITRARY graph models, same scheme as
    parallel/ShardedDetector (weights replicate, activations shard,
    no collectives in the hot loop; batches pad to mesh multiples).
    """

    def __init__(self, path_or_graph,
                 config=None, mesh=None):
        from infercam_onnx_tpu.config import DetectorConfig
        from infercam_onnx_tpu.models.onnx_reader import (
            OnnxGraph,
            read_onnx_graph,
        )
        from infercam_onnx_tpu.ops.preprocess import Preprocessor

        self.config = config or DetectorConfig(compute_dtype="float32")
        graph = (path_or_graph if isinstance(path_or_graph, OnnxGraph)
                 else read_onnx_graph(path_or_graph))
        self.graph = graph
        self.executor = GraphExecutor(graph)
        shape = graph.inputs[0].shape
        if len(shape) != 4 or shape[1] != 3:
            raise ValueError(f"expected NCHW image input, got {shape}")
        self.height, self.width = int(shape[2]), int(shape[3])
        self.preprocessor = Preprocessor(self.width, self.height)
        # float tensors become jit arguments; integer tensors (shape
        # math) must stay concrete
        self._weights = {
            k: v for k, v in graph.initializers.items()
            if np.issubdtype(v.dtype, np.floating)
        }
        self.mesh = mesh
        self._tail_programs: dict = {}
        if mesh is None:
            self._shardings = None
            self._program = jax.jit(self._forward)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch = NamedSharding(mesh, P("data"))
            repl = NamedSharding(mesh, P())
            self._shardings = (batch, repl)
            self.batch_granularity = mesh.shape["data"]
            self._program = jax.jit(
                self._forward,
                in_shardings=(repl, batch, repl, repl),
                out_shardings=(batch, batch, batch))

    def to_mesh(self, mesh) -> "GraphDetector":
        """Mesh-aware clone reusing the parsed graph (no re-parse)."""
        return GraphDetector(self.graph, self.config, mesh=mesh)

    def _forward(self, weights, images, r_h, r_w):
        from infercam_onnx_tpu.ops.postprocess import batched_postprocess
        from infercam_onnx_tpu.ops.preprocess import preprocess_images

        x = preprocess_images(images, r_h, r_w)
        x = jnp.transpose(x, (0, 3, 1, 2))

        def one(xi):
            scores, boxes = self.executor(xi[None],
                                          initializers=weights)
            return scores[0], boxes[0]

        scores, boxes = jax.vmap(one)(x)
        c = self.config
        sel_boxes, sel_conf, count = batched_postprocess(
            scores, boxes, min_confidence=c.min_confidence,
            max_iou=c.max_iou, top_k=c.top_k,
            max_detections=c.max_detections)
        return sel_boxes, sel_conf, count

    def run_device(self, images, *, pack_output: bool = False):
        b, h, w, _ = images.shape
        r_h, r_w = self.preprocessor.matrices(w, h)
        boxes, confs, count = self._program(
            self._weights, jnp.asarray(self._mesh_pad(images)),
            r_h, r_w)
        boxes, confs, count = boxes[:b], confs[:b], count[:b]
        if not pack_output:
            return boxes, confs, count
        return self._pack(boxes, confs, count)

    def _mesh_pad(self, arr):
        if self.mesh is None:
            return arr
        pad = (-arr.shape[0]) % self.mesh.shape["data"]
        if pad:
            arr = np.pad(np.asarray(arr),
                         [(0, pad)] + [(0, 0)] * (arr.ndim - 1))
        return arr

    def _pack(self, boxes, confs, count):
        d = boxes.shape[1]
        valid = (jnp.arange(d)[None, :]
                 < count[:, None]).astype(jnp.float32)
        return jnp.concatenate(
            [boxes, confs[..., None], valid[..., None]], axis=-1)

    def _tail_program(self, key, impl, *, outs: int = 3,
                      extra_repl: int = 0):
        """jit (with mesh shardings when sharded) one device-decode-tail
        variant; cached per static geometry. ``outs`` batch-sharded
        outputs; ``extra_repl`` replicated trailing args beyond the
        standard (r_h, r_w) pair."""
        prog = self._tail_programs.get(key)
        if prog is None:
            if self._shardings is None:
                prog = jax.jit(impl)
            else:
                batch, repl = self._shardings
                n_batch = key[1]  # how many leading args are batched
                ins = ((repl,) + (batch,) * n_batch
                       + (repl, repl) + (repl,) * extra_repl)
                prog = jax.jit(impl, in_shardings=ins,
                               out_shardings=tuple([batch] * outs))
            self._tail_programs[key] = prog
        return prog

    def run_device_ycbcr_packed(self, packed, geom: dict, *,
                                pack_output: bool = False):
        """Transfer-optimal path for graph models: packed YCbCr planes
        in (native decode_ycbcr_batch), chroma upsampling + color
        conversion fused ahead of the interpreted graph — identical
        scheme to detector.detect_from_ycbcr_impl."""
        from infercam_onnx_tpu.ops.jpeg_device import (
            combine_ycbcr,
            unpack_ycbcr_planes,
        )

        w, h = geom["width"], geom["height"]
        gkey = tuple(sorted(
            (k, tuple(v) if isinstance(v, tuple) else v)
            for k, v in geom.items()))

        def impl(weights, packed, r_h, r_w):
            y, cb, cr = unpack_ycbcr_planes(
                packed, y_pw=geom["y_pw"], y_ph=geom["y_ph"],
                c_pw=geom["c_pw"], c_ph=geom["c_ph"])
            rgb = combine_ycbcr(y, cb, cr, width=w, height=h,
                                sampling=tuple(geom["sampling"]))
            return self._forward(weights, rgb, r_h, r_w)

        b = packed.shape[0]
        prog = self._tail_program(("ycbcr", 1, gkey), impl)
        r_h, r_w = self.preprocessor.matrices(w, h)
        boxes, confs, count = prog(
            self._weights, jnp.asarray(self._mesh_pad(packed)),
            r_h, r_w)
        boxes, confs, count = boxes[:b], confs[:b], count[:b]
        if pack_output:
            return self._pack(boxes, confs, count)
        return boxes, confs, count

    def run_device_ycbcr_annotated(self, packed, geom: dict, *,
                                   quality: int = 95,
                                   disp_dims: tuple | None = None):
        """Fused annotated path for graph models: the interpreted
        graph's detections are overlaid into the YCbCr planes and the
        output JPEG's DCT blocks quantized on-device (identical encode
        tail to detector.detect_annotate_from_ycbcr_impl); host does
        entropy coding only."""
        from infercam_onnx_tpu.detector import Detector
        from infercam_onnx_tpu.ops.jpeg_device import (
            combine_ycbcr,
            unpack_ycbcr_planes,
        )
        from infercam_onnx_tpu.ops.jpeg_encode_device import (
            encode_planes,
            render_overlay_ycbcr,
        )

        w, h = geom["width"], geom["height"]
        samp = tuple(geom["sampling"])
        disp = tuple(disp_dims) if disp_dims else None
        gkey = tuple(sorted(
            (k, tuple(v) if isinstance(v, tuple) else v)
            for k, v in geom.items()))

        def impl(weights, packed_arr, r_h, r_w, quant2):
            y, cb, cr = unpack_ycbcr_planes(
                packed_arr, y_pw=geom["y_pw"], y_ph=geom["y_ph"],
                c_pw=geom["c_pw"], c_ph=geom["c_ph"])
            rgb = combine_ycbcr(y, cb, cr, width=w, height=h,
                                sampling=samp)
            boxes, confs, count = self._forward(weights, rgb, r_h, r_w)
            pdet = self._pack(boxes, confs, count)
            y, cb, cr = render_overlay_ycbcr(
                y, cb, cr, pdet, width=w, height=h, sampling=samp,
                disp_dims=disp)
            return encode_planes(y, cb, cr, quant2), pdet

        b = packed.shape[0]
        prog = self._tail_program(("ycbcr_annot", 1, gkey, disp), impl,
                                  outs=2, extra_repl=1)
        r_h, r_w = self.preprocessor.matrices(w, h)
        coefs, pdet = prog(
            self._weights, jnp.asarray(self._mesh_pad(packed)),
            r_h, r_w, Detector._encode_quant(quality))
        return coefs[:b], pdet[:b]

    def run_device_annotated(self, images, *, quality: int = 95,
                             subsampling: str = "420",
                             disp_dims: tuple | None = None):
        """RGB-input fused annotated path for graph models."""
        from infercam_onnx_tpu.detector import Detector
        from infercam_onnx_tpu.ops.jpeg_encode_device import (
            SUBSAMPLING_FACTORS,
            encode_planes,
            render_overlay_ycbcr,
            rgb_to_ycbcr_planes,
        )

        sampling = SUBSAMPLING_FACTORS[subsampling]
        b, h, w, _ = images.shape
        disp = tuple(disp_dims) if disp_dims else None

        def impl(weights, imgs, r_h, r_w, quant2):
            boxes, confs, count = self._forward(weights, imgs,
                                                r_h, r_w)
            pdet = self._pack(boxes, confs, count)
            y, cb, cr = rgb_to_ycbcr_planes(imgs, sampling=sampling)
            y, cb, cr = render_overlay_ycbcr(
                y, cb, cr, pdet, width=w, height=h,
                sampling=sampling, disp_dims=disp)
            return encode_planes(y, cb, cr, quant2), pdet

        prog = self._tail_program(
            ("rgb_annot", 1, (h, w), sampling, disp), impl,
            outs=2, extra_repl=1)
        r_h, r_w = self.preprocessor.matrices(w, h)
        coefs, pdet = prog(
            self._weights, jnp.asarray(self._mesh_pad(images)),
            r_h, r_w, Detector._encode_quant(quality))
        return coefs[:b], pdet[:b]

    def run_device_coefficients_arrays(self, y, cb, cr, quant, wh, *,
                                       sampling=(2, 2),
                                       pack_output: bool = False):
        """Zero-pixel path for graph models: entropy-decoded DCT
        coefficients in, dequant+IDCT+upsample+color fused ahead of the
        interpreted graph (cf. detector.detect_from_coefficients_impl).
        """
        from infercam_onnx_tpu.ops.jpeg_device import decode_rgb_device

        w, h = int(wh[0]), int(wh[1])

        def impl(weights, y, cb, cr, quant, r_h, r_w):
            rgb = decode_rgb_device(y, cb, cr, quant, width=w,
                                    height=h,
                                    sampling=tuple(sampling))
            return self._forward(weights, rgb, r_h, r_w)

        b = y.shape[0]
        prog = self._tail_program(
            ("coef", 4, w, h, tuple(sampling),
             tuple(y.shape[1:]), tuple(cb.shape[1:])), impl)
        r_h, r_w = self.preprocessor.matrices(w, h)
        boxes, confs, count = prog(
            self._weights, jnp.asarray(self._mesh_pad(y)),
            jnp.asarray(self._mesh_pad(cb)),
            jnp.asarray(self._mesh_pad(cr)),
            jnp.asarray(self._mesh_pad(quant)), r_h, r_w)
        boxes, confs, count = boxes[:b], confs[:b], count[:b]
        if pack_output:
            return self._pack(boxes, confs, count)
        return boxes, confs, count

    def warmup(self, batch_size: int, height: int, width: int, *,
               pack_output: bool = False) -> None:
        dummy = np.zeros((batch_size, height, width, 3), np.uint8)
        jax.block_until_ready(
            self.run_device(dummy, pack_output=pack_output))

    def detect_batch(self, frames):
        boxes, confs, counts = jax.device_get(self.run_device(frames))
        return [
            [(boxes[b, i], float(confs[b, i]))
             for i in range(int(counts[b]))]
            for b in range(frames.shape[0])
        ]

    def detect(self, frame):
        return self.detect_batch(frame[None])[0]
