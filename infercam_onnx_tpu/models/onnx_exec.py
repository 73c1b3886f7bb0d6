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
    1: jnp.float32, 6: jnp.int32, 7: jnp.int64, 9: jnp.bool_,
    10: jnp.float16, 11: jnp.float64,
}


def _is_concrete(*vals) -> bool:
    return all(isinstance(v, (np.ndarray, np.generic, int, float))
               for v in vals)


def _xp(*vals):
    """numpy for all-concrete inputs (keeps shape math static), else jnp."""
    return np if _is_concrete(*vals) else jnp


def _conv(node: OnnxNode, x, w, b=None):
    pads = node.attrs.get("pads", [0, 0, 0, 0])
    strides = node.attrs.get("strides", [1, 1])
    dilations = node.attrs.get("dilations", [1, 1])
    group = node.attrs.get("group", 1)
    if node.attrs.get("auto_pad", b"NOTSET") not in (b"", b"NOTSET"):
        raise ValueError(f"Conv auto_pad unsupported ({node.name})")
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
    eps = node.attrs.get("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = 1.0 / np.sqrt(np.asarray(var) + eps)
    return (x - mean.reshape(shape)) * (scale * inv).reshape(shape) \
        + bias.reshape(shape)


def _pool(node: OnnxNode, x, reducer, init, is_avg=False):
    ks = node.attrs["kernel_shape"]
    strides = node.attrs.get("strides", [1] * len(ks))
    pads = node.attrs.get("pads", [0] * (2 * len(ks)))
    n = len(ks)
    window = (1, 1) + tuple(ks)
    strd = (1, 1) + tuple(strides)
    padding = ((0, 0), (0, 0)) + tuple(
        (pads[i], pads[i + n]) for i in range(n))
    out = jax.lax.reduce_window(jnp.asarray(x), init, reducer,
                                window, strd, padding)
    if is_avg:
        out = out / float(np.prod(ks))
    return out


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


def _softmax(node: OnnxNode, x):
    axis = node.attrs.get("axis", -1)
    xp = _xp(x)
    if xp is np:
        e = np.exp(x - x.max(axis=axis, keepdims=True))
        return e / e.sum(axis=axis, keepdims=True)
    return jax.nn.softmax(x, axis=axis)


def _gather(node: OnnxNode, x, idx):
    axis = node.attrs.get("axis", 0)
    return _xp(x, idx).take(np.asarray(idx) if _is_concrete(idx) else idx,
                            axis=axis)


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
    "Div": lambda n, a, b: a / b,
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
    "Shape": lambda n, x: np.asarray(x.shape, np.int64),
    "Gather": _gather,
    "Unsqueeze": _unsqueeze,
    "Squeeze": _squeeze,
    "Cast": lambda n, x: _xp(x).asarray(x).astype(
        _ONNX_DTYPES[n.attrs["to"]] if _xp(x) is jnp
        else np.dtype(jnp.dtype(_ONNX_DTYPES[n.attrs["to"]]).name)),
    "Softmax": _softmax,
    "Slice": _slice,
    "MaxPool": lambda n, x: _pool(n, x, jax.lax.max, -jnp.inf),
    "AveragePool": lambda n, x: _pool(n, x, jax.lax.add, 0.0,
                                      is_avg=True),
    "Clip": _clip,
    "Constant": lambda n: n.attrs["value"],
}


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
        for node in graph.nodes:
            if node.op_type not in _OPS:
                raise ValueError(
                    f"unsupported ONNX op {node.op_type!r} "
                    f"(node {node.name!r}) — extend models/onnx_exec.py")
            missing = [i for i in node.inputs if i not in known]
            if missing:
                raise ValueError(
                    f"node {node.name!r} consumes unknown values "
                    f"{missing} (graph not topologically ordered?)")
            known.update(node.outputs)
        absent = [o for o in self.output_names if o not in known]
        if absent:
            raise ValueError(f"graph outputs never produced: {absent}")

    def __call__(self, *inputs):
        if len(inputs) != len(self.input_names):
            raise ValueError(
                f"expected {len(self.input_names)} inputs "
                f"({self.input_names}), got {len(inputs)}")
        env: dict[str, object] = dict(self.graph.initializers)
        env.update(zip(self.input_names, inputs))
        for node in self.graph.nodes:
            args = [env[name] for name in node.inputs if name != ""]
            results = _OPS[node.op_type](node, *args)
            if len(node.outputs) == 1:
                env[node.outputs[0]] = results
            else:
                for out_name, val in zip(node.outputs, results):
                    env[out_name] = val
        return tuple(env[name] for name in self.output_names)


def load_graph_executor(path: str) -> GraphExecutor:
    """Parse + validate an ONNX file into a jittable executor."""
    from infercam_onnx_tpu.models.onnx_reader import read_onnx_graph

    return GraphExecutor(read_onnx_graph(path))
