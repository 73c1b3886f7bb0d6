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
    # dtype-module-agnostic: the stats may be concrete numpy OR traced
    # jit arguments (GraphDetector passes weights as arguments)
    eps = node.attrs.get("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = scale * (var + eps) ** -0.5
    return (x - mean.reshape(shape)) * inv.reshape(shape) \
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
    """

    def __init__(self, path_or_graph,
                 config=None):
        from infercam_onnx_tpu.config import DetectorConfig
        from infercam_onnx_tpu.models.onnx_reader import (
            OnnxGraph,
            read_onnx_graph,
        )
        from infercam_onnx_tpu.ops.preprocess import Preprocessor

        self.config = config or DetectorConfig(compute_dtype="float32")
        graph = (path_or_graph if isinstance(path_or_graph, OnnxGraph)
                 else read_onnx_graph(path_or_graph))
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
        self._program = jax.jit(self._forward)

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
        _, h, w, _ = images.shape
        r_h, r_w = self.preprocessor.matrices(w, h)
        boxes, confs, count = self._program(
            self._weights, jnp.asarray(images), r_h, r_w)
        if not pack_output:
            return boxes, confs, count
        d = boxes.shape[1]
        valid = (jnp.arange(d)[None, :]
                 < count[:, None]).astype(jnp.float32)
        return jnp.concatenate(
            [boxes, confs[..., None], valid[..., None]], axis=-1)

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
