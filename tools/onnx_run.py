#!/usr/bin/env python3
"""Run any supported ONNX model on the TPU via the graph executor.

The reference's NN runtime is a general ONNX executor (tract, reference
infer_server/src/nn.rs:166-174); this tool exposes our TPU-native
equivalent (models/onnx_exec.GraphExecutor, ~80 ops + If/Loop) as a
standalone runner for arbitrary exports::

    python tools/onnx_run.py model.onnx                    # random inputs
    python tools/onnx_run.py model.onnx --input x.npy y.npy
    python tools/onnx_run.py model.onnx --runs 50          # timing

Inputs default to standard-normal float32 (uint8 images get 0..255)
with symbolic batch dims pinned to 1. Outputs print as shape/dtype +
value summary; --runs reports amortized ms/run after a warmup."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _random_input(info, rng) -> np.ndarray:
    shape = [1 if d is None else int(d) for d in info.shape]
    # TensorProto elem types: 1=float32, 2=uint8, 6=int32, 7=int64
    if info.elem_type == 2:
        return rng.integers(0, 256, size=shape).astype(np.uint8)
    if info.elem_type in (6, 7):
        dt = np.int32 if info.elem_type == 6 else np.int64
        return rng.integers(0, 4, size=shape).astype(dt)
    return rng.normal(size=shape).astype(np.float32)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("model", help="ONNX file")
    ap.add_argument("--input", nargs="*", default=None,
                    help=".npy/.npz files, one per graph input "
                         "(default: random tensors from declared "
                         "shapes)")
    ap.add_argument("--runs", type=int, default=1,
                    help="timed runs after warmup (default 1)")
    ap.add_argument("--no-jit", action="store_true",
                    help="interpret eagerly instead of one fused "
                         "XLA program")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    from infercam_onnx_tpu.models.onnx_exec import GraphExecutor
    from infercam_onnx_tpu.models.onnx_reader import read_onnx_graph
    from infercam_onnx_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    graph = read_onnx_graph(args.model)
    ex = GraphExecutor(graph)
    print(f"{os.path.basename(args.model)}: {len(graph.nodes)} nodes, "
          f"{len(graph.initializers)} initializers; device "
          f"{jax.devices()[0]}")

    rng = np.random.default_rng(args.seed)
    if args.input:
        inputs = []
        for p in args.input:
            loaded = np.load(p)
            if isinstance(loaded, np.lib.npyio.NpzFile):
                inputs.extend(loaded[k] for k in loaded.files)
            else:
                inputs.append(loaded)
        if len(inputs) != len(graph.inputs):
            ap.error(f"model wants {len(graph.inputs)} inputs "
                     f"({[i.name for i in graph.inputs]}), "
                     f"got {len(inputs)} arrays")
    else:
        inputs = [_random_input(i, rng) for i in graph.inputs]
    for info, arr in zip(graph.inputs, inputs):
        print(f"  in  {info.name}: {arr.shape} {arr.dtype}")

    # trip the transfer-mode latch BEFORE timing anything: the first
    # device->host read in a process can stall minutes on tunneled rigs
    # and must not be misattributed to compile time (CLAUDE.md)
    t0 = time.perf_counter()
    np.asarray(jax.numpy.zeros((1,), jax.numpy.float32))
    latch_s = time.perf_counter() - t0
    if latch_s > 5:
        print(f"first-device-read stall: {latch_s:.1f} s (rig quirk, "
              "not the model)")

    fn = ex if args.no_jit else jax.jit(ex)
    t0 = time.perf_counter()
    outs = fn(*inputs)
    outs = [np.asarray(o) for o in outs]
    warm_s = time.perf_counter() - t0
    for o, info in zip(outs, graph.outputs):
        flat = o.reshape(-1)
        summary = (f"mean {flat.astype(np.float64).mean():.6g}"
                   if flat.size else "empty")
        print(f"  out {info.name}: {o.shape} {o.dtype} ({summary})")
    print(f"first call (incl. compile): {warm_s * 1e3:.1f} ms")

    if args.runs > 1:
        t0 = time.perf_counter()
        for _ in range(args.runs):
            r = fn(*inputs)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / args.runs
        print(f"{args.runs} runs: {dt * 1e3:.3f} ms/run")
    return 0


if __name__ == "__main__":
    sys.exit(main())
