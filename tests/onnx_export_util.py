"""Shared torch.onnx.export helper for tests.

torch.onnx.export works offline (no `onnx` package installed) except
for its final `_add_onnxscript_fn` post-processing step, which only
matters for custom onnxscript ops (absent here) — patch it to identity
for the duration of the export. This private-API patch lives in ONE
place so a torch upgrade that moves the hook is a one-file fix.
"""

import warnings


def export_onnx(mod, path, *example_inputs, opset=11, fold=True,
                input_names=None, output_names=None):
    import torch
    from torch.onnx._internal.torchscript_exporter import (
        onnx_proto_utils)

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda b, c: b
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            torch.onnx.export(mod, tuple(example_inputs), str(path),
                              input_names=input_names,
                              output_names=output_names,
                              opset_version=opset,
                              do_constant_folding=fold, dynamo=False)
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig
