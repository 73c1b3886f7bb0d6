"""FULL-MODEL GraphExecutor parity: three standard torchvision-family
architectures exported whole through torch.onnx and executed by the
jittable graph executor, pinned against torch eval outputs.

This is the model-scale counterpart of tests/test_onnx_exec_ops.py's
per-op pins — the tract-equivalence claim at the granularity the
reference actually uses tract (load a whole ONNX model and run it,
reference infer_server/src/nn.rs:166-186).
"""

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")

from infercam_onnx_tpu.models.onnx_exec import GraphExecutor  # noqa: E402
from infercam_onnx_tpu.models.onnx_reader import read_onnx_graph  # noqa: E402

from tests.model_zoo_torch import (  # noqa: E402
    MobileNetV2,
    ResNet18,
    SqueezeNet11,
)
from tests.onnx_export_util import export_onnx  # noqa: E402


def _full_model_parity(mod, tmp_path, *, size=96, batch=2, opset=13,
                       atol=1e-4):
    torch.manual_seed(0)
    mod = mod.eval()
    # BatchNorm running stats away from init so eval-mode normalization
    # is non-trivial
    with torch.no_grad():
        for m in mod.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    x = np.random.default_rng(0).normal(
        size=(batch, 3, size, size)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = mod(torch.from_numpy(x)).numpy()

    path = tmp_path / "model.onnx"
    export_onnx(mod, path, torch.from_numpy(x), opset=opset)
    ex = GraphExecutor(read_onnx_graph(str(path)))
    got_eager = np.asarray(ex(x)[0], np.float32)
    np.testing.assert_allclose(got_eager, want, atol=atol, rtol=1e-4)
    got_jit = np.asarray(jax.jit(ex)(x)[0], np.float32)
    np.testing.assert_allclose(got_jit, want, atol=atol, rtol=1e-4)
    return ex


def test_resnet18_full_model(tmp_path):
    ex = _full_model_parity(ResNet18(), tmp_path)
    ops = {n.op_type for n in ex.graph.nodes}
    # residual topology survived export (folded BN leaves Conv+Add)
    assert "Add" in ops and "Conv" in ops


def test_mobilenet_v2_full_model(tmp_path):
    ex = _full_model_parity(MobileNetV2(), tmp_path)
    ops = {n.op_type for n in ex.graph.nodes}
    assert "Clip" in ops  # ReLU6
    # depthwise convs present (group == channels)
    assert any(n.op_type == "Conv" and n.attrs.get("group", 1) > 1
               for n in ex.graph.nodes)


def test_squeezenet1_1_full_model(tmp_path):
    ex = _full_model_parity(SqueezeNet11(), tmp_path)
    ops = {n.op_type for n in ex.graph.nodes}
    assert "Concat" in ops  # Fire expand concat
    assert "MaxPool" in ops  # ceil_mode pooling


def test_resnet18_opset17(tmp_path):
    """Same model through a newer opset exporter (operator set
    evolution must not change results)."""
    _full_model_parity(ResNet18(), tmp_path, opset=17, size=64,
                       batch=1)


def test_unet_small_full_model(tmp_path):
    """Segmentation-family export: ConvTranspose decoder + skip
    concats at model scale (round-3 continuation)."""
    from tests.model_zoo_torch import UNetSmall

    ex = _full_model_parity(UNetSmall(), tmp_path, size=64)
    ops = {n.op_type for n in ex.graph.nodes}
    assert "ConvTranspose" in ops and "Concat" in ops


def test_crnn_full_model(tmp_path):
    """Recurrent-family export at model scale: conv columns into a
    2-layer bidirectional LSTM (the standard OCR shape)."""
    from tests.model_zoo_torch import CRNN

    torch.manual_seed(1)
    mod = CRNN().eval()
    x = np.random.default_rng(2).normal(
        size=(2, 1, 32, 24)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = mod(torch.from_numpy(x)).numpy()
    path = tmp_path / "crnn.onnx"
    export_onnx(mod, path, torch.from_numpy(x), opset=13)
    ex = GraphExecutor(read_onnx_graph(str(path)))
    got = np.asarray(ex(x)[0], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    got_jit = np.asarray(jax.jit(ex)(x)[0], np.float32)
    np.testing.assert_allclose(got_jit, want, atol=1e-4, rtol=1e-4)
    ops = {n.op_type for n in ex.graph.nodes}
    assert "LSTM" in ops
