"""Pallas NMS kernel vs the XLA formulation and the NumPy oracle.

Runs the kernel in interpreter mode (tests execute on CPU); the real
Mosaic lowering is exercised on hardware by bench.py and the serving
stack when impl="pallas" is configured.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from infercam_onnx_tpu.ops import postprocess as pp
from infercam_onnx_tpu.ops import reference_impl as ref

from tests.test_postprocess import _random_detections


@pytest.mark.parametrize("trial", range(4))
def test_pallas_matches_xla_and_oracle(trial):
    rng = np.random.default_rng(100 + trial)
    scores, boxes = _random_detections(rng, k=400)
    conf = scores[:, 1]

    args = dict(min_confidence=0.5, max_iou=0.5, top_k=256,
                max_detections=64)
    xb, xc, xn = pp.batched_nms(
        jnp.asarray(conf[None]), jnp.asarray(boxes[None]),
        impl="xla", **args)
    pb, pc, pn = pp.batched_nms(
        jnp.asarray(conf[None]), jnp.asarray(boxes[None]),
        impl="pallas_interpret", **args)

    assert int(xn[0]) == int(pn[0])
    np.testing.assert_allclose(np.asarray(pb), np.asarray(xb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pc), np.asarray(xc), atol=1e-6)

    want = ref.postprocess(scores, boxes, 0.5, 0.5)
    n = int(pn[0])
    assert n == min(len(want), 64)
    for i in range(n):
        np.testing.assert_allclose(np.asarray(pb)[0, i], want[i][0],
                                   atol=1e-6)


def test_pallas_batched_consistency():
    rng = np.random.default_rng(7)
    s1, b1 = _random_detections(rng, k=300)
    s2, b2 = _random_detections(rng, k=300)
    conf = np.stack([s1[:, 1], s2[:, 1]])
    boxes = np.stack([b1, b2])
    bb, cc, nn = pp.batched_nms(
        jnp.asarray(conf), jnp.asarray(boxes), impl="pallas_interpret",
        top_k=256, max_detections=64)
    b1b, c1c, n1n = pp.batched_nms(
        jnp.asarray(conf[1:]), jnp.asarray(boxes[1:]),
        impl="pallas_interpret", top_k=256, max_detections=64)
    assert int(nn[1]) == int(n1n[0])
    np.testing.assert_allclose(np.asarray(bb)[1], np.asarray(b1b)[0],
                               atol=1e-6)


def test_pallas_strict_iou_boundary():
    # suppression strictly > max_iou, as in the reference (nn.rs:211)
    boxes = np.array([[0.0, 0.0, 0.2, 0.2], [0.1, 0.0, 0.3, 0.2]],
                     np.float32)
    conf = np.array([0.9, 0.8], np.float32)
    inter = 0.1 * 0.2
    union = 2 * 0.2 * 0.2 - inter
    true_iou = inter / (union + ref.EPS)
    for miou, expect in [(true_iou + 1e-4, 2), (true_iou - 1e-4, 1)]:
        _, _, n = pp.batched_nms(
            jnp.asarray(conf[None]), jnp.asarray(boxes[None]),
            impl="pallas_interpret", max_iou=float(miou),
            top_k=2, max_detections=2)
        assert int(n[0]) == expect
