"""Fixed-shape TPU NMS vs the dynamic NumPy oracle (reference semantics)."""

import numpy as np
import jax.numpy as jnp

from infercam_onnx_tpu.ops import postprocess as pp
from infercam_onnx_tpu.ops import reference_impl as ref


def _random_detections(rng, k=500, n_clusters=12, spread=0.02):
    """Clustered random boxes so NMS actually suppresses things."""
    centers = rng.uniform(0.1, 0.9, size=(n_clusters, 2))
    idx = rng.integers(0, n_clusters, size=k)
    cxy = centers[idx] + rng.normal(0, spread, size=(k, 2))
    wh = rng.uniform(0.05, 0.2, size=(k, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=1)
    conf = rng.uniform(0.0, 1.0, size=k)
    scores = np.stack([1 - conf, conf], axis=1)
    return scores.astype(np.float32), boxes.astype(np.float32)


def _run_both(scores, boxes, min_confidence=0.5, max_iou=0.5,
              top_k=512, max_detections=128):
    got_b, got_c, got_n = pp.batched_postprocess(
        jnp.asarray(scores[None]), jnp.asarray(boxes[None]),
        min_confidence=min_confidence, max_iou=max_iou,
        top_k=top_k, max_detections=max_detections)
    want = ref.postprocess(scores, boxes, min_confidence, max_iou)
    return (np.asarray(got_b[0]), np.asarray(got_c[0]),
            int(got_n[0])), want


def test_matches_oracle_on_random_clusters():
    rng = np.random.default_rng(0)
    for trial in range(8):
        scores, boxes = _random_detections(rng)
        (gb, gc, gn), want = _run_both(scores, boxes)
        assert gn == len(want), f"trial {trial}: {gn} != {len(want)}"
        for i, (wbox, wconf) in enumerate(want):
            np.testing.assert_allclose(gb[i], wbox, rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(gc[i], wconf, rtol=1e-6)


def test_strict_threshold_boundary():
    # conf exactly == min_confidence must be dropped (strict >,
    # reference nn.rs:127)
    boxes = np.array([[0.1, 0.1, 0.2, 0.2], [0.5, 0.5, 0.6, 0.6]],
                     np.float32)
    scores = np.array([[0.5, 0.5], [0.3, 0.7]], np.float32)
    (gb, gc, gn), want = _run_both(scores, boxes)
    assert gn == len(want) == 1
    np.testing.assert_allclose(gc[0], 0.7, rtol=1e-6)


def test_tie_break_matches_pop_from_back():
    # Two fully-overlapping boxes with identical confidence: the reference's
    # ascending stable sort + pop-from-back selects the LATER index.
    boxes = np.array([[0.1, 0.1, 0.3, 0.3], [0.1, 0.1, 0.3, 0.3]],
                     np.float32)
    scores = np.array([[0.2, 0.8], [0.2, 0.8]], np.float32)
    (gb, gc, gn), want = _run_both(scores, boxes)
    assert gn == len(want) == 1
    np.testing.assert_allclose(gb[0], want[0][0])


def test_iou_boundary_not_suppressed():
    # IoU exactly max_iou must NOT suppress (strict >, reference nn.rs:211).
    # Two side-by-side boxes sharing half their area: iou = 1/3 with
    # max_iou=1/3 - eps suppresses, max_iou=1/3 + eps keeps both.
    boxes = np.array([[0.0, 0.0, 0.2, 0.2], [0.1, 0.0, 0.3, 0.2]],
                     np.float32)
    scores = np.array([[0.1, 0.9], [0.2, 0.8]], np.float32)
    inter = 0.1 * 0.2
    union = 2 * 0.2 * 0.2 - inter
    true_iou = inter / (union + ref.EPS)
    for miou, expect in [(true_iou + 1e-4, 2), (true_iou - 1e-4, 1)]:
        (gb, gc, gn), want = _run_both(scores, boxes, max_iou=miou)
        assert gn == len(want) == expect


def test_illformed_overlap_is_zero_area():
    # Disjoint boxes: overlap corner points invert, area must clamp to 0.
    a = jnp.asarray([[0.0, 0.0, 0.1, 0.1]])
    b = jnp.asarray([[0.5, 0.5, 0.6, 0.6]])
    m = pp.iou_matrix(a, b)
    assert float(m[0, 0]) == 0.0


def test_padding_and_count():
    rng = np.random.default_rng(1)
    scores, boxes = _random_detections(rng, k=100)
    got_b, got_c, got_n = pp.batched_postprocess(
        jnp.asarray(scores[None]), jnp.asarray(boxes[None]),
        max_detections=8, top_k=128)
    n = int(got_n[0])
    assert n <= 8
    # padding rows are zeroed
    assert np.all(np.asarray(got_c[0])[n:] == 0.0)
    assert np.all(np.asarray(got_b[0])[n:] == 0.0)


def test_closure_matches_sequential_scan_fuzz():
    # The production parallel fixpoint closure must be bit-identical to
    # the sequential greedy scan on every input (same reference
    # semantics, different evaluation order).
    rng = np.random.default_rng(3)
    for trial in range(6):
        s1, b1 = _random_detections(
            rng, k=300, n_clusters=rng.integers(2, 20),
            spread=float(rng.uniform(0.005, 0.1)))
        s2, b2 = _random_detections(rng, k=300)
        scores = jnp.asarray(np.stack([s1, s2]))
        boxes = jnp.asarray(np.stack([b1, b2]))
        kw = dict(min_confidence=0.1, max_iou=0.3, top_k=256,
                  max_detections=128)
        cb, cc, cn = pp.batched_postprocess(scores, boxes, **kw)
        sb, sc, sn = pp.batched_postprocess(scores, boxes, impl="scan",
                                            **kw)
        np.testing.assert_array_equal(np.asarray(cn), np.asarray(sn))
        np.testing.assert_array_equal(np.asarray(cb), np.asarray(sb))
        np.testing.assert_array_equal(np.asarray(cc), np.asarray(sc))


def test_closure_deep_suppression_chain():
    # Adversarial worst case for the fixpoint iteration: a chain where
    # box i overlaps only box i+1 beyond the threshold, confidences
    # strictly descending by position. Greedy keeps every even index;
    # the closure needs ~chain-length iterations (first-disagreement
    # index advances one per step) — this pins that the iteration cap
    # never truncates convergence.
    n = 96
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        x0 = i * 0.5  # half-width offset: IoU(i, i+1) = 1/3 > 0.3
        boxes[i] = [x0, 0.0, x0 + 1.0, 1.0]
    boxes /= boxes.max()
    conf = np.linspace(0.95, 0.55, n).astype(np.float32)
    scores = np.stack([1 - conf, conf], axis=1)
    (gb, gc, gn), want = _run_both(
        scores, boxes, min_confidence=0.5, max_iou=0.3,
        top_k=128, max_detections=128)
    assert gn == len(want) == (n + 1) // 2
    for i, (wbox, wconf) in enumerate(want):
        np.testing.assert_allclose(gb[i], wbox, rtol=1e-6, atol=1e-7)


def test_batched_is_per_image_independent():
    rng = np.random.default_rng(2)
    s1, b1 = _random_detections(rng)
    s2, b2 = _random_detections(rng)
    gb, gc, gn = pp.batched_postprocess(
        jnp.asarray(np.stack([s1, s2])), jnp.asarray(np.stack([b1, b2])),
        top_k=512, max_detections=128)
    gb1, gc1, gn1 = pp.batched_postprocess(
        jnp.asarray(s2[None]), jnp.asarray(b2[None]),
        top_k=512, max_detections=128)
    assert int(gn[1]) == int(gn1[0])
    np.testing.assert_allclose(np.asarray(gb[1]), np.asarray(gb1[0]))
