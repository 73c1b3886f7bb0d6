"""UltraFace model structure + numerics tests.

The golden structural facts come from the reference's contract: output 0 is
1xKx2 softmax scores, output 1 is 1xKx4 relative corner boxes with K=4420
(320 variant) / 17640 (640 variant) (reference infer_server/src/nn.rs:99-120
and SURVEY.md section 2 "model specifics").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infercam_onnx_tpu.models import ultraface as uf


def test_num_priors_matches_reference_k():
    assert uf.num_priors(320, 240) == 4420
    assert uf.num_priors(640, 480) == 17640
    assert uf.generate_priors(320, 240).shape == (4420, 4)
    assert uf.generate_priors(640, 480).shape == (17640, 4)


def test_priors_are_clamped_and_center_form():
    p = uf.generate_priors(320, 240)
    assert p.min() >= 0.0 and p.max() <= 1.0
    # first prior of level 0: center (0.5/40, 0.5/30), size (10/320, 10/240)
    np.testing.assert_allclose(
        p[0], [0.5 / 40, 0.5 / 30, 10 / 320, 10 / 240], rtol=1e-6
    )
    # anchor ordering within a cell follows MIN_BOXES
    np.testing.assert_allclose(p[1][2], 16 / 320, rtol=1e-6)
    np.testing.assert_allclose(p[2][2], 24 / 320, rtol=1e-6)


@pytest.mark.parametrize("variant,k", [("RFB-320", 4420), ("RFB-640", 17640)])
def test_forward_shapes(variant, k):
    model = uf.UltraFace.create(variant, rng=0)
    w, h = uf.VARIANTS[variant]
    x = jnp.zeros((2, h, w, 3), jnp.float32)
    scores, boxes = model(x)
    assert scores.shape == (2, k, 2)
    assert boxes.shape == (2, k, 4)
    # softmax rows sum to 1
    np.testing.assert_allclose(
        np.asarray(jnp.sum(scores, -1)), 1.0, atol=1e-5
    )


def test_forward_jits_and_batches():
    model = uf.UltraFace.create("RFB-320", rng=0)
    fwd = jax.jit(lambda x: model(x))
    x1 = jax.random.uniform(jax.random.PRNGKey(1), (1, 240, 320, 3))
    x4 = jnp.tile(x1, (4, 1, 1, 1))
    s1, b1 = fwd(x1)
    s4, b4 = fwd(x4)
    # batching is exact: every batch row equals the single-image result
    np.testing.assert_allclose(np.asarray(s4[2]), np.asarray(s1[0]),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b4[2]), np.asarray(b1[0]),
                               rtol=0, atol=1e-5)


def test_background_bias_sparsifies_detections():
    dense = uf.UltraFace.create("RFB-320", rng=0)
    sparse = uf.UltraFace.create("RFB-320", rng=0, background_bias=4.0)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 240, 320, 3))
    s_dense, _ = dense(x)
    s_sparse, _ = sparse(x)
    frac_dense = float(jnp.mean(s_dense[..., 1] > 0.5))
    frac_sparse = float(jnp.mean(s_sparse[..., 1] > 0.5))
    assert frac_sparse < frac_dense
    assert frac_sparse < 0.05


def test_slim_variant_forward():
    model = uf.UltraFace.create("slim-320", rng=0)
    x = jnp.zeros((1, 240, 320, 3), jnp.float32)
    scores, boxes = model(x)
    assert scores.shape == (1, 4420, 2)
    # slim block 7 is a conv_dw, not an RFB
    assert "branch0" not in model.params["base"][7]
    assert "dw" in model.params["base"][7]
