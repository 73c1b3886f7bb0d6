"""Parameter checkpoint (.npz) roundtrip tests."""

import numpy as np

import jax

from infercam_onnx_tpu.models import checkpoint
from infercam_onnx_tpu.models import ultraface as uf


def test_roundtrip_preserves_structure_and_values(tmp_path):
    params = uf.init_params(3, background_bias=2.0)
    path = tmp_path / "p.npz"
    checkpoint.save_params(params, str(path))
    loaded = checkpoint.load_params(str(path))

    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(loaded)
    assert len(flat_a) == len(flat_b)
    # identical tree structure
    assert (jax.tree.structure(jax.tree.map(lambda x: 0, params))
            == jax.tree.structure(jax.tree.map(lambda x: 0, loaded)))
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_roundtrip_forward_identical(tmp_path):
    import jax.numpy as jnp

    params = uf.init_params(1, background_bias=3.0)
    path = tmp_path / "p.npz"
    checkpoint.save_params(params, str(path))
    loaded = checkpoint.load_params(str(path))
    priors = jnp.asarray(uf.generate_priors(320, 240))
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 240, 320, 3), np.float32))
    s1, b1 = uf.forward(params, x, priors)
    s2, b2 = uf.forward(loaded, x, priors)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
