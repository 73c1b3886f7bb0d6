"""JAX UltraFace vs the independent torch twin (the CPU numerical oracle).

Random weights flow through the same converter used for real checkpoints /
ONNX files, so this validates both the network math (conv padding/dilation/
grouping, BN folding, head reshape ordering, softmax, box decode) and the
upstream-name -> pytree mapping in models/convert.py.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from infercam_onnx_tpu.models import ultraface as uf
from infercam_onnx_tpu.models.convert import params_from_state_dict

from tests.torch_twin import UltraFaceTwin


def _build_twin(width: int, height: int, seed: int = 7,
                arch: str = "RFB") -> UltraFaceTwin:
    torch.manual_seed(seed)
    priors = torch.from_numpy(uf.generate_priors(width, height))
    twin = UltraFaceTwin(priors, arch=arch).eval()
    # randomize BN stats so folding is actually exercised
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    return twin


@pytest.mark.parametrize("variant", ["RFB-320", "slim-320"])
def test_forward_matches_torch_twin(variant):
    width, height = uf.VARIANTS[variant]
    arch = "slim" if variant.startswith("slim") else "RFB"
    twin = _build_twin(width, height, arch=arch)

    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    params = params_from_state_dict(sd)
    priors = jnp.asarray(uf.generate_priors(width, height))

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, height, width, 3), dtype=np.float32)

    with torch.no_grad():
        t_scores, t_boxes = twin(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    j_scores, j_boxes = uf.forward(params, jnp.asarray(x), priors)

    np.testing.assert_allclose(
        np.asarray(j_scores), t_scores.numpy(), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(j_boxes), t_boxes.numpy(), rtol=1e-4, atol=2e-5)


def test_converter_consumes_all_parameters():
    width, height = uf.VARIANTS["RFB-320"]
    twin = _build_twin(width, height)
    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    # strict=True raises if any tensor in the checkpoint is unmapped
    params = params_from_state_dict(sd, strict=True)
    assert len(params["base"]) == 13
    assert len(params["cls_heads"]) == 4


def test_converter_rejects_truncated_state_dict():
    width, height = uf.VARIANTS["RFB-320"]
    twin = _build_twin(width, height)
    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    sd.pop("base_net.7.ConvLinear.conv.weight")
    with pytest.raises(KeyError):
        params_from_state_dict(sd)
