"""Committed cross-implementation golden fixtures (BASELINE fidelity gate).

The reference ships its behavioral oracle in-tree (8 photos + exact face
counts, reference infer_server/tests/integration_tests.rs:20-34). This
suite's equivalent is committed to the repo: frozen deterministic weights
(resources/weights/ultraface-twin.npz) shared by the torch twin and the
JAX detector, plus per-box golden detections computed by the TORCH twin +
NumPy reference postprocess (tools/make_fixtures.py). The JAX detector
must clear the >=95% box/confidence parity gate against them — an
independent regression any numerical change can break.
"""

import os
import pathlib

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
WEIGHTS = REPO / "resources" / "weights" / "ultraface-twin.npz"
SYNTH_PICS = REPO / "resources" / "test_pics_synthetic"
FIXTURES = pathlib.Path(__file__).resolve().parent / "fixtures"


@pytest.fixture(scope="module")
def frozen_params():
    from infercam_onnx_tpu.models.convert import params_from_state_dict

    return params_from_state_dict(dict(np.load(WEIGHTS)))


def _detector(variant, frozen_params):
    from infercam_onnx_tpu.config import DetectorConfig
    from infercam_onnx_tpu.detector import Detector

    return Detector(
        DetectorConfig(variant=variant, compute_dtype="float32",
                       top_k=512, max_detections=256),
        params=frozen_params)


def test_synthetic_goldens_gate(frozen_params):
    from infercam_onnx_tpu.eval.goldens import check_against_goldens

    det = _detector("RFB-320", frozen_params)
    result = check_against_goldens(
        det, str(SYNTH_PICS),
        str(FIXTURES / "goldens_twin_rfb320_synthetic.json"))
    assert result["want_total"] >= 10  # fixture is non-trivial
    assert result["passed"], result


def test_reference_testpics_goldens_gate(frozen_params, test_pics_dir):
    from infercam_onnx_tpu.eval.goldens import check_against_goldens

    det = _detector("RFB-640", frozen_params)
    result = check_against_goldens(
        det, str(test_pics_dir),
        str(FIXTURES / "goldens_twin_rfb640_testpics.json"))
    assert result["want_total"] >= 100
    assert result["passed"], result


def test_state_dict_roundtrip_is_exact():
    import jax

    from infercam_onnx_tpu.models import ultraface as uf
    from infercam_onnx_tpu.models.convert import (
        params_from_state_dict,
        state_dict_from_params,
    )

    params = uf.init_params(5, background_bias=1.25)
    back = params_from_state_dict(state_dict_from_params(params))
    flat_a, _ = jax.tree.flatten(params)
    flat_b, _ = jax.tree.flatten(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-7)


def test_torch_twin_loads_frozen_weights(frozen_params, rng):
    """The frozen npz drives BOTH implementations to the same function."""
    torch = pytest.importorskip("torch")

    import jax.numpy as jnp

    from infercam_onnx_tpu.models import ultraface as uf
    from torch_twin import UltraFaceTwin

    twin = UltraFaceTwin(
        torch.from_numpy(uf.generate_priors(320, 240))).eval()
    missing, unexpected = twin.load_state_dict(
        {k: torch.from_numpy(v) for k, v in np.load(WEIGHTS).items()},
        strict=False)
    assert not unexpected
    assert all("num_batches_tracked" in m or m == "priors"
               for m in missing)

    x = rng.normal(size=(1, 3, 240, 320)).astype(np.float32)
    with torch.no_grad():
        want_s, want_b = twin(torch.from_numpy(x))
    s, b = uf.forward(frozen_params,
                      jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                      jnp.asarray(uf.generate_priors(320, 240)),
                      compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(s), want_s.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(b), want_b.numpy(), atol=2e-5)


def test_synthetic_pics_are_committed():
    jpgs = sorted(os.listdir(SYNTH_PICS))
    assert len(jpgs) == 4
    assert all(j.endswith(".jpg") for j in jpgs)
