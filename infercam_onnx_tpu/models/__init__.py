"""Model zoo: UltraFace face detector (version-RFB-320/640)."""

from infercam_onnx_tpu.models.ultraface import (  # noqa: F401
    VARIANTS,
    UltraFace,
    forward,
    generate_priors,
    init_params,
)
