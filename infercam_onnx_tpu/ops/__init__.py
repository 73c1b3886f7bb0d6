"""Device-side image ops: preprocessing and detection postprocessing."""

from infercam_onnx_tpu.ops.preprocess import (  # noqa: F401
    Preprocessor,
    preprocess_images,
    triangle_resize_matrix,
)
from infercam_onnx_tpu.ops.postprocess import (  # noqa: F401
    batched_postprocess,
)
