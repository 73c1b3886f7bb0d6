"""Multi-chip scale-out: data-parallel serving + tiled high-res detection.

The reference is a single-host CPU server with no device parallelism
(SURVEY.md section 2 'parallelism inventory'); this package is the
TPU-native scale-out story: a `jax.sharding.Mesh` over the pod, the batch
dim (streams) sharded across chips over ICI, and spatial tiling of
high-resolution frames with a cross-tile NMS merge (BASELINE.json
config 5).
"""

from infercam_onnx_tpu.parallel.mesh import make_mesh  # noqa: F401
from infercam_onnx_tpu.parallel.data_parallel import (  # noqa: F401
    ShardedDetector,
    shard_detect,
)
from infercam_onnx_tpu.parallel.tiling import (  # noqa: F401
    TiledDetector,
    tile_grid_boxes,
)
