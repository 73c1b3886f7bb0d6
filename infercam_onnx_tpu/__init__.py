"""infercam_onnx_tpu — a TPU-native streaming face-detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
sgasse/infercam_onnx (a Rust client/server webcam face-detection system):
edge senders stream JPEG frames over a length-delimited TCP protocol to an
inference server that runs the UltraFace (version-RFB-320/640) detector and
serves raw + annotated MJPEG streams over HTTP.

Unlike the reference (single-threaded tract-onnx CPU inference, batch pinned
to 1 — see reference infer_server/src/nn.rs:83,167), the whole per-frame hot
path here (resize, normalize, CNN forward, confidence filter, hard-NMS) is a
single jitted XLA program, micro-batched across concurrent streams, and
scales over a `jax.sharding.Mesh` for multi-chip serving.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level API (importing the package stays cheap; jax loads
    # only when the compute path is touched)
    if name == "Detector":
        from infercam_onnx_tpu.detector import Detector

        return Detector
    if name == "UltraFace":
        from infercam_onnx_tpu.models import UltraFace

        return UltraFace
    if name == "GraphDetector":
        from infercam_onnx_tpu.models.onnx_exec import GraphDetector

        return GraphDetector
    if name == "ShardedDetector":
        from infercam_onnx_tpu.parallel import ShardedDetector

        return ShardedDetector
    if name in ("DetectorConfig", "EngineConfig", "ServerConfig",
                "ClientConfig", "ParallelConfig"):
        from infercam_onnx_tpu import config

        return getattr(config, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
