"""Worker process for the 2-process multi-host (DCN) dryrun test.

Spawned twice by tests/test_parallel.py::test_multihost_two_process_dryrun
with process_id 0/1. Joins the jax.distributed runtime over localhost
(the CPU backend wires cross-process collectives via Gloo — standing in
for DCN), builds the global 2-device mesh spanning both processes, and
runs BOTH a collective sanity check and the real sharded detection
program (parallel.ShardedDetector) with one frame per process.

Prints one final line ``MULTIHOST_OK <checksum>`` that the parent
compares across the two processes (replicated outputs must agree).
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    port = sys.argv[1]
    pid = int(sys.argv[2])
    cache_dir = sys.argv[3] if len(sys.argv) > 3 else None
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)

    from infercam_onnx_tpu.parallel.multihost import initialize

    initialize(f"127.0.0.1:{port},num_processes=2,process_id={pid}")

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 2, f"global device list {devs}"
    assert len(jax.local_devices()) == 1
    mesh = Mesh(np.array(devs), ("data",))

    # 1. collective sanity: global sum across both processes
    sharding = NamedSharding(mesh, P("data"))
    local = np.full((1, 4), float(pid + 1), np.float32)
    garr = jax.make_array_from_process_local_data(sharding, local, (2, 4))
    total = float(jax.jit(
        lambda x: x.sum(),
        out_shardings=NamedSharding(mesh, P()))(garr))
    assert total == 12.0, total

    # 2. the real serving program sharded across processes: one frame
    # per process, detect batch sharded over the process-spanning mesh
    from infercam_onnx_tpu.config import DetectorConfig
    from infercam_onnx_tpu.detector import Detector
    from infercam_onnx_tpu.parallel.data_parallel import ShardedDetector

    det = Detector(
        DetectorConfig(variant="RFB-320", compute_dtype="float32"),
        rng=0)
    shard_det = ShardedDetector(det, mesh)
    rng = np.random.default_rng(0)  # same frames in both processes
    frames = rng.integers(0, 256, size=(2, 48, 64, 3), dtype=np.uint8)
    out = shard_det.run_device(frames, pack_output=True)
    # the result is batch-sharded ACROSS PROCESSES: each host owns its
    # streams' detections (exactly the DCN serving layout). This process
    # must be able to read its own shard directly ...
    local_rows = [np.asarray(s.data) for s in out.addressable_shards]
    assert local_rows and all(r.ndim == 3 for r in local_rows)
    # ... and the checksum compares the GLOBAL result across processes
    from jax.experimental import multihost_utils

    packed = np.asarray(
        multihost_utils.process_allgather(out, tiled=True))
    assert packed.shape[0] == 2
    checksum = float(np.abs(packed).sum())
    print(f"MULTIHOST_OK {checksum:.6f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
