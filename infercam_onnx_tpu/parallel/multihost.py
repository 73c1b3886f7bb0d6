"""Multi-host serving setup (DCN tier).

The reference's only cross-machine fabric is its TCP edge protocol
(SURVEY.md section 5 'distributed communication'). For the serving tier
itself, scale-out follows the standard JAX recipe: intra-pod chips
communicate over ICI via the collectives XLA inserts (see
parallel/tiling.py); across hosts, `jax.distributed` wires processes over
DCN and `jax.devices()` becomes the global device list, so the same
1-D data mesh in parallel/mesh.py spans hosts with no code changes —
shardings should keep per-image work on one host's chips (the batch axis
maps streams to chips, so only the host-side frame scatter crosses DCN).

Run one server process per host::

    python -m infercam_onnx_tpu.serve \
        --distributed coordinator_host:1234,num_processes=4,process_id=0

Data layout across hosts: the batch axis shards over the global mesh, so
each host feeds the frames of ITS streams (its addressable shard of the
global input) and reads back its own detections via
``out.addressable_shards`` — only the jit-internal collectives (none in
per-image detection) would cross DCN. The executed 2-process dryrun for
this path lives in tests/multihost_worker.py (spawned by
tests/test_parallel.py::test_multihost_two_process_dryrun; CPU backend,
Gloo standing in for DCN).

SERVING on a process-spanning mesh additionally requires lockstep
program dispatch — see parallel/lockstep.py and the serve CLI's
``--lockstep-address`` (two-process deployment test:
tests/test_lockstep.py).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class DistributedSpec:
    coordinator: str
    num_processes: int
    process_id: int


def parse_distributed_spec(spec: str) -> DistributedSpec:
    """Parse ``host:port,num_processes=N,process_id=I``."""
    parts = [p.strip() for p in spec.split(",") if p.strip()]
    if not parts:
        raise ValueError("empty --distributed spec")
    coordinator = parts[0]
    if ":" not in coordinator:
        raise ValueError(
            f"coordinator must be host:port, got {coordinator!r}")
    kv = {}
    for p in parts[1:]:
        if "=" not in p:
            raise ValueError(f"expected key=value, got {p!r}")
        k, v = p.split("=", 1)
        kv[k.strip()] = v.strip()
    try:
        return DistributedSpec(
            coordinator=coordinator,
            num_processes=int(kv["num_processes"]),
            process_id=int(kv["process_id"]))
    except KeyError as e:
        raise ValueError(f"missing {e.args[0]} in --distributed spec")


def initialize(spec: str | DistributedSpec) -> None:
    """Join the multi-host JAX runtime (call before any device use)."""
    if isinstance(spec, str):
        spec = parse_distributed_spec(spec)
    import jax

    jax.distributed.initialize(
        coordinator_address=spec.coordinator,
        num_processes=spec.num_processes,
        process_id=spec.process_id)
