"""Device mesh helpers."""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None,
              axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all).

    Serving is data-parallel: the stream/batch dimension shards over this
    axis and rides ICI; the ~1 MB model replicates onto every chip.
    """
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))
