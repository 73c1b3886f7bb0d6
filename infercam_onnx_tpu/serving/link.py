"""Host->device link probing + adaptive transfer-path selection.

The transfer-heaviest serving path (the splice transcode: coefficients
decode mode + device annotate) ships full-resolution coefficient planes
up for every frame. On a healthy link it is the fastest AND the only
bit-exact-outside-overlay path; on a degraded link (observed on this
rig's TPU tunnel: ~45 MB/s vs ~1.5 GB/s healthy) it collapses below
the host-annotate fallback (docs/PERFORMANCE.md "splice caveat": 1.3
vs 8.1 fps observed).

bench.py has always probed the link and re-planned its sampling around
this; this module gives the *server* the same sense: probe H2D at
startup (and optionally on a timer), and when the link is degraded
re-route the coefficients decode mode onto the packed-YCbCr path
(~half the upload bytes, scaled-decode capable — the measured-best
degraded-link path, BENCH_r03: annotated-device-ycbcr 97.3 fps vs
host 58.4 on a 47 MB/s link). The configured mode is re-evaluated on
every probe, so a recovered link gets its splice path back.

The reference has no equivalent (its single fixed path is
reference infer_server/src/inferer.rs:23); this is a TPU-first
capability driven by the tunnel/ICI cost model, disable with
``--link-adaptive off``.
"""

from __future__ import annotations

import logging
import time

log = logging.getLogger("infercam.link")


def probe_h2d_mbps(size_mb: float = 4.0, trials: int = 3) -> float:
    """Measured host->device bandwidth in MB/s (best of ``trials``).

    Same probe bench.py keys its sampling plan on: a synchronous
    ``device_put`` of a few MB, best-of-N so a one-off tunnel hiccup
    doesn't misclassify the link. Costs <1 s on any link state.
    """
    import jax
    import numpy as np

    probe = np.zeros((int(size_mb * 1024 * 1024),), np.uint8)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(probe))
        best = min(best, time.perf_counter() - t0)
    return size_mb / best


def decide_decode_mode(configured_mode: str, h2d_mbps: float,
                       healthy_mbps: float) -> tuple[str, str]:
    """Effective decode mode for a measured link; returns (mode, why).

    Only the coefficients mode is re-routed: its uploads are full-res
    12-bit coefficient planes that cannot ride the scaled decode, and
    its annotate tail (the splice transcode) is the documented
    degraded-link collapse. "pixels" (the reference-parity default)
    and "ycbcr" are left exactly as configured.
    """
    if configured_mode != "coefficients":
        return configured_mode, "configured path kept"
    if h2d_mbps >= healthy_mbps:
        return configured_mode, (
            f"link healthy ({h2d_mbps:.0f} >= {healthy_mbps:.0f} MB/s)")
    return "ycbcr", (
        f"H2D degraded ({h2d_mbps:.0f} < {healthy_mbps:.0f} MB/s): "
        "full-res coefficient uploads would collapse; re-routed to "
        "packed-YCbCr transfers until a probe sees recovery")
