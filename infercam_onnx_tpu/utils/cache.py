"""Compiled-program and artifact caching.

The reference caches downloaded model files under the user cache dir
(reference infer_server/src/nn.rs:149-162). The TPU analog adds a
persistent XLA compilation cache so server restarts skip the expensive
device compiles (SURVEY.md section 5 'checkpoint/resume': cached converted
weights + compiled-executable cache).
"""

from __future__ import annotations

import os


def cache_dir(*parts: str) -> str:
    base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    d = os.path.join(base, "infercam_onnx_tpu", *parts)
    os.makedirs(d, exist_ok=True)
    return d


def enable_compilation_cache() -> None:
    """Point JAX's persistent compilation cache at our cache dir."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      cache_dir("xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
