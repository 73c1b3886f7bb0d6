"""Converted-parameter checkpoints (.npz).

The reference's only persistent state is the downloaded ONNX file cache
(reference infer_server/src/nn.rs:149-162). The TPU analog (SURVEY.md
section 5 'checkpoint/resume') is two-level: converted weights persist as
a flat .npz keyed by pytree path, so server restarts skip the ONNX
protobuf parse + BN folding; compiled executables persist via the XLA
compilation cache (utils/cache.py).
"""

from __future__ import annotations

from typing import Any

import numpy as np

_SEP = "::"


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}{_SEP}"))
    else:
        out[prefix.rstrip(":")] = np.asarray(tree)
    return out


def _insert(root: dict, path: list[str], value: np.ndarray) -> None:
    node = root
    for part, nxt in zip(path[:-1], path[1:]):
        key: Any = int(part) if part.isdigit() else part
        default: Any = [] if nxt.isdigit() else {}
        if isinstance(node, list):
            while len(node) <= key:
                node.append(None)
            if node[key] is None:
                node[key] = default
            node = node[key]
        else:
            node = node.setdefault(key, default)
    leaf = path[-1]
    key = int(leaf) if leaf.isdigit() else leaf
    if isinstance(node, list):
        while len(node) <= key:
            node.append(None)
        node[key] = value
    else:
        node[key] = value


def save_params(params: Any, path: str) -> None:
    """Write a parameter pytree as a flat .npz."""
    flat = _flatten(params)
    np.savez_compressed(path, **flat)


def load_params(path: str) -> Any:
    """Read a .npz back into the nested dict/list pytree (jnp leaves)."""
    import jax.numpy as jnp

    with np.load(path) as z:
        root: dict = {}
        for key in z.files:
            _insert(root, key.split(_SEP), z[key])
    import jax

    return jax.tree.map(jnp.asarray, root)
