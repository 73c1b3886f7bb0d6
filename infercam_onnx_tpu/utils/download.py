"""Whole-body HTTP download to file (reference infer_server/src/utils.rs:9-21).

Uses stdlib urllib; in offline environments every call raises and callers
fall back (e.g. models/convert.py returns random-weight mode).
"""

from __future__ import annotations

import os
import urllib.request


def download_file(url: str, path: str, *, timeout: float = 60.0) -> None:
    """Buffered GET -> file write, via a temp file for atomicity."""
    tmp = path + ".part"
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        with open(tmp, "wb") as f:
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
    os.replace(tmp, path)
