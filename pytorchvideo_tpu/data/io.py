"""Pluggable path IO (the reference's iopath ``g_pathmgr`` role).

The reference reads every video file through ``g_pathmgr.open`` into BytesIO
so remote URIs work in all backends (reference data/encoded_video.py:65-66).
Here the equivalent is a small scheme->opener registry: local paths pass
straight to the decoders (which mmap/stream them natively); any registered
scheme (``s3://``, ``gs://``, ...) is fetched to bytes and decoded from
memory via the native buffer entry point.

Usage::

    from pytorchvideo_tpu.data.io import register_path_opener
    register_path_opener("s3", lambda path: my_s3_client.get_bytes(path))
    EncodedVideo.from_path("s3://bucket/video.mp4", decoder="native")
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

# scheme (without "://") -> fn(full_path) -> bytes
_PATH_OPENERS: Dict[str, Callable[[str], bytes]] = {}


def register_path_opener(scheme: str, opener: Callable[[str], bytes]) -> None:
    """Register a byte-fetcher for a URI scheme (e.g. "s3", "gs", "http")."""
    _PATH_OPENERS[scheme.rstrip(":/")] = opener


def path_scheme(path: str) -> Optional[str]:
    """URI scheme of ``path``, or None for plain/local paths."""
    path = str(path)
    idx = path.find("://")
    if idx <= 0:
        return None
    return path[:idx]


def is_local_path(path: str) -> bool:
    scheme = path_scheme(path)
    return scheme is None or scheme == "file"


def local_path(path: str) -> str:
    """Strip a file:// prefix if present."""
    path = str(path)
    return path[len("file://"):] if path.startswith("file://") else path


def read_bytes(path: str) -> bytes:
    """Whole-file read: local filesystem directly, remote via the registered
    opener for the path's scheme."""
    scheme = path_scheme(path)
    if scheme is None or scheme == "file":
        with open(local_path(path), "rb") as f:
            return f.read()
    opener = _PATH_OPENERS.get(scheme)
    if opener is None:
        raise ValueError(
            f"no path opener registered for scheme {scheme!r} "
            f"(register_path_opener({scheme!r}, fn))"
        )
    return opener(str(path))


def exists(path: str) -> bool:
    """Local existence check; remote paths are assumed to exist (the opener
    will raise on fetch if not)."""
    if is_local_path(path):
        return os.path.exists(local_path(path))
    return True
