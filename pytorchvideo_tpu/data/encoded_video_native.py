"""Native (first-party C++/FFmpeg) encoded-video backend.

Binds native/libpvt_decode.so via ctypes: frame-accurate seek + range decode
into preallocated RGB24 numpy buffers (no per-frame Python hops — the whole
clip decode is one native call). This is the production host-decode path of
the framework (SURVEY §2.9 row 1); the OpenCV backend remains the fallback
when the shared library isn't built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import logging
import math
import os
from typing import Dict, Optional

import numpy as np

from pytorchvideo_tpu.data.encoded_video import EncodedVideo

logger = logging.getLogger(__name__)

_LIB = None
_LIB_TRIED = False


def _find_library() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.environ.get("PVT_DECODE_LIB", ""),
        os.path.join(here, "native", "libpvt_decode.so"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def load_native_library():
    """Load (once) the native decode library; None if unavailable."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _find_library()
    if path is None:
        logger.info("libpvt_decode.so not found; native decoder disabled")
        return None
    lib = ctypes.CDLL(path)
    lib.pvt_open.restype = ctypes.c_void_p
    lib.pvt_open.argtypes = [ctypes.c_char_p]
    lib.pvt_width.restype = ctypes.c_int
    lib.pvt_width.argtypes = [ctypes.c_void_p]
    lib.pvt_height.restype = ctypes.c_int
    lib.pvt_height.argtypes = [ctypes.c_void_p]
    lib.pvt_fps.restype = ctypes.c_double
    lib.pvt_fps.argtypes = [ctypes.c_void_p]
    lib.pvt_num_frames.restype = ctypes.c_int64
    lib.pvt_num_frames.argtypes = [ctypes.c_void_p]
    lib.pvt_duration.restype = ctypes.c_double
    lib.pvt_duration.argtypes = [ctypes.c_void_p]
    lib.pvt_decode_range.restype = ctypes.c_int64
    lib.pvt_decode_range.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.pvt_close.restype = None
    lib.pvt_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return load_native_library() is not None


class EncodedVideoNative(EncodedVideo):
    """Video interface over the C++ decode service (same get_clip semantics
    as EncodedVideoOpenCV; audio unsupported)."""

    def __init__(
        self,
        file_path: str,
        decode_video: bool = True,
        decode_audio: bool = False,
        video_name: Optional[str] = None,
    ):
        lib = load_native_library()
        if lib is None:
            raise RuntimeError("native decoder not built (make -C native)")
        if not decode_video:
            raise NotImplementedError("decode_video=False unsupported")
        if decode_audio:
            logger.warning("native backend does not decode audio")
        self._lib = lib
        self._video_name = video_name or os.path.basename(file_path)
        self._handle = lib.pvt_open(str(file_path).encode())
        if not self._handle:
            raise RuntimeError(f"Failed to open video {file_path}")
        self._fps = lib.pvt_fps(self._handle)
        self._num_frames = lib.pvt_num_frames(self._handle)
        self._width = lib.pvt_width(self._handle)
        self._height = lib.pvt_height(self._handle)

    @property
    def name(self):
        return self._video_name

    @property
    def rate(self) -> float:
        return self._fps

    @property
    def duration(self) -> float:
        return self._num_frames / self._fps

    def get_clip(self, start_sec: float, end_sec: float) -> Dict[str, Optional[np.ndarray]]:
        if start_sec > end_sec or start_sec > self.duration:
            logger.warning(
                "Invalid clip times %s-%s for duration %s",
                start_sec,
                end_sec,
                self.duration,
            )
            return {"video": None, "audio": None}
        start_idx = max(int(math.ceil(self._fps * start_sec - 1e-9)), 0)
        if end_sec == math.inf:
            end_idx = self._num_frames
        else:
            end_idx = min(
                int(math.ceil(self._fps * end_sec - 1e-9)), self._num_frames
            )
        if end_idx <= start_idx:
            end_idx = min(start_idx + 1, self._num_frames)
        n = end_idx - start_idx
        if n <= 0:
            return {"video": None, "audio": None}
        out = np.empty((n, self._height, self._width, 3), np.uint8)
        written = self._lib.pvt_decode_range(
            self._handle,
            start_idx,
            end_idx,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if written <= 0:
            return {"video": None, "audio": None}
        return {"video": out[:written].astype(np.float32), "audio": None}

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.pvt_close(self._handle)
            self._handle = None
