"""Native (first-party C++/FFmpeg) encoded-video backend.

Binds native/libpvt_decode.so via ctypes: frame-accurate seek + range decode
into preallocated RGB24 numpy buffers (no per-frame Python hops — the whole
clip decode is one native call), mono float32 audio decode (the reference
PyAV backend's semantics, reference data/encoded_video_pyav.py:285-318), and
decode-from-memory (``from_bytes``) for remote/in-memory IO (the reference
reads whole files into BytesIO via iopath, reference
data/encoded_video.py:65-66). This is the production host-decode path of the
framework (SURVEY §2.9 row 1); the OpenCV backend remains the fallback when
the shared library isn't built (``make -C native``).
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
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.pvt_open.restype = ctypes.c_void_p
    lib.pvt_open.argtypes = [ctypes.c_char_p]
    lib.pvt_open_buffer.restype = ctypes.c_void_p
    lib.pvt_open_buffer.argtypes = [u8p, ctypes.c_int64]
    for name in ("pvt_width", "pvt_height", "pvt_has_audio",
                 "pvt_audio_rate", "pvt_audio_channels"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_void_p]
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
        u8p,
    ]
    lib.pvt_decode_audio.restype = ctypes.c_int64
    lib.pvt_decode_audio.argtypes = [
        ctypes.c_void_p,
        ctypes.c_double,
        ctypes.c_double,
        f32p,
        ctypes.c_int64,
    ]
    lib.pvt_mux_av.restype = ctypes.c_int
    lib.pvt_mux_av.argtypes = [
        ctypes.c_char_p,
        u8p,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_double,
        f32p,
        ctypes.c_int64,
        ctypes.c_int,
    ]
    lib.pvt_close.restype = None
    lib.pvt_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return load_native_library() is not None


def mux_av(
    path: str,
    frames: np.ndarray,
    fps: float,
    audio: Optional[np.ndarray] = None,
    audio_rate: int = 0,
) -> None:
    """Write (T, H, W, 3) uint8 RGB frames + optional mono float32 audio into
    a container (FFV1 lossless video + pcm_s16le audio). The writer side of
    the decode service — used by data.utils.export_video_array and the
    synthetic A/V fixtures (the reference writes fixtures with PyAV,
    reference tests/utils.py:60-78)."""
    lib = load_native_library()
    if lib is None:
        raise RuntimeError("native decoder not built (make -C native)")
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    assert frames.ndim == 4 and frames.shape[-1] == 3, frames.shape
    t, h, w, _ = frames.shape
    audio_ptr, n_samples, rate = None, 0, 0
    if audio is not None:
        audio = np.ascontiguousarray(audio, dtype=np.float32).reshape(-1)
        audio_ptr = audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        n_samples = audio.size
        rate = int(audio_rate)
        if rate <= 0:
            raise ValueError("audio_rate must be positive when audio is given")
    rc = lib.pvt_mux_av(
        str(path).encode(),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t,
        h,
        w,
        float(fps),
        audio_ptr,
        n_samples,
        rate,
    )
    if rc != 0:
        raise RuntimeError(f"pvt_mux_av failed for {path}")


class EncodedVideoNative(EncodedVideo):
    """Video interface over the C++ decode service: same get_clip contract as
    the reference backends — {"video": (T, H, W, C) float32, "audio": mono
    float32 samples or None} for [start_sec, end_sec)."""

    def __init__(
        self,
        file_path: Optional[str] = None,
        decode_video: bool = True,
        decode_audio: bool = False,
        video_name: Optional[str] = None,
        _buffer: Optional[bytes] = None,
    ):
        lib = load_native_library()
        if lib is None:
            raise RuntimeError("native decoder not built (make -C native)")
        if not decode_video and not decode_audio:
            raise ValueError(
                "decode_video=False requires decode_audio=True (audio-only "
                "decode, reference encoded_video_decord.py:77-79)"
            )
        self._lib = lib
        self._decode_video = decode_video
        self._decode_audio = decode_audio
        if _buffer is not None:
            self._video_name = video_name or "<memory>"
            buf = np.frombuffer(_buffer, dtype=np.uint8)
            self._handle = lib.pvt_open_buffer(
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size
            )
            if not self._handle:
                raise RuntimeError("Failed to open video from memory buffer")
        else:
            self._video_name = video_name or os.path.basename(file_path)
            self._handle = lib.pvt_open(str(file_path).encode())
            if not self._handle:
                raise RuntimeError(f"Failed to open video {file_path}")
        self._fps = lib.pvt_fps(self._handle)
        self._num_frames = lib.pvt_num_frames(self._handle)
        self._width = lib.pvt_width(self._handle)
        self._height = lib.pvt_height(self._handle)
        self._has_audio = bool(lib.pvt_has_audio(self._handle))
        self._audio_rate = lib.pvt_audio_rate(self._handle)
        if decode_audio and not self._has_audio:
            logger.debug("decode_audio requested but %s has no audio stream",
                         self._video_name)

    @classmethod
    def from_bytes(
        cls,
        data: bytes,
        decode_video: bool = True,
        decode_audio: bool = False,
        video_name: Optional[str] = None,
    ) -> "EncodedVideoNative":
        """Decode from an in-memory container (remote-IO entry point)."""
        return cls(
            None,
            decode_video=decode_video,
            decode_audio=decode_audio,
            video_name=video_name,
            _buffer=bytes(data),
        )

    @property
    def name(self):
        return self._video_name

    @property
    def rate(self) -> float:
        return self._fps

    @property
    def duration(self) -> float:
        return self._num_frames / self._fps

    @property
    def has_audio(self) -> bool:
        return self._has_audio

    @property
    def audio_rate(self) -> int:
        """Native sample rate of the audio stream (0 if none)."""
        return self._audio_rate

    def _get_audio(self, start_sec: float, end_sec: float) -> Optional[np.ndarray]:
        if not (self._decode_audio and self._has_audio and self._audio_rate > 0):
            return None
        end = min(float(end_sec), self.duration + 1.0)
        max_samples = int(math.ceil((end - start_sec) * self._audio_rate)) + (
            self._audio_rate  # one extra second: frame-granular inclusion
        )
        if max_samples <= 0:
            return None
        buf = np.empty(max_samples, np.float32)
        n = self._lib.pvt_decode_audio(
            self._handle,
            float(start_sec),
            float(end_sec),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_samples,
        )
        if n <= 0:
            return None
        return buf[:n].copy()

    def get_clip(self, start_sec: float, end_sec: float) -> Dict[str, Optional[np.ndarray]]:
        if start_sec > end_sec or start_sec > self.duration:
            logger.warning(
                "Invalid clip times %s-%s for duration %s",
                start_sec,
                end_sec,
                self.duration,
            )
            return {"video": None, "audio": None}
        if not self._decode_video:
            # audio-only decode: skip the video stream entirely (reference
            # encoded_video.py:52, encoded_video_decord.py:77-79); duration
            # still comes from the container header above
            return {"video": None, "audio": self._get_audio(start_sec, end_sec)}
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
        audio = self._get_audio(start_sec, end_sec)
        return {"video": out[:written].astype(np.float32), "audio": audio}

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.pvt_close(self._handle)
            self._handle = None
