"""Encoded-video decoding.

The reference delegates to PyAV / torchvision video_reader / decord
(pytorchvideo/data/encoded_video.py:17-76 and backend files). None of those
are in this image; the native decode path here is OpenCV's VideoCapture
(FFmpeg C++ under the hood — same libav machinery PyAV wraps). A PyAV
backend slot is kept for environments that have it.
"""

from __future__ import annotations

import logging
import math
import os
from typing import Any, Dict, Optional

import numpy as np

from pytorchvideo_tpu.data.video import Video

logger = logging.getLogger(__name__)


class DecoderType:
    NATIVE = "native"
    OPENCV = "opencv"
    PYAV = "pyav"
    TORCHVISION = "torchvision"
    DECORD = "decord"


def select_video_class(decoder: str):
    """Reference encoded_video.py:17-39 analogue. ``native`` is the
    first-party C++/FFmpeg service (data/encoded_video_native.py); opencv is
    the always-available fallback."""
    if decoder == DecoderType.NATIVE:
        from pytorchvideo_tpu.data.encoded_video_native import (
            EncodedVideoNative,
            native_available,
        )

        if native_available():
            return EncodedVideoNative
        logger.warning("native decoder unavailable; falling back to OpenCV")
        return EncodedVideoOpenCV
    if decoder in (DecoderType.OPENCV, DecoderType.TORCHVISION, DecoderType.DECORD):
        # torchvision/decord requests fall through to the one native backend.
        return EncodedVideoOpenCV
    if decoder == DecoderType.PYAV:
        try:
            import av  # noqa: F401

            raise NotImplementedError(
                "PyAV backend not wired in this build; use decoder='opencv'"
            )
        except ImportError:
            logger.warning("PyAV unavailable; falling back to OpenCV decoder")
            return EncodedVideoOpenCV
    raise NotImplementedError(f"Unknown decoder type {decoder}")


class EncodedVideo(Video):
    """Factory entry (reference encoded_video.py:48-76). Local paths go
    straight to the backend; remote URIs are fetched to bytes through the
    pluggable opener registry (data/io.py — the reference's g_pathmgr role,
    reference encoded_video.py:65-66) and decoded from memory."""

    @classmethod
    def from_path(
        cls,
        file_path: str,
        decode_video: bool = True,
        decode_audio: bool = False,
        decoder: str = "opencv",
        **other_args,
    ) -> "Video":
        from pytorchvideo_tpu.data import io as pvt_io

        if not pvt_io.is_local_path(file_path):
            return cls.from_bytes(
                pvt_io.read_bytes(file_path),
                decode_video=decode_video,
                decode_audio=decode_audio,
                decoder=decoder,
                video_name=os.path.basename(str(file_path)),
                **other_args,
            )
        video_cls = select_video_class(decoder)
        return video_cls(
            pvt_io.local_path(file_path),
            decode_video=decode_video,
            decode_audio=decode_audio,
            **other_args,
        )

    @classmethod
    def from_bytes(
        cls,
        data: bytes,
        decode_video: bool = True,
        decode_audio: bool = False,
        decoder: str = "opencv",
        **other_args,
    ) -> "Video":
        """Decode an in-memory container. The native backend decodes directly
        from the buffer (pvt_open_buffer); the OpenCV backend uses a
        temp-file shim (cv2.VideoCapture has no memory input)."""
        video_cls = select_video_class(decoder)
        # Only backends that *override* from_bytes decode from memory
        # directly (checking hasattr would find this inherited factory).
        if video_cls.from_bytes.__func__ is not EncodedVideo.from_bytes.__func__:
            return video_cls.from_bytes(
                data,
                decode_video=decode_video,
                decode_audio=decode_audio,
                **other_args,
            )
        tmp = _TempFileFromBytes(data)
        video = video_cls(
            tmp.path,
            decode_video=decode_video,
            decode_audio=decode_audio,
            **other_args,
        )
        video._tempfile_ref = tmp  # keep the backing file alive
        return video


class _TempFileFromBytes:
    """Spill bytes to a temp file whose lifetime tracks this object; the
    OpenCV from_bytes shim keeps a reference on the Video instance."""

    def __init__(self, data: bytes):
        import tempfile

        fd, self.path = tempfile.mkstemp(suffix=".video")
        with os.fdopen(fd, "wb") as f:
            f.write(data)

    def __del__(self):
        try:
            os.unlink(self.path)
        except OSError:
            pass


class EncodedVideoOpenCV(EncodedVideo):
    """cv2.VideoCapture-backed decode with frame-accurate seeking.

    Matches reference backend behavior (encoded_video_pyav.py:19-364):
    duration from container metadata, ``get_clip(start, end)`` returns frames
    with pts in [start, end) as (T, H, W, C) float32 [0-255] RGB. Audio
    decoding is unsupported by OpenCV; ``audio`` is always None (a warning is
    emitted if requested).
    """

    def __init__(
        self,
        file_path: str,
        decode_video: bool = True,
        decode_audio: bool = False,
        video_name: Optional[str] = None,
    ):
        import cv2

        if not decode_video:
            raise NotImplementedError("decode_video=False unsupported")
        if decode_audio:
            logger.warning(
                "OpenCV backend cannot decode audio; returning audio=None"
            )
        self._decode_audio = decode_audio
        self._video_name = video_name or os.path.basename(file_path)
        self._path = str(file_path)
        self._cap = cv2.VideoCapture(self._path)
        if not self._cap.isOpened():
            raise RuntimeError(f"Failed to open video {file_path}")
        self._fps = float(self._cap.get(cv2.CAP_PROP_FPS)) or 30.0
        self._num_frames = int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self._next_frame_idx = 0

    @property
    def name(self) -> Optional[str]:
        return self._video_name

    @property
    def rate(self) -> float:
        return self._fps

    @property
    def duration(self) -> float:
        return self._num_frames / self._fps

    def _seek_to(self, frame_idx: int):
        import cv2

        if frame_idx != self._next_frame_idx:
            self._cap.set(cv2.CAP_PROP_POS_FRAMES, frame_idx)
            self._next_frame_idx = frame_idx

    def get_clip(
        self, start_sec: float, end_sec: float
    ) -> Dict[str, Optional[np.ndarray]]:
        import cv2

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

        self._seek_to(start_idx)
        frames = []
        for _ in range(start_idx, end_idx):
            ok, frame = self._cap.read()
            if not ok:
                break
            self._next_frame_idx += 1
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        if not frames:
            logger.debug("No frames decoded for %s-%s", start_sec, end_sec)
            return {"video": None, "audio": None}
        video = np.stack(frames).astype(np.float32)
        return {"video": video, "audio": None}

    def close(self):
        if self._cap is not None:
            self._cap.release()
            self._cap = None
