"""Video abstraction + path dispatch.

Parity: pytorchvideo/data/video.py (Video ABC :53, VideoPathHandler :21-50).
Our clip layout is native (T, H, W, C) float32 [0-255] numpy (the reference
returns CTHW torch tensors; use data.utils.thwc_to_cthw for interop).
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod
from fractions import Fraction
from typing import Any, BinaryIO, Dict, Optional, Union


class Video(ABC):
    """Decoded-video interface: duration + random clip access."""

    @property
    @abstractmethod
    def duration(self) -> float:
        """Video duration in seconds."""

    @property
    def name(self) -> Optional[str]:
        return getattr(self, "_video_name", None)

    @abstractmethod
    def get_clip(
        self, start_sec: float, end_sec: float
    ) -> Dict[str, Optional[Any]]:
        """Return {"video": (T, H, W, C) float32 [0-255] numpy or None,
        "audio": 1D float samples or None} for [start_sec, end_sec)."""

    def close(self) -> None:
        """Release decoder resources."""

    @classmethod
    def from_path(cls, file_path: str, **kwargs) -> "Video":
        raise NotImplementedError


class VideoPathHandler:
    """Dispatch a path to EncodedVideo (file) or FrameVideo (directory),
    caching frame-dir listings (reference data/video.py:21-50)."""

    def __init__(self) -> None:
        self.path_order_cache: Dict[str, list] = {}

    def video_from_path(
        self,
        filepath: str,
        decode_video: bool = True,
        decode_audio: bool = False,
        decoder: str = "opencv",
        fps: float = 30.0,
    ) -> Video:
        if os.path.isdir(filepath):
            from pytorchvideo_tpu.data.frame_video import FrameVideo

            assert not decode_audio, "decode_audio must be False for frame videos"
            return FrameVideo.from_directory(
                filepath, fps, path_order_cache=self.path_order_cache
            )
        from pytorchvideo_tpu.data.encoded_video import EncodedVideo

        return EncodedVideo.from_path(
            filepath,
            decode_video=decode_video,
            decode_audio=decode_audio,
            decoder=decoder,
        )
