"""Ego4d dataset utilities.

Parity: pytorchvideo/data/ego4d/utils.py — window constraining
(check_window_len), MomentsClipSampler (fixed window around an annotation),
label-id-map loader, IMU base interface.
"""

from __future__ import annotations

import json
import logging
from abc import ABC, abstractmethod
from typing import Any, Dict, Optional, Tuple

from pytorchvideo_tpu.data.clip_sampling import ClipInfo, ClipSampler

log = logging.getLogger("Ego4dDatasetUtils")


def check_window_len(
    s_time: float, e_time: float, w_len: float, video_dur: float
) -> Tuple[float, float]:
    """Center/slide the window to exactly w_len within the video bounds."""
    interval = e_time - s_time
    if abs(interval - w_len) > 0.001:
        delta = w_len - (e_time - s_time)
        s_time -= delta / 2
        e_time += delta / 2
        if s_time < 0:
            e_time += -s_time
            s_time = 0
    if video_dur and e_time > video_dur:
        overlap = e_time - video_dur
        assert s_time >= overlap, "Incompatible w_len / video_dur"
        s_time -= overlap
        e_time -= overlap
    if abs((e_time - s_time) - w_len) > 0.01:
        log.error("check_window_len: invalid time interval: %s, %s", s_time, e_time)
    return s_time, e_time


class MomentsClipSampler(ClipSampler):
    """Fixed window_sec window around the annotated moment; records
    clip_start/clip_end into the annotation for downstream lookups."""

    def __init__(self, window_sec: float = 0) -> None:
        self.window_sec = window_sec

    def __call__(
        self,
        last_clip_end_time: Optional[float],
        video_duration: float,
        annotation: Dict[str, Any],
    ) -> ClipInfo:
        assert (
            last_clip_end_time is None or last_clip_end_time <= video_duration
        )
        start = annotation["label_video_start_sec"]
        end = annotation["label_video_end_sec"]
        if video_duration is not None and end > video_duration + 0.1:
            raise Exception(
                f"Invalid video_duration/end_sec: {video_duration} / {end}"
            )
        assert end >= start
        if self.window_sec > 0:
            start, end = check_window_len(
                start, end, self.window_sec, video_duration
            )
        annotation["clip_start"] = start
        annotation["clip_end"] = end
        return ClipInfo(start, end, 0, 0, True)

    def reset(self) -> None:
        pass


def get_label_id_map(label_id_map_path: str) -> Dict[str, int]:
    try:
        with open(label_id_map_path, "r") as f:
            return json.load(f)
    except Exception as e:
        raise FileNotFoundError(
            f"{label_id_map_path} must be a valid label id map json: {e}"
        )


class Ego4dImuDataBase(ABC):
    """IMU provider interface."""

    def __init__(self, basepath: str):
        self.basepath = basepath

    @abstractmethod
    def has_imu(self, video_uid: str) -> bool:
        ...

    @abstractmethod
    def get_imu_sample(
        self, video_uid: str, video_start: float, video_end: float
    ) -> Dict[str, Any]:
        ...
