"""EpicKitchen action-recognition task dataset.

Parity: pytorchvideo/data/epic_kitchen_recognition.py:20-224 — clips tiled
uniformly with a random per-video offset; the transform prunes actions to
those overlapping the clip.
"""

from __future__ import annotations

from enum import Enum
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from pytorchvideo_tpu.data.dataset_manifest_utils import (
    VideoClipInfo,
    VideoDatasetType,
)
from pytorchvideo_tpu.data.epic_kitchen import ActionData, EpicKitchenDataset
from pytorchvideo_tpu.data.video import Video


class ClipSampling(Enum):
    RandomOffsetUniform = 1


class EpicKitchenRecognition(EpicKitchenDataset):
    def __init__(
        self,
        video_info_file_path: str,
        actions_file_path: str,
        video_data_manifest_file_path: str,
        clip_sampling: ClipSampling = ClipSampling.RandomOffsetUniform,
        dataset_type: VideoDatasetType = VideoDatasetType.Frame,
        seconds_per_clip: float = 2.0,
        frames_per_clip: Optional[int] = None,
        transform: Optional[Callable[[Dict[str, Any]], Any]] = None,
        multithreaded_io: bool = True,
        rng: Optional[np.random.Generator] = None,
    ):
        define_clip_structure_fn = self._define_clip_structure_generator(
            seconds_per_clip, clip_sampling, rng
        )
        transform = self._transform_generator(transform)
        frame_filter = (
            self._frame_filter_generator(frames_per_clip)
            if frames_per_clip is not None
            else None
        )
        super().__init__(
            video_info_file_path=video_info_file_path,
            actions_file_path=actions_file_path,
            dataset_type=dataset_type,
            video_data_manifest_file_path=video_data_manifest_file_path,
            transform=transform,
            frame_filter=frame_filter,
            clip_sampler=define_clip_structure_fn,
            multithreaded_io=multithreaded_io,
        )

    @staticmethod
    def _transform_generator(
        transform: Optional[Callable[[Dict[str, Any]], Dict[str, Any]]],
    ) -> Callable[[Dict[str, Any]], Dict[str, Any]]:
        """Keep only actions overlapping the clip window
        (reference :119-149)."""

        def transform_clip(clip: Dict[str, Any]) -> Dict[str, Any]:
            clip["actions"] = [
                a
                for a in clip["actions"]
                if a.start_time <= clip["stop_time"]
                and a.stop_time >= clip["start_time"]
            ]
            for key in clip:
                if clip[key] is None:
                    clip[key] = np.array([])
            if transform:
                clip = transform(clip)
            return clip

        return transform_clip

    @staticmethod
    def _frame_filter_generator(
        frames_per_clip: int,
    ) -> Callable[[List[int]], List[int]]:
        """Stride-based subsampling (reference :152-168)."""

        def frame_filter(frame_indices: List[int]) -> List[int]:
            num_frames = len(frame_indices)
            frame_step = int(num_frames // frames_per_clip)
            selected = set(range(0, num_frames, frame_step))
            return [x for i, x in enumerate(frame_indices) if i in selected]

        return frame_filter

    @staticmethod
    def _define_clip_structure_generator(
        seconds_per_clip: float,
        clip_sampling: ClipSampling,
        rng: Optional[np.random.Generator] = None,
    ):
        """Uniform tiling from a random offset (reference :171-224)."""
        if clip_sampling != ClipSampling.RandomOffsetUniform:
            raise NotImplementedError(f"{clip_sampling} not implemented.")
        rng = rng or np.random.default_rng()

        def define_clip_structure(
            videos: Dict[str, Video], actions: Dict[str, List[ActionData]]
        ) -> List[VideoClipInfo]:
            clips = []
            for video_id, video in videos.items():
                offset = float(rng.random()) * seconds_per_clip
                num_clips = int((video.duration - offset) // seconds_per_clip)
                for i in range(num_clips):
                    start = i * seconds_per_clip + offset
                    clips.append(
                        VideoClipInfo(video_id, start, start + seconds_per_clip)
                    )
            return clips

        return define_clip_structure
