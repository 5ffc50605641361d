"""Manifest builders for EpicKitchen-style directory layouts.

Covers reference data/epic_kitchen/utils.py:10-199: walk a frame or
encoded-video directory tree and produce the ``VideoFrameInfo`` /
``EncodedVideoInfo`` manifests the dataset consumes. Listing is local
filesystem (`os.listdir`; the reference goes through iopath's g_pathmgr
for remote URIs — remote storage is out of scope in this environment).
"""

from __future__ import annotations

import os
from typing import Dict

from pytorchvideo_tpu.data.dataset_manifest_utils import (
    EncodedVideoInfo,
    VideoFrameInfo,
)
from pytorchvideo_tpu.data.utils import optional_threaded_foreach


def _ls(path: str):
    return sorted(os.listdir(str(path)))


def _accumulate_frame(
    video_frames: Dict[str, VideoFrameInfo],
    video_id: str,
    location: str,
    frame_file_name: str,
    frame_file_stem: str,
    frame_number: int,
) -> None:
    """Fold one frame file into the per-video VideoFrameInfo, asserting the
    contiguous-numbering/consistent-format invariants the reference enforces
    (epic_kitchen/utils.py:52-76)."""
    file_extension = frame_file_name.split(".")[-1]
    frame_name = frame_file_name[: -(len(file_extension) + 1)]
    if video_id not in video_frames:
        video_frames[video_id] = VideoFrameInfo(
            video_id=video_id,
            location=location,
            frame_file_stem=frame_file_stem,
            frame_string_length=len(frame_name),
            min_frame_number=frame_number,
            max_frame_number=frame_number,
            file_extension=file_extension,
        )
        return
    info = video_frames[video_id]
    assert info.frame_string_length == len(frame_name)
    assert info.location == location, (
        f"Frames for {video_id} found in two paths: "
        f"{info.location} and {location}"
    )
    assert info.max_frame_number + 1 == frame_number
    assert (
        info.file_extension == file_extension
    ), f"Frames with two different file extensions found for video {video_id}"
    video_frames[video_id] = VideoFrameInfo(
        video_id=info.video_id,
        location=info.location,
        frame_file_stem=info.frame_file_stem,
        frame_string_length=info.frame_string_length,
        min_frame_number=info.min_frame_number,
        max_frame_number=frame_number,
        file_extension=info.file_extension,
    )


def build_frame_manifest_from_flat_directory(
    data_directory_path: str, multithreaded: bool
) -> Dict[str, VideoFrameInfo]:
    """``{video_id}/frame_{number}.{ext}`` layout → manifest
    (reference epic_kitchen/utils.py:10-84)."""
    video_frames: Dict[str, VideoFrameInfo] = {}

    def add_video_frames(video_id: str, video_path: str) -> None:
        for frame in _ls(video_path):
            file_extension = frame.split(".")[-1]
            frame_name = frame[: -(len(file_extension) + 1)]
            stem, path_frame_id = frame_name.split("_")
            _accumulate_frame(
                video_frames,
                video_id,
                video_path,
                frame,
                f"{stem}_",
                int(path_frame_id),
            )

    video_paths = [
        (video_id, f"{data_directory_path}/{video_id}")
        for video_id in _ls(data_directory_path)
    ]
    optional_threaded_foreach(add_video_frames, video_paths, multithreaded)
    return video_frames


def build_frame_manifest_from_nested_directory(
    data_directory_path: str, multithreaded: bool
) -> Dict[str, VideoFrameInfo]:
    """``{participant}/{participant}_{video}_{number}.{ext}`` layout →
    manifest (reference epic_kitchen/utils.py:87-173)."""
    video_frames: Dict[str, VideoFrameInfo] = {}

    def add_participant_video_frames(
        participant_id: str, participant_path: str
    ) -> None:
        for frame_file_name in _ls(participant_path):
            file_extension = frame_file_name.split(".")[-1]
            frame_name = frame_file_name[: -(len(file_extension) + 1)]
            path_participant_id, path_video_id, path_frame_id = frame_name.split(
                "_"
            )
            assert path_participant_id == participant_id
            video_id = f"{path_participant_id}_{path_video_id}"
            _accumulate_frame(
                video_frames,
                video_id,
                participant_path,
                frame_file_name,
                f"{video_id}_",
                int(path_frame_id),
            )

    participant_paths = [
        (participant_id, f"{data_directory_path}/{participant_id}")
        for participant_id in _ls(data_directory_path)
    ]
    optional_threaded_foreach(
        add_participant_video_frames, participant_paths, multithreaded
    )
    return video_frames


def build_encoded_manifest_from_nested_directory(
    data_directory_path: str,
) -> Dict[str, EncodedVideoInfo]:
    """``{participant}/{video_id}.<ext>`` layout → EncodedVideoInfo manifest
    (reference epic_kitchen/utils.py:176-199; video_id = first 6 chars of
    the file name)."""
    encoded_video_infos: Dict[str, EncodedVideoInfo] = {}
    for participant_id in _ls(data_directory_path):
        participant_folder_path = f"{data_directory_path}/{participant_id}"
        for video_file_name in _ls(participant_folder_path):
            video_id = video_file_name[:6]
            video_full_path = f"{participant_folder_path}/{video_file_name}"
            encoded_video_infos[video_id] = EncodedVideoInfo(
                video_id, video_full_path
            )
    return encoded_video_infos
