"""HMDB51 dataset: fold-based split parsing -> LabeledVideoDataset.

Parity: pytorchvideo/data/hmdb51.py (Hmdb51LabeledVideoPaths :21,
Hmdb51 :169). Split files are ``<class>_test_split<id>.txt`` with lines
``<video> <0|1|2>`` (unused/train/test).
"""

from __future__ import annotations

import os
import pathlib
from typing import Any, Callable, List, Optional, Tuple, Type, Union

from pytorchvideo_tpu.data.clip_sampling import ClipSampler
from pytorchvideo_tpu.data.labeled_video_dataset import LabeledVideoDataset
from pytorchvideo_tpu.data.samplers import RandomSampler


class Hmdb51LabeledVideoPaths:
    """(video path, {label, meta_tags}) list from HMDB51 fold files."""

    _allowed_splits = [1, 2, 3]
    _split_type_dict = {"train": 1, "test": 2, "unused": 0}

    def __init__(
        self, paths_and_labels: List[Tuple[str, Optional[dict]]], path_prefix=""
    ) -> None:
        self._paths_and_labels = paths_and_labels
        self._path_prefix = path_prefix

    @classmethod
    def from_dir(
        cls, data_path: str, split_id: int = 1, split_type: str = "train"
    ) -> "Hmdb51LabeledVideoPaths":
        data_path = pathlib.Path(data_path)
        assert data_path.is_dir(), f"{data_path} not found or not a directory."
        assert int(split_id) in cls._allowed_splits
        file_name_format = "_test_split" + str(int(split_id))
        file_paths = sorted(
            f
            for f in data_path.iterdir()
            if f.is_file() and f.suffix == ".txt" and file_name_format in f.stem
        )
        return cls.from_csvs(file_paths, split_type)

    @classmethod
    def from_csvs(
        cls,
        file_paths: List[Union[pathlib.Path, str]],
        split_type: str = "train",
    ) -> "Hmdb51LabeledVideoPaths":
        video_paths_and_label: List[Tuple[str, Optional[dict]]] = []
        for file_path in file_paths:
            file_path = pathlib.Path(file_path)
            assert os.path.exists(file_path), f"{file_path} not found."
            assert (
                file_path.suffix == ".txt" and "_test_split" in file_path.stem
            ), f"Invalid file: {file_path}"

            action_name = "_".join(file_path.stem.split("_")[:-2])
            with open(file_path, "r") as f:
                for path_label in f.read().splitlines():
                    line_split = path_label.rsplit(None, 1)
                    if int(line_split[1]) != cls._split_type_dict[split_type]:
                        continue
                    video_path = os.path.join(action_name, line_split[0])
                    meta_tags = line_split[0].split("_")[-6:-1]
                    video_paths_and_label.append(
                        (video_path, {"label": action_name, "meta_tags": meta_tags})
                    )
        assert len(video_paths_and_label) > 0, "Failed to load HMDB51 splits."
        return cls(video_paths_and_label)

    @property
    def path_prefix(self):
        return self._path_prefix

    @path_prefix.setter
    def path_prefix(self, value):
        self._path_prefix = value

    def __getitem__(self, index) -> Tuple[str, dict]:
        path, label = self._paths_and_labels[index]
        return os.path.join(self._path_prefix, path), label

    def __len__(self) -> int:
        return len(self._paths_and_labels)


def Hmdb51(
    data_path: str,
    clip_sampler: ClipSampler,
    video_sampler: Type = RandomSampler,
    transform: Optional[Callable[[dict], Any]] = None,
    video_path_prefix: str = "",
    split_id: int = 1,
    split_type: str = "train",
    decode_audio: bool = False,
    decoder: str = "opencv",
) -> LabeledVideoDataset:
    """HMDB51 dataset factory (reference hmdb51.py:169-231)."""
    labeled_video_paths = Hmdb51LabeledVideoPaths.from_dir(
        data_path, split_id=split_id, split_type=split_type
    )
    labeled_video_paths.path_prefix = video_path_prefix
    return LabeledVideoDataset(
        labeled_video_paths,
        clip_sampler,
        video_sampler,
        transform,
        decode_audio=decode_audio,
        decoder=decoder,
    )
