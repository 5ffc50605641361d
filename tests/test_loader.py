"""Prefetching loader tests."""

import os
import tempfile

import numpy as np
import pytest

from fixtures import temp_encoded_video
from pytorchvideo_tpu.data import (
    SequentialSampler,
    labeled_video_dataset,
    make_clip_sampler,
)
from pytorchvideo_tpu.data.loader import BatchLoader, device_prefetch


def test_batch_loader_over_dataset():
    with temp_encoded_video(num_frames=10, fps=5) as (path, data):
        with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
            for i in range(4):
                f.write(f"{path} {i}\n")
            csv = f.name
        try:
            ds = labeled_video_dataset(
                csv,
                make_clip_sampler("uniform", 1.0),
                video_sampler=SequentialSampler,
            )
            loader = BatchLoader(ds, batch_size=4, num_workers=2)
            batches = list(loader)
            # 4 videos x 2 clips = 8 samples -> 2 batches of 4
            assert len(batches) == 2
            assert batches[0]["video"].shape == (4, 5, 32, 32, 3)
            all_labels = sorted(
                int(l) for b in batches for l in np.asarray(b["label"])
            )
            assert all_labels == [0, 0, 1, 1, 2, 2, 3, 3]
        finally:
            os.unlink(csv)


def test_device_prefetch():
    batches = [{"x": np.full((2, 3), i)} for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])
