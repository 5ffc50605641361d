"""Data layer tests: decode exactness, clip coverage, dataset iteration.

Modeled on the reference's test strategy (tests/test_data_labeled_video_dataset.py):
lossless synthetic fixtures let us assert exact frame coverage.
"""

import os
import tempfile

import numpy as np
import pytest

from fixtures import create_dummy_video_frames, temp_encoded_video, temp_frame_video
from pytorchvideo_tpu.data import (
    EncodedVideo,
    FrameVideo,
    LabeledVideoDataset,
    LabeledVideoPaths,
    SequentialSampler,
    UniformClipSampler,
    labeled_video_dataset,
    make_clip_sampler,
)
from pytorchvideo_tpu.data.samplers import DistributedSampler


def test_encoded_video_exact_decode():
    with temp_encoded_video(num_frames=10, fps=5) as (path, data):
        video = EncodedVideo.from_path(path)
        assert video.duration == pytest.approx(2.0)
        clip = video.get_clip(0, 2.0)
        np.testing.assert_array_equal(clip["video"], data)
        # second half only
        clip2 = video.get_clip(1.0, 2.0)
        np.testing.assert_array_equal(clip2["video"], data[5:])
        video.close()


def test_encoded_video_out_of_range():
    with temp_encoded_video(num_frames=10, fps=5) as (path, data):
        video = EncodedVideo.from_path(path)
        assert video.get_clip(3.0, 4.0)["video"] is None
        video.close()


def test_frame_video_exact():
    names = [f"{i:06d}.png" for i in range(12)]
    with temp_frame_video(names) as (dirname, data):
        fv = FrameVideo.from_directory(dirname, fps=6)
        assert fv.duration == pytest.approx(2.0)
        clip = fv.get_clip(0, 1.0)
        np.testing.assert_array_equal(clip["video"], data[:6])
        assert clip["frame_indices"] == list(range(6))
        # frame_filter subsampling before load
        clip_f = fv.get_clip(0, 2.0, frame_filter=lambda idx: idx[::2])
        np.testing.assert_array_equal(clip_f["video"], data[::2])


def test_labeled_video_dataset_covers_all_clips():
    with temp_encoded_video(num_frames=10, fps=5) as (path1, data1):
        with temp_encoded_video(num_frames=10, fps=5) as (path2, data2):
            with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
                f.write(f"{path1} 0\n{path2} 1\n")
                csv_path = f.name
            try:
                dataset = labeled_video_dataset(
                    csv_path,
                    make_clip_sampler("uniform", 1.0),
                    video_sampler=SequentialSampler,
                )
                assert dataset.num_videos == 2
                samples = list(iter_n(dataset, 4))
                # 2 videos x 2 clips of 1s each
                assert len(samples) == 4
                labels = [s["label"] for s in samples]
                assert labels == [0, 0, 1, 1]
                np.testing.assert_array_equal(samples[0]["video"], data1[:5])
                np.testing.assert_array_equal(samples[1]["video"], data1[5:])
                np.testing.assert_array_equal(samples[3]["video"], data2[5:])
                for s in samples:
                    assert set(s).issuperset(
                        {"video", "video_name", "video_index", "clip_index", "aug_index", "label"}
                    )
            finally:
                os.unlink(csv_path)


def iter_n(dataset, n):
    it = iter(dataset)
    for _ in range(n):
        yield next(it)


def test_dataset_transform_none_skips():
    with temp_encoded_video(num_frames=10, fps=5) as (path, _):
        with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
            f.write(f"{path} 0\n" * 3)
            csv_path = f.name
        try:
            calls = []

            def veto_first(sample):
                calls.append(1)
                return None if len(calls) == 1 else sample

            dataset = labeled_video_dataset(
                csv_path,
                make_clip_sampler("random", 1.0),
                video_sampler=SequentialSampler,
                transform=veto_first,
            )
            sample = next(iter(dataset))
            assert sample is not None
            assert len(calls) == 2
        finally:
            os.unlink(csv_path)


def test_dataset_from_directory_tree():
    with temp_encoded_video(num_frames=10, fps=5) as (src, _):
        with tempfile.TemporaryDirectory() as root:
            for cls in ["classA", "classB"]:
                os.makedirs(os.path.join(root, cls))
                import shutil

                shutil.copy(src, os.path.join(root, cls, "v.avi"))
            paths = LabeledVideoPaths.from_directory(root)
            assert len(paths) == 2
            assert paths[0][1]["label"] == 0
            assert paths[1][1]["label"] == 1


def test_multi_clip_sampler_dataset():
    with temp_encoded_video(num_frames=10, fps=5) as (path, data):
        with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
            f.write(f"{path} 7\n")
            csv_path = f.name
        try:
            dataset = labeled_video_dataset(
                csv_path,
                make_clip_sampler("random_multi", 1.0, 3),
                video_sampler=SequentialSampler,
            )
            sample = next(iter(dataset))
            assert isinstance(sample["video"], list) and len(sample["video"]) == 3
        finally:
            os.unlink(csv_path)


def test_constant_clips_aug_reuse():
    with temp_encoded_video(num_frames=10, fps=5) as (path, data):
        with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
            f.write(f"{path} 0\n")
            csv_path = f.name
        try:
            dataset = labeled_video_dataset(
                csv_path,
                make_clip_sampler("constant_clips_per_video", 1.0, 2, 2),
                video_sampler=SequentialSampler,
            )
            samples = list(iter_n(dataset, 4))
            # 2 clips x 2 augs; same decoded clip reused across aug indices
            assert [s["aug_index"] for s in samples] == [0, 1, 0, 1]
            assert [s["clip_index"] for s in samples] == [0, 0, 1, 1]
            np.testing.assert_array_equal(samples[0]["video"], samples[1]["video"])
        finally:
            os.unlink(csv_path)


def test_distributed_sampler_split():
    data = list(range(10))
    seen = []
    for rank in range(3):
        s = DistributedSampler(data, num_replicas=3, rank=rank, shuffle=False)
        idx = list(s)
        assert len(idx) == 4  # ceil(10/3) with padding
        seen.extend(idx)
    assert set(seen) == set(range(10))


def test_multiprocess_sampler_with_torch_workers():
    torch = pytest.importorskip("torch")
    import torch.utils.data as tud

    with temp_encoded_video(num_frames=10, fps=5) as (path, data):
        with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
            for _ in range(4):
                f.write(f"{path} 0\n")
            csv_path = f.name
        try:
            dataset = labeled_video_dataset(
                csv_path,
                make_clip_sampler("uniform", 1.0),
                video_sampler=SequentialSampler,
            )

            class _Wrap(tud.IterableDataset):
                def __iter__(self):
                    return iter(dataset)

            loader = tud.DataLoader(
                _Wrap(),
                num_workers=2,
                batch_size=None,
                collate_fn=lambda x: x,
            )
            samples = list(loader)
            # 4 videos x 2 clips each, split across 2 workers
            assert len(samples) == 8
            assert sorted(s["video_index"] for s in samples) == [
                0, 0, 1, 1, 2, 2, 3, 3,
            ]
        finally:
            os.unlink(csv_path)
