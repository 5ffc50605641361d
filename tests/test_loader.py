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


def test_batch_loader_parallel_decode_coverage():
    """Parallel plan/load path yields exactly the sequential sample set
    (same clips, same decoded frames), order-independent."""
    with temp_encoded_video(num_frames=20, fps=5) as (path, data):
        with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
            for i in range(3):
                f.write(f"{path} {i}\n")
            csv = f.name
        try:
            def build():
                return labeled_video_dataset(
                    csv,
                    make_clip_sampler("uniform", 1.0),
                    video_sampler=SequentialSampler,
                )

            sequential = [
                (int(s["label"]), int(s["clip_index"]), s["video"].sum())
                for s in build()
            ]
            loader = BatchLoader(
                build(), batch_size=1, num_workers=4, drop_last=False
            )
            parallel = [
                (
                    int(b["label"][0]),
                    int(b["clip_index"][0]),
                    np.asarray(b["video"][0]).sum(),
                )
                for b in loader
            ]
            assert sorted(parallel) == sorted(sequential)
        finally:
            os.unlink(csv)


def test_batch_loader_parallel_aug_grouping():
    """constant_clips_per_video with augs_per_clip>1: one decode produces
    all augmented views with correct aug indices."""
    with temp_encoded_video(num_frames=10, fps=5) as (path, _):
        with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
            f.write(f"{path} 0\n")
            csv = f.name
        try:
            ds = labeled_video_dataset(
                csv,
                make_clip_sampler("constant_clips_per_video", 1.0, 2, 3),
                video_sampler=SequentialSampler,
            )
            loader = BatchLoader(ds, batch_size=1, num_workers=2, drop_last=False)
            seen = sorted(
                (int(b["clip_index"][0]), int(b["aug_index"][0])) for b in loader
            )
            assert seen == [(c, a) for c in range(2) for a in range(3)]
        finally:
            os.unlink(csv)


def test_batch_loader_decodes_concurrently():
    """The lock must not serialize load_clip: with 4 workers and a slow
    decode, executions overlap."""
    import threading
    import time

    class SlowPlanned:
        def __init__(self):
            self.lock = threading.Lock()
            self.concurrent = 0
            self.max_concurrent = 0

        def plan_clips(self):
            for i in range(8):
                yield i

        def load_clip(self, plan):
            with self.lock:
                self.concurrent += 1
                self.max_concurrent = max(self.max_concurrent, self.concurrent)
            time.sleep(0.05)
            with self.lock:
                self.concurrent -= 1
            return [{"x": np.full((2,), plan)}]

    ds = SlowPlanned()
    loader = BatchLoader(ds, batch_size=2, num_workers=4, drop_last=False)
    batches = list(loader)
    assert sum(len(b["x"]) for b in batches) == 8
    assert ds.max_concurrent >= 3, f"decode serialized: {ds.max_concurrent}"


def test_device_prefetch():
    batches = [{"x": np.full((2, 3), i)} for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


def test_device_prefetch_close_stops_worker():
    """The documented abandonment contract (ADVICE r4): gen.close() runs
    the generator's finally, sets the stop flag, and the daemon worker
    exits instead of busy-polling forever holding device batches."""
    import threading
    import time

    def source():
        i = 0
        while True:  # endless producer: only close() can end the worker
            yield {"x": np.full((2, 3), i)}
            i += 1

    gen = device_prefetch(source(), size=2)
    first = next(gen)
    np.testing.assert_array_equal(np.asarray(first["x"]), 0)
    assert any(
        t.name == "device_prefetch" and t.is_alive()
        for t in threading.enumerate()
    )
    gen.close()
    deadline = time.time() + 5.0
    while time.time() < deadline:
        if not any(
            t.name == "device_prefetch" and t.is_alive()
            for t in threading.enumerate()
        ):
            break
        time.sleep(0.05)
    assert not any(
        t.name == "device_prefetch" and t.is_alive()
        for t in threading.enumerate()
    ), "worker thread still alive 5s after close()"
