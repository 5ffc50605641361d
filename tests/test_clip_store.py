"""Packed preprocessed clip store (data/clip_store.py): prep -> mmap -> batch.

The store replaces online codec decode for throughput-bound training
(SURVEY §7 hard part #1); these tests pin prep correctness (content equals
the online-decoded clips), shard round-trips, shuffling determinism, and
multi-epoch streaming.
"""

import os

import numpy as np
import pytest

from pytorchvideo_tpu.data import (
    ClipStore,
    SequentialSampler,
    labeled_video_dataset,
    make_clip_sampler,
    prepare_clip_store,
)


@pytest.fixture()
def small_store(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"v{i}.avi")
        # FFV1 lossless so stored clips can be compared exactly
        wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"FFV1"), 10, (32, 24))
        for f in rng.integers(0, 255, (20, 24, 32, 3), dtype=np.uint8):
            wr.write(f)
        wr.release()
        paths.append(p)
    csv = tmp_path / "d.csv"
    csv.write_text("".join(f"{p} {i}\n" for i, p in enumerate(paths)))

    def transform(sample):
        v = sample["video"]  # (T, H, W, C) float32 0-255
        idx = np.linspace(0, v.shape[0] - 1, 4).round().astype(int)
        sample["video"] = v[idx]
        return sample

    def build():
        return labeled_video_dataset(
            str(csv),
            make_clip_sampler("uniform", 1.0),
            video_sampler=SequentialSampler,
            transform=transform,
        )

    store_dir = str(tmp_path / "store")
    index = prepare_clip_store(
        build(), store_dir, clips_per_shard=2, num_workers=2
    )
    return store_dir, index, build


def test_prepare_and_roundtrip(small_store):
    store_dir, index, build = small_store
    assert index["num_clips"] == 6  # 3 videos x 2 one-second clips
    assert index["clip_shape"] == [4, 24, 32]
    assert index["num_shards"] == 3

    store = ClipStore(store_dir)
    assert len(store) == 6

    # content equals the online-decoded clips (order-insensitive:
    # prep decode is parallel, so shard order may interleave videos)
    online = {}
    for s in iter(build()):
        key = (int(s["video_index"]), tuple(np.asarray(s["video"])[0, 0, 0]))
        online[key] = np.asarray(s["video"]).astype(np.uint8)
    got = store.gather(np.arange(6))
    assert sorted(got["label"].tolist()) == [0, 0, 1, 1, 2, 2]
    matched = 0
    for i in range(6):
        key = (int(got["video_index"][i]), tuple(got["video"][i, 0, 0, 0]))
        if key in online:
            np.testing.assert_array_equal(got["video"][i], online[key])
            matched += 1
    assert matched == 6


def test_batches_shuffle_and_epochs(small_store):
    store_dir, _, _ = small_store
    store = ClipStore(store_dir)

    b1 = list(store.batches(2, shuffle=True, seed=7))
    b2 = list(store.batches(2, shuffle=True, seed=7))
    assert len(b1) == 3
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a["video"], b["video"])

    # multi-epoch streaming reshuffles
    stream = store.batches(2, shuffle=True, seed=7, epochs=2)
    epoch1 = [next(stream) for _ in range(3)]
    epoch2 = [next(stream) for _ in range(3)]
    assert any(
        not np.array_equal(a["label"], b["label"])
        for a, b in zip(epoch1, epoch2)
    )

    # drop_last=False covers the tail
    n = sum(b["video"].shape[0] for b in store.batches(4, drop_last=False))
    assert n == 6

    # batch_size > store with drop_last would yield zero batches per epoch
    # (an infinite empty stream under epochs=None): must raise up front
    with pytest.raises(ValueError, match="no full batch"):
        next(store.batches(64, epochs=None))
    # ...but drop_last=False still serves the short batch
    short = next(store.batches(64, drop_last=False))
    assert short["video"].shape[0] == 6


def test_shape_mismatch_rejected(tmp_path):
    class Bad:
        def __iter__(self):
            yield {"video": np.zeros((4, 8, 8, 3)), "label": 0}
            yield {"video": np.zeros((5, 8, 8, 3)), "label": 0}

    with pytest.raises(ValueError, match="store shape"):
        prepare_clip_store(Bad(), str(tmp_path / "s"), num_workers=1)
