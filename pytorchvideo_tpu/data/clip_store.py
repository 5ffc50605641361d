"""Packed preprocessed clip store: decode once, train at chip rate.

SURVEY §7 hard part #1 ("keeping TPUs fed"): codec decode sustains tens of
clips/s per host core while one chip trains thousands — the standard TPU
answer is to pay the decode ONCE offline and train from fixed-shape uint8
shards that mmap straight into the host→HBM prefetch path. This replaces
the reference's DataLoader-worker decode for throughput-bound training
(reference pytorchvideo/data/labeled_video_dataset.py:72-80); the online
decode path (labeled_video_dataset + BatchLoader) remains the
flexibility/eval path.

Layout of a store directory::

    index.json             # geometry, counts, provenance
    clips_00000.npy        # uint8 (n, T, H, W, 3), np.load(mmap_mode="r")
    labels_00000.npy       # int64 (n,)
    video_index_00000.npy  # int32 (n,)  (multi-clip eval ensembling keys)
    ...

Normalization deliberately does NOT happen here: uint8 clips are 4x
smaller than f32 on disk/page cache/PCIe, and the scale+mean/std fold into
the jitted train step's first ops on device (see
benchmarks/clip_store_e2e.py).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Iterator, Optional, Sequence, Tuple

import numpy as np

_INDEX = "index.json"


def prepare_clip_store(
    dataset,
    out_dir: str,
    clips_per_shard: int = 256,
    num_workers: int = 4,
    expected_shape: Optional[Tuple[int, int, int]] = None,
) -> Dict[str, Any]:
    """Decode ``dataset`` (any iterable of sample dicts whose "video" is a
    fixed-shape (T, H, W, 3) array — compose the sizing transform into the
    dataset) into uint8 shards under ``out_dir``.

    The dataset's own transform must make every clip the same shape
    (e.g. UniformTemporalSubsample -> ShortSideScale -> CenterCrop). Values
    may be float [0, 255] or uint8; both are stored as uint8.

    Returns the written index dict.
    """
    from pytorchvideo_tpu.data.loader import BatchLoader

    os.makedirs(out_dir, exist_ok=True)
    shard, labels, vidx = [], [], []
    n_shards = 0
    total = 0
    t_h_w = expected_shape

    def flush():
        nonlocal n_shards, shard, labels, vidx
        if not shard:
            return
        np.save(
            os.path.join(out_dir, f"clips_{n_shards:05d}.npy"),
            np.stack(shard),
        )
        np.save(
            os.path.join(out_dir, f"labels_{n_shards:05d}.npy"),
            np.asarray(labels, np.int64),
        )
        np.save(
            os.path.join(out_dir, f"video_index_{n_shards:05d}.npy"),
            np.asarray(vidx, np.int32),
        )
        n_shards += 1
        shard, labels, vidx = [], [], []

    # BatchLoader parallelizes the decode when the dataset supports the
    # plan/load split; batch_size 1 keeps per-sample granularity.
    loader = BatchLoader(
        dataset, batch_size=1, num_workers=num_workers,
        collate_fn=lambda b: b, drop_last=False,
    )
    for samples in loader:
        for sample in samples:
            video = np.asarray(sample["video"])
            if video.ndim != 4 or video.shape[-1] != 3:
                raise ValueError(f"expected (T,H,W,3) clips, got {video.shape}")
            if t_h_w is None:
                t_h_w = video.shape[:3]
            elif tuple(video.shape[:3]) != tuple(t_h_w):
                raise ValueError(
                    f"clip shape {video.shape[:3]} != store shape {t_h_w}; "
                    "fix the dataset transform to a constant geometry"
                )
            clip = np.clip(video, 0, 255).astype(np.uint8)
            shard.append(clip)
            labels.append(int(sample.get("label", -1)))
            vidx.append(int(sample.get("video_index", -1)))
            total += 1
            if len(shard) >= clips_per_shard:
                flush()
    flush()

    if total == 0:
        raise ValueError(
            "prepare_clip_store: no clips were decoded from the dataset "
            "(every sample failed or the iterator was empty); refusing to "
            "write an unusable index.json"
        )

    index = {
        "version": 1,
        "num_clips": total,
        "num_shards": n_shards,
        "clip_shape": list(t_h_w) if t_h_w else None,
        "dtype": "uint8",
    }
    with open(os.path.join(out_dir, _INDEX), "w") as f:
        json.dump(index, f)
    return index


class ClipStore:
    """mmap-backed random access over a prepared store.

    ``np.load(mmap_mode="r")`` keeps shards out of RSS until touched; batch
    assembly is a fancy-index gather (page-cache reads + one memcpy into
    the batch buffer) — no decode, no per-sample Python work.
    """

    def __init__(self, store_dir: str):
        with open(os.path.join(store_dir, _INDEX)) as f:
            self.index = json.load(f)
        self._clips = []
        self._labels = []
        self._vidx = []
        for i in range(self.index["num_shards"]):
            self._clips.append(
                np.load(
                    os.path.join(store_dir, f"clips_{i:05d}.npy"),
                    mmap_mode="r",
                )
            )
            self._labels.append(
                np.load(os.path.join(store_dir, f"labels_{i:05d}.npy"))
            )
            self._vidx.append(
                np.load(os.path.join(store_dir, f"video_index_{i:05d}.npy"))
            )
        self._sizes = np.array([c.shape[0] for c in self._clips])
        self._offsets = np.concatenate([[0], np.cumsum(self._sizes)])
        self.num_clips = int(self._offsets[-1])
        self.clip_shape = tuple(self.index["clip_shape"])

    def __len__(self) -> int:
        return self.num_clips

    def gather(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        """Assemble a batch for global clip ``indices`` (any order)."""
        out = np.empty((len(indices),) + self.clip_shape + (3,), np.uint8)
        labels = np.empty(len(indices), np.int64)
        vidx = np.empty(len(indices), np.int32)
        shard_ids = np.searchsorted(self._offsets, indices, side="right") - 1
        for pos, (g, s) in enumerate(zip(indices, shard_ids)):
            local = g - self._offsets[s]
            out[pos] = self._clips[s][local]
            labels[pos] = self._labels[s][local]
            vidx[pos] = self._vidx[s][local]
        return {"video": out, "label": labels, "video_index": vidx}

    def batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        epochs: Optional[int] = 1,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield batch dicts; ``epochs=None`` streams forever (reshuffling
        each epoch from the seed + epoch counter)."""
        epoch = 0
        if drop_last and self.num_clips < batch_size:
            # would yield zero batches per epoch; with epochs=None the loop
            # would spin forever producing nothing
            raise ValueError(
                f"store holds {self.num_clips} clips < batch_size="
                f"{batch_size} with drop_last=True; no full batch exists"
            )
        while epochs is None or epoch < epochs:
            order = np.arange(self.num_clips)
            if shuffle:
                np.random.default_rng(seed + epoch).shuffle(order)
            end = (
                self.num_clips - self.num_clips % batch_size
                if drop_last
                else self.num_clips
            )
            for i in range(0, end, batch_size):
                yield self.gather(order[i : i + batch_size])
            epoch += 1
