"""Decode-path throughput: frames/sec for each decoder backend.

SURVEY §7 ranks host decode -> HBM streaming as the top performance
determinant for clips/sec/chip. This harness measures the native C++
FFmpeg decoder (native/decode.cc via ctypes) against the OpenCV backend on
a synthetic encoded video, plus the frame-dir path.

Run: python benchmarks/decode_throughput.py
Prints one json line per backend.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from pytorchvideo_tpu.data.encoded_video import EncodedVideo

    rng = np.random.default_rng(0)
    n_frames, h, w = 240, 240, 320
    # moderately compressible content (pure noise defeats codecs)
    base = rng.integers(0, 255, (1, h, w, 3), dtype=np.uint8)
    arr = np.clip(
        base.astype(np.int16)
        + rng.integers(-20, 20, (n_frames, h, w, 3), dtype=np.int16),
        0,
        255,
    ).astype(np.uint8)

    with tempfile.TemporaryDirectory() as td:
        # mp4v (MPEG-4 pt 2): a realistic inter-frame codec; FFV1 would
        # benchmark lossless decode, not the dataset-decode hot path
        path = os.path.join(td, "clip.mp4")
        import cv2

        wr = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h)
        )
        for f in arr:
            wr.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        wr.release()

        backends = ["opencv"]
        try:
            from pytorchvideo_tpu.data.encoded_video_native import (
                native_available,
            )

            if native_available():
                backends.insert(0, "native")
        except Exception:
            pass

        for backend in backends:
            # warm (file cache)
            v = EncodedVideo.from_path(path, decoder=backend)
            v.get_clip(0, v.duration)
            v.close()
            t0 = time.perf_counter()
            trips = 3
            for _ in range(trips):
                v = EncodedVideo.from_path(path, decoder=backend)
                clip = v.get_clip(0, v.duration)
                v.close()
            dt = (time.perf_counter() - t0) / trips
            frames = clip["video"].shape[0]
            print(
                json.dumps(
                    {
                        "backend": backend,
                        "frames": int(frames),
                        "frames_per_sec": round(frames / dt, 1),
                        "ms_per_240f_clip": round(dt * 1000, 1),
                    }
                ),
                flush=True,
            )


def loader_scaling():
    """BatchLoader worker scaling on the Python path (plan/load split):
    clips/sec through labeled_video_dataset for 1..8 decode workers.
    Round-1 finding: the old loader serialized decode under one lock
    (~1x scaling); the plan/load split should scale near-linearly until
    decode saturates the cores."""
    import cv2

    from pytorchvideo_tpu.data import (
        SequentialSampler,
        labeled_video_dataset,
        make_clip_sampler,
    )
    from pytorchvideo_tpu.data.loader import BatchLoader

    rng = np.random.default_rng(0)
    n_frames, h, w, fps = 60, 240, 320, 30
    base = rng.integers(0, 255, (1, h, w, 3), dtype=np.uint8)
    arr = np.clip(
        base.astype(np.int16)
        + rng.integers(-20, 20, (n_frames, h, w, 3), dtype=np.int16),
        0,
        255,
    ).astype(np.uint8)
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i in range(8):
            p = os.path.join(td, f"v{i}.mp4")
            wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
            for f in arr:
                wr.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
            wr.release()
            paths.append(p)
        csv = os.path.join(td, "data.csv")
        with open(csv, "w") as f:
            for i, p in enumerate(paths):
                f.write(f"{p} {i}\n")

        results = {}
        for workers in (1, 2, 4, 8):
            ds = labeled_video_dataset(
                csv,
                make_clip_sampler("uniform", 0.5),
                video_sampler=SequentialSampler,
            )
            loader = BatchLoader(
                ds, batch_size=4, num_workers=workers, drop_last=False
            )
            t0 = time.perf_counter()
            n_clips = sum(b["video"].shape[0] for b in loader)
            dt = time.perf_counter() - t0
            results[workers] = n_clips / dt
            print(
                json.dumps(
                    {
                        "loader_workers": workers,
                        "clips": n_clips,
                        "clips_per_sec": round(n_clips / dt, 1),
                        "scaling_vs_1_worker": round(
                            results[workers] / results[1], 2
                        ),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
    loader_scaling()
