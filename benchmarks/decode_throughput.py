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


if __name__ == "__main__":
    main()
