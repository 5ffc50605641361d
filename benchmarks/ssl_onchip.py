"""On-chip SSL train-path exercise (VERDICT r4 item 6): run each SSL task
(byol / simclr / moco_v2) for N real optimizer steps on the attached TPU
through the full SSLTrainApp path (datamodule -> two-view transform ->
jitted task step), and record per-step wall time + the loss trace.

The contrastive all-gather (SimCLR NT-Xent negatives, reference
models/simclr.py:192) and the MoCo queue/shuffle path compile and execute
on the real chip here — the one reference parallelism surface that
previously had no TPU execution record (multi-device behavior is covered
by tests/test_ssl_app.py + the driver's dryrun on the virtual mesh; this
run is the single-chip hardware record).

Usage:  python benchmarks/ssl_onchip.py [--steps 10] [--tasks simclr,byol,moco_v2]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_videos(td, n_files=4, rows=88, seconds=2.0, fps=10, size=224):
    """``n_files`` distinct videos repeated across ``rows`` csv rows: the
    train datamodule draws ONE random clip per csv row per epoch, so the
    row count (not the file count) sets the samples available to the
    10-step run (8/batch x 10 steps needs >=80)."""
    import cv2

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_files):
        p = os.path.join(td, f"v{i}.avi")
        wr = cv2.VideoWriter(
            p, cv2.VideoWriter_fourcc(*"FFV1"), fps, (size, size)
        )
        for frame in rng.integers(
            0, 255, (int(seconds * fps), size, size, 3), np.uint8
        ):
            wr.write(frame)
        wr.release()
        paths.append(p)
    csv = os.path.join(td, "train.csv")
    with open(csv, "w") as f:
        for i in range(rows):
            f.write(f"{paths[i % n_files]} {i % 2}\n")
    return csv


def run_task(task, csv, steps):
    import jax

    from pytorchvideo_tpu.train.config import DataConfig, ModelConfig
    from pytorchvideo_tpu.train.ssl_app import SSLConfig, SSLTrainApp

    cfg = SSLConfig(task=task)
    cfg.model = ModelConfig(
        name="x3d_xs",
        kwargs=dict(input_clip_length=4, input_crop_size=160),
        clip_length=4,
        crop_size=160,
    )
    cfg.data = DataConfig(
        data_path=csv,
        clip_duration=1.0,
        batch_size=8,
        num_samples=4,
        min_size=180,
        max_size=200,
        crop_size=160,
    )
    cfg.optim.lr = 0.01
    cfg.feature_dim = 128
    cfg.predictor_inner = 256
    cfg.queue_size = 1024
    cfg.max_epochs = 1

    app = SSLTrainApp(cfg, steps_per_epoch=steps)
    t0 = time.perf_counter()
    app.setup()
    setup_s = time.perf_counter() - t0

    # time each step around the jitted call incl. the loss readback the
    # app itself performs (float(loss) forces device completion through
    # the tunnel; block_until_ready alone is unreliable here)
    orig = app._step
    times = []

    def timed(*a):
        t1 = time.perf_counter()
        out = orig(*a)
        float(out[2])
        times.append(time.perf_counter() - t1)
        return out

    app._step = timed
    t0 = time.perf_counter()
    history = app.train()
    train_s = time.perf_counter() - t0
    post = sorted(times[1:])  # drop the compile step
    return {
        "task": task,
        "steps": len(history),
        "setup_s": round(setup_s, 1),
        "train_wall_s": round(train_s, 1),
        "compile_step_s": round(times[0], 1) if times else None,
        "median_step_s": (
            round(post[len(post) // 2], 3) if post else None
        ),
        "loss_trace": [round(v, 4) for v in history],
        "finite": bool(np.all(np.isfinite(history))),
        "ok": len(history) == steps
        and bool(np.all(np.isfinite(history))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--tasks", default="simclr,byol,moco_v2")
    args = ap.parse_args()
    import jax

    dev = jax.devices()[0]
    print(
        json.dumps({"device": dev.device_kind, "platform": dev.platform}),
        flush=True,
    )
    ok = True
    with tempfile.TemporaryDirectory() as td:
        csv = make_videos(td, rows=8 * args.steps + 8)
        for task in args.tasks.split(","):
            rec = run_task(task, csv, args.steps)
            ok = ok and rec["ok"]
            print(json.dumps(rec), flush=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
