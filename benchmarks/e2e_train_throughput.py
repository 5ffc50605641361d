"""End-to-end train throughput FROM DISK: decode -> transform -> step.

The model-only grids (train_throughput.py) time the device step on
pre-staged batches; this harness answers the question that actually
determines production clips/sec (SURVEY §7 hard part #1): can the host
pipeline — C++/OpenCV decode in BatchLoader worker threads, numpy
transforms, double-buffered device_put prefetch — keep the chip fed?

Writes N synthetic mp4s (inter-frame codec), builds the real Kinetics-style
dataset + train transform, streams through BatchLoader + device_prefetch
into the jitted bf16 train step, and reports steady-state clips/s.

Context for the recorded number: this dev box exposes ONE cpu core
(sched_getaffinity), so the run is host-decode-bound (~3 clips/s; the
device step alone does ~457). Host cost is ~120-320 ms/clip
(decode ~100 ms + numpy transform ~25 ms + collate/put, GIL-serialized
on one core) and scales ~linearly with cores in the threaded BatchLoader
— a 64-core production host feeds ~500+ clips/s, and the C++ decode
service (native/) raises the per-core decode rate further. The numpy
host fast paths in transforms/functional.py took the transform from
460 -> 25 ms/clip (XLA was recompiling per random resize shape).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
if "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"

import jax
import jax.numpy as jnp
import numpy as np

MODEL = "x3d_s"
CLIP_LEN, CROP = 13, 160
BATCH = 64
N_VIDEOS = 16
WORKERS = 8
STEPS = 12  # first 2 discarded (compile + pipeline fill)


def write_videos(td):
    import cv2

    rng = np.random.default_rng(0)
    n_frames, h, w = 90, 200, 260
    paths = []
    base = rng.integers(0, 255, (1, h, w, 3), dtype=np.uint8)
    arr = np.clip(
        base.astype(np.int16)
        + rng.integers(-20, 20, (n_frames, h, w, 3), dtype=np.int16),
        0,
        255,
    ).astype(np.uint8)
    for i in range(N_VIDEOS):
        p = os.path.join(td, f"v{i}.mp4")
        wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
        for f in arr:
            wr.write(f[:, :, ::-1])
        wr.release()
        paths.append(p)
    csv = os.path.join(td, "train.csv")
    # one clip is drawn per csv row per pass: repeat rows so one pass
    # covers the whole timed run
    rows = (STEPS + 3) * BATCH
    with open(csv, "w") as f:
        for i in range(rows):
            f.write(f"{paths[i % len(paths)]} {i % 4}\n")
    return csv


def main():
    from pytorchvideo_tpu.data import labeled_video_dataset, make_clip_sampler
    from pytorchvideo_tpu.data.loader import BatchLoader, device_prefetch
    from pytorchvideo_tpu.data.samplers import RandomSampler
    from pytorchvideo_tpu.models import hub
    from pytorchvideo_tpu.train import (
        OptimizerConfig,
        construct_optimizer,
        create_train_state,
        make_train_step,
    )
    from pytorchvideo_tpu.transforms import (
        ApplyTransformToKey,
        Compose,
    )
    from pytorchvideo_tpu.transforms.transforms_factory import (
        create_video_transform,
    )

    device = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    model = hub.x3d_s(model_num_class=400)
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, CLIP_LEN, CROP, CROP, 3)), False
        )
        tx = construct_optimizer(
            variables["params"], OptimizerConfig(method="sgd", lr=0.1)
        )
        state = create_train_state(variables, tx)
    state = jax.device_put(state, device)
    step = jax.jit(
        make_train_step(model, tx, compute_dtype=jnp.bfloat16)
    )

    t = create_video_transform(
        "train",
        num_samples=CLIP_LEN,
        convert_to_float=False,
        min_size=182,
        max_size=228,
        crop_size=CROP,
    )
    transform = Compose(
        [
            ApplyTransformToKey(
                "video", Compose([lambda v: np.asarray(v) / 255.0, t])
            ),
            lambda s: {"video": s["video"], "label": s["label"]},
        ]
    )

    with tempfile.TemporaryDirectory() as td:
        csv = write_videos(td)
        dataset = labeled_video_dataset(
            csv,
            make_clip_sampler("random", CLIP_LEN / 30.0),
            video_sampler=RandomSampler,
            transform=transform,
            decoder="opencv",
        )
        loader = BatchLoader(
            dataset, batch_size=BATCH, num_workers=WORKERS, drop_last=True
        )
        batches = device_prefetch(iter(loader), size=2)

        key = jax.random.PRNGKey(1)
        times = []
        n = 0
        last = time.perf_counter()
        for batch in batches:
            state, metrics = step(state, batch, key)
            jax.block_until_ready(metrics["loss"])
            now = time.perf_counter()
            times.append(now - last)
            last = now
            n += 1
            if n >= STEPS:
                break
        steady = times[2:]
        sec = sum(steady) / len(steady)
        n_cores = len(os.sched_getaffinity(0))
        print(
            json.dumps(
                {
                    "metric": "x3d_s_e2e_train_from_disk_clips_per_sec",
                    "value": round(BATCH / sec, 2),
                    "unit": "clips/s",
                    "batch": BATCH,
                    "workers": WORKERS,
                    "steps": len(steady),
                    "host_cores": n_cores,
                    # host cost per clip: decode+transform are CPU-bound and
                    # scale ~linearly with cores (threaded BatchLoader); on
                    # an N-core production host the e2e rate approaches
                    # min(N * 1000/host_ms_per_clip, device_rate).
                    "host_ms_per_clip": round(sec / BATCH * 1e3 * n_cores, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
