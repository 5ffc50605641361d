"""Benchmark: the full BASELINE.json north-star metric set.

Emits ONE json line with the headline X3D-S number in "value"/"vs_baseline"
(driver contract) plus a "submetrics" record carrying the other named
metrics: SlowFast-R50 and MViT-B 16x4 inference clips/s/chip and the
decode+transform pipeline FPS. Anchors and their provenance live in
BASELINE.json.published.

Methodology notes (load-bearing in this environment):
- The axon TPU tunnel's ``block_until_ready`` does not reliably reflect
  device completion, so timing uses an on-device ``lax.fori_loop`` chain
  whose next iteration depends on a full-output reduction of the previous
  one (DCE-proof, dispatch-free), differencing two trip counts to cancel
  dispatch/readback overhead.
- bf16 weights/activations (MXU path); deploy-form weights (accelerate
  fold_conv_bn folds the BN affine into conv kernels — the framework's
  production inference path).
- X3D-S batch 128 (measured sweet spot on one chip: 64→2850, 128→3750,
  256→3570 clips/s); SlowFast-R50 batch 64 (64 beat 32/128 in the round-1
  sweep).
- Pipeline FPS is host-side (decode+transform through BatchLoader with the
  plan/load parallel split; workers adapt to the host core count) — it
  exercises no TPU and runs FIRST, before backend init, because the TPU
  tunnel client's service threads were measured to cut it 4x otherwise.
"""

import json
import os
import tempfile
import time

# keep the TPU default but register the CPU backend too: params are
# initialized host-side (eager init through the tunnel costs minutes).
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
if os.environ["JAX_PLATFORMS"] and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"

import jax
import jax.numpy as jnp
import numpy as np

# Anchors (provenance recorded in BASELINE.json "published"):
#  - x3d_s: round-1 bench.py measurement (v5e chip, batch 64, bf16 deploy form)
#  - slowfast_r50: corrected round-2 measurement (B64, bf16 deploy). The
#    round-1 1092 was invalidated: its timing loop chained only the slow
#    pathway, so XLA hoisted the fast pathway out of the loop (LICM) and
#    the measurement covered a fraction of the model (1095 vs 496 side by
#    side on v5e; see utils/profiling.py time_jitted note).
#  - pipeline_fps: round-2 first measurement on the 1-core dev box with the
#    serialized round-1 loader semantics (1 worker); beating it = real
#    decode parallelism.
BASELINES = {
    "x3d_s": 2680.0,
    "slowfast_r50": 496.0,
    "pipeline_fps": 160.0,
    "mvit_base_16x4": 323.0,
}

N_SMALL = 1
N_BIG = 9


def _measure_model(model, example, batch_inputs, variables, device):
    """clips/s for model.apply on batch_inputs (list or single array) using
    the trip-count-differenced on-device loop."""

    @jax.jit
    def loop(variables, xs, n):
        def body(i, carry):
            xs, acc = carry
            out = model.apply(variables, xs, False)
            probe = out.mean().astype(jnp.float32)
            if isinstance(xs, (list, tuple)):
                xs = type(xs)(
                    x + (probe * 1e-24).astype(x.dtype) for x in xs
                )
            else:
                xs = xs + (probe * 1e-24).astype(xs.dtype)
            return (xs, acc + probe)

        _, acc = jax.lax.fori_loop(0, n, body, (xs, jnp.float32(0)))
        return acc

    float(loop(variables, batch_inputs, N_SMALL))
    float(loop(variables, batch_inputs, N_BIG))
    best_small = best_big = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(variables, batch_inputs, N_SMALL))
        best_small = min(best_small, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(loop(variables, batch_inputs, N_BIG))
        best_big = min(best_big, time.perf_counter() - t0)
    diff = best_big - best_small
    assert diff > 0, f"timing below noise floor (diff={diff:.6f}s)"
    per_step = diff / (N_BIG - N_SMALL)
    leading = (
        batch_inputs[0].shape[0]
        if isinstance(batch_inputs, (list, tuple))
        else batch_inputs.shape[0]
    )
    return leading / per_step


def _deploy_variables(model, example_shapes, device, cpu):
    from pytorchvideo_tpu.accelerate import fold_conv_bn

    with jax.default_device(cpu):
        example = [jnp.zeros(s) for s in example_shapes]
        if len(example) == 1:
            example = example[0]
        variables = model.init(jax.random.PRNGKey(0), example, False)
        variables = fold_conv_bn(variables)
        variables = {
            "params": jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), variables["params"]
            ),
            "batch_stats": variables["batch_stats"],
        }
    return jax.device_put(variables, device)


def bench_x3d_s(device, cpu):
    from pytorchvideo_tpu.models import hub

    model = hub.x3d_s(model_num_class=400)
    B, T, S = 128, 13, 160
    variables = _deploy_variables(model, [(1, T, S, S, 3)], device, cpu)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.uniform(-1, 1, (B, T, S, S, 3)), jnp.bfloat16), device
    )
    return _measure_model(model, None, x, variables, device)


def bench_slowfast_r50(device, cpu):
    from pytorchvideo_tpu.models import hub

    model = hub.slowfast_r50(model_num_class=400)
    B, S = 64, 224
    variables = _deploy_variables(
        model, [(1, 8, S, S, 3), (1, 32, S, S, 3)], device, cpu
    )
    rng = np.random.default_rng(0)
    xs = [
        jax.device_put(
            jnp.asarray(rng.uniform(-1, 1, (B, 8, S, S, 3)), jnp.bfloat16),
            device,
        ),
        jax.device_put(
            jnp.asarray(rng.uniform(-1, 1, (B, 32, S, S, 3)), jnp.bfloat16),
            device,
        ),
    ]
    return _measure_model(model, None, xs, variables, device)


def bench_mvit(device, cpu):
    """MViT-B 16x4, batch 16 (measured per-chip optimum), bf16, BN-fused
    deploy form. Exercises the Pallas pooled-attention + token-pool kernels
    (PVT_* auto dispatch on TPU)."""
    from pytorchvideo_tpu.accelerate import fuse_bn_mvit
    from pytorchvideo_tpu.models import hub

    model = hub.mvit_base_16x4()
    B, T, S = 16, 16, 224
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, T, S, S, 3)), False
        )
        if "batch_stats" in variables:
            variables = fuse_bn_mvit(variables)
        variables = {
            "params": jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), variables["params"]
            ),
            **{k: v for k, v in variables.items() if k != "params"},
        }
    variables = jax.device_put(variables, device)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.uniform(-1, 1, (B, T, S, S, 3)), jnp.bfloat16), device
    )
    return _measure_model(model, None, x, variables, device)


def bench_pipeline_fps():
    """Host decode+transform FPS: synthetic mp4s -> BatchLoader (4 decode
    workers, plan/load split) -> val-style transform chain. Reported as
    source frames decoded+transformed per second."""
    import cv2

    from pytorchvideo_tpu.data import (
        SequentialSampler,
        labeled_video_dataset,
        make_clip_sampler,
    )
    from pytorchvideo_tpu.data.loader import BatchLoader
    from pytorchvideo_tpu.transforms import (
        CenterCropVideo,
        Compose,
        Div255,
        Normalize,
        ShortSideScale,
        UniformTemporalSubsample,
    )

    rng = np.random.default_rng(0)
    n_frames, h, w, fps = 60, 240, 320, 30
    base = rng.integers(0, 255, (1, h, w, 3), dtype=np.uint8)
    arr = np.clip(
        base.astype(np.int16)
        + rng.integers(-20, 20, (n_frames, h, w, 3), dtype=np.int16),
        0,
        255,
    ).astype(np.uint8)
    frame_transform = Compose(
        [
            UniformTemporalSubsample(8),
            Div255(),
            Normalize([0.45] * 3, [0.225] * 3),
            ShortSideScale(182),
            CenterCropVideo(160),
        ]
    )

    def transform(sample):
        sample["video"] = np.asarray(frame_transform(sample["video"]))
        return sample

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

        # Worker count adapts to the host: measured on the 1-core dev box
        # the loader peaks at 2 workers (0w 149 / 1w 254 / 2w 332 / 4w 200
        # fps — 4 threads thrash one core); larger hosts take 4.
        num_workers = 2 if (os.cpu_count() or 1) < 4 else 4
        src_frames_per_clip = int(0.5 * fps)
        best = 0.0
        for _ in range(2):  # best-of-2: absorbs first-pass warmup (thread
            # spawn, page cache) like the min-of-trials device timings
            ds = labeled_video_dataset(
                csv,
                make_clip_sampler("uniform", 0.5),
                video_sampler=SequentialSampler,
                transform=transform,
            )
            loader = BatchLoader(
                ds, batch_size=4, num_workers=num_workers, drop_last=False
            )
            t0 = time.perf_counter()
            n_clips = sum(b["video"].shape[0] for b in loader)
            dt = time.perf_counter() - t0
            best = max(best, n_clips * src_frames_per_clip / dt)
        return best


def _devices_with_timeout(timeout_s: float):
    """Backend init crosses the TPU tunnel, which has been observed to stall
    for tens of minutes; fail fast with a diagnosable JSON line instead of
    hanging the driver's bench run."""
    import threading

    result = {}

    def init():
        try:
            result["d"] = jax.devices()
        except Exception as e:  # pragma: no cover
            result["e"] = repr(e)

    th = threading.Thread(target=init, daemon=True)
    th.start()
    th.join(timeout_s)
    if "d" not in result:
        print(
            json.dumps(
                {
                    "metric": "x3d_s_inference_clips_per_sec_per_chip",
                    "value": 0,
                    "unit": "clips/s",
                    "vs_baseline": 0,
                    "error": result.get(
                        "e",
                        f"TPU backend init did not complete in {timeout_s}s "
                        "(tunnel stall)",
                    ),
                }
            ),
            flush=True,
        )
        os._exit(1)
    return result["d"]


def main():
    errors = {}

    def run(name, fn, *args):
        # One failing model must not take down the whole bench line (e.g.
        # a kernel that stops lowering on the real chip): record the error
        # as a 0-valued submetric instead.
        try:
            return fn(*args)
        except Exception as e:  # pragma: no cover
            errors[name] = f"{type(e).__name__}: {e}"[:400]
            return 0.0

    # Host-only pipeline bench runs FIRST, before any TPU backend init:
    # the tunnel client's service threads compete for host CPU and were
    # measured to cut this host-side number 4x when it ran last.
    pipeline = run("pipeline_fps", bench_pipeline_fps)

    device = _devices_with_timeout(float(os.environ.get("BENCH_INIT_TIMEOUT", 900)))[0]
    cpu = jax.devices("cpu")[0]

    x3d = run("x3d_s", bench_x3d_s, device, cpu)
    slowfast = run("slowfast_r50", bench_slowfast_r50, device, cpu)
    mvit = run("mvit_base_16x4", bench_mvit, device, cpu)

    print(
        json.dumps(
            {
                "metric": "x3d_s_inference_clips_per_sec_per_chip",
                "value": round(x3d, 2),
                "unit": "clips/s",
                "vs_baseline": round(x3d / BASELINES["x3d_s"], 3),
                "submetrics": {
                    "slowfast_r50_inference_clips_per_sec_per_chip": {
                        "value": round(slowfast, 2),
                        "unit": "clips/s",
                        "vs_baseline": round(
                            slowfast / BASELINES["slowfast_r50"], 3
                        ),
                    },
                    "mvit_base_16x4_inference_clips_per_sec_per_chip": {
                        "value": round(mvit, 2),
                        "unit": "clips/s",
                        "vs_baseline": round(
                            mvit / BASELINES["mvit_base_16x4"], 3
                        ),
                    },
                    "decode_transform_pipeline_fps": {
                        "value": round(pipeline, 1),
                        "unit": "frames/s",
                        "vs_baseline": round(
                            pipeline / BASELINES["pipeline_fps"], 3
                        ),
                    },
                },
                **({"errors": errors} if errors else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
