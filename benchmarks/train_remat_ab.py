"""Train-step remat-policy / batch-geometry A/B (round 5).

The two train gate metrics (x3d_s B64, slowfast_r50 B32; bf16 compute,
MixUp + SoftTarget CE + SGD-momentum — bench.py setup_*_train) have only
ever been measured with ``remat_policy=None`` at one batch size. This
harness answers, same-session and interleaved (the repo's decision-grade
discipline, see docs/bench_instrument.md):

  1. Does activation rematerialization SPEED UP the step? On a
     bandwidth-bound model (X3D: docs/x3d_roofline.md) the saved
     residuals of elementwise chains round-trip HBM between fwd and bwd;
     ``dots_with_no_batch_dims_saveable`` recomputes them from the saved
     dot outputs instead — trading cheap VPU FLOPs for HBM traffic, which
     can be net-positive, not just a memory trade.
  2. Does a larger batch (enabled by remat's smaller live set) buy
     throughput per chip?

Reference analogue: the reference trains via Lightning DDP with no
activation checkpointing knob in the trainer
(/root/reference/pytorchvideo_trainer/pytorchvideo_trainer/module/
video_classification.py:104-223); remat is a TPU/XLA-native lever.

Run:  python benchmarks/train_remat_ab.py [x3d_s|slowfast] [--iters N]
Prints one json line per variant; OOM variants report {"oom": true}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
if "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"

import jax
import jax.numpy as jnp
import numpy as np


def _rand_input(shape, device, seed=0, dtype=jnp.float32):
    # On-device generation: host->device of multi-hundred-MB arrays can
    # stall through the axon tunnel (bench.py _rand_input).
    with jax.default_device(device):
        x = jax.jit(lambda k: jax.random.uniform(k, shape, dtype, -1, 1))(
            jax.random.PRNGKey(seed)
        )
    return jax.block_until_ready(x)


def _build_x3d_variant(device, cpu, remat, batch):
    from pytorchvideo_tpu.models import hub
    from pytorchvideo_tpu.train import (
        OptimizerConfig,
        construct_optimizer,
        create_train_state,
        make_train_step,
    )
    from pytorchvideo_tpu.transforms.mix import MixUp

    T, S = 13, 160
    model = hub.x3d_s(model_num_class=400)
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, T, S, S, 3)), False
        )
        tx = construct_optimizer(
            variables["params"],
            OptimizerConfig(method="sgd", lr=0.1, momentum=0.9),
        )
        state = create_train_state(variables, tx)
    state = jax.device_put(state, device)
    mix = MixUp(num_classes=400, label_smoothing=0.1)
    step = make_train_step(
        model,
        tx,
        batch_transform=lambda k, v, l: mix(k, v, l),
        compute_dtype=jnp.bfloat16,
        remat_policy=remat,
    )
    video = _rand_input((batch, T, S, S, 3), device, seed=0)
    label = jax.device_put(jnp.asarray(np.arange(batch) % 400), device)
    return step, state, video, label


def _build_single_pathway_variant(factory_name, T, S, device, cpu, remat, batch):
    """slow_r50 / mvit train variants: their train_throughput.py grid
    numbers have been INVALID since the round-2 DCE bug (forward-only
    measurement) with no corrected re-run; this builder produces the
    corrected numbers and sweeps the batch-geometry lever that won 33%
    on X3D-S."""
    from pytorchvideo_tpu.models import hub
    from pytorchvideo_tpu.train import (
        OptimizerConfig,
        construct_optimizer,
        create_train_state,
        make_train_step,
    )
    from pytorchvideo_tpu.transforms.mix import MixUp

    factory = getattr(hub, factory_name)
    model = (
        factory() if "mvit" in factory_name else factory(model_num_class=400)
    )
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, T, S, S, 3)), False
        )
        tx = construct_optimizer(
            variables["params"],
            OptimizerConfig(method="sgd", lr=0.1, momentum=0.9),
        )
        state = create_train_state(variables, tx)
    state = jax.device_put(state, device)
    num_class = 400
    mix = MixUp(num_classes=num_class, label_smoothing=0.1)
    step = make_train_step(
        model,
        tx,
        batch_transform=lambda k, v, l: mix(k, v, l),
        compute_dtype=jnp.bfloat16,
        remat_policy=remat,
    )
    video = _rand_input((batch, T, S, S, 3), device, seed=0)
    label = jax.device_put(jnp.asarray(np.arange(batch) % num_class), device)
    return step, state, video, label


def _build_slowfast_variant(device, cpu, remat, batch):
    from pytorchvideo_tpu.models import hub
    from pytorchvideo_tpu.train import (
        OptimizerConfig,
        construct_optimizer,
        create_train_state,
        make_train_step,
    )
    from pytorchvideo_tpu.transforms.mix import _mix_labels, _sample_beta

    S = 224
    model = hub.slowfast_r50(model_num_class=400)
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0),
            [jnp.zeros((1, 8, S, S, 3)), jnp.zeros((1, 32, S, S, 3))],
            False,
        )
        tx = construct_optimizer(
            variables["params"],
            OptimizerConfig(method="sgd", lr=0.1, momentum=0.9),
        )
        state = create_train_state(variables, tx)
    state = jax.device_put(state, device)

    def pathway_mixup(key, videos, labels):
        lam = _sample_beta(key, 1.0)
        mixed = [v * lam + jnp.flip(v, axis=0) * (1.0 - lam) for v in videos]
        return mixed, _mix_labels(labels, 400, lam, 0.1, False)

    step = make_train_step(
        model,
        tx,
        batch_transform=pathway_mixup,
        compute_dtype=jnp.bfloat16,
        remat_policy=remat,
    )
    videos = [
        _rand_input((batch, 8, S, S, 3), device, seed=0),
        _rand_input((batch, 32, S, S, 3), device, seed=1),
    ]
    label = jax.device_put(jnp.asarray(np.arange(batch) % 400), device)
    return step, state, videos, label


def _make_loop(step):
    key = jax.random.PRNGKey(1)

    @jax.jit
    def loop(state, video, label, n):
        def body(i, carry):
            state, video, acc = carry
            new_state, metrics = step(
                state, {"video": video, "label": label}, key
            )
            probe = metrics["loss"].astype(jnp.float32)
            video = jax.tree_util.tree_map(
                lambda v: v + (probe * 1e-24).astype(v.dtype), video
            )
            return (new_state, video, acc + probe)

        _, _, acc = jax.lax.fori_loop(
            0, n, body, (state, video, jnp.float32(0))
        )
        return acc

    return loop


def main():
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    only = set(sys.argv[1:]) - flags
    iters = 5
    for a in list(flags):
        if a.startswith("--iters"):
            iters = int(a.split("=")[1])
    device = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    print(
        json.dumps({"device": device.device_kind, "iters": iters}),
        file=sys.stderr,
        flush=True,
    )

    suites = {
        "x3d_s": (
            _build_x3d_variant,
            [
                ("none_b64", None, 64),
                ("dots_b64", "dots_with_no_batch_dims_saveable", 64),
                ("full_b64", "full", 64),
                ("none_b128", None, 128),
                ("dots_b128", "dots_with_no_batch_dims_saveable", 128),
            ],
        ),
        # Round-5 follow-up: B128-none won round 1 (609.5 vs 457.1 at B64,
        # remat a ~19% loss at both batches); probe the batch ceiling.
        "x3d_big": (
            _build_x3d_variant,
            [
                ("none_b192", None, 192),
                ("none_b256", None, 256),
            ],
        ),
        "slowfast": (
            _build_slowfast_variant,
            [
                ("none_b32", None, 32),
                ("dots_b32", "dots_with_no_batch_dims_saveable", 32),
                ("none_b64", None, 64),
                ("dots_b64", "dots_with_no_batch_dims_saveable", 64),
            ],
        ),
        # B64 fails at compile (tpu_compile_helper exit 1 — same failure
        # as x3d B192/256); bracket the ceiling between 32 and 64.
        "slowfast_mid": (
            _build_slowfast_variant,
            [
                ("none_b40", None, 40),
                ("none_b48", None, 48),
            ],
        ),
        # Corrected (DCE-proof) train numbers + batch sweep for the rest
        # of the zoo grid; train_throughput.py's round-2 slow_r50/mvit
        # rows were forward-only and never re-measured.
        "slow_r50": (
            lambda d, c, r, b: _build_single_pathway_variant(
                "slow_r50", 8, 224, d, c, r, b
            ),
            [
                ("none_b32", None, 32),
                ("none_b64", None, 64),
            ],
        ),
        "mvit_16x4": (
            lambda d, c, r, b: _build_single_pathway_variant(
                "mvit_base_16x4", 16, 224, d, c, r, b
            ),
            [
                ("none_b8", None, 8),
                ("none_b16", None, 16),
            ],
        ),
        # Both mvit_16x4 batches die in the remote-compile helper (exit
        # 1). Bisect: same graph under XLA attention (PVT_POOLED_
        # ATTENTION=xla set by the caller) vs a smaller Pallas graph.
        "mvit_small": (
            lambda d, c, r, b: _build_single_pathway_variant(
                "mvit_base_16x4", 16, 224, d, c, r, b
            ),
            [
                ("none_b4", None, 4),
            ],
        ),
    }
    for suite_name, (builder, variants) in suites.items():
        if only and suite_name not in only:
            continue
        live = []
        for vname, remat, batch in variants:
            t0 = time.time()
            try:
                step, state, video, label = builder(device, cpu, remat, batch)
                loop = _make_loop(step)
                # warm/compile both trip counts
                float(loop(state, video, label, 1))
                float(loop(state, video, label, iters + 1))
            except Exception as e:  # noqa: BLE001 - report per-variant OOM
                msg = str(e).split("\n")[0][:160]
                print(
                    json.dumps(
                        {"variant": f"{suite_name}/{vname}", "error": msg}
                    ),
                    flush=True,
                )
                continue
            print(
                json.dumps(
                    {
                        "variant": f"{suite_name}/{vname}",
                        "compile_s": round(time.time() - t0, 1),
                    }
                ),
                file=sys.stderr,
                flush=True,
            )
            live.append((vname, batch, loop, state, video, label))

        # interleaved min-diff trials across the co-resident variants
        best = {v[0]: [float("inf"), float("inf")] for v in live}
        for _trial in range(3):
            for vname, batch, loop, state, video, label in live:
                t0 = time.perf_counter()
                float(loop(state, video, label, 1))
                best[vname][0] = min(
                    best[vname][0], time.perf_counter() - t0
                )
                t0 = time.perf_counter()
                float(loop(state, video, label, iters + 1))
                best[vname][1] = min(
                    best[vname][1], time.perf_counter() - t0
                )
        for vname, batch, loop, state, video, label in live:
            small, big = best[vname]
            diff = big - small
            if diff <= 0:
                print(
                    json.dumps(
                        {
                            "variant": f"{suite_name}/{vname}",
                            "error": f"noise floor diff={diff * 1e3:.2f}ms",
                        }
                    ),
                    flush=True,
                )
                continue
            sec = diff / iters
            print(
                json.dumps(
                    {
                        "variant": f"{suite_name}/{vname}",
                        "clips_per_sec": round(batch / sec, 1),
                        "step_ms": round(sec * 1e3, 2),
                        "batch": batch,
                    }
                ),
                flush=True,
            )
        # free this suite before the next (docs/bench_instrument.md)
        del live, best
        jax.clear_caches()
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
