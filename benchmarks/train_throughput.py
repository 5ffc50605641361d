"""Training-step throughput (clips/sec/chip, fwd+bwd+optimizer update).

Complements model_throughput.py (inference): times the full jitted train
step — SoftTarget CE + MixUp batch transform + SGD update + BN stat
updates — for a model grid on one chip. Run: python
benchmarks/train_throughput.py. Prints one json line per model.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
if "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"

import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = [
    # (name, geom (T, crop), batch)
    ("x3d_s", (13, 160), 64),
    ("slow_r50", (8, 224), 32),
    ("mvit_base_16x4", (16, 224), 8),
    ("mvit_base_32x3", (32, 224), 4),
]


def bench_train(name, geom, batch, bf16=False, remat=None):
    from pytorchvideo_tpu.models import hub
    from pytorchvideo_tpu.train import (
        OptimizerConfig,
        construct_optimizer,
        create_train_state,
        make_train_step,
    )
    from pytorchvideo_tpu.transforms.mix import MixUp
    from pytorchvideo_tpu.utils.profiling import time_stateful

    cpu = jax.devices("cpu")[0]
    device = jax.devices()[0]
    t, crop = geom
    factory = getattr(hub, name)
    model = factory() if "mvit" in name else factory(model_num_class=400)
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, t, crop, crop, 3)), False
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
        compute_dtype=jnp.bfloat16 if bf16 else None,
        remat_policy=remat,
    )

    rng = np.random.default_rng(0)
    batch_dict = {
        "video": jax.device_put(
            jnp.asarray(
                rng.uniform(-1, 1, (batch, t, crop, crop, 3)), jnp.float32
            ),
            device,
        ),
        "label": jax.device_put(jnp.asarray(np.arange(batch) % 400), device),
    }
    key = jax.random.PRNGKey(1)

    def one_step(state, video, label):
        new_state, metrics = step(
            state, {"video": video, "label": label}, key
        )
        return new_state, metrics["loss"]

    # time_stateful carries new_state through the timing loop. The round-2
    # numbers (README "x3d_s 1003->1661" etc.) used time_jitted with a
    # loss+step-counter output: neither depends on the gradient, so XLA
    # dead-code-eliminated the entire backward pass + optimizer update and
    # the harness measured forward-only (x3d_s bf16 corrected: 457 clips/s).
    sec = time_stateful(
        one_step, state, batch_dict["video"], batch_dict["label"], iters=5
    )
    suffix = ("_bf16" if bf16 else "") + ("_remat" if remat else "")
    print(
        json.dumps(
            {
                "metric": f"{name}_train{suffix}_clips_per_sec_per_chip",
                "value": round(batch / sec, 2),
                "unit": "clips/s",
                "batch": batch,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    bf16 = "--bf16" in flags
    remat = "dots_with_no_batch_dims_saveable" if "--remat" in flags else None
    only = set(sys.argv[1:]) - flags
    for name, geom, batch in CONFIGS:
        if only and name not in only:
            continue
        bench_train(name, geom, batch, bf16=bf16, remat=remat)
