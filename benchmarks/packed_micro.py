"""A/B the packed-channel fast pathway on the real chip (SlowFast-R50 B64).

Variants (all bf16 deploy form, identical params — layers/packed.py is a
pure layout rewrite; pack caps are ADAPTIVE: the pathway picks per-stage
packs, 4->2 at the 28->14 stride boundary, unpacked at the odd 7x7 res5):
  plain      the shipping build
  adapt2     fast pathway pack cap 2
  adapt4     fast pathway pack cap 4 (per-op measured optimum:
             benchmarks/fastpath_micro.py — res2 pointwise/temporal convs
             2.3-3.2x faster at pack 4, res4 conv 2x at pack 2)

Run: python benchmarks/packed_micro.py [batch]
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

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64

VARIANTS = {
    "plain": {},
    "adapt2": {"pathway_packs": (1, 2)},
    "adapt4": {"pathway_packs": (1, 4)},
    # per-stage caps at the measured per-stage optimum (fastpath_micro.py
    # stages): res2@4, res3+@2, fusion caps follow (stem@4, C>=128 plain)
    "mixed": {"pathway_packs": (1, (4, 2, 2, 2))},
}


def time_variant(name: str, extra: dict) -> float:
    from pytorchvideo_tpu.accelerate import fold_conv_bn
    from pytorchvideo_tpu.models.slowfast import create_slowfast
    from pytorchvideo_tpu.utils.profiling import time_jitted

    model = create_slowfast(model_num_class=400, **extra)
    cpu = jax.devices("cpu")[0]
    device = jax.devices()[0]
    rng = np.random.default_rng(0)
    example = [
        jnp.zeros((1, 8, 224, 224, 3)),
        jnp.zeros((1, 32, 224, 224, 3)),
    ]
    with jax.default_device(cpu):
        variables = model.init(jax.random.PRNGKey(0), example, False)
        variables = fold_conv_bn(variables)
        variables = {
            "params": jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), variables["params"]
            ),
            **{k: v for k, v in variables.items() if k != "params"},
        }
    variables = jax.device_put(variables, device)
    xs = [
        jax.device_put(
            jnp.asarray(
                rng.uniform(-1, 1, (BATCH, t, 224, 224, 3)), jnp.bfloat16
            ),
            device,
        )
        for t in (8, 32)
    ]

    def fn(slow, fast):
        return model.apply(variables, [slow, fast], False)

    return time_jitted(fn, xs[0], xs[1], iters=10)


def main():
    for name, extra in VARIANTS.items():
        try:
            sec = time_variant(name, extra)
            print(
                json.dumps(
                    {
                        "variant": name,
                        "batch": BATCH,
                        "ms_per_batch": round(sec * 1e3, 2),
                        "clips_per_sec": round(BATCH / sec, 1),
                    }
                ),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
