"""Same-session A/B of the fused kv-pool+LN+attention kernel on MViT-B.

Interleaves PVT_FUSED_KVPOOL=0/1 whole-model measurements (mvit_base_16x4,
B16, bf16 deploy form) in ONE process so chip/session drift cancels —
the rule every prior dispatch decision followed (ops/token_pool.py A/B,
pallas_kv A/B in git 6385423). Prints one json line per measurement plus a
final medians line; the medians decide the default in layers/attention.py.

Usage: JAX_PLATFORMS=axon,cpu python benchmarks/fused_kvpool_ab.py [reps]
"""

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pytorchvideo_tpu.accelerate import fuse_bn_mvit
    from pytorchvideo_tpu.models import hub
    from pytorchvideo_tpu.utils.profiling import time_jitted

    batch = int(os.environ.get("BENCH_BATCH", 16))
    model = hub.mvit_base_16x4()
    cpu = jax.devices("cpu")[0]
    device = jax.devices()[0]
    rng = np.random.default_rng(0)
    example = jnp.zeros((1, 16, 224, 224, 3))
    x = jnp.asarray(rng.uniform(-1, 1, (batch, 16, 224, 224, 3)), jnp.bfloat16)

    with jax.default_device(cpu):
        variables = model.init(jax.random.PRNGKey(0), example, False)
        if "batch_stats" in variables:
            variables = fuse_bn_mvit(variables)
        variables = {
            "params": jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), variables["params"]
            ),
            **{k: v for k, v in variables.items() if k != "params"},
        }
    variables = jax.device_put(variables, device)
    x = jax.device_put(x, device)

    def measure(fused: bool) -> float:
        os.environ["PVT_FUSED_KVPOOL"] = "1" if fused else "0"

        # Fresh closure per measurement so jax's jit cache can't alias the
        # two variants (the env flag is read at trace time).
        def fn(xx, _tag=("fused" if fused else "plain")):
            return model.apply(variables, xx, False)

        sec = time_jitted(fn, x, iters=10)
        cps = batch / sec
        print(
            json.dumps(
                {"variant": _variant(fused), "clips_per_sec": round(cps, 1)}
            ),
            flush=True,
        )
        return cps

    def _variant(fused):
        return "fused_kvpool" if fused else "plain"

    results = {"plain": [], "fused_kvpool": []}
    for _ in range(reps):
        for fused in (False, True):
            results[_variant(fused)].append(measure(fused))

    summary = {
        k: round(statistics.median(v), 1) for k, v in results.items() if v
    }
    summary["speedup"] = round(
        summary["fused_kvpool"] / summary["plain"], 4
    )
    print(json.dumps({"medians": summary}), flush=True)


if __name__ == "__main__":
    main()
