"""Token-pool kernel micro: Pallas vs XLA grouped conv at real MViT shapes.

The XLA grouped conv's kernel time alone is small (0.04-0.5 ms/shape); its
real cost in the packed MViT path is the relayout copies XLA inserts around
it (~11 ms/step at MViT-B b16, benchmarks/mvit_breakdown.py). This micro
times both ops standalone (same row-major operands) — the whole-model
number in model_throughput.py (PVT_TOKEN_POOL=pallas vs xla) is the one
that includes the boundary effects.

Run on TPU: python benchmarks/token_pool_micro.py
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

from pytorchvideo_tpu.ops.token_pool import (
    _token_pool_ad,
    _xla_depthwise_pool,
)
from pytorchvideo_tpu.utils.profiling import time_jitted

# MViT-B 16x4 @ B16 real pool geometries (name, shape, kernel, stride).
B = int(os.environ.get("BENCH_BATCH", 16))
CASES = [
    ("d0_kv", (B, 8, 56, 56, 96), (3, 3, 3), (1, 8, 8)),
    ("d1_q", (B, 8, 56, 56, 192), (3, 3, 3), (1, 2, 2)),
    ("d1_kv", (B, 8, 56, 56, 192), (3, 3, 3), (1, 8, 8)),
    ("d2_kv", (B, 8, 28, 28, 192), (3, 3, 3), (1, 4, 4)),
    ("d3_q", (B, 8, 28, 28, 384), (3, 3, 3), (1, 2, 2)),
    ("d4_kv", (B, 8, 14, 14, 384), (3, 3, 3), (1, 2, 2)),
    ("d14_q", (B, 8, 14, 14, 768), (3, 3, 3), (1, 2, 2)),
]


def main():
    device = jax.devices()[0]
    rng = np.random.default_rng(0)
    for name, shape, kernel, stride in CASES:
        pad = tuple(k // 2 for k in kernel)
        x = jax.device_put(
            jnp.asarray(rng.normal(size=shape), jnp.bfloat16), device
        )
        w = jax.device_put(
            jnp.asarray(
                rng.normal(size=kernel + (shape[-1],)) * 0.1, jnp.bfloat16
            ),
            device,
        )
        hbm_mb = x.size * 2 / 1e6
        rec = {"case": name, "shape": shape, "stride": stride}
        try:
            t_pallas = time_jitted(
                lambda xx: _token_pool_ad(xx, w, stride, pad, False), x,
                iters=20,
            )
            rec["pallas_ms"] = round(t_pallas * 1e3, 3)
            rec["read_gbps_pallas"] = round(hbm_mb / 1e3 / t_pallas, 1)
        except Exception as e:  # Mosaic lowering limits are per-geometry
            rec["pallas_error"] = str(e)[:120]
        try:
            t_xla = time_jitted(
                lambda xx: _xla_depthwise_pool(xx, w, stride, pad), x,
                iters=20,
            )
            rec["xla_ms"] = round(t_xla * 1e3, 3)
        except Exception as e:
            rec["xla_error"] = str(e)[:120]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
