"""Localize the MViT-B train-compile failure (round 5).

Full-size MViT-B 16x4 training fails in the axon remote-compile helper
(exit 1) whenever the Pallas pooled-attention path is active — at B16,
B8, and even B4 — while the identical graph with
``PVT_POOLED_ATTENTION=xla`` compiles and trains (98.0 clips/s B8).
The tiny-geometry custom-VJP gradient test passes, so the failure is
geometry- or graph-size-dependent. This probe compiles ``jax.grad`` of a
SINGLE ``pooled_attention_packed`` op (Pallas fwd + flash-style Pallas
bwd, `ops/pooled_attention.py pooled_attention_packed_pallas_bwd`) at
each representative MViT-B depth geometry, one executable at a time:

- if some geometry fails solo → the backward kernel can't lower/compile
  at that shape (kernel bug to fix);
- if every geometry compiles solo → the whole-model failure is the
  compile helper running out of memory on the 16-block graph (rig
  artifact), and the documented workaround (PVT_POOLED_ATTENTION=xla
  for training on this rig) is the right call.

Run: python benchmarks/mvit_bwd_probe.py  (chip required)
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

from pytorchvideo_tpu.ops.pooled_attention import pooled_attention_packed

# (label, B, Lq, Lk, num_heads, head_dim) — MViT-B 16x4 depth ladder
# (thw 8x56x56 = 25088 tokens + cls at entry; stage transitions pool q
# 4x spatially and double heads; kv pooled by stride 8/4/2/1).
GEOMS = [
    ("stage1", 4, 25089, 1569, 1, 96),
    ("stage2", 4, 6273, 1569, 2, 96),
    ("stage3", 4, 1569, 1569, 4, 96),
    ("stage3_respool", 4, 1569, 393, 4, 96),
    ("stage4", 4, 393, 393, 8, 96),
]


def main():
    device = jax.devices()[0]
    print(json.dumps({"device": device.device_kind}), file=sys.stderr)
    for label, b, lq, lk, h, c in GEOMS:
        with jax.default_device(device):
            q = jax.jit(
                lambda k: jax.random.uniform(k, (b, lq, h * c), jnp.bfloat16)
            )(jax.random.PRNGKey(0))
            kv = jax.jit(
                lambda k: jax.random.uniform(k, (b, lk, h * c), jnp.bfloat16)
            )(jax.random.PRNGKey(1))

        def loss(q, k, v):
            out = pooled_attention_packed(
                q, k, v, h, (96) ** -0.5, False, use_pallas=True
            )
            return jnp.sum(out.astype(jnp.float32))

        t0 = time.time()
        try:
            grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, kv, kv)
            jax.block_until_ready(grads)
            rec = {
                "geom": label,
                "ok": True,
                "compile_s": round(time.time() - t0, 1),
            }
        except Exception as e:  # noqa: BLE001 - probe reports any failure
            rec = {"geom": label, "ok": False, "error": str(e).split("\n")[0][:200]}
        print(json.dumps(rec), flush=True)
        del q, kv
        jax.clear_caches()
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
