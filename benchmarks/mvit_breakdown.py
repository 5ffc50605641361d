"""MViT-B 16x4 inference time breakdown by ablation (diagnostic, TPU).

Times the full model, then variants with one component knocked out
(monkeypatched to a cheap stand-in). The delta attributes time to the
component. Shapes change if pooling is removed, so pool ablation swaps
conv->avg (same output shape, near-zero cost) rather than removing it.

Measured v5e, batch 16 bf16 (2026-08): base 53.4 ms/batch ->
attention core 13.9 ms (Pallas kernel + pad/unpad; standalone kernel sum
across real depth shapes is ~8.6 ms at 40-70 TF/s, the rest is padding
copies), k/v projection+pool chain ~18.9 ms by ablation (NOTE: isolated
microbenches of the same chain cost only ~3-6 ms total — per-head vs
full-channel depthwise layouts measure identical — so a chunk of this
delta is cross-variant compile/fusion variance, not a single hot op),
MLP fc1+act 6.3 ms, pool-conv taps 0.5 ms. Remaining ~14 ms: q chain,
out-proj, LNs, patch embed, head. Conclusion: no single dominant
op remains; further gains need HLO-level profiling (xprof), not kernel
swaps. Kernel q-tile dispatch tuned from the depth-shape microbench
(ops/pooled_attention.py).
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

BATCH = 16


def timed(model_builder, label):
    from pytorchvideo_tpu.utils.profiling import time_jitted

    model = model_builder()
    cpu = jax.devices("cpu")[0]
    device = jax.devices()[0]
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 224, 224, 3)), False
        )
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32
            else a,
            variables,
        )
    variables = jax.device_put(variables, device)
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (BATCH, 16, 224, 224, 3)),
            jnp.bfloat16,
        ),
        device,
    )
    sec = time_jitted(
        lambda x, v: model.apply(v, x, False).astype(jnp.float32).mean(),
        x,
        variables,
        iters=5,
    )
    print(
        json.dumps(
            {"variant": label, "ms_per_batch": round(sec * 1e3, 2),
             "clips_per_sec": round(BATCH / sec, 1)}
        ),
        flush=True,
    )
    return sec


def build():
    from pytorchvideo_tpu.models import hub

    return hub.mvit_base_16x4()


if __name__ == "__main__":
    import pytorchvideo_tpu.layers.attention as A

    base = timed(build, "full")

    # 1) attention core -> near-free op that still CONSUMES k and v, so
    # XLA cannot dead-code-eliminate the k/v projections and pools
    # (returning bare q would over-attribute; see kernel microbench).
    import pytorchvideo_tpu.ops.pooled_attention as PA

    orig_sdpa = A.scaled_dot_product_attention
    orig_pooled = PA.pooled_attention

    def cheap(q, k, v, scale, residual_pool=False, **kw):
        keep = (
            jnp.mean(k, axis=2, keepdims=True)
            + jnp.mean(v, axis=2, keepdims=True)
        ) * jnp.asarray(1e-6, q.dtype)
        return q + keep

    PA.pooled_attention = cheap
    A.scaled_dot_product_attention = cheap
    no_attn = timed(build, "attention-core->cheap(kv kept)")
    # 1b) identity-on-q variant: ALSO removes k/v projections+pools via DCE
    PA.pooled_attention = lambda q, k, v, scale, residual_pool=False, **kw: q
    A.scaled_dot_product_attention = (
        lambda q, k, v, scale, residual_pool: q
    )
    no_attn_kv = timed(build, "attention+kvproj+kvpool->identity")
    PA.pooled_attention = orig_pooled
    A.scaled_dot_product_attention = orig_sdpa

    # 2) pool convs -> avg pool (same shapes, near-free). TokenPool is the
    # only conv3d user in layers.attention, so patch that factory.
    orig_conv3d = A.conv3d

    def fake_conv3d(c, kernel, stride, padding, groups=1, bias=False, name=None):
        return lambda grid: A.avg_pool3d(grid, kernel, stride, padding)

    A.conv3d = fake_conv3d
    no_poolconv = timed(build, "poolconv->avg")
    A.conv3d = orig_conv3d

    # 3) mlp -> single cheap linear? knock out fc1/fc2 via identity act:
    orig_mlp = A.Mlp.__call__

    def mlp_passthrough(self, x, train=False):
        import flax.linen as nn

        # keep one Dense so output dims still match
        return nn.Dense(self.out_features, name="fc2")(x)

    A.Mlp.__call__ = mlp_passthrough
    no_mlp = timed(build, "mlp->single-dense")
    A.Mlp.__call__ = orig_mlp

    print(
        json.dumps(
            {
                "attn_core_ms": round((base - no_attn) * 1e3, 2),
                "kvproj_pool_ms": round((no_attn - no_attn_kv) * 1e3, 2),
                "poolconv_ms": round((base - no_poolconv) * 1e3, 2),
                "mlp_extra_ms": round((base - no_mlp) * 1e3, 2),
                "base_ms": round(base * 1e3, 2),
            }
        ),
        flush=True,
    )
