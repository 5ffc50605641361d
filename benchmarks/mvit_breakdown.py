"""MViT-B 16x4 inference time breakdown by ablation (diagnostic, TPU).

Times the full model, then variants with one component knocked out
(monkeypatched to a cheap stand-in). The delta attributes time to the
component. Shapes change if pooling is removed, so pool ablation swaps
conv->avg (same output shape, near-zero cost) rather than removing it.

ROUND-2 STATUS (v5e, batch 16 bf16): 323 -> 367 clips/s (43.6 ms/batch)
via, in order: head-packed attention layout (+ lane-aligned concat-write
kernel, Pallas at every depth incl. the short late blocks), W-stride-
blocked patch embed (2.9 -> 1.7 ms), and cls-token/grid split threading
(~5 ms of slice+copy choreography removed). HLO-trace roofline of what
REMAINS (fori_loop graph, trace attribution; see /tmp-style scripts in
the repo history):

  GEMMs (qkv/proj/fc1/fc2 + patch conv)  ~15 ms at 45-90 TF/s each —
      individual GEMMs are at or near the achievable tile efficiency for
      their (L, 96-multiple) shapes; fc2 (1536->384, L 1569) hits 84 TF/s.
  Pallas attention kernels                ~6.5 ms; exact-shape micros run
      0.95/0.56/0.33/0.34 ms at 46-89 TF/s (kv fits VMEM; the kernel is
      MXU-bound at head_dim 96 -> 128-lane padding caps it at ~0.75x).
  Pool convs + fused neighbors            ~8.9 ms attributed, BUT the conv
      op standalone is 0.04-0.5 ms/shape; the bucket is mostly fused
      producer work (LN/GELU) plus the layout problem below.
  Layout copies                           ~11 ms. Root cause: XLA:TPU's
      grouped-conv layout assignment wants (C-minor, B-second) for the
      depthwise pool convs while Dense outputs and pallas_call operands
      are row-major {2,1,0}; XLA inserts {1,2,0}->{2,0,1} relayouts of the
      25k-token tensors around every early-block pool (3 x 0.62 ms at
      block 1 alone) plus the patch-conv input relayout (1.2 ms).

TOKEN-POOL KERNEL OUTCOME (late round 2): the Pallas depthwise token-pool
(ops/token_pool.py) does NOT lower on real hardware for strided pools —
Mosaic rejects vector.extract_strided_slice with stride > 1 — and where it
does lower (stride-1 q pools) it is a measured net e2e LOSS: same-session
v5e A/B at b16 gave 309.8 clips/s (Pallas stride-1 + window kv pools) vs
320.3 (all-XLA grouped conv) vs 320.2 (disjoint-window rewrite for the
kv pools, no grouped conv). Two conclusions: (a) XLA's fused stride-1
grouped conv already beats the VMEM-pad tap loop; (b) the disjoint-window
rewrite is exactly perf-neutral, i.e. the grouped-conv relayout copies at
the kv pools are NOT the recoverable ~few-ms this trace hoped — the
copies XLA still inserts around the strided reshape-take match what the
conv path paid. auto dispatch therefore stays on the XLA paths.

MEASUREMENT VARIANCE NOTE: those 320s were measured in a session where
the chip state ran globally ~13% below the numbers recorded above
(323->367 era); cross-session clips/s on this tunnel-attached chip moves
by +/-15%, so only same-session A/Bs are decision-grade.

Dead ends measured so far (do not re-try blindly):
  - optimization_barrier around pool convs: 367 -> 291 clips/s (the
    "slow" conv fusions contain real producer work).
  - 27-tap strided-slice multiply-add pooling: faults the TPU worker
    (XLA:TPU bug), and was 25x slower where it did run (pool_micro.py).
  - Pallas depthwise conv (ops/depthwise_conv.py): 2-3x slower than
    XLA's windowed scheduling at every measured shape.
  - PVT_POOLED_ATTENTION=xla end to end: 252 clips/s (fp32 softmax HBM
    traffic dwarfs the pallas boundary-layout cost).
  - Batch 32: 350 clips/s (b16 is the per-chip optimum).
The remaining structural fix is owning the whole block in one Pallas
kernel (GEMM+LN+pool+attention) so no XLA layout boundary exists —
a mega-kernel project, not an incremental swap.
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
