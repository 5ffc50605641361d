"""SlowFast-R50 8x8 inference time breakdown by pathway ablation (TPU).

SlowFast-R50 at B64 bf16 runs ~496 clips/s (65.71 GF/clip => ~32.6 TF/s,
~18% of the chip's measured 183 TF/s bf16) while Slow-R50 alone hits ~46%.
The fast pathway carries only ~1/5 of the FLOPs (65.71 - 54.52 ~= 11 GF)
but the earlier slow-only-chained measurement (1095 clips/s) implies it
costs as much wall time as the slow pathway: tiny channel counts (stem 8,
stage outs 32/64/128/256) on 128-lane hardware.

Method: clone the Net with one component swapped for a cheap stand-in of
identical output shape (strided slice + broadcast so it stays
data-dependent and can't be DCE'd/hoisted), re-init, BN-fold, time. The
delta vs the full model attributes wall time to the ablated component.
Stand-ins are not free, so deltas are lower bounds.

Ablations:
  full          the real model
  fast_ablated  fast-pathway stem+stages replaced (fusion convs kept)
  slow_ablated  slow-pathway stem+stages replaced
  fuse_ablated  FuseFastToSlow replaced by shape-matched cheap concat
  head_ablated  PoolConcatPathway+ResNetBasicHead replaced by a
                full-reduction stand-in (direct head-bucket measurement)
  both_ablated  BOTH pathways replaced, fusion+head real: measures the
                stand-in floor itself

Round-4 session (v5e, B64, bf16 deploy, shipped packed default): full
113.08 ms (566.0 clips/s) | fast_ablated 73.80 | slow_ablated 73.18 |
head_ablated 112.97 | both_ablated 33.08 | fuse_ablated 112.10 (vs a
same-session full re-read of 113.01: fusion ~0.9 ms). The round-2 "~18-25 ms
head/pool residual" was an artifact: the head bucket measures 0.12 ms
DIRECTLY, and both_ablated shows the CheapStage stand-ins themselves
cost ~33 ms (they materialize full-size lane-padded stage outputs), so
summing single-ablation deltas double-counts the stand-in floor. See
docs/slowfast_roofline.md "Round-4 resolution".

Recorded run (v5e, B64, bf16 deploy form, 2026-08-18 session):
  full 116.57 ms/batch (549.0 clips/s) | fast_ablated 64.35 |
  slow_ablated 77.60 | fuse_ablated 119.49 (fusion ~free; -2.92 is
  stand-in noise). Attribution: fast 52.22 ms, slow 38.97 ms,
  residual (head/pool/stand-in overlap) ~25.4 ms.
  => fast pathway: 11.19 GF/clip over 52.22 ms = 13.7 TF/s (~7% of the
  183 TF/s measured bf16 peak) vs slow pathway 54.52 GF over 38.97 ms
  = 89.5 TF/s (49%). The fast pathway's channel ladder (8/32/64/128/256)
  sits under the 128-lane tile on most convs: output channels are
  lane-padded (C=8 stores 16x its bytes) and the early stages' implicit
  GEMMs are N-lane-starved (C=8/32 fill <=1/4 of the lanes; C=64 fills
  half; only the res5 ladder reaches full width). The structural fix is
  the exact packed-channel (space-to-depth) rewrite in layers/packed.py —
  per-stage results in benchmarks/fastpath_micro.py (stages mode) and the
  whole-model A/B in benchmarks/packed_micro.py.

Run: python benchmarks/slowfast_breakdown.py [batch]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
if "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64


class CheapStage(nn.Module):
    """Shape-matched, data-dependent stand-in for a pathway stage.

    Output (B, T//ts, H//ss, W//ss, out_channels): strided slice + single
    learned 1-channel scale + broadcast. Costs ~nothing but cannot be
    constant-folded (depends on the input tensor).
    """

    out_channels: int
    spatial_stride: int = 1
    temporal_stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        s, t = self.spatial_stride, self.temporal_stride
        y = x[:, ::t, ::s, ::s, :1]
        scale = self.param("scale", nn.initializers.ones, (1,))
        y = y * scale
        return jnp.broadcast_to(
            y, y.shape[:-1] + (self.out_channels,)
        ).astype(x.dtype)


class CheapFuse(nn.Module):
    """Stand-in for FuseFastToSlow: concat a cheap projection of fast."""

    out_channels: int
    temporal_stride: int = 4

    @nn.compact
    def __call__(self, x: List, train: bool = False):
        x_s, x_f = x[0], x[1]
        y = x_f[:, :: self.temporal_stride, :, :, :1]
        # hub default ships the fast pathway packed (pathway_packs=(1,2)):
        # fast runs at (H/p, W/p, p^2*C) — repeat the 1-channel slice back
        # up to slow's spatial grid so the stand-in stays shape-matched
        if y.shape[2] != x_s.shape[2]:
            p = x_s.shape[2] // y.shape[2]
            y = jnp.repeat(jnp.repeat(y, p, axis=2), p, axis=3)
        scale = self.param("scale", nn.initializers.ones, (1,))
        y = jnp.broadcast_to(
            y * scale, y.shape[:-1] + (self.out_channels,)
        ).astype(x_f.dtype)
        return [jnp.concatenate([x_s, y], axis=-1), x_f]


class CheapLogits(nn.Module):
    """Stand-in for PoolConcatPathway + head: [slow, fast] -> (B, classes),
    data-dependent (slice + learned scale + broadcast)."""

    num_classes: int = 400

    @nn.compact
    def __call__(self, x: List, train: bool = False):
        # depend on EVERY ELEMENT of EVERY pathway: a slice would let XLA
        # narrow the final-stage convs (channel/spatial slice sinking) and
        # under-time the trunk, overstating the inferred head bucket. A
        # full mean costs one HBM read of each pathway (~0.2 ms at B64),
        # which the real head's pools also pay — comparable floor.
        y = jnp.mean(x[0].astype(jnp.float32), axis=(1, 2, 3, 4), keepdims=False)
        for p in x[1:]:
            y = y + jnp.mean(p.astype(jnp.float32), axis=(1, 2, 3, 4))
        scale = self.param("scale", nn.initializers.ones, (1,))
        return jnp.broadcast_to(
            (y * scale)[:, None], (y.shape[0], self.num_classes)
        ).astype(x[0].dtype)


def build_variant(which: str):
    from pytorchvideo_tpu.models import hub

    model = hub.slowfast_r50(model_num_class=400)
    if which == "full":
        return model

    # SlowFast-R50 8x8 per-stage geometry (channels-last THWC).
    # stage outs (slow, fast): stem (64, 8); res2 (256, 32); res3 (512, 64);
    # res4 (1024, 128); res5 (2048, 256). Fusion adds 2*fast onto slow.
    fast_outs = [8, 32, 64, 128, 256]
    slow_outs = [64, 256, 512, 1024, 2048]
    spatial = [2 * 2, 1, 2, 2, 2]  # stem conv+pool, then stage strides
    fuse_outs = [16, 64, 128, 256]  # 2 * fast_out for stages 0..3

    blocks = list(model.blocks)
    if which == "head_ablated":
        # blocks 5 (PoolConcatPathway) + 6 (ResNetBasicHead) -> stand-in:
        # the direct measurement of the head/pool bucket (VERDICT r3
        # item 7) instead of inferring it as the ablation residual
        return model.clone(blocks=tuple(blocks[:5]) + (CheapLogits(),))
    for i in range(5):  # stem + 4 res stages carry pathways
        mpw = blocks[i]
        sub = list(mpw.multipathway_blocks)
        fusion = mpw.multipathway_fusion
        if which == "fast_ablated":
            sub[1] = CheapStage(
                out_channels=fast_outs[i], spatial_stride=spatial[i]
            )
        elif which == "both_ablated":
            # stand-in floor probe: both pathways cheap, fusion+head real
            sub[0] = CheapStage(
                out_channels=slow_outs[i], spatial_stride=spatial[i]
            )
            sub[1] = CheapStage(
                out_channels=fast_outs[i], spatial_stride=spatial[i]
            )
        elif which == "slow_ablated":
            sub[0] = CheapStage(
                out_channels=slow_outs[i], spatial_stride=spatial[i]
            )
        elif which == "fuse_ablated" and fusion is not None:
            fusion = CheapFuse(out_channels=fuse_outs[i])
        blocks[i] = mpw.clone(
            multipathway_blocks=tuple(sub), multipathway_fusion=fusion
        )
    return model.clone(blocks=tuple(blocks))


def time_variant(which: str) -> Tuple[float, float]:
    from pytorchvideo_tpu.accelerate import fold_conv_bn
    from pytorchvideo_tpu.utils.profiling import time_jitted

    model = build_variant(which)
    cpu = jax.devices("cpu")[0]
    device = jax.devices()[0]
    rng = np.random.default_rng(0)
    example = [
        jnp.zeros((1, 8, 224, 224, 3)),
        jnp.zeros((1, 32, 224, 224, 3)),
    ]
    with jax.default_device(cpu):
        variables = model.init(jax.random.PRNGKey(0), example, False)
        if "batch_stats" in variables:
            variables = fold_conv_bn(variables)
        variables = {
            "params": jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), variables["params"]
            ),
            **{k: v for k, v in variables.items() if k != "params"},
        }
    variables = jax.device_put(variables, device)
    # generate the ~770 MB of inputs ON DEVICE: host->device transfer of
    # B64 224^2 tensors through the axon tunnel was measured to stall for
    # tens of minutes in degraded sessions (round-4), and the values only
    # need to be well-scaled noise
    key = jax.random.PRNGKey(int(rng.integers(1 << 31)))
    gen = jax.jit(
        lambda k: [
            jax.random.uniform(
                k, (BATCH, 8, 224, 224, 3), jnp.bfloat16, -1, 1
            ),
            jax.random.uniform(
                jax.random.fold_in(k, 1),
                (BATCH, 32, 224, 224, 3),
                jnp.bfloat16,
                -1,
                1,
            ),
        ]
    )
    x = jax.block_until_ready(gen(key))

    def fn(slow, fast):
        return model.apply(variables, [slow, fast], False)

    sec = time_jitted(fn, x[0], x[1], iters=10)
    return sec, BATCH / sec


def main():
    results = {}
    for which in [
        "full",
        "fast_ablated",
        "slow_ablated",
        "fuse_ablated",
        "head_ablated",
        "both_ablated",
    ]:
        try:
            sec, cps = time_variant(which)
            results[which] = sec
            print(
                json.dumps(
                    {
                        "variant": which,
                        "batch": BATCH,
                        "ms_per_batch": round(sec * 1e3, 2),
                        "clips_per_sec": round(cps, 1),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # keep going; partial data still useful
            print(json.dumps({"variant": which, "error": str(e)}), flush=True)
    if "full" in results:
        full = results["full"]
        attrib = {
            k.replace("_ablated", ""): round((full - v) * 1e3, 2)
            for k, v in results.items()
            if k != "full"
        }
        print(
            json.dumps({"attribution_ms_per_batch": attrib, "full_ms": round(full * 1e3, 2)}),
            flush=True,
        )


if __name__ == "__main__":
    main()
