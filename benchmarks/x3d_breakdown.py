"""Per-stage + per-op attribution for X3D-S (B128 bf16 deploy, real chip).

X3D-S is the bench headline (BASELINE.json config #2; bench.py "value").
It measures ~3,450 clips/s = 37 ms/batch-128 = 10.3 TF/s aggregate = 5.6%
of the chip's 183 TF/s bf16 — the lowest MFU of the model zoo. Like the
SlowFast fast pathway (docs/slowfast_roofline.md) the early stages have a
lane-hostile channel ladder (stem 24, stage dims 24/48/96/192 with 2.25x
inner 54/108/216/432 — reference x3d.py:539-738), so every C<128 tensor is
lane-padded (C=24 stores 5.3x its bytes in the (8,128)-tiled layout) and
every pointwise GEMM is lane-starved. This harness locates the time:

  stages mode  - the REAL model segments (stem, stage1..4, head) built
                 standalone via the model's own factories, timed at B128.
  default mode - per-op grid for the hottest stages: pointwise conv_a /
                 conv_c (plain vs PackedConv3d pack 2/4), the depthwise
                 conv_b, SE, swish, and lane-padding elementwise probes.

Run: python benchmarks/x3d_breakdown.py          # per-op grid
     python benchmarks/x3d_breakdown.py stages   # per-stage attribution
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

B = 128

# X3D-S geometry (create_x3d defaults, width 2.0 / depth 2.2, 13x160):
# stem -> (13,80,80,24); stages (depth, dim_in, dim_inner, dim_out, H_in):
STAGES = [
    ("stage1", 3, 24, 54, 24, 80),
    ("stage2", 5, 24, 108, 48, 40),
    ("stage3", 11, 48, 216, 96, 20),
    ("stage4", 7, 96, 432, 192, 10),
]


def _rand(shape, device, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    return jax.device_put(jnp.asarray(rng.uniform(-1, 1, shape), dtype), device)


def report(name, sec, gflop=None, gbytes=None):
    rec = {"op": name, "ms": round(sec * 1e3, 3)}
    if gflop:
        rec["tflops"] = round(gflop / sec / 1e3, 1)
    if gbytes:
        rec["gbps"] = round(gbytes / sec, 1)
    print(json.dumps(rec), flush=True)


def timed(name, fn, *args, iters=20, gflop=None, gbytes=None):
    from pytorchvideo_tpu.utils.profiling import time_jitted

    for it in (iters, iters * 8, iters * 32):
        try:
            report(name, time_jitted(fn, *args, iters=it), gflop, gbytes)
            return
        except RuntimeError:
            continue
        except Exception as e:
            print(json.dumps({"op": name, "error": str(e)[:200]}), flush=True)
            return
    print(json.dumps({"op": name, "error": "below noise floor"}), flush=True)


def _fold_bf16(m, in_shape, cpu):
    from pytorchvideo_tpu.accelerate import fold_conv_bn

    with jax.default_device(cpu):
        v = m.init(jax.random.PRNGKey(0), np.zeros((1,) + in_shape, np.float32))
        if "batch_stats" in v:
            v = fold_conv_bn(v)
        v = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), v)
    return v


def stages():
    """Time each real X3D-S segment standalone at B128 bf16 deploy form."""
    from pytorchvideo_tpu.models.x3d import (
        create_x3d_head,
        create_x3d_res_stage,
        create_x3d_stem,
    )

    device = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    stem = create_x3d_stem(in_channels=3, out_channels=24)
    x = _rand((B, 13, 160, 160, 3), device, seed=1)
    v = jax.device_put(_fold_bf16(stem, (13, 160, 160, 3), cpu), device)
    timed("stem", lambda a, v=v: stem.apply(v, a, False), x, iters=10)

    for name, depth, din, dinner, dout, h in STAGES:
        stage = create_x3d_res_stage(
            depth=depth, dim_in=din, dim_inner=dinner, dim_out=dout,
            conv_stride=(1, 2, 2),
        )
        in_shape = (13, h, h, din)
        x = _rand((B,) + in_shape, device, seed=hash(name) % 97)
        v = jax.device_put(_fold_bf16(stage, in_shape, cpu), device)
        timed(name, lambda a, v=v, s=stage: s.apply(v, a, False), x, iters=10)

    head = create_x3d_head(
        dim_in=192, dim_inner=432, dim_out=2048, num_classes=400,
        pool_kernel_size=(13, 5, 5),
    )
    x = _rand((B, 13, 5, 5, 192), device, seed=5)
    v = jax.device_put(_fold_bf16(head, (13, 5, 5, 192), cpu), device)
    timed("head", lambda a, v=v: head.apply(v, a, False), x, iters=10)


def knockout():
    """In-model attribution: rebuild each stage with one component knocked
    out (identity) and report the delta vs the full stage. Standalone per-op
    timings overstate ops that XLA brackets with relayouts in isolation
    (the mvit_breakdown.py lesson), so knockout deltas are the decision
    numbers."""
    import flax.linen as nn

    from pytorchvideo_tpu.layers.stochastic import swish  # noqa: F401
    from pytorchvideo_tpu.models import x3d as mx

    device = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    class _IdConv(nn.Module):
        """Parameter-free stand-in for a knocked-out conv: strides (so
        shapes downstream stay right) but no arithmetic."""

        stride: tuple = (1, 1, 1)
        features: int = 0

        @nn.compact
        def __call__(self, x):
            st, sh, sw = self.stride
            x = x[:, ::st, ::sh, ::sw, :]
            if self.features and x.shape[-1] != self.features:
                reps = -(-self.features // x.shape[-1])
                x = jnp.tile(x, (1,) * (x.ndim - 1) + (reps,))[
                    ..., : self.features
                ]
            return x

    def build_stage(depth, din, dinner, dout, variant):
        orig_bneck = mx.create_x3d_bottleneck_block

        def bneck(**kw):
            blk = orig_bneck(**kw)
            if variant == "no_dw":
                blk = blk.clone(
                    conv_b=_IdConv(stride=kw["conv_stride"], features=dinner)
                )
            elif variant == "no_pw":
                blk = blk.clone(
                    conv_a=_IdConv(features=dinner),
                    conv_c=_IdConv(features=dout),
                )
            elif variant == "no_se":
                blk = blk.clone(norm_b=blk.norm_b.clone(se=None))
            elif variant == "no_inner_elem":
                # knock out swish + SE (keep BN): the elementwise chain
                blk = blk.clone(
                    norm_b=blk.norm_b.clone(se=None), act_b=None
                )
            return blk

        return mx.create_x3d_res_stage(
            depth=depth, dim_in=din, dim_inner=dinner, dim_out=dout,
            conv_stride=(1, 2, 2), bottleneck=bneck,
        )

    for name, depth, din, dinner, dout, h in STAGES:
        if name == "stage4":
            continue  # 3.7 ms, lane-aligned; not worth the compile time
        in_shape = (13, h, h, din)
        x = _rand((B,) + in_shape, device, seed=hash(name) % 97)
        for variant in ("full", "no_dw", "no_pw", "no_se", "no_inner_elem"):
            stage = build_stage(depth, din, dinner, dout, variant)
            v = jax.device_put(_fold_bf16(stage, in_shape, cpu), device)
            timed(f"{name}_{variant}",
                  lambda a, v=v, s=stage: s.apply(v, a, False), x, iters=10)


def ab():
    """Whole-model X3D-S A/B: plain vs batch-packed (layers/batchpack.py)
    variants, ONE session, shared folded params (trees are identical), a
    bf16 output-parity check, then interleaved timing rounds. Per-op wins
    don't decide (relayout bracketing); this does.

    Run: python benchmarks/x3d_breakdown.py ab
    """
    from pytorchvideo_tpu.models import create_x3d
    from pytorchvideo_tpu.utils.profiling import time_jitted

    device = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    variants = [
        ("plain", 0, "input"),
        ("bpack2", 2, "input"),
        ("bpack2_late", 2, "late"),
        ("bpack4", 4, "input"),
    ]
    models = {}
    for name, bp, entry in variants:
        os.environ["PVT_X3D_BPACK_ENTRY"] = entry
        models[name] = create_x3d(
            input_clip_length=13, input_crop_size=160,
            model_num_class=400, batch_pack=bp,
        )
    os.environ.pop("PVT_X3D_BPACK_ENTRY", None)

    in_shape = (13, 160, 160, 3)
    v = jax.device_put(_fold_bf16(models["plain"], in_shape, cpu), device)
    x = _rand((B,) + in_shape, device, seed=7)

    # parity gate at the bench batch (bf16 reassociation tolerance)
    ref = np.asarray(
        jax.jit(lambda a: models["plain"].apply(v, a, False))(x[:8]),
        np.float32,
    )
    for name in models:
        if name == "plain":
            continue
        out = np.asarray(
            jax.jit(lambda a, m=models[name]: m.apply(v, a, False))(x[:8]),
            np.float32,
        )
        err = float(np.max(np.abs(out - ref)))
        print(json.dumps({"parity": name, "max_abs_err": round(err, 5)}),
              flush=True)

    rounds = {name: [] for name in models}
    for _ in range(3):
        for name, m in models.items():
            sec = time_jitted(
                lambda a, m=m: m.apply(v, a, False), x, iters=10
            )
            rounds[name].append(B / sec)
    for name, cps in rounds.items():
        print(json.dumps({
            "model": f"x3d_s_{name}", "batch": B,
            "clips_per_sec_per_chip": round(float(np.median(cps)), 1),
            "rounds": [round(c, 1) for c in cps],
        }), flush=True)


def ab_dw():
    """Whole-model A/B: plain vs DEPTHWISE-ONLY batch-packing (VERDICT r3
    item 3). The full batch-pack lost 3x because the packed pointwise convs
    lose more than the depthwise wins (see layers/batchpack.py). This
    variant packs LOCALLY around each depthwise chain only — conv_a/conv_c
    stay plain GEMMs, the pack lives inside conv_b (pack_input) and the
    unpack inside conv_c (unpack_input); built only for dim_inner<128
    blocks (stage-1's 54-channel inner, where the dw win 3.95->2.62 ms was
    measured). Tests whether two relayouts per block cost less than the
    ~1.3 ms/step dw + packed-elementwise win.

    Run: python benchmarks/x3d_breakdown.py ab_dw
    """
    import functools

    from pytorchvideo_tpu.models import create_x3d
    from pytorchvideo_tpu.models.x3d import create_x3d_bottleneck_block
    from pytorchvideo_tpu.utils.profiling import time_jitted

    device = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    models = {
        "plain": create_x3d(
            input_clip_length=13, input_crop_size=160, model_num_class=400
        ),
        "dw2": create_x3d(
            input_clip_length=13, input_crop_size=160, model_num_class=400,
            bottleneck=functools.partial(
                create_x3d_bottleneck_block,
                batch_pack=2, batch_pack_mode="dw",
            ),
        ),
        "dw4": create_x3d(
            input_clip_length=13, input_crop_size=160, model_num_class=400,
            bottleneck=functools.partial(
                create_x3d_bottleneck_block,
                batch_pack=4, batch_pack_mode="dw",
            ),
        ),
    }
    in_shape = (13, 160, 160, 3)
    v = jax.device_put(_fold_bf16(models["plain"], in_shape, cpu), device)
    x = _rand((B,) + in_shape, device, seed=7)

    ref = np.asarray(
        jax.jit(lambda a: models["plain"].apply(v, a, False))(x[:8]),
        np.float32,
    )
    for name, m in models.items():
        if name == "plain":
            continue
        out = np.asarray(
            jax.jit(lambda a, m=m: m.apply(v, a, False))(x[:8]), np.float32
        )
        err = float(np.max(np.abs(out - ref)))
        print(json.dumps({"parity": name, "max_abs_err": round(err, 5)}),
              flush=True)

    rounds = {name: [] for name in models}
    for _ in range(3):
        for name, m in models.items():
            sec = time_jitted(
                lambda a, m=m: m.apply(v, a, False), x, iters=10
            )
            rounds[name].append(B / sec)
    for name, cps in rounds.items():
        print(json.dumps({
            "model": f"x3d_s_{name}", "batch": B,
            "clips_per_sec_per_chip": round(float(np.median(cps)), 1),
            "rounds": [round(c, 1) for c in cps],
        }), flush=True)


def main():
    from pytorchvideo_tpu.layers.packed import PackedConv3d, pack_hw
    from pytorchvideo_tpu.layers.squeeze_excitation import SqueezeExcitation
    from pytorchvideo_tpu.layers.stochastic import swish

    device = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    # ---- lane-padding elementwise probes: ms vs unpadded-bytes roofline ----
    for name, shape in [
        ("relu_c24_80", (B, 13, 80, 80, 24)),
        ("relu_c54_40", (B, 13, 40, 40, 54)),
        ("relu_c54_80", (B, 13, 80, 80, 54)),
        ("relu_c108_20", (B, 13, 20, 20, 108)),
        ("relu_c216_10", (B, 13, 10, 10, 216)),
        ("relu_c96_pack2", (B, 13, 40, 40, 96)),  # 24ch packed 2x2
    ]:
        x = _rand(shape, device)
        n = float(np.prod(shape))
        timed(name, lambda a: jnp.maximum(a, 0), x, iters=20,
              gbytes=2 * n * 2 / 1e9)

    # swish + SE at the two hottest inner-channel shapes
    for name, shape in [
        ("swish_c54_40", (B, 13, 40, 40, 54)),
        ("swish_c108_20", (B, 13, 20, 20, 108)),
    ]:
        x = _rand(shape, device)
        timed(name, lambda a: swish(a), x, iters=20)

    for name, shape, red in [
        ("se_c54_40", (B, 13, 40, 40, 54), 8),
        ("se_c108_20", (B, 13, 20, 20, 108), 8),
    ]:
        se = SqueezeExcitation(num_channels_reduced=red)
        x = _rand(shape, device)
        v = jax.device_put(_fold_bf16(se, shape[1:], cpu), device)
        timed(name, lambda a, v=v, m=se: m.apply(v, a), x, iters=20)

    # ---- conv grid: (name, in_shape(THWC), cout, kernel, stride, groups) ----
    convs = [
        # stage1 steady block
        ("s1_conv_a", (13, 40, 40, 24), 54, (1, 1, 1), (1, 1, 1), 1),
        ("s1_conv_b_dw", (13, 40, 40, 54), 54, (3, 3, 3), (1, 1, 1), 54),
        ("s1_conv_c", (13, 40, 40, 54), 24, (1, 1, 1), (1, 1, 1), 1),
        # stage1 first block (80^2 input, stride-2 depthwise)
        ("s1b1_conv_a_80", (13, 80, 80, 24), 54, (1, 1, 1), (1, 1, 1), 1),
        ("s1b1_conv_b_dw_s2", (13, 80, 80, 54), 54, (3, 3, 3), (1, 2, 2), 54),
        # stage2 steady block
        ("s2_conv_a", (13, 20, 20, 48), 108, (1, 1, 1), (1, 1, 1), 1),
        ("s2_conv_b_dw", (13, 20, 20, 108), 108, (3, 3, 3), (1, 1, 1), 108),
        ("s2_conv_c", (13, 20, 20, 108), 48, (1, 1, 1), (1, 1, 1), 1),
        # stage3 steady block (216 inner: first lane-aligned-ish stage)
        ("s3_conv_a", (13, 10, 10, 96), 216, (1, 1, 1), (1, 1, 1), 1),
        ("s3_conv_b_dw", (13, 10, 10, 216), 216, (3, 3, 3), (1, 1, 1), 216),
        ("s3_conv_c", (13, 10, 10, 216), 96, (1, 1, 1), (1, 1, 1), 1),
        # stem convs
        ("stem_conv_t_dw", (13, 80, 80, 24), 24, (5, 1, 1), (1, 1, 1), 24),
    ]
    for name, in_shape, cout, k, s, groups in convs:
        t, h, w_, cin = in_shape
        x = _rand((B,) + in_shape, device)
        pad = tuple(kk // 2 for kk in k)
        out_sp = [
            (d + 2 * p - kk) // ss + 1
            for d, kk, ss, p in zip((t, h, w_), k, s, pad)
        ]
        gflop = 2 * B * np.prod(out_sp) * cout * (cin // groups) * np.prod(k) / 1e9

        rngk = np.random.default_rng(1)
        wk = jax.device_put(
            jnp.asarray(
                rngk.standard_normal(k + (cin // groups, cout)) * 0.05,
                jnp.bfloat16,
            ),
            device,
        )

        def plain(a, wk=wk, k=k, s=s, pad=pad, groups=groups):
            return jax.lax.conv_general_dilated(
                a, wk, window_strides=s,
                padding=[(p, p) for p in pad],
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
                feature_group_count=groups,
            )

        timed(name + "_plain", plain, x, iters=20, gflop=gflop)

        if groups == 1:
            for packn in (2, 4):
                if h % packn or w_ % packn:
                    continue
                m = PackedConv3d(
                    features=cout, kernel_size=k, in_channels=cin,
                    pack=packn, strides=s,
                    padding=pad, use_bias=False,
                )
                with jax.default_device(cpu):
                    variables = jax.tree_util.tree_map(
                        lambda a: a.astype(jnp.bfloat16),
                        m.init(jax.random.PRNGKey(0), np.zeros((1,) + in_shape)),
                    )
                variables = jax.device_put(variables, device)
                xp = pack_hw(x, packn, packn)
                timed(f"{name}_pack{packn}",
                      lambda a, v=variables, m=m: m.apply(v, a), xp,
                      iters=20, gflop=gflop)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "stages":
        stages()
    elif len(sys.argv) > 1 and sys.argv[1] == "knockout":
        knockout()
    elif len(sys.argv) > 1 and sys.argv[1] == "ab_dw":
        ab_dw()
    elif len(sys.argv) > 1 and sys.argv[1] == "ab":
        ab()
    else:
        main()
