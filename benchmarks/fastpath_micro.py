"""Per-op attribution for the SlowFast fast pathway (B64 bf16, real chip).

The pathway ablation (slowfast_breakdown.py) says the fast pathway costs
~52 ms/batch at 7% MFU; the packed-channel rewrite (layers/packed.py)
recovered only ~2% e2e. This harness times the individual ops and stages
to find where the 52 ms actually sits:

  relu_*        elementwise pass  -> measures the tensor's PHYSICAL bytes
                (lane-padding probe: a C=8 (B,T,H,W,C) pass that times 16x
                its unpadded roofline is stored lane-padded)
  conv*_plain   each res2 conv as XLA conv_general_dilated
  conv*_pack2/4 the same op through PackedConv3d
  stage_*       whole res stages, plain vs packed
  stem          fast stem conv k(5,7,7) s(1,2,2) + maxpool

Run: python benchmarks/fastpath_micro.py            # per-op grid
     python benchmarks/fastpath_micro.py stages     # per-stage attribution

The `stages` mode builds each REAL fast-pathway segment standalone (stem,
res2..res5 via create_res_stage with the same packed factories the model
uses, the 4 fusion convs, and the pack transition) and times each at pack
caps 1/2/4 with the input packed exactly as the pathway would deliver it —
the attribution harness for whole-model A/B deltas that per-op timings
can't explain.
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

B = 64


def _rand(shape, device, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    return jax.device_put(
        jnp.asarray(rng.uniform(-1, 1, shape), dtype), device
    )


def report(name, sec, gflop=None, gbytes=None):
    rec = {"op": name, "ms": round(sec * 1e3, 3)}
    if gflop:
        rec["tflops"] = round(gflop / sec / 1e3, 1)
    if gbytes:
        rec["gbps"] = round(gbytes / sec, 1)
    print(json.dumps(rec), flush=True)


def timed(name, fn, *args, iters=20, gflop=None, gbytes=None):
    """time_jitted with noise-floor escalation; one failure must not kill
    the whole grid."""
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


def main():
    from pytorchvideo_tpu.layers.packed import PackedConv3d, pack_hw

    device = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    # ---- elementwise layout probes (physical-bytes detector) ----
    for name, shape in [
        ("relu_c8_56", (B, 32, 56, 56, 8)),
        ("relu_c32_56", (B, 32, 56, 56, 32)),
        ("relu_c8_packed32", (B, 32, 28, 28, 32)),
        ("relu_c128_14", (B, 32, 14, 14, 128)),
        ("relu_c2048_slow", (B, 8, 7, 7, 2048)),
    ]:
        x = _rand(shape, device)
        n = float(np.prod(shape))
        timed(name, lambda a: jnp.maximum(a, 0), x, iters=20,
              gbytes=2 * n * 2 / 1e9)  # read+write bf16

    # ---- res2 convs, plain vs packed ----
    convs = [
        # name, (T,H,W,Cin), Cout, kernel, stride, pad
        ("res2_conv_a", (32, 56, 56, 8), 8, (3, 1, 1), (1, 1, 1), (1, 0, 0)),
        ("res2_conv_b", (32, 56, 56, 8), 8, (1, 3, 3), (1, 1, 1), (0, 1, 1)),
        ("res2_conv_c", (32, 56, 56, 8), 32, (1, 1, 1), (1, 1, 1), (0, 0, 0)),
        ("res2_skip", (32, 56, 56, 8), 32, (1, 1, 1), (1, 1, 1), (0, 0, 0)),
        ("res3_conv_b_s2", (32, 56, 56, 16), 16, (1, 3, 3), (1, 2, 2), (0, 1, 1)),
        ("res4_conv_b", (32, 14, 14, 32), 32, (1, 3, 3), (1, 1, 1), (0, 1, 1)),
    ]
    for name, in_shape, cout, k, s, pad in convs:
        t, h, w_, cin = in_shape
        x = _rand((B,) + in_shape, device)
        out_sp = [
            (d + 2 * p - kk) // ss + 1
            for d, kk, ss, p in zip((t, h, w_), k, s, pad)
        ]
        gflop = (
            2 * B * np.prod(out_sp) * cout * cin * np.prod(k) / 1e9
        )

        rngk = np.random.default_rng(1)
        wk = jax.device_put(
            jnp.asarray(
                rngk.standard_normal(k + (cin, cout)) * 0.05, jnp.bfloat16
            ),
            device,
        )

        def plain(a, wk=wk, k=k, s=s, pad=pad):
            return jax.lax.conv_general_dilated(
                a, wk, window_strides=s,
                padding=[(p, p) for p in pad],
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            )

        timed(name + "_plain", plain, x, iters=20, gflop=gflop)

        for packn in (2, 4):
            m = PackedConv3d(
                features=cout, kernel_size=k, in_channels=cin,
                pack=packn, strides=s, padding=pad, use_bias=False,
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

    # ---- fast stem ----
    x = _rand((B, 32, 224, 224, 3), device)
    rngk = np.random.default_rng(2)
    wk = jax.device_put(
        jnp.asarray(rngk.standard_normal((5, 7, 7, 3, 8)) * 0.05, jnp.bfloat16),
        device,
    )

    def stem(a):
        import flax.linen as nn

        y = jax.lax.conv_general_dilated(
            a, wk, window_strides=(1, 2, 2),
            padding=[(2, 2), (3, 3), (3, 3)],
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        )
        return nn.max_pool(
            y, (1, 3, 3), strides=(1, 2, 2),
            padding=[(0, 0), (1, 1), (1, 1)],
        )

    timed("fast_stem_conv_pool", stem, x, iters=10,
          gflop=2 * B * 32 * 112 * 112 * 8 * 3 * 5 * 7 * 7 / 1e9)


def _fold_bf16(m, in_shape, cpu):
    import jax

    from pytorchvideo_tpu.accelerate import fold_conv_bn

    with jax.default_device(cpu):
        v = m.init(jax.random.PRNGKey(0), np.zeros((1,) + in_shape, np.float32))
        if "batch_stats" in v:
            v = fold_conv_bn(v)
        v = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), v)
    return v


def stages():
    """Per-stage fast-pathway attribution at pack caps 1/2/4 (B64 bf16)."""
    import flax.linen as nn

    from pytorchvideo_tpu.layers.common import Conv3d
    from pytorchvideo_tpu.layers.norms import BatchNorm
    from pytorchvideo_tpu.layers.packed import (
        pack_hw,
        packed_conv_factory,
        packed_norm,
    )
    from pytorchvideo_tpu.models.resnet import (
        create_bottleneck_block,
        create_res_stage,
    )
    from pytorchvideo_tpu.layers.pooling import MaxPool3d
    from pytorchvideo_tpu.models.stem import create_res_basic_stem

    device = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    # (name, dim_in, dim_inner, dim_out, depth, spatial_stride, H_in)
    SPECS = [
        ("res2", 8, 8, 32, 3, 1, 56),
        ("res3", 32, 16, 64, 4, 2, 56),
        ("res4", 64, 32, 128, 6, 2, 28),
        ("res5", 128, 64, 256, 3, 2, 14),
    ]

    for cap in (1, 2, 4):
        conv_f = packed_conv_factory(cap) if cap > 1 else Conv3d
        norm_f = packed_norm(BatchNorm) if cap > 1 else BatchNorm

        # stem (always unpacked input) + the pack transition on its output
        stem = create_res_basic_stem(
            in_channels=3, out_channels=8,
            conv_kernel_size=(5, 7, 7), conv_stride=(1, 2, 2),
            conv_padding=(2, 3, 3),
            pool=MaxPool3d, pool_kernel_size=(1, 3, 3),
            pool_stride=(1, 2, 2), pool_padding=(0, 1, 1),
            norm=BatchNorm, activation=jax.nn.relu,
        )
        if cap == 1:
            x = _rand((B, 32, 224, 224, 3), device, seed=7)
            v = jax.device_put(_fold_bf16(stem, (32, 224, 224, 3), cpu), device)
            timed("cap1_stem", lambda a, v=v: stem.apply(v, a, False), x,
                  iters=10)
        else:
            xs = _rand((B, 32, 56, 56, 8), device, seed=8)
            timed(f"cap{cap}_pack_transition",
                  lambda a, c=cap: pack_hw(a, c, c), xs, iters=20)

        # res stages, input packed as the pathway delivers it
        in_pack = cap
        for name, din, dinner, dout, depth, sp, h in SPECS:
            stage = create_res_stage(
                depth=depth, dim_in=din, dim_inner=dinner, dim_out=dout,
                bottleneck=create_bottleneck_block,
                conv_a_kernel_size=(3, 1, 1), conv_a_stride=(1, 1, 1),
                conv_a_padding=(1, 0, 0),
                conv_b_kernel_size=(1, 3, 3), conv_b_stride=(1, sp, sp),
                conv_b_padding=(0, 1, 1),
                conv_a=conv_f, conv_b=conv_f, conv_c=conv_f,
                conv_skip=conv_f, norm=norm_f, activation=nn.relu,
            )
            p = in_pack
            while p > 1 and h % p:
                p //= 2
            shape = (32, h // p, h // p, p * p * din)
            x = _rand((B,) + shape, device, seed=hash(name) % 97)
            v = jax.device_put(_fold_bf16(stage, shape, cpu), device)
            timed(f"cap{cap}_{name}",
                  lambda a, v=v, s=stage: s.apply(v, a, False), x, iters=10)
            # output pack of this stage (stride boundary may shrink it)
            h_out = h // sp
            in_pack = next(
                (q for q in (p, p // 2, p // 4, 1)
                 if q >= 1 and (q * sp) % p == 0 and h_out % max(q, 1) == 0),
                1,
            ) if p > 1 else cap

        # fusion convs (packed in, unpacked out)
        fuse_f = (
            packed_conv_factory(cap, unpack_output=True) if cap > 1 else Conv3d
        )
        for name, c, h in [
            ("fuse_stem", 8, 56), ("fuse_res2", 32, 56),
            ("fuse_res3", 64, 28), ("fuse_res4", 128, 14),
        ]:
            m = fuse_f(
                in_channels=c, out_channels=2 * c, kernel_size=(7, 1, 1),
                stride=(4, 1, 1), padding=(3, 0, 0), bias=False,
            )
            p = cap
            while p > 1 and h % p:
                p //= 2
            shape = (32, h // p, h // p, p * p * c)
            x = _rand((B,) + shape, device, seed=hash(name) % 89)
            v = jax.device_put(_fold_bf16(m, shape, cpu), device)
            timed(f"cap{cap}_{name}",
                  lambda a, v=v, m=m: m.apply(v, a), x, iters=10)


def wstem():
    """Sweep WPackedConv3d out_block/in_block on the stem convs (B64 bf16).

    Baselines: the shipping WBlockedConv stem conv and the raw XLA conv.
    Cases: SlowFast fast stem k(5,7,7)s(1,2,2) 3->8 @224 (N=8 lanes, the
    27.5 ms item from `stages`), slow stem k(1,7,7) 3->64 @224 T8, X3D-S
    stem conv_xy k(1,3,3) 3->24 @160 T13, and the fast stem's maxpool.
    """
    import flax.linen as nn

    from pytorchvideo_tpu.layers.common import WBlockedConv
    from pytorchvideo_tpu.layers.packed import WPackedConv3d

    device = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    CASES = [
        ("fast_stem", (32, 224, 224, 3), 8, (5, 7, 7), (1, 2, 2), (2, 3, 3),
         (8, 16, 32)),
        ("slow_stem", (8, 224, 224, 3), 64, (1, 7, 7), (1, 2, 2), (0, 3, 3),
         (2, 4)),
        ("x3d_stem_xy", (13, 160, 160, 3), 24, (1, 3, 3), (1, 2, 2),
         (0, 1, 1), (2, 4, 8)),
    ]
    for name, in_shape, F, k, s, pad, qs in CASES:
        x = _rand((B,) + in_shape, device, seed=3)
        t, h, w_, cin = in_shape
        out_sp = [
            (d + 2 * p - kk) // ss + 1
            for d, kk, ss, p in zip((t, h, w_), k, s, pad)
        ]
        gflop = 2 * B * np.prod(out_sp) * F * cin * np.prod(k) / 1e9

        m0 = WBlockedConv(features=F, kernel_size=k, strides=s,
                          padding=tuple((p, p) for p in pad), use_bias=False)
        v0 = jax.device_put(_fold_bf16(m0, in_shape, cpu), device)
        timed(f"{name}_wblocked", lambda a, v=v0, m=m0: m.apply(v, a), x,
              iters=10, gflop=gflop)

        for q in qs:
            for b_in in (1, 2, 4):
                if (q * s[2]) % b_in:
                    continue
                m = WPackedConv3d(
                    features=F, kernel_size=k, out_block=q, in_block=b_in,
                    strides=s, padding=pad, use_bias=False,
                )
                v = jax.device_put(_fold_bf16(m, in_shape, cpu), device)
                timed(f"{name}_q{q}_b{b_in}",
                      lambda a, v=v, m=m: m.apply(v, a), x,
                      iters=10, gflop=gflop)

    # the fast stem's maxpool k(1,3,3) s(1,2,2) on the C=8 conv output
    xp = _rand((B, 32, 112, 112, 8), device, seed=4)
    timed("fast_stem_maxpool",
          lambda a: nn.max_pool(a, (1, 3, 3), strides=(1, 2, 2),
                                padding=[(0, 0), (1, 1), (1, 1)]),
          xp, iters=10, gbytes=(2 * B * 32 * 112 * 112 * 8 * 2) / 1e9)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "stages":
        stages()
    elif len(sys.argv) > 1 and sys.argv[1] == "wstem":
        wstem()
    else:
        main()
