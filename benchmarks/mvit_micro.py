"""MViT optimization microbenchmarks (real TPU).

Quantifies the round-2 optimization candidates before surgery:
  1. whole-model mvit_base_16x4 clips/s at batch 16/32/64 (bf16 deploy form)
  2. separate q/k/v GEMMs vs one fused qkv GEMM at the real block shapes
  3. pooled-attention kernel: current padded wrapper vs cdiv-grid no-pad
  4. GELU exact (erf) vs tanh-approx at the MLP shapes

Run: python benchmarks/mvit_micro.py [--models-only]
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


def time_fn(fn, *args, n_small=1, n_big=9, trials=5):
    """Trip-count-differenced on-device timing (see bench.py notes)."""
    import time

    @jax.jit
    def loop(args, n):
        def body(i, carry):
            args, acc = carry
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            probe = sum(l.mean().astype(jnp.float32) for l in leaves)
            args = jax.tree_util.tree_map(
                lambda a: a + (probe * 1e-24).astype(a.dtype), args
            )
            return (args, acc + probe)

        _, acc = jax.lax.fori_loop(0, n, body, (args, jnp.float32(0)))
        return acc

    float(loop(args, n_small))
    float(loop(args, n_big))
    best_s = best_b = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(loop(args, n_small))
        best_s = min(best_s, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(loop(args, n_big))
        best_b = min(best_b, time.perf_counter() - t0)
    return (best_b - best_s) / (n_big - n_small)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def model_batch_sweep():
    from pytorchvideo_tpu.accelerate import fuse_bn_mvit
    from pytorchvideo_tpu.models import hub

    cpu = jax.devices("cpu")[0]
    device = jax.devices()[0]
    model = hub.mvit_base_16x4(head_num_classes=400)
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 224, 224, 3)), False
        )
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables,
        )
    variables = jax.device_put(variables, device)
    rng = np.random.default_rng(0)
    for batch in (16, 32, 64):
        x = jax.device_put(
            jnp.asarray(
                rng.uniform(-1, 1, (batch, 16, 224, 224, 3)), jnp.bfloat16
            ),
            device,
        )
        dt = time_fn(lambda v, x: model.apply(v, x, False), variables, x)
        emit(
            bench="mvit_16x4_batch_sweep",
            batch=batch,
            clips_per_sec=round(batch / dt, 1),
            ms_per_batch=round(dt * 1e3, 2),
        )
        del x


def qkv_fusion():
    device = jax.devices()[0]
    rng = np.random.default_rng(0)
    # (label, M, K): real MViT-B b16 block shapes (M = B * L)
    shapes = [
        ("d96_L25089", 16 * 25089, 96),
        ("d192_L6273", 16 * 6273, 192),
        ("d384_L1569", 16 * 1569, 384),
        ("d768_L393", 16 * 393, 768),
    ]
    for label, M, K in shapes:
        x = jax.device_put(
            jnp.asarray(rng.uniform(-1, 1, (M, K)), jnp.bfloat16), device
        )
        ws = [
            jax.device_put(
                jnp.asarray(rng.uniform(-1, 1, (K, K)), jnp.bfloat16), device
            )
            for _ in range(3)
        ]
        wf = jax.device_put(jnp.concatenate(ws, axis=1), device)

        def separate(x, w0, w1, w2):
            return x @ w0, x @ w1, x @ w2

        def fused(x, wf):
            y = x @ wf
            return y[:, :K], y[:, K : 2 * K], y[:, 2 * K :]

        def fused_concat(x, w0, w1, w2):
            y = x @ jnp.concatenate([w0, w1, w2], axis=1)
            return y[:, :K], y[:, K : 2 * K], y[:, 2 * K :]

        t_sep = time_fn(separate, x, *ws)
        t_fused = time_fn(fused, x, wf)
        t_fc = time_fn(fused_concat, x, *ws)
        emit(
            bench="qkv_fusion",
            shape=label,
            sep_ms=round(t_sep * 1e3, 3),
            fused_ms=round(t_fused * 1e3, 3),
            fused_concat_ms=round(t_fc * 1e3, 3),
            speedup=round(t_sep / t_fused, 2),
        )


def attention_padding():
    from pytorchvideo_tpu.ops.pooled_attention import (
        pooled_attention_pallas,
        pooled_attention_xla,
    )

    device = jax.devices()[0]
    rng = np.random.default_rng(0)
    # real depth shapes (B, H, Lq, c) with pooled Lk
    shapes = [
        ("d0", 16, 1, 25089, 96, 393),
        ("d1", 16, 2, 6273, 96, 393),
        ("d3", 16, 4, 1569, 96, 393),
        ("d14", 16, 8, 393, 96, 99),
    ]
    for label, B, H, Lq, c, Lk in shapes:
        q = jax.device_put(
            jnp.asarray(rng.uniform(-1, 1, (B, H, Lq, c)), jnp.bfloat16), device
        )
        k = jax.device_put(
            jnp.asarray(rng.uniform(-1, 1, (B, H, Lk, c)), jnp.bfloat16), device
        )
        v = jax.device_put(
            jnp.asarray(rng.uniform(-1, 1, (B, H, Lk, c)), jnp.bfloat16), device
        )
        tile = 512 if Lq >= 8192 else 256
        t_pallas = time_fn(
            lambda q, k, v: pooled_attention_pallas(
                q, k, v, c**-0.5, True, False, tile
            ),
            q,
            k,
            v,
        )
        t_xla = time_fn(
            lambda q, k, v: pooled_attention_xla(q, k, v, c**-0.5, True),
            q,
            k,
            v,
        )
        flops = 2 * B * H * Lq * Lk * c * 2
        emit(
            bench="attention",
            shape=label,
            pallas_ms=round(t_pallas * 1e3, 3),
            xla_ms=round(t_xla * 1e3, 3),
            pallas_tflops=round(flops / t_pallas / 1e12, 1),
        )


def _pallas_nopad(q, k, v, scale, residual, tile_q):
    """cdiv-grid variant: no materialized jnp.pad on Lq/Lk/c — Mosaic
    handles ragged block edges internally. Candidate replacement for the
    padded wrapper in ops/pooled_attention.py."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pytorchvideo_tpu.ops.pooled_attention import _attention_kernel

    B, H, Lq, c = q.shape
    Lk = k.shape[2]
    qf = q.reshape(B * H, Lq, c)
    kf = k.reshape(B * H, Lk, c)
    vf = v.reshape(B * H, Lk, c)
    grid = (B * H, pl.cdiv(Lq, tile_q))
    out = pl.pallas_call(
        functools.partial(
            _attention_kernel, scale=scale, lk_valid=Lk, residual=residual
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, c), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, c), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, c), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, c), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_q, c), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
    )(qf, kf, vf)
    return out.reshape(B, H, Lq, c)


def attention_nopad(n_big=33):
    from pytorchvideo_tpu.ops.pooled_attention import pooled_attention_pallas

    device = jax.devices()[0]
    rng = np.random.default_rng(0)
    shapes = [
        ("d0", 16, 1, 25089, 96, 393),
        ("d1", 16, 2, 6273, 96, 393),
        ("d3", 16, 4, 1569, 96, 393),
        ("d14", 16, 8, 393, 96, 99),
    ]
    for label, B, H, Lq, c, Lk in shapes:
        q = jax.device_put(
            jnp.asarray(rng.uniform(-1, 1, (B, H, Lq, c)), jnp.bfloat16), device
        )
        k = jax.device_put(
            jnp.asarray(rng.uniform(-1, 1, (B, H, Lk, c)), jnp.bfloat16), device
        )
        v = jax.device_put(
            jnp.asarray(rng.uniform(-1, 1, (B, H, Lk, c)), jnp.bfloat16), device
        )
        tile = 512 if Lq >= 8192 else 256
        # numerics check vs padded path first
        a = np.asarray(
            jax.jit(
                lambda q, k, v: pooled_attention_pallas(
                    q, k, v, c**-0.5, True, False, tile
                )
            )(q, k, v),
            np.float32,
        )
        b = np.asarray(
            jax.jit(lambda q, k, v: _pallas_nopad(q, k, v, c**-0.5, True, tile))(
                q, k, v
            ),
            np.float32,
        )
        err = float(np.abs(a - b).max())
        t_pad = time_fn(
            lambda q, k, v: pooled_attention_pallas(
                q, k, v, c**-0.5, True, False, tile
            ),
            q, k, v, n_big=n_big,
        )
        t_nopad = time_fn(
            lambda q, k, v: _pallas_nopad(q, k, v, c**-0.5, True, tile),
            q, k, v, n_big=n_big,
        )
        emit(
            bench="attention_nopad",
            shape=label,
            padded_ms=round(t_pad * 1e3, 3),
            nopad_ms=round(t_nopad * 1e3, 3),
            max_err=err,
        )


def gelu_flavors():
    device = jax.devices()[0]
    rng = np.random.default_rng(0)
    M, N = 16 * 1569, 1536  # d384 MLP hidden
    x = jax.device_put(
        jnp.asarray(rng.uniform(-1, 1, (M, N)), jnp.bfloat16), device
    )
    t_exact = time_fn(lambda x: jax.nn.gelu(x, approximate=False), x)
    t_tanh = time_fn(lambda x: jax.nn.gelu(x, approximate=True), x)
    emit(
        bench="gelu",
        exact_ms=round(t_exact * 1e3, 3),
        tanh_ms=round(t_tanh * 1e3, 3),
    )


if __name__ == "__main__":
    if "--models-only" in sys.argv:
        model_batch_sweep()
    elif "--nopad-only" in sys.argv:
        attention_nopad()
    else:
        model_batch_sweep()
        qkv_fusion()
        attention_padding()
        attention_nopad()
        gelu_flavors()
