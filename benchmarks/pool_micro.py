"""Depthwise token-pool formulations (real TPU).

Measured findings (v5e, round 2):
  - XLA grouped depthwise conv3d at the hot d3 kv shape
    ((64, 8, 14, 14, 96), k 3x3x3, s (1,2,2)) runs in 0.05 ms — the k/v
    pool chain is NOT a bottleneck. Round-1's ablation attributed ~19 ms
    to it because the ablation swapped conv -> reduce_window avg pool as a
    "near-zero" stand-in, but overlapping-window reduce_window at that
    shape takes ~9.9 ms (~200x the conv): the attribution measured the
    stand-in, not the component.
  - The 27-tap strided-slice multiply-add reformulation is ~25x slower
    than the conv AND triggers a TPU-worker kernel fault at the stride-4
    d1 shape, so it is excluded from the default run (--with-madd to
    include it at your own risk).

Run: python benchmarks/pool_micro.py [--with-madd]
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

from mvit_micro import time_fn  # noqa: E402


def out_size(n, k, s, p):
    return (n + 2 * p - k) // s + 1


def depthwise_pool_madd(grid, w, stride, padding):
    """Depthwise conv3d as 27 strided-slice multiply-adds.

    grid: (B, T, H, W, c); w: (kt, kh, kw, c). Equivalent to
    conv_general_dilated with feature_group_count=c, zero padding.
    """
    B, T, H, W, c = grid.shape
    kt, kh, kw, _ = w.shape
    st, sh, sw = stride
    pt, ph, pw = padding
    To = out_size(T, kt, st, pt)
    Ho = out_size(H, kh, sh, ph)
    Wo = out_size(W, kw, sw, pw)
    gp = jnp.pad(grid, ((0, 0), (pt, pt), (ph, ph), (pw, pw), (0, 0)))
    out = jnp.zeros((B, To, Ho, Wo, c), jnp.float32)
    for dt in range(kt):
        for dh in range(kh):
            for dw in range(kw):
                sl = gp[
                    :,
                    dt : dt + To * st : st,
                    dh : dh + Ho * sh : sh,
                    dw : dw + Wo * sw : sw,
                    :,
                ]
                out = out + sl.astype(jnp.float32) * w[dt, dh, dw]
    return out.astype(grid.dtype)


def xla_depthwise(grid, w, stride, padding):
    # channels-last conv_general_dilated, feature_group_count=c
    c = grid.shape[-1]
    kernel = w[:, :, :, None, :]  # (kt, kh, kw, I=1 per group, O=c)
    return jax.lax.conv_general_dilated(
        grid,
        kernel.astype(grid.dtype),
        window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        feature_group_count=c,
    )


def avg_pool(grid, stride, kernel, padding):
    window = (1,) + kernel + (1,)
    strides = (1,) + stride + (1,)
    pads = ((0, 0),) + tuple((p, p) for p in padding) + ((0, 0),)
    s = jax.lax.reduce_window(grid, 0.0, jax.lax.add, window, strides, pads)
    return s / float(np.prod(kernel))


def main():
    device = jax.devices()[0]
    rng = np.random.default_rng(0)
    # d3..d13 hot-block kv pool: (B*heads, 8, 14, 14, 96), k 3x3x3, s (1,2,2)
    shapes = [
        ("d3_kv", (64, 8, 14, 14, 96), (3, 3, 3), (1, 2, 2)),
        ("d1_kv", (32, 8, 28, 28, 96), (3, 3, 3), (1, 4, 4)),
        ("d0_kv", (16, 8, 56, 56, 96), (3, 3, 3), (1, 8, 8)),
        ("d14_kv_s1", (128, 8, 7, 7, 96), (3, 3, 3), (1, 1, 1)),
    ]
    for label, shape, kernel, stride in shapes:
        padding = tuple(k // 2 for k in kernel)
        grid = jax.device_put(
            jnp.asarray(rng.uniform(-1, 1, shape), jnp.bfloat16), device
        )
        w = jax.device_put(
            jnp.asarray(
                rng.uniform(-1, 1, kernel + (shape[-1],)), jnp.bfloat16
            ),
            device,
        )
        with_madd = "--with-madd" in sys.argv
        record = {"bench": "depthwise_pool", "shape": label}
        t_conv = time_fn(
            lambda g, w: xla_depthwise(g, w, stride, padding), grid, w, n_big=65
        )
        record["conv_ms"] = round(t_conv * 1e3, 4)
        t_avg = time_fn(
            lambda g: avg_pool(g, stride, kernel, padding), grid, n_big=65
        )
        record["avg_ms"] = round(t_avg * 1e3, 4)
        if with_madd:
            a = np.asarray(
                jax.jit(lambda g, w: xla_depthwise(g, w, stride, padding))(
                    grid, w
                ),
                np.float32,
            )
            b = np.asarray(
                jax.jit(lambda g, w: depthwise_pool_madd(g, w, stride, padding))(
                    grid, w
                ),
                np.float32,
            )
            record["max_err"] = float(np.abs(a - b).max())
            record["madd_ms"] = round(
                time_fn(
                    lambda g, w: depthwise_pool_madd(g, w, stride, padding),
                    grid,
                    w,
                    n_big=65,
                )
                * 1e3,
                4,
            )
        print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
