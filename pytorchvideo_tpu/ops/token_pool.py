"""Depthwise token-pool kernel (Pallas/TPU) with XLA fallback.

MViT pools q/k/v tokens through their (T, H, W) geometry with a depthwise
3x3x3 strided conv (reference pytorchvideo/layers/attention.py:117-212).
XLA:TPU's grouped-conv layout assignment picks a channel-minor operand
layout for ``feature_group_count=C`` convs, so every pool in the row-major
(B, L, H*c) packed token path gets bracketed by relayout copies of the
full-resolution token tensor (~0.62 ms each for the 25k-token early blocks
at MViT-B b16 — the single largest non-roofline bucket in the round-2 HLO
trace, ~11 ms/step total; see benchmarks/mvit_breakdown.py).

This kernel computes the same conv directly on the row-major layout, so no
layout boundary exists between the qkv GEMMs, the pool, and the packed
attention kernel:

- Grid ``(B, T_out)``. The T receptive field (kernel 3, stride 1, pad 1 in
  the flagship configs) is covered by passing x once per T-tap with a
  clamped index map; out-of-range taps are masked by zeroing their weight.
- Each invocation loads kt planes (H, W, C), zero-pads H/W by the conv
  padding in VMEM, and accumulates the kh*kw strided-slice taps times the
  per-channel weight row in f32 — a pure VPU loop; channels stay on lanes.
- Backward (training) routes through ``jax.vjp`` of the XLA conv (the tap
  math is linear in both operands, so the primal conv is dead code and XLA
  DCEs it; only the transposed convs run).

Supported geometry: odd kernels with pad = k//2 per axis and T-kernel
covered by the tap refs (kt <= 3); on HARDWARE additionally stride 1 on
every axis — Mosaic rejects ``vector.extract_strided_slice`` with stride
> 1 (verified on v5e: "expected strides to be confined to [1, 2)"), so
strided pools only run the Pallas path in interpret mode (tests).
Strided pools therefore dispatch to the plain XLA grouped conv.

``PVT_TOKEN_POOL`` = ``pallas`` | ``xla`` | ``window`` | ``grouped`` |
``interpret`` | ``auto`` picks the path. MEASURED OUTCOMES:
- Round 2 (degraded session, MViT-B 16x4 b16): Pallas pools where they
  lower (stride-1 q pools) are a net e2e loss — auto-with-Pallas 309.8
  clips/s vs 320.3 (grouped conv); the VMEM pad + tap loop doesn't beat
  XLA's fused stride-1 grouped conv.
- Round 3 (healthy session, same shapes): the disjoint-window rewrite
  ``_window_depthwise_pool`` — which round 2 measured "neutral" (320.2 vs
  320.3) and shipped as the default for stride>=kernel kv pools — is a 7%
  whole-model LOSS: 268 clips/s (window) vs 288.5 (grouped). It was the
  round-2 bench-gate regression (BENCH_r02 mvit 0.829x the anchor).
``auto`` therefore uses the XLA grouped conv everywhere; ``window`` and
``pallas`` stay as explicit diagnostics/opt-ins for future toolchains.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas import kept optional: CPU test envs use interpret mode
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

Size3 = Tuple[int, int, int]


def _xla_depthwise_pool(x, w_packed, stride: Size3, padding: Size3):
    """Reference path: grouped conv on (B, T, H, W, C); w_packed (kt,kh,kw,C)."""
    return jax.lax.conv_general_dilated(
        x,
        w_packed[..., None, :],
        window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        feature_group_count=x.shape[-1],
    )


def _pool_kernel(
    *refs,
    kt: int,
    kh: int,
    kw: int,
    stride_t: int,
    stride_h: int,
    stride_w: int,
    pad_t: int,
    pad_h: int,
    pad_w: int,
    t_in: int,
    h_out: int,
    w_out: int,
    mode: str = "conv",
):
    """One (b, t_out) step: depthwise pool of kt input planes -> one output
    plane. refs = (x_tap_0 .. x_tap_{kt-1}[, w], out). Conv accumulates
    weighted taps in f32 with zero padding; max folds taps with -inf
    padding (torch MaxPool3d semantics, layers/common.py max_pool3d)."""
    x_refs = refs[:kt]
    w_ref = refs[kt] if mode == "conv" else None
    o_ref = refs[-1]
    t_out = pl.program_id(1)
    is_max = mode == "max"
    if is_max:
        acc = jnp.full((h_out, w_out, o_ref.shape[-1]), -jnp.inf, jnp.float32)
    else:
        acc = jnp.zeros((h_out, w_out, o_ref.shape[-1]), jnp.float32)

    def tap_slice(plane, dh, dw):
        """plane[dh::stride_h, dw::stride_w][:h_out, :w_out] WITHOUT strided
        slices (Mosaic rejects vector.extract_strided_slice with stride > 1,
        verified on v5e): unit slice + dim-split reshape + index-0 take.
        The H split touches only the untiled leading dim (free); the W
        split re-groups the sublane dim (a VMEM relayout, no HBM)."""
        Hp, Wp, C = plane.shape
        hi = dh + (stride_h * h_out if stride_h > 1 else h_out)
        seg = jax.lax.slice(plane, (dh, 0, 0), (hi, Wp, C))
        if stride_h > 1:
            seg = seg.reshape(h_out, stride_h, Wp, C)[:, 0]
        wi = dw + (stride_w * w_out if stride_w > 1 else w_out)
        seg = jax.lax.slice(seg, (0, dw, 0), (h_out, wi, C))
        if stride_w > 1:
            seg = seg.reshape(h_out, w_out, stride_w, C)[:, :, 0]
        return seg

    # extra high-side pad so the dim-split slices stay in bounds (the extra
    # positions are never selected by the index-0 take)
    eh, ew = max(stride_h - 1, 0), max(stride_w - 1, 0)
    for dt in range(kt):
        plane = x_refs[dt][0, 0]  # (H, W, C)
        if pad_t > 0:
            # The index map clamps the tap's source T row into range; a tap
            # that falls in the T-pad region contributes nothing, which is
            # enforced by zeroing its weight row (conv) or folding -inf
            # (max).
            t_src = stride_t * t_out + dt - pad_t
            valid = jnp.logical_and(t_src >= 0, t_src < t_in)
        else:
            valid = None
        if pad_h or pad_w or eh or ew:
            plane = jnp.pad(
                plane,
                ((pad_h, pad_h + eh), (pad_w, pad_w + ew), (0, 0)),
                constant_values=-jnp.inf if is_max else 0,
            )
        for dh in range(kh):
            for dw in range(kw):
                tap = tap_slice(plane, dh, dw).astype(jnp.float32)
                if is_max:
                    if valid is not None:
                        tap = jnp.where(valid, tap, -jnp.inf)
                    acc = jnp.maximum(acc, tap)
                else:
                    w_row = w_ref[dt * kh * kw + dh * kw + dw].astype(
                        jnp.float32
                    )
                    if valid is not None:
                        w_row = jnp.where(valid, w_row, 0.0)
                    acc = acc + tap * w_row
    o_ref[0, 0] = acc.astype(o_ref.dtype)


def pool_out_size(d: int, k: int, s: int, p: int) -> int:
    return (d + 2 * p - k) // s + 1


def _supported(kernel: Size3, stride: Size3, padding: Size3) -> bool:
    kt, kh, kw = kernel
    return (
        kt in (1, 2, 3)
        and 1 <= kh <= 5
        and 1 <= kw <= 5
        and all(p == k // 2 for k, p in zip(kernel, padding))
    )


def _hw_supported(kernel: Size3, stride: Size3, padding: Size3) -> bool:
    """Geometry the kernel can LOWER on real TPU hardware (Mosaic).

    Mosaic rejects ``vector.extract_strided_slice`` with stride > 1
    ("expected strides to be confined to [1, 2)" — measured on v5e with
    the MViT kv pool, stride 8), so the kernel's strided taps are written
    as unit slice + dim-split reshape + index-0 take (``tap_slice`` in
    ``_pool_kernel``), which lowers for any stride. The T stride rides the
    BlockSpec index map and is unrestricted."""
    return _supported(kernel, stride, padding)


def _window_pool_applicable(kernel: Size3, stride: Size3) -> bool:
    kt, kh, kw = kernel
    st, sh, sw = stride
    return st == 1 and sh >= kh and sw >= kw and (sh > 1 or sw > 1)


def _window_depthwise_pool(x, w_packed, stride: Size3, padding: Size3):
    """Disjoint-window depthwise pool: exact rewrite for sh>=kh, sw>=kw,
    st==1 (the MViT kv pools: kernel 3, stride 8/4).

    pad -> slice -> reshape (h_out, sh, w_out, sw, C) -> take the leading
    (kh, kw) taps -> weighted sum. Pure reshape/slice/elementwise ops, so
    XLA keeps the packed row-major token layout end to end — no
    ``feature_group_count=C`` conv, hence none of the channel-minor
    relayout copies that bracket every grouped conv on XLA:TPU (the ~0.62
    ms/pool copies at MViT-B block 1, benchmarks/mvit_breakdown.py).
    Linear in (x, w): JAX AD differentiates it without a custom VJP.
    """
    kt, kh, kw = (int(k) for k in w_packed.shape[:3])
    st, sh, sw = (int(s) for s in stride)
    pt, ph, pw = (int(p) for p in padding)
    B, T, H, W, C = x.shape
    t_out = pool_out_size(T, kt, st, pt)
    h_out = pool_out_size(H, kh, sh, ph)
    w_out = pool_out_size(W, kw, sw, pw)
    hp = max(H + 2 * ph, h_out * sh)
    wp = max(W + 2 * pw, w_out * sw)
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (pt, pt),
            (ph, hp - H - ph),
            (pw, wp - W - pw),
            (0, 0),
        ),
    )
    xp = xp[:, :, : h_out * sh, : w_out * sw, :]
    xp = xp.reshape(B, T + 2 * pt, h_out, sh, w_out, sw, C)
    win = xp[:, :, :, :kh, :, :kw, :].astype(jnp.float32)
    w = w_packed.astype(jnp.float32)
    out = None
    for dt in range(kt):
        # spatial taps weighted by this T-tap's (kh, kw, C) weight plane,
        # then the T shift: output row t reads padded T row t + dt.
        s_dt = (win * w[dt][None, None, None, :, None, :, :]).sum(axis=(3, 5))
        s_dt = s_dt[:, dt : dt + t_out]
        out = s_dt if out is None else out + s_dt
    return out.astype(x.dtype)


def _pool_pallas_call(
    x: jnp.ndarray,
    w_flat: Optional[jnp.ndarray],
    kernel_size: Size3,
    stride: Size3,
    padding: Size3,
    mode: str,
    interpret: bool,
) -> jnp.ndarray:
    """Shared pallas_call builder for conv/max token pooling."""
    B, T, H, W, C = x.shape
    kt, kh, kw = kernel_size
    st, sh, sw = stride
    pt, ph, pw = padding
    T2 = pool_out_size(T, kt, st, pt)
    H2 = pool_out_size(H, kh, sh, ph)
    W2 = pool_out_size(W, kw, sw, pw)

    kernel = functools.partial(
        _pool_kernel,
        kt=kt,
        kh=kh,
        kw=kw,
        stride_t=st,
        stride_h=sh,
        stride_w=sw,
        pad_t=pt,
        pad_h=ph,
        pad_w=pw,
        t_in=T,
        h_out=H2,
        w_out=W2,
        mode=mode,
    )

    def tap_spec(dt):
        def index_map(b, t):
            src = st * t + dt - pt
            src = jnp.clip(src, 0, T - 1)
            return (b, src, 0, 0, 0)

        return pl.BlockSpec(
            (1, 1, H, W, C), index_map, memory_space=pltpu.VMEM
        )

    in_specs = [tap_spec(dt) for dt in range(kt)]
    operands = [x] * kt
    if mode == "conv":
        in_specs.append(
            pl.BlockSpec(
                (kt * kh * kw, C), lambda b, t: (0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(w_flat)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, T2, H2, W2, C), x.dtype),
        grid=(B, T2),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, H2, W2, C), lambda b, t: (b, t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(*operands)


def depthwise_token_pool_pallas(
    x: jnp.ndarray,
    w_packed: jnp.ndarray,
    stride: Size3,
    padding: Size3,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (B, T, H, W, C) row-major; w_packed: (kt, kh, kw, C) depthwise
    weights (already head-tiled). Returns (B, T', H', W', C).

    SPMD: batch- and channel-parallel under a mesh (the conv is depthwise,
    so a channel shard is self-contained); the token geometry must stay
    replicated (ops/spmd.py).
    """
    from pytorchvideo_tpu.ops.spmd import shard_by_rule

    kt, kh, kw, C = w_packed.shape
    kernel_size = (kt, kh, kw)
    w_flat = w_packed.reshape(kt * kh * kw, C)
    fn = shard_by_rule(
        lambda a, b: _pool_pallas_call(
            a, b, kernel_size, stride, padding, "conv", interpret
        ),
        "b t h w c, k c -> b t2 h2 w2 c",
        need_replication=("t", "h", "w", "t2", "h2", "w2", "k"),
    )
    return fn(x, w_flat)


def max_token_pool_pallas(
    x: jnp.ndarray,
    kernel_size: Size3,
    stride: Size3,
    padding: Size3,
    interpret: bool = False,
) -> jnp.ndarray:
    """Torch-MaxPool3d-compatible max pool on the row-major token grid.
    SPMD: batch/channel-parallel like :func:`depthwise_token_pool_pallas`."""
    from pytorchvideo_tpu.ops.spmd import shard_by_rule

    fn = shard_by_rule(
        lambda a: _pool_pallas_call(
            a, None, kernel_size, stride, padding, "max", interpret
        ),
        "b t h w c -> b t2 h2 w2 c",
        need_replication=("t", "h", "w", "t2", "h2", "w2"),
    )
    return fn(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _token_pool_ad(x, w_packed, stride, padding, interpret):
    return depthwise_token_pool_pallas(x, w_packed, stride, padding, interpret)


def _token_pool_fwd(x, w_packed, stride, padding, interpret):
    out = depthwise_token_pool_pallas(x, w_packed, stride, padding, interpret)
    return out, (x, w_packed)


def _dw_kernel(
    *refs,
    kt: int,
    kh: int,
    kw: int,
    stride_t: int,
    stride_h: int,
    stride_w: int,
    pad_t: int,
    pad_h: int,
    pad_w: int,
    t_in: int,
    h_out: int,
    w_out: int,
):
    """Weight gradient: one (b, t_out) step accumulates per-tap channel dots
    sum_{h',w'}(x_tap * g) into a VMEM-resident (kt*kh*kw, C) block shared
    across the whole sequential grid (same pattern as the attention bwd's
    dk/dv accumulators)."""
    x_refs = refs[:kt]
    g_ref = refs[kt]
    dw_ref = refs[kt + 1]
    b = pl.program_id(0)
    t_out = pl.program_id(1)
    g = g_ref[0, 0].astype(jnp.float32)  # (H2, W2, C)
    rows = []
    for dt in range(kt):
        plane = x_refs[dt][0, 0]
        if pad_t > 0:
            t_src = stride_t * t_out + dt - pad_t
            valid = jnp.logical_and(t_src >= 0, t_src < t_in)
        else:
            valid = None
        if pad_h or pad_w:
            plane = jnp.pad(plane, ((pad_h, pad_h), (pad_w, pad_w), (0, 0)))
        for dh in range(kh):
            for dw in range(kw):
                tap = jax.lax.slice(
                    plane,
                    (dh, dw, 0),
                    (
                        dh + stride_h * (h_out - 1) + 1,
                        dw + stride_w * (w_out - 1) + 1,
                        plane.shape[-1],
                    ),
                    (stride_h, stride_w, 1),
                ).astype(jnp.float32)
                row = jnp.sum(tap * g, axis=(0, 1))  # (C,)
                if valid is not None:
                    row = jnp.where(valid, row, 0.0)
                rows.append(row)
    update = jnp.stack(rows)  # (kt*kh*kw, C)

    @pl.when(jnp.logical_and(b == 0, t_out == 0))
    def _init():
        dw_ref[...] = update

    @pl.when(jnp.logical_or(b > 0, t_out > 0))
    def _accum():
        dw_ref[...] += update


def _weight_grad_pallas(x, g, kernel_size, stride, padding, interpret):
    """dw for the depthwise pool: (kt, kh, kw, C) from one pass over x/g.
    SPMD: channel-parallel; batch is a reduction factor — a batch-sharded
    mesh computes local dw and psums it (ops/spmd.py)."""
    from pytorchvideo_tpu.ops.spmd import shard_by_rule

    fn = shard_by_rule(
        lambda a, b: _weight_grad_pallas_local(
            a, b, kernel_size, stride, padding, interpret
        ),
        "b t h w c, b t2 h2 w2 c -> k c",
        need_replication=("t", "h", "w", "t2", "h2", "w2"),
        reduction=("b",),
        psum_over_arg_dim=(0, 0),
    )
    return fn(x, g).reshape(kernel_size + (x.shape[-1],))


def _weight_grad_pallas_local(x, g, kernel_size, stride, padding, interpret):
    B, T, H, W, C = x.shape
    kt, kh, kw = kernel_size
    st, sh, sw = stride
    pt, ph, pw = padding
    T2, H2, W2 = g.shape[1:4]

    kernel = functools.partial(
        _dw_kernel,
        kt=kt,
        kh=kh,
        kw=kw,
        stride_t=st,
        stride_h=sh,
        stride_w=sw,
        pad_t=pt,
        pad_h=ph,
        pad_w=pw,
        t_in=T,
        h_out=H2,
        w_out=W2,
    )

    def tap_spec(dt):
        def index_map(b, t):
            src = st * t + dt - pt
            src = jnp.clip(src, 0, T - 1)
            return (b, src, 0, 0, 0)

        return pl.BlockSpec((1, 1, H, W, C), index_map,
                            memory_space=pltpu.VMEM)

    in_specs = [tap_spec(dt) for dt in range(kt)]
    in_specs.append(
        pl.BlockSpec(
            (1, 1, H2, W2, C), lambda b, t: (b, t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((kt * kh * kw, C), jnp.float32),
        grid=(B, T2),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (kt * kh * kw, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*([x] * kt + [g]))


def _input_grad_pallas(x_shape, w_packed, g, stride, padding, interpret):
    """dx via the transposed-conv identity: dilate g by the stride, pad so
    the remaining conv is stride-1 with p=k//2 (which the forward kernel
    supports), and run the forward kernel with the flipped weights."""
    B, T, H, W, C = x_shape
    kt, kh, kw = w_packed.shape[:3]
    dims = []
    for d, k, s, p in zip((T, H, W), (kt, kh, kw), stride, padding):
        d2 = pool_out_size(d, k, s, p)
        lo = k - 1 - p  # transposed-conv pad
        hi = d + p - 1 - (d2 - 1) * s  # so the stride-1 output size == d
        dims.append((d2, lo, hi, s))
    # Fold the asymmetric part of the pad into the dilated tensor so the
    # kernel sees a symmetric p = k//2 (lo == k-1-p == k//2 for odd k).
    pad_cfg = [(0, 0, 0)]
    for (d2, lo, hi, s), k, p in zip(dims, (kt, kh, kw), padding):
        sym = k // 2
        pad_cfg.append((lo - sym, hi - sym, s - 1))
    pad_cfg.append((0, 0, 0))
    g_dil = jax.lax.pad(g.astype(jnp.float32), jnp.float32(0), pad_cfg)
    w_flip = w_packed[::-1, ::-1, ::-1].astype(jnp.float32)
    dx = depthwise_token_pool_pallas(
        g_dil,
        w_flip,
        (1, 1, 1),
        (kt // 2, kh // 2, kw // 2),
        interpret,
    )
    assert dx.shape == x_shape, (dx.shape, x_shape)
    return dx


def _token_pool_bwd(stride, padding, interpret, res, g):
    x, w_packed = res
    kernel_size = tuple(w_packed.shape[:3])
    use_pallas = interpret or (
        _HAS_PALLAS
        and jax.default_backend() == "tpu"
        and _hw_supported(kernel_size, stride, padding)
        and all(k % 2 == 1 for k in kernel_size)
    )
    if use_pallas:
        dx = _input_grad_pallas(
            x.shape, w_packed, g, stride, padding, interpret
        ).astype(x.dtype)
        dw = _weight_grad_pallas(
            x, g, kernel_size, stride, padding, interpret
        ).astype(w_packed.dtype)
        return dx, dw
    # Fallback: the conv is linear in (x, w), so the primal conv inside vjp
    # is dead code (XLA DCEs it); only the transposed convs execute.
    _, vjp = jax.vjp(
        lambda a, b: _xla_depthwise_pool(a, b, stride, padding), x, w_packed
    )
    return vjp(g)


_token_pool_ad.defvjp(_token_pool_fwd, _token_pool_bwd)


def _xla_max_pool(x, kernel_size: Size3, stride: Size3, padding: Size3):
    from pytorchvideo_tpu.layers.common import max_pool3d

    return max_pool3d(x, kernel_size, stride, padding)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _max_pool_ad(x, kernel_size, stride, padding, interpret):
    return max_token_pool_pallas(x, kernel_size, stride, padding, interpret)


def _max_pool_fwd(x, kernel_size, stride, padding, interpret):
    out = max_token_pool_pallas(x, kernel_size, stride, padding, interpret)
    return out, (x,)


def _max_pool_bwd(kernel_size, stride, padding, interpret, res, g):
    (x,) = res
    # Max-pool backward needs the primal windows (select-and-scatter); the
    # recomputed XLA forward inside vjp is cheap relative to the step.
    _, vjp = jax.vjp(
        lambda a: _xla_max_pool(a, kernel_size, stride, padding), x
    )
    return vjp(g)


_max_pool_ad.defvjp(_max_pool_fwd, _max_pool_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _avg_pool_ad(x, kernel_size, stride, padding, interpret):
    # count_include_pad=True average = depthwise conv with uniform 1/k^3
    # weights and zero padding (layers/common.py avg_pool3d semantics).
    w = jnp.full(
        tuple(kernel_size) + (x.shape[-1],),
        1.0 / float(np.prod(kernel_size)),
        x.dtype,
    )
    return depthwise_token_pool_pallas(x, w, stride, padding, interpret)


def _avg_pool_fwd(x, kernel_size, stride, padding, interpret):
    return _avg_pool_ad(x, kernel_size, stride, padding, interpret), (x,)


def _avg_pool_bwd(kernel_size, stride, padding, interpret, res, g):
    (x,) = res
    from pytorchvideo_tpu.layers.common import avg_pool3d

    _, vjp = jax.vjp(
        lambda a: avg_pool3d(a, kernel_size, stride, padding), x
    )
    return vjp(g)


_avg_pool_ad.defvjp(_avg_pool_fwd, _avg_pool_bwd)


def avg_token_pool(
    x: jnp.ndarray,
    kernel_size: Size3,
    stride: Size3,
    padding: Size3,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Average pooling (count_include_pad=True) of a (B, T, H, W, C) token
    grid. Same dispatch policy as :func:`depthwise_token_pool`."""
    from pytorchvideo_tpu.layers.common import avg_pool3d

    kernel_size = tuple(int(k) for k in kernel_size)
    interpret = False
    if use_pallas is None:
        mode = os.environ.get("PVT_TOKEN_POOL", "auto")
        if mode == "pallas":
            use_pallas = True
        elif mode == "xla":
            use_pallas = False
        elif mode == "interpret":
            use_pallas, interpret = True, True
        else:
            # auto: Pallas pools measured a net e2e LOSS on v5e even where
            # they lower (stride-1: MViT-B b16 309.8 vs 320.3 clips/s with
            # the XLA paths, same session) — keep XLA by default; `pallas`
            # opts in explicitly.
            use_pallas = False
    if use_pallas:
        if not (
            interpret or _hw_supported(kernel_size, stride, padding)
        ) or not _supported(kernel_size, stride, padding):
            raise NotImplementedError(
                f"token-pool kernel supports odd k<=5 (kt<=3) with p=k//2, "
                f"stride 1 on hardware (Mosaic strided-slice limit); got "
                f"kernel={kernel_size} stride={stride} padding={padding}"
            )
        return _avg_pool_ad(x, kernel_size, stride, padding, interpret)
    return avg_pool3d(x, kernel_size, stride, padding)


def max_token_pool(
    x: jnp.ndarray,
    kernel_size: Size3,
    stride: Size3,
    padding: Size3,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Max pooling of a (B, T, H, W, C) token grid (torch MaxPool3d
    semantics). Same dispatch policy as :func:`depthwise_token_pool`."""
    kernel_size = tuple(int(k) for k in kernel_size)
    interpret = False
    if use_pallas is None:
        mode = os.environ.get("PVT_TOKEN_POOL", "auto")
        if mode == "pallas":
            use_pallas = True
        elif mode == "xla":
            use_pallas = False
        elif mode == "interpret":
            use_pallas, interpret = True, True
        else:
            # auto: Pallas pools measured a net e2e LOSS on v5e even where
            # they lower (stride-1: MViT-B b16 309.8 vs 320.3 clips/s with
            # the XLA paths, same session) — keep XLA by default; `pallas`
            # opts in explicitly.
            use_pallas = False
    if use_pallas:
        if not (
            interpret or _hw_supported(kernel_size, stride, padding)
        ) or not _supported(kernel_size, stride, padding):
            raise NotImplementedError(
                f"token-pool kernel supports odd k<=5 (kt<=3) with p=k//2, "
                f"stride 1 on hardware (Mosaic strided-slice limit); got "
                f"kernel={kernel_size} stride={stride} padding={padding}"
            )
        return _max_pool_ad(x, kernel_size, stride, padding, interpret)
    return _xla_max_pool(x, kernel_size, stride, padding)


def depthwise_token_pool(
    x: jnp.ndarray,
    w_packed: jnp.ndarray,
    stride: Size3,
    padding: Size3,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Depthwise-conv pooling of a (B, T, H, W, C) token grid.

    Dispatch mirrors ops.pooled_attention: Pallas on TPU (keeps the packed
    token path layout-boundary-free), XLA grouped conv otherwise;
    ``PVT_TOKEN_POOL`` = ``pallas`` | ``xla`` | ``auto`` overrides.
    """
    kernel = tuple(w_packed.shape[:3])
    interpret = False
    if use_pallas is None:
        mode = os.environ.get("PVT_TOKEN_POOL", "auto")
        if mode == "pallas":
            use_pallas = True
        elif mode == "xla":
            use_pallas = False
        elif mode == "window":
            # diagnostic: disjoint-window rewrite where applicable, grouped
            # conv elsewhere — no Pallas anywhere.
            if _window_pool_applicable(kernel, stride):
                return _window_depthwise_pool(x, w_packed, stride, padding)
            return _xla_depthwise_pool(x, w_packed, stride, padding)
        elif mode == "grouped":
            # diagnostic: plain XLA grouped conv everywhere (the pre-round-2
            # configuration, no window rewrite) — for regression A/Bs.
            return _xla_depthwise_pool(x, w_packed, stride, padding)
        elif mode == "pallas_kv":
            # Pallas only for the large-stride (disjoint-window) kv pools,
            # where the kernel's row-major taps now lower on hardware
            # (tap_slice above; stride-2 geometries still crash Mosaic —
            # v5e compile-helper exit 1) and the XLA grouped conv's
            # relayout brackets are at their most expensive (full-res
            # token tensors). Stride-1/2 pools stay on the grouped conv.
            # MEASURED (round 3, same-session v5e, MViT-B 16x4 b16):
            # grouped 367.9 clips/s vs pallas_kv 330.1 — a 10% whole-model
            # LOSS despite the kernel lowering and running 0.26 ms at the
            # block-0 shape. Swapping the pool op does not remove the
            # layout boundary; XLA re-brackets the pallas_call operands
            # instead. Third strike for op-substitution here (window
            # rewrite, full pallas, pallas_kv) — consistent with the
            # mvit_roofline.md conclusion that only a block-granularity
            # fusion (pool inside the attention kernel's operand
            # streaming) can remove this movement. Kept as a diagnostic.
            use_pallas = (
                min(stride[1], stride[2]) >= 4
                and _hw_supported(kernel, stride, padding)
            )
        elif mode == "interpret":
            # CPU end-to-end testing of the Pallas wiring (weight tiling,
            # split-token threading) without a TPU.
            use_pallas, interpret = True, True
        else:
            # auto: Pallas pools measured a net e2e LOSS on v5e even where
            # they lower (stride-1: MViT-B b16 309.8 vs 320.3 clips/s with
            # the XLA paths, same session) — keep XLA by default; `pallas`
            # opts in explicitly.
            use_pallas = False
    if use_pallas:
        if not (interpret or _hw_supported(kernel, stride, padding)) or not _supported(
            kernel, stride, padding
        ):
            raise NotImplementedError(
                f"token-pool kernel supports odd k<=5 (kt<=3) with p=k//2, "
                f"stride 1 on hardware (Mosaic strided-slice limit); got "
                f"kernel={kernel} stride={stride} padding={padding}"
            )
        return _token_pool_ad(x, w_packed, stride, padding, interpret)
    # Plain grouped conv for every non-Pallas pool. The disjoint-window
    # rewrite was measured "neutral" in a round-2 degraded session but is a
    # 7% whole-model LOSS in a healthy one (round-3 same-session A/B,
    # MViT-B 16x4 b16: grouped 288.5 clips/s vs window 268; the window
    # rewrite was the round-2 bench regression). PVT_TOKEN_POOL=window keeps
    # it as a diagnostic.
    return _xla_depthwise_pool(x, w_packed, stride, padding)
