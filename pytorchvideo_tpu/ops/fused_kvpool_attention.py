"""Fused kv-pool + LN + attention kernel (Pallas/TPU): the MViT block
mega-kernel step scoped by docs/mvit_roofline.md.

Why: the ~11 ms/step "layout copies" bucket in the MViT-B roofline is the
HBM movement XLA charges for re-gridding the packed token axis around the
depthwise kv-pool convs. Three op-level substitutions failed to remove it
(disjoint-window rewrite: neutral-to-loss; standalone Pallas pool: loss;
pallas_kv dispatch: 330 vs 368 clips/s — ops/token_pool.py) because the
copies attach to whatever op boundary the pool has. This kernel removes
the boundary itself: the UNPOOLED k/v grids (the qkv GEMM outputs,
row-major) are the attention operands, and pooling + post-pool LayerNorm
happen on VMEM-resident planes inside the attention kernel's own grid.

Structure — a PHASED grid, no manual DMA:

  grid = (B, T2 + n_q_tiles)
  steps j < T2           pool phase: three clamped-index plane refs per
                         tensor deliver k/v planes (t-1, t, t+1); 27
                         depthwise taps (strided taps via the unit-slice +
                         dim-split-reshape trick, ops/token_pool.py) +
                         per-head-segment LayerNorm (segment sums as 0/1
                         matmuls — no minor-dim reshapes) accumulate the
                         pooled rows into VMEM scratch; step 0 also writes
                         the (pre-normed) cls row.
  steps j >= T2          attention phase: q tile (j - T2) attends over the
                         scratch k/v exactly like _attention_kernel_packed
                         (ops/pooled_attention.py).

Scope gates (checked by ``fusable``): depthwise conv pool, LN-after-pool
(MViT video configs), kernel (3,3,3) with pad k//2, stride (1, s, s) with
s >= 4 (stride-2 W splits crash the v5e Mosaic compile helper), and
VMEM-bounded plane sizes. Everything else stays on the unfused path.

Backward: ``fused_kvpool_attention`` is wrapped in ``jax.custom_vjp``; the
backward recomputes pooled k/v through the XLA grouped conv + LN (exactly
the unfused path — same math, reference pytorchvideo/layers/attention.py
:341-465) and reuses its VJP plus the packed attention backward kernel, so
training gradients are identical to the unfused path's.

HW verdict (v5e, 2026-08-19, whole-model mvit_base_16x4 B16 bf16 deploy,
interleaved 3x medians, same session): plain 367.9 clips/s vs fused 354.6
(0.964x) — a NET LOSS, so ``PVT_FUSED_KVPOOL`` stays DEFAULT OFF like the
other two pool substitutions (ops/token_pool.py). Per-geometry parity on
real HW passed at both fused block shapes (max|diff| ~0.016-0.03 on
activations of scale ~4-6, bf16 rounding). Two v5e Mosaic lowering facts
learned, encoded in the kernel (probe: aligned vs unaligned constructs):
  1. vector shape casts collapsing a non-sublane-aligned second-minor dim
     ((7,7,96)->(49,96), (8,49,96)->(392,96)) are REJECTED; the same
     collapse with the W axis padded to a multiple of 8 (f32) lowers.
     Hence the w_pad scheme + masked attention columns below.
  2. exceeding VMEM with plane-sized block refs does not fail cleanly on
     the axon tunnel — the MViT-B transition-block geometry (56x56x192
     planes, ~20 MB live estimate) compiled, then HUNG at runtime. Hence
     ``fusable``'s aggregate VMEM budget gate.
"""

from __future__ import annotations

import functools
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

_TILE_Q = 512
# Aggregate VMEM budget for the kernel's live buffers. v5e VMEM is ~16 MB;
# leave headroom for Mosaic's own allocations. Exceeding it does NOT fail
# cleanly on the axon tunnel: the MViT-B transition-block geometry
# (thw (8,56,56), HC=192, stride (1,4,4); ~20 MB est.) compiled but HUNG
# at runtime (2026-08-19 HW bisect), so the gate must be conservative.
_VMEM_BUDGET = 12_000_000


def pool_out(d, k, s, p):
    return (d + 2 * p - k) // s + 1


def fusable(
    thw: Size3,
    hc: int,
    kernel: Optional[Size3],
    stride: Size3,
    itemsize: int = 2,
) -> bool:
    """Geometry gate for the fused kernel (see module docstring)."""
    if kernel is None:
        return False
    kt, kh, kw = kernel
    st, sh, sw = stride
    if (kt, kh, kw) != (3, 3, 3) or st != 1 or sh < 4 or sw < 4:
        return False
    t, h, w = thw
    t2 = pool_out(t, kt, st, kt // 2)
    h2 = pool_out(h, kh, sh, kh // 2)
    w2 = pool_out(w, kw, sw, kw // 2)
    if min(t2, h2, w2) <= 0:
        return False
    w2p = -(-w2 // 8) * 8
    # Live-buffer estimate: 6 plane refs (3 k taps + 3 v taps), double-
    # buffered by the pipeline, + the two f32 pooled-row scratches + q/out
    # tiles. Must stay under the budget (see _VMEM_BUDGET note).
    plane = h * w * hc * itemsize
    scratch = 2 * t2 * h2 * w2p * hc * 4
    tiles = 4 * _TILE_Q * hc * itemsize + 4 * h2 * w2p * hc * itemsize
    return 12 * plane + scratch + tiles <= _VMEM_BUDGET


def _tap_slice(plane, dh, dw, sh, sw, h_out, w_out):
    """plane[dh::sh, dw::sw][:h_out, :w_out] without strided slices."""
    Hp, Wp, C = plane.shape
    hi = dh + (sh * h_out if sh > 1 else h_out)
    seg = jax.lax.slice(plane, (dh, 0, 0), (hi, Wp, C))
    if sh > 1:
        seg = seg.reshape(h_out, sh, Wp, C)[:, 0]
    wi = dw + (sw * w_out if sw > 1 else w_out)
    seg = jax.lax.slice(seg, (0, dw, 0), (h_out, wi, C))
    if sw > 1:
        seg = seg.reshape(h_out, w_out, sw, C)[:, :, 0]
    return seg


def _pool_ln_plane(
    tap_refs, w_ref, ln_ref, seg, segT, *, t_out, t_in, kernel, stride,
    h_out, w_out, w_pad, head_dim, eps, out_dtype,
):
    """Pool one output t-plane from 3 tap planes, then per-head-segment LN.

    Returns (h_out*w_pad, HC): the W axis is zero-padded to ``w_pad`` (a
    sublane multiple) BEFORE the 3D->2D collapse — v5e Mosaic rejects the
    unaligned collapse (measured: (7,7,96)->(49,96) is an "unsupported
    shape cast"; (7,8,96)->(56,96) f32 lowers). Pad rows carry finite
    garbage (LN of zeros = bias) and are masked out of the attention
    scores by the caller."""
    kt, kh, kw = kernel
    st, sh, sw = stride
    ph, pw = kh // 2, kw // 2
    eh, ew = max(sh - 1, 0), max(sw - 1, 0)
    hc = tap_refs[0].shape[-1]
    acc = jnp.zeros((h_out, w_out, hc), jnp.float32)
    for dt in range(kt):
        plane = tap_refs[dt][0, 0]  # (H, W, HC)
        t_src = st * t_out + dt - kt // 2
        valid = jnp.logical_and(t_src >= 0, t_src < t_in)
        plane = jnp.pad(plane, ((ph, ph + eh), (pw, pw + ew), (0, 0)))
        for dh in range(kh):
            for dw in range(kw):
                tap = _tap_slice(plane, dh, dw, sh, sw, h_out, w_out).astype(
                    jnp.float32
                )
                w_row = w_ref[dt * kh * kw + dh * kw + dw].astype(jnp.float32)
                w_row = jnp.where(valid, w_row, 0.0)
                acc = acc + tap * w_row
    if w_pad != w_out:
        acc = jnp.pad(acc, ((0, 0), (0, w_pad - w_out), (0, 0)))
    x = acc.reshape(h_out * w_pad, hc)
    # per-head-segment LayerNorm via 0/1 segment matmuls (no minor reshape)
    heads = hc // head_dim
    inv_c = 1.0 / head_dim
    sums = jax.lax.dot_general(
        x, seg, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, heads)
    mean = sums * inv_c
    mean_b = jax.lax.dot_general(
        mean, segT, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, HC)
    xc = x - mean_b
    var = (
        jax.lax.dot_general(
            xc * xc, seg, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * inv_c
    )
    rstd = jax.lax.rsqrt(var + eps)
    rstd_b = jax.lax.dot_general(
        rstd, segT, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scale = ln_ref[0].astype(jnp.float32)
    bias = ln_ref[1].astype(jnp.float32)
    return (xc * rstd_b * scale + bias).astype(out_dtype)


def _fused_kernel(
    # inputs
    q_ref,
    k0_ref, k1_ref, k2_ref,
    v0_ref, v1_ref, v2_ref,
    wk_ref, wv_ref,
    lnk_ref, lnv_ref,
    clsk_ref, clsv_ref,
    # outputs: attention tiles + the pooled grids (consumed outside by the
    # single-row cls query, reference attention.py:531 attends cls over
    # the same pooled keys)
    o_ref, ok_ref, ov_ref,
    # scratch: pooled rows per output t-plane (leading-dim indexed — no
    # dynamic sublane stores), plus the cls row pair
    k_scr, v_scr, cls_scr,
    *,
    t2, n_tiles, t_in, kernel, stride, h_out, w_out, w_pad,
    heads, head_dim, scale, residual, has_cls, eps,
):
    j = pl.program_id(1)
    # 0/1 head-segment matrix built from iota (pallas kernels cannot
    # capture array constants): S[i, h] = 1 iff i // head_dim == h
    hc = heads * head_dim
    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (hc, heads), 0) // head_dim
        == jax.lax.broadcasted_iota(jnp.int32, (hc, heads), 1)
    ).astype(jnp.float32)
    segT = seg.T

    @pl.when(j < t2)
    def _pool_phase():
        if has_cls:
            @pl.when(j == 0)
            def _cls():
                cls_scr[0] = clsk_ref[0, 0]
                cls_scr[1] = clsv_ref[0, 0]

        for taps, w_ref, ln_ref, scr, oref in (
            ((k0_ref, k1_ref, k2_ref), wk_ref, lnk_ref, k_scr, ok_ref),
            ((v0_ref, v1_ref, v2_ref), wv_ref, lnv_ref, v_scr, ov_ref),
        ):
            rows = _pool_ln_plane(
                taps, w_ref, ln_ref, seg, segT,
                t_out=j, t_in=t_in, kernel=kernel, stride=stride,
                h_out=h_out, w_out=w_out, w_pad=w_pad, head_dim=head_dim,
                eps=eps, out_dtype=scr.dtype,
            )
            scr[j] = rows
            oref[0, 0] = rows.astype(oref.dtype)

    @pl.when(j >= t2)
    def _attn_phase():
        hc = heads * head_dim
        q = q_ref[0]  # (tile_q, HC)
        # Aligned collapse: the scratch's second-minor is w_pad-aligned so
        # Mosaic accepts the shape cast (see _pool_ln_plane docstring).
        k = k_scr[...].reshape(t2 * h_out * w_pad, hc).astype(q.dtype)
        v = v_scr[...].reshape(t2 * h_out * w_pad, hc).astype(q.dtype)
        if has_cls:
            k = jnp.concatenate([cls_scr[0:1], k], axis=0)
            v = jnp.concatenate([cls_scr[1:2], v], axis=0)
        off = 1 if has_cls else 0
        lk = k.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, lk), 1)
        key_valid = jnp.logical_or(
            col < off, ((col - off) % w_pad) < w_out
        )  # pad W columns are finite garbage: mask them out of the softmax
        outs = []
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            qh = q[:, sl]
            scores = jax.lax.dot_general(
                qh, k[:, sl], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            scores = scores * scale
            scores = jnp.where(key_valid, scores, -1e30)
            scores = scores - jnp.max(scores, axis=-1, keepdims=True)
            probs = jnp.exp(scores)
            probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
            out = jax.lax.dot_general(
                probs.astype(v.dtype), v[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if residual:
                out = out + qh.astype(jnp.float32)
            outs.append(out.astype(o_ref.dtype))
        o_ref[0] = outs[0] if heads == 1 else jnp.concatenate(outs, axis=1)


def _fused_local(
    q, k_grid, v_grid, wk, wv, lnk, lnv, cls_k, cls_v,
    *, thw, num_heads, scale, residual, kernel, stride, eps, tile_q,
    interpret,
):
    B, Lq, HC = q.shape
    T, H, W = thw
    kt, kh, kw = kernel
    st, sh, sw = stride
    T2 = pool_out(T, kt, st, kt // 2)
    H2 = pool_out(H, kh, sh, kh // 2)
    W2 = pool_out(W, kw, sw, kw // 2)
    # W padded to the f32 sublane tile so every 3D->2D collapse inside the
    # kernel is layout-aligned (v5e Mosaic rejects unaligned shape casts).
    W2p = -(-W2 // 8) * 8
    has_cls = cls_k is not None
    head_dim = HC // num_heads
    tile_q = min(tile_q, Lq)
    n_tiles = pl.cdiv(Lq, tile_q)
    grid = (B, T2 + n_tiles)

    k5 = k_grid.reshape(B, T, H, W, HC)
    v5 = v_grid.reshape(B, T, H, W, HC)

    def plane_spec(dt):
        def index_map(b, j):
            t_src = jnp.clip(st * j + dt - kt // 2, 0, T - 1)
            return (b, t_src, 0, 0, 0)

        return pl.BlockSpec(
            (1, 1, H, W, HC), index_map, memory_space=pltpu.VMEM
        )

    q_spec = pl.BlockSpec(
        (1, tile_q, HC),
        lambda b, j: (b, jnp.maximum(j - T2, 0), 0),
        memory_space=pltpu.VMEM,
    )
    small = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    cls_spec = pl.BlockSpec(
        (1, 1, HC), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM
    )

    zero = jnp.zeros((B, 1, HC), q.dtype)
    qf = _pad_to(q, 1, tile_q)
    kernel_fn = functools.partial(
        _fused_kernel,
        t2=T2, n_tiles=n_tiles, t_in=T, kernel=kernel, stride=stride,
        h_out=H2, w_out=W2, w_pad=W2p, heads=num_heads, head_dim=head_dim,
        scale=scale, residual=residual, has_cls=has_cls, eps=eps,
    )
    pooled_spec = pl.BlockSpec(
        (1, 1, H2 * W2p, HC),
        lambda b, j: (b, jnp.minimum(j, T2 - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    out, kp, vp = pl.pallas_call(
        kernel_fn,
        out_shape=[
            jax.ShapeDtypeStruct(qf.shape, q.dtype),
            jax.ShapeDtypeStruct((B, T2, H2 * W2p, HC), q.dtype),
            jax.ShapeDtypeStruct((B, T2, H2 * W2p, HC), q.dtype),
        ],
        grid=grid,
        in_specs=[
            q_spec,
            plane_spec(0), plane_spec(1), plane_spec(2),
            plane_spec(0), plane_spec(1), plane_spec(2),
            small((kt * kh * kw, HC)), small((kt * kh * kw, HC)),
            small((2, HC)), small((2, HC)),
            cls_spec, cls_spec,
        ],
        out_specs=[q_spec, pooled_spec, pooled_spec],
        scratch_shapes=[
            # f32 scratch: the sublane tile is 8, matching the W2p pad
            # (bf16's 16-row tile would mis-align the (T2, H2*W2p) collapse
            # when W2p is an odd multiple of 8)
            pltpu.VMEM((T2, H2 * W2p, HC), jnp.float32),
            pltpu.VMEM((T2, H2 * W2p, HC), jnp.float32),
            pltpu.VMEM((2, HC), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        qf, k5, k5, k5, v5, v5, v5, wk, wv, lnk, lnv,
        cls_k if has_cls else zero, cls_v if has_cls else zero,
    )
    def unpad(p):
        # (B, T2, H2*W2p, HC) -> drop the pad W columns -> (B, T2*H2*W2, HC).
        # Tiny tensor (the pooled grid); plain XLA slice+reshape.
        p = p.reshape(B, T2, H2, W2p, HC)[:, :, :, :W2, :]
        return p.reshape(B, T2 * H2 * W2, HC)

    return out[:, :Lq], unpad(kp), unpad(vp)


def _pad_to(x, axis, mult):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


# ---------------------------------------------------------------------------
# Reference (XLA) path — also the recompute used by the custom VJP backward.
# ---------------------------------------------------------------------------


def _pool_ln_xla(grid, w_packed, lnp, stride, kernel, head_dim, eps):
    """Depthwise grouped conv pool + per-head-segment LN, pure XLA."""
    pad = [(k // 2, k // 2) for k in kernel]
    w5 = w_packed.reshape(tuple(kernel) + (1, grid.shape[-1]))
    pooled = jax.lax.conv_general_dilated(
        grid,
        w5.astype(grid.dtype),
        window_strides=stride,
        padding=pad,
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        feature_group_count=grid.shape[-1],
    )
    B = pooled.shape[0]
    hc = pooled.shape[-1]
    x = pooled.reshape(B, -1, hc // head_dim, head_dim).astype(jnp.float32)
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    x = x.reshape(B, -1, hc)
    return (x * lnp[0].astype(jnp.float32) + lnp[1].astype(jnp.float32)).astype(
        grid.dtype
    )


def fused_kvpool_attention_xla(
    q, k_grid, v_grid, wk, wv, lnk, lnv, cls_k, cls_v,
    thw, num_heads, scale, residual, kernel, stride, eps=1e-6,
):
    """Pure-XLA reference: pool + LN + packed attention (same math).
    Returns (attn_out, pooled_k_grid, pooled_v_grid) like the kernel."""
    from pytorchvideo_tpu.ops.pooled_attention import (
        pooled_attention_packed_xla,
    )

    B, Lq, HC = q.shape
    T, H, W = thw
    head_dim = HC // num_heads
    k5 = k_grid.reshape(B, T, H, W, HC)
    v5 = v_grid.reshape(B, T, H, W, HC)
    kp = _pool_ln_xla(k5, wk, lnk, stride, kernel, head_dim, eps)
    vp = _pool_ln_xla(v5, wv, lnv, stride, kernel, head_dim, eps)
    k_full, v_full = kp, vp
    if cls_k is not None:
        k_full = jnp.concatenate([cls_k, kp], axis=1)
        v_full = jnp.concatenate([cls_v, vp], axis=1)
    out = pooled_attention_packed_xla(
        q, k_full, v_full, num_heads, scale, residual
    )
    return out, kp, vp


# ---------------------------------------------------------------------------
# custom_vjp: Pallas forward, XLA-recompute backward
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14, 15, 16, 17)
)
def fused_kvpool_attention(
    q, k_grid, v_grid, wk, wv, lnk, lnv, cls_k, cls_v,
    thw, num_heads, scale, residual, kernel, stride, eps=1e-6,
    tile_q=_TILE_Q, interpret=False,
):
    """Fused kv-pool+LN+attention. q: (B, Lq, H*c) pooled queries;
    k_grid/v_grid: (B, T*H*W, H*c) UNPOOLED grids (qkv GEMM outputs);
    wk/wv: (kt*kh*kw, H*c) head-tiled depthwise pool taps; lnk/lnv:
    (2, H*c) post-pool LN scale/bias (head-tiled); cls_k/cls_v: (B, 1,
    H*c) ALREADY-NORMED cls rows or None. Returns (attn_out (B, Lq, H*c),
    pooled_k_grid (B, Lk, H*c), pooled_v_grid) — the pooled grids feed the
    single-row cls query outside the kernel."""
    return _fused_local(
        q, k_grid, v_grid, wk, wv, lnk, lnv, cls_k, cls_v,
        thw=thw, num_heads=num_heads, scale=scale, residual=residual,
        kernel=kernel, stride=stride, eps=eps, tile_q=tile_q,
        interpret=(
            interpret
            or not _HAS_PALLAS
            or jax.default_backend() != "tpu"
        ),
    )


def _fused_fwd(
    q, k_grid, v_grid, wk, wv, lnk, lnv, cls_k, cls_v,
    thw, num_heads, scale, residual, kernel, stride, eps, tile_q, interpret,
):
    out = fused_kvpool_attention(
        q, k_grid, v_grid, wk, wv, lnk, lnv, cls_k, cls_v,
        thw, num_heads, scale, residual, kernel, stride, eps, tile_q,
        interpret,
    )
    return out, (q, k_grid, v_grid, wk, wv, lnk, lnv, cls_k, cls_v)


def _fused_bwd(
    thw, num_heads, scale, residual, kernel, stride, eps, tile_q, interpret,
    res, g,
):
    q, k_grid, v_grid, wk, wv, lnk, lnv, cls_k, cls_v = res
    has_cls = cls_k is not None

    def f(q, k_grid, v_grid, wk, wv, lnk, lnv, cls_k, cls_v):
        return fused_kvpool_attention_xla(
            q, k_grid, v_grid, wk, wv, lnk, lnv,
            cls_k if has_cls else None, cls_v if has_cls else None,
            thw, num_heads, scale, residual, kernel, stride, eps,
        )

    zero = jnp.zeros_like(q[:, :1]) if not has_cls else None
    args = (
        q, k_grid, v_grid, wk, wv, lnk, lnv,
        cls_k if has_cls else zero, cls_v if has_cls else zero,
    )
    _, vjp = jax.vjp(f, *args)
    grads = vjp(g)
    if not has_cls:
        grads = grads[:7] + (None, None)
    return grads


fused_kvpool_attention.defvjp(_fused_fwd, _fused_bwd)
