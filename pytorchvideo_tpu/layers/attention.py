"""MViT multiscale (pooled) attention, TPU-native.

Semantics parity: pytorchvideo/layers/attention.py — Mlp :51, _AttentionPool
:117-212, MultiScaleAttention :215-544 (q/k/v pooling :341-465, scaled dot
product :531-532, residual pooling :536-537), MultiScaleBlock :578-757.

TPU-first design notes:
- Tokens stay channels-last end to end: pooling reshapes (B, heads, L, c) ->
  (B*heads, T, H, W, c) with NO transpose (the reference permutes to NCTHW
  for torch conv; XLA wants channels-last, so our reshape is free).
- Pooled output length L' is computed statically from thw + kernel/stride, so
  all 16 block shapes compile once each under jit.
- The attention core is isolated in :func:`scaled_dot_product_attention` so
  the Pallas flash-attention kernel (ops/) can swap in.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pytorchvideo_tpu.layers.common import conv3d, max_pool3d, avg_pool3d, triple
from pytorchvideo_tpu.layers.norms import Identity, LayerNorm, norm_is_batchnorm
from pytorchvideo_tpu.layers.stochastic import DropPath

Size3 = Tuple[int, int, int]


class Mlp(nn.Module):
    """fc1 -> act -> drop -> fc2 -> drop (reference attention.py:51-114)."""

    hidden_features: int
    out_features: int
    act_layer: Callable = jax.nn.gelu
    dropout_rate: float = 0.0
    bias_on: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_features, use_bias=self.bias_on, name="fc1")(x)
        x = self.act_layer(x)
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.out_features, use_bias=self.bias_on, name="fc2")(x)
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


def _pooled_thw(thw: Size3, kernel: Size3, stride: Size3, padding: Size3) -> Size3:
    return tuple(
        (d + 2 * p - k) // s + 1 for d, k, s, p in zip(thw, kernel, stride, padding)
    )


class _PoolConvParams(nn.Module):
    """Kernel param of a bias-free grouped nn.Conv ((kt,kh,kw,in_pg,c)) —
    declared without instantiating the conv so the packed TokenPool path can
    apply it with head-tiled weights while keeping the exact nn.Conv
    parameter tree ("pool"/"kernel")."""

    kernel_size: Size3
    in_per_group: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            nn.linear.default_kernel_init,
            tuple(self.kernel_size) + (self.in_per_group, self.features),
        )


class _LNParamsInner(nn.Module):
    """Param twin of nn.LayerNorm (scale/bias of (dim,)) — name "ln"."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


class _FusedPoolParams(nn.Module):
    """Param-tree twin of a conv+LN TokenPool (``pool/kernel`` +
    ``norm/ln/{scale,bias}``) so the fused kv-pool attention kernel
    (ops/fused_kvpool_attention.py) can read the SAME parameters the
    unfused path declares — checkpoints and init are path-agnostic."""

    kernel: Size3
    c: int

    @nn.compact
    def __call__(self):
        w = _PoolConvParams(self.kernel, 1, self.c, name="pool")()
        # match TokenPool's nesting: norm (LayerNorm wrapper) -> ln
        return w, _TwoLevelLN(self.c, name="norm")()


class _TwoLevelLN(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        return _LNParamsInner(self.dim, name="ln")()


class TokenPool(nn.Module):
    """Pool a flattened token tensor through its (T, H, W) geometry.

    Mirrors reference _AttentionPool (attention.py:117-212): split cls token,
    reshape to the 3D grid, optional BN+GELU pre-pool, conv/max/avg pool,
    reshape back, re-attach cls, LN post-pool.

    Input: (B, N, L, c) with N = heads (or 1), or — with ``head_groups`` > 1
    — head-PACKED (B, L, head_groups*c) tokens, pooled without any per-head
    transpose (the conv weights are declared per head-channel-group, shared
    across heads exactly like the per-head path, and tiled at apply time).
    Returns (pooled, thw').
    """

    pool_mode: Optional[str]  # "conv" | "max" | "avg" | None
    kernel: Optional[Size3]
    stride: Size3
    has_cls_embed: bool = True
    norm_layer: Optional[Callable] = None
    depthwise_conv: bool = True
    head_groups: int = 1

    def _packed_call(self, x, thw: Size3, train: bool):
        """Tuple path: x = (cls|None, grid (B, L, Hg*c)) — the cls token is
        threaded separately (never sliced out of / concatenated onto the
        grid, reference attention.py:162-212 does both per q/k/v per block:
        measured ~5 ms/step of slice+copy choreography at MViT-B b16).
        Returns ((cls', grid'), thw')."""
        kernel = triple(self.kernel)
        stride = triple(self.stride)
        padding = tuple(k // 2 for k in kernel)
        Hg = self.head_groups

        cls_tok, x = x
        B, L, HC = x.shape
        c = HC // Hg
        T, Hh, W = thw
        grid = x.reshape(B, T, Hh, W, HC)

        norm = self.norm_layer(name="norm") if self.norm_layer is not None else None
        norm_before = norm is not None and norm_is_batchnorm(self.norm_layer)
        if norm_before:
            # BN stats/params are per head-channel (c,), shared across heads:
            # expose the head axis so the feature axis is c. The cls token is
            # untouched in BN mode (reference attention.py:193-197 norms the
            # grid tensor only, pre-pool).
            g6 = grid.reshape(B, T, Hh, W, Hg, c)
            g6 = norm(g6, train=train)
            grid = jax.nn.gelu(g6).reshape(B, T, Hh, W, HC)

        if self.pool_mode == "conv":
            in_pg = 1 if self.depthwise_conv else c
            w = _PoolConvParams(kernel, in_pg, c, name="pool")()
            if self.depthwise_conv:
                # Depthwise pool through the Pallas token-pool kernel: the
                # conv runs directly on the row-major packed layout, so no
                # grouped-conv relayout copies bracket it (ops/token_pool.py).
                from pytorchvideo_tpu.ops.token_pool import (
                    depthwise_token_pool,
                )

                w_packed = jnp.tile(w[..., 0, :], (1, 1, 1, Hg)).astype(
                    grid.dtype
                )
                grid = depthwise_token_pool(
                    grid,
                    w_packed,
                    stride,
                    padding,
                    # Init often runs host-side under jax.default_device(cpu),
                    # where pallas can't lower.
                    use_pallas=False if self.is_initializing() else None,
                )
            else:
                w = jnp.tile(w, (1, 1, 1, 1, Hg)).astype(grid.dtype)
                grid = jax.lax.conv_general_dilated(
                    grid,
                    w,
                    window_strides=stride,
                    padding=[(p, p) for p in padding],
                    dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
                    feature_group_count=Hg,
                )
        elif self.pool_mode == "max":
            from pytorchvideo_tpu.ops.token_pool import max_token_pool

            grid = max_token_pool(
                grid,
                kernel,
                stride,
                padding,
                use_pallas=False if self.is_initializing() else None,
            )
        elif self.pool_mode == "avg":
            from pytorchvideo_tpu.ops.token_pool import avg_token_pool

            grid = avg_token_pool(
                grid,
                kernel,
                stride,
                padding,
                use_pallas=False if self.is_initializing() else None,
            )
        else:
            raise NotImplementedError(self.pool_mode)

        thw_out = grid.shape[1:4]
        x = grid.reshape(B, thw_out[0] * thw_out[1] * thw_out[2], HC)
        if norm is not None and not norm_before:
            # LN post-pool is per-token: applying it to cls and grid
            # separately is exactly the reference's LN over [cls; grid].
            x = norm(x.reshape(B, -1, Hg, c), train=train).reshape(B, -1, HC)
            if cls_tok is not None:
                cls_tok = norm(
                    cls_tok.reshape(B, 1, Hg, c), train=train
                ).reshape(B, 1, HC)
        return (cls_tok, x), tuple(thw_out)

    @nn.compact
    def __call__(self, x, thw: Size3, train: bool = False):
        if self.pool_mode is None or self.kernel is None:
            return x, thw
        if isinstance(x, tuple):
            return self._packed_call(x, thw, train)
        kernel = triple(self.kernel)
        stride = triple(self.stride)
        padding = tuple(k // 2 for k in kernel)

        squeeze = x.ndim == 3
        if squeeze:
            x = x[:, None]
        cls_tok = None
        if self.has_cls_embed:
            cls_tok, x = x[:, :, :1], x[:, :, 1:]

        B, N, L, c = x.shape
        T, H, W = thw
        grid = x.reshape(B * N, T, H, W, c)

        norm = self.norm_layer(name="norm") if self.norm_layer is not None else None
        norm_before = norm is not None and norm_is_batchnorm(self.norm_layer)
        if norm_before:
            # BN-before-pool (+ GELU) special case, reference attention.py:193-197.
            grid = norm(grid, train=train)
            grid = jax.nn.gelu(grid)

        if self.pool_mode == "conv":
            grid = conv3d(
                c,
                kernel,
                stride,
                padding,
                groups=c if self.depthwise_conv else 1,
                bias=False,
                name="pool",
            )(grid)
        elif self.pool_mode == "max":
            grid = max_pool3d(grid, kernel, stride, padding)
        elif self.pool_mode == "avg":
            grid = avg_pool3d(grid, kernel, stride, padding)
        else:
            raise NotImplementedError(self.pool_mode)

        thw_out = grid.shape[1:4]
        x = grid.reshape(B, N, thw_out[0] * thw_out[1] * thw_out[2], c)
        if cls_tok is not None:
            x = jnp.concatenate([cls_tok, x], axis=2)
        if norm is not None and not norm_before:
            x = norm(x, train=train)
        if squeeze:
            x = x[:, 0]
        return x, tuple(thw_out)


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    residual_pool: bool,
) -> jnp.ndarray:
    """attn = softmax(q*scale @ k^T); out = attn @ v (+ q if residual_pool).

    Reference attention.py:531-537. q/k/v: (B, heads, L, c). The Pallas fused
    kernel in ops/ replaces this on TPU for long sequences.
    """
    attn = jnp.einsum(
        "bhqc,bhkc->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
    if residual_pool:
        out = out + q
    return out


def _maybe_kernel(kernel, stride) -> Optional[Size3]:
    """Pooling disabled when kernel and stride are all ones
    (reference attention.py:327-339)."""
    if kernel is None:
        return None
    if int(np.prod(triple(kernel))) == 1 and int(np.prod(triple(stride))) == 1:
        return None
    return triple(kernel)


class _ProjParams(nn.Module):
    """Declares a Dense-shaped (kernel, bias) param pair without running the
    GEMM. Used to keep separate q/k/v parameter trees (checkpoint-compatible
    with nn.Dense(name="q"|"k"|"v")) while computing all three projections
    as ONE fused GEMM — a single pass over the (B*L, C) activation instead
    of three (the activations dominate HBM traffic at MViT's early-block
    sequence lengths)."""

    features: int
    use_bias: bool

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.linear.default_kernel_init,
            (in_features, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class MultiScaleAttention(nn.Module):
    """Pooled multi-head attention (reference attention.py:215-544)."""

    dim_out: int
    num_heads: int = 8
    qkv_bias: bool = False
    dropout_rate: float = 0.0
    kernel_q: Size3 = (1, 1, 1)
    kernel_kv: Size3 = (1, 1, 1)
    stride_q: Size3 = (1, 1, 1)
    stride_kv: Size3 = (1, 1, 1)
    norm_layer: Callable = LayerNorm
    has_cls_embed: bool = True
    pool_mode: str = "conv"
    pool_first: bool = False
    residual_pool: bool = True
    depthwise_conv: bool = True
    bias_on: bool = True
    separate_qkv: bool = True

    def _split_heads(self, x, heads):
        B, L, C = x.shape
        return x.reshape(B, L, heads, C // heads).transpose(0, 2, 1, 3)

    def _merge_heads(self, x):
        B, N, L, c = x.shape
        return x.transpose(0, 2, 1, 3).reshape(B, L, N * c)

    def _fused_kv_attention(self, q, k_, v_, thw, kkv, head_dim, train):
        """kv-pool + LN + attention in ONE pallas_call
        (ops/fused_kvpool_attention.py) — removes the grouped-conv layout
        boundary the roofline doc shows is otherwise unremovable. Params
        are declared through the TokenPool tree twins (_FusedPoolParams),
        so this path and the unfused one share the same checkpoint."""
        import functools as _ft

        from pytorchvideo_tpu.ops.fused_kvpool_attention import (
            fused_kvpool_attention,
        )
        from pytorchvideo_tpu.ops.pooled_attention import (
            pooled_attention_packed_xla,
        )

        Hg, HC = self.num_heads, self.dim_out
        c = head_dim
        eps = (
            self.norm_layer.keywords.get("epsilon", 1e-5)
            if isinstance(self.norm_layer, _ft.partial)
            else 1e-5
        )
        kernel = triple(kkv)
        stride = triple(self.stride_kv)
        cls_q, grid_q = q
        cls_k, grid_k = k_
        cls_v, grid_v = v_

        wk, (lnk_s, lnk_b) = _FusedPoolParams(kernel, c, name="pool_k")()
        wv, (lnv_s, lnv_b) = _FusedPoolParams(kernel, c, name="pool_v")()
        kt, kh, kw = kernel
        dt = grid_k.dtype

        def tile_w(w):
            return (
                jnp.tile(w[..., 0, :], (1, 1, 1, Hg))
                .reshape(kt * kh * kw, HC)
                .astype(dt)
            )

        def tile_ln(s, b):
            return jnp.stack([jnp.tile(s, Hg), jnp.tile(b, Hg)]).astype(dt)

        def ln_cls(t, s, b):
            if t is None:
                return None
            B = t.shape[0]
            x = t.reshape(B, 1, Hg, c).astype(jnp.float32)
            mean = x.mean(-1, keepdims=True)
            var = ((x - mean) ** 2).mean(-1, keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + eps)
            x = x * s.astype(jnp.float32) + b.astype(jnp.float32)
            return x.reshape(B, 1, HC).astype(t.dtype)

        cls_k_n = ln_cls(cls_k, lnk_s, lnk_b)
        cls_v_n = ln_cls(cls_v, lnv_s, lnv_b)

        grid_out, kp, vp = fused_kvpool_attention(
            grid_q, grid_k, grid_v,
            tile_w(wk), tile_w(wv),
            tile_ln(lnk_s, lnk_b), tile_ln(lnv_s, lnv_b),
            cls_k_n, cls_v_n,
            tuple(thw), Hg, head_dim**-0.5, self.residual_pool,
            kernel, stride, eps,
        )
        cls_out = None
        if cls_q is not None:
            k_full = jnp.concatenate([cls_k_n, kp], axis=1)
            v_full = jnp.concatenate([cls_v_n, vp], axis=1)
            cls_out = pooled_attention_packed_xla(
                cls_q, k_full, v_full, Hg, head_dim**-0.5, self.residual_pool
            )
        return cls_out, grid_out

    @nn.compact
    def __call__(self, x, thw: Size3, train: bool = False):
        assert self.pool_mode in ("conv", "avg", "max")
        is_tuple = isinstance(x, tuple)
        if self.pool_first:
            # Legacy per-head layout path; fold a split input back together.
            if is_tuple:
                cls_in, grid_in = x
                x = (
                    grid_in
                    if cls_in is None
                    else jnp.concatenate([cls_in, grid_in], axis=1)
                )
        elif not is_tuple:
            # Main path always runs split: slice cls once here instead of
            # inside every TokenPool.
            x = (x[:, :1], x[:, 1:]) if self.has_cls_embed else (None, x)
        kq = _maybe_kernel(self.kernel_q, self.stride_q)
        kkv = _maybe_kernel(self.kernel_kv, self.stride_kv)
        conv_norm = self.norm_layer if self.pool_mode == "conv" else None

        def pool(name, kernel, stride, head_groups: int = 1):
            return TokenPool(
                pool_mode=self.pool_mode if kernel is not None else None,
                kernel=kernel,
                stride=stride,
                has_cls_embed=self.has_cls_embed,
                norm_layer=conv_norm if kernel is not None else None,
                depthwise_conv=self.depthwise_conv,
                head_groups=head_groups,
                name=name,
            )

        if self.pool_first:
            # Pool raw per-head tokens first, then project (attention.py:511-517).
            B, L, C = x.shape
            heads = self._split_heads(x, self.num_heads)
            q, q_thw = pool("pool_q", kq, self.stride_q)(heads, thw, train)
            k, k_thw = pool("pool_k", kkv, self.stride_kv)(heads, thw, train)
            v, v_thw = pool("pool_v", kkv, self.stride_kv)(heads, thw, train)
            q = self._split_heads(
                nn.Dense(self.dim_out, use_bias=self.qkv_bias, name="q")(
                    self._merge_heads(q)
                ),
                self.num_heads,
            )
            k = self._split_heads(
                nn.Dense(self.dim_out, use_bias=self.qkv_bias, name="k")(
                    self._merge_heads(k)
                ),
                self.num_heads,
            )
            v = self._split_heads(
                nn.Dense(self.dim_out, use_bias=self.qkv_bias, name="v")(
                    self._merge_heads(v)
                ),
                self.num_heads,
            )
        else:
            # Head-PACKED split path: tokens stay (B, L, H*c) — the Dense
            # projection layout — through pooling and attention (no per-head
            # (B,L,H,c)->(B,H,L,c) transposes reach HBM; measured ~11.5
            # ms/step of pure layout copies at MViT-B b16 otherwise), and
            # the cls token is threaded separately so no per-pool slicing
            # or concatenation touches the long grid axis.
            cls_x, grid_x = x
            C = grid_x.shape[-1]

            def _apply_pair(fn):
                return (None if cls_x is None else fn(cls_x), fn(grid_x))

            if self.separate_qkv:
                # Separate q/k/v params (reference layout). PVT_FUSED_QKV=1
                # computes all three projections as one (C, 3*dim_out) GEMM —
                # measured on v5e (mvit_base_16x4, B16, bf16): fused 287.7
                # vs separate 312.4 clips/s, i.e. the single-GEMM variant is
                # ~8% SLOWER end-to-end (the theoretical one-pass activation
                # saving is ~0.5 ms/step; the slice+per-head-reshape after
                # the wide GEMM fuses worse), so three GEMMs are the default.
                import os as _os

                wq, bq = _ProjParams(self.dim_out, self.qkv_bias, name="q")(C)
                wk, bk = _ProjParams(self.dim_out, self.qkv_bias, name="k")(C)
                wv, bv = _ProjParams(self.dim_out, self.qkv_bias, name="v")(C)
                d = self.dim_out
                if _os.environ.get("PVT_FUSED_QKV", "0") == "1":
                    w = jnp.concatenate([wq, wk, wv], axis=1)
                    bcat = (
                        jnp.concatenate([bq, bk, bv]) if self.qkv_bias else None
                    )

                    def _fused(a):
                        y = a @ w.astype(a.dtype)
                        if bcat is not None:
                            y = y + bcat.astype(y.dtype)
                        return y

                    qkv_pair = _apply_pair(_fused)
                    q_, k_, v_ = (
                        tuple(
                            None if p is None else p[..., i * d : (i + 1) * d]
                            for p in qkv_pair
                        )
                        for i in range(3)
                    )
                else:

                    def _proj(wa, ba):
                        def f(a):
                            out = a @ wa.astype(a.dtype)
                            if ba is not None:
                                out = out + ba.astype(out.dtype)
                            return out

                        return _apply_pair(f)

                    q_, k_, v_ = _proj(wq, bq), _proj(wk, bk), _proj(wv, bv)
            else:
                qkv_mod = nn.Dense(
                    self.dim_out * 3, use_bias=self.qkv_bias, name="qkv"
                )
                # Reference channel order within the fused projection is
                # (3, heads, head_dim) major-to-minor, so each third IS the
                # head-packed layout.
                d = self.dim_out
                qkv_pair = _apply_pair(qkv_mod)
                q_, k_, v_ = (
                    tuple(
                        None if p is None else p[..., i * d : (i + 1) * d]
                        for p in qkv_pair
                    )
                    for i in range(3)
                )
            q, q_thw = pool(
                "pool_q", kq, self.stride_q, head_groups=self.num_heads
            )(q_, thw, train)

            head_dim = self.dim_out // self.num_heads
            import os as _os

            from pytorchvideo_tpu.ops.fused_kvpool_attention import fusable

            use_fused = (
                _os.environ.get("PVT_FUSED_KVPOOL", "0") == "1"
                and not self.is_initializing()
                and self.pool_mode == "conv"
                and self.depthwise_conv
                and kkv is not None
                and self.norm_layer is not None
                and not norm_is_batchnorm(self.norm_layer)
                and fusable(
                    thw,
                    self.dim_out,
                    triple(kkv),
                    triple(self.stride_kv),
                    # VMEM live-buffer estimate must use the real activation
                    # itemsize: with f32 activations the bf16 default is 2x
                    # low, and over-budget geometries hang at runtime on v5e
                    # rather than failing cleanly. k_ is a (cls, grid) pair
                    # (entries may be None); any non-None leaf carries the
                    # activation dtype.
                    itemsize=jnp.dtype(
                        next(
                            p
                            for p in (
                                k_ if isinstance(k_, tuple) else (k_,)
                            )
                            if p is not None
                        ).dtype
                    ).itemsize,
                )
            )
            if use_fused:
                cls_out, grid_out = self._fused_kv_attention(
                    q, k_, v_, thw, kkv, head_dim, train
                )
            else:
                k, k_thw = pool(
                    "pool_k", kkv, self.stride_kv, head_groups=self.num_heads
                )(k_, thw, train)
                v, v_thw = pool(
                    "pool_v", kkv, self.stride_kv, head_groups=self.num_heads
                )(v_, thw, train)
                from pytorchvideo_tpu.ops.pooled_attention import (
                    pooled_attention_packed,
                    pooled_attention_packed_xla,
                )

                cls_q, grid_q = q
                # Keys/values DO need the cls row in front (every query
                # attends to it) — but only at the POOLED length, a tiny
                # concat.
                cls_k, grid_k = k
                cls_v, grid_v = v
                k_full = (
                    grid_k
                    if cls_k is None
                    else jnp.concatenate([cls_k, grid_k], axis=1)
                )
                v_full = (
                    grid_v
                    if cls_v is None
                    else jnp.concatenate([cls_v, grid_v], axis=1)
                )

                attn_fn = (
                    pooled_attention_packed_xla
                    # Init often runs host-side under
                    # jax.default_device(cpu), where pallas can't lower.
                    if self.is_initializing()
                    else pooled_attention_packed
                )
                grid_out = attn_fn(
                    grid_q,
                    k_full,
                    v_full,
                    self.num_heads,
                    head_dim**-0.5,
                    self.residual_pool,
                )
                cls_out = (
                    None
                    if cls_q is None
                    # Single-row query: the XLA einsum path is free (and the
                    # Pallas dispatch floor routes it there anyway).
                    else pooled_attention_packed_xla(
                        cls_q,
                        k_full,
                        v_full,
                        self.num_heads,
                        head_dim**-0.5,
                        self.residual_pool,
                    )
                )

            proj = nn.Dense(self.dim_out, use_bias=self.bias_on, name="proj")
            drop = (
                nn.Dropout(self.dropout_rate, deterministic=not train)
                if self.dropout_rate > 0.0
                else None
            )

            def _out(a):
                a = proj(a)
                return drop(a) if drop is not None else a

            cls_out = None if cls_out is None else _out(cls_out)
            grid_out = _out(grid_out)
            if is_tuple:
                return (cls_out, grid_out), q_thw
            out = (
                grid_out
                if cls_out is None
                else jnp.concatenate([cls_out, grid_out], axis=1)
            )
            return out, q_thw

        # pool_first: per-head layout (pool raw tokens, then project).
        head_dim = self.dim_out // self.num_heads
        if not self.is_initializing():
            from pytorchvideo_tpu.ops.pooled_attention import pooled_attention

            out = pooled_attention(
                q, k, v, head_dim**-0.5, self.residual_pool
            )
        else:
            out = scaled_dot_product_attention(
                q, k, v, head_dim**-0.5, self.residual_pool
            )
        out = self._merge_heads(out)
        out = nn.Dense(self.dim_out, use_bias=self.bias_on, name="proj")(out)
        if self.dropout_rate > 0.0:
            out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        return out, q_thw


class MultiScaleBlock(nn.Module):
    """MViT transformer block (reference attention.py:578-757)."""

    dim: int
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    dropout_rate: float = 0.0
    droppath_rate: float = 0.0
    act_layer: Callable = jax.nn.gelu
    norm_layer: Callable = LayerNorm
    attn_norm_layer: Callable = LayerNorm
    dim_mul_in_att: bool = False
    kernel_q: Size3 = (1, 1, 1)
    kernel_kv: Size3 = (1, 1, 1)
    stride_q: Size3 = (1, 1, 1)
    stride_kv: Size3 = (1, 1, 1)
    pool_mode: str = "conv"
    has_cls_embed: bool = True
    pool_first: bool = False
    residual_pool: bool = False
    depthwise_conv: bool = True
    bias_on: bool = True
    separate_qkv: bool = True

    def _drop_path_pair(self, pair, train: bool):
        """One shared per-sample mask over both halves of a (cls, grid)
        pair — two independent DropPath calls would drop the cls token and
        its grid inconsistently within the same residual branch."""
        cls_x, grid_x = pair
        if self.droppath_rate == 0.0 or not train:
            return pair
        keep = 1.0 - self.droppath_rate
        mask = jax.random.bernoulli(
            self.make_rng("dropout"), keep, (grid_x.shape[0], 1, 1)
        )
        scale = jnp.where(mask, 1.0 / keep, 0.0).astype(grid_x.dtype)
        return (
            None if cls_x is None else cls_x * scale,
            grid_x * scale,
        )

    @nn.compact
    def __call__(self, x, thw: Size3, train: bool = False):
        att_dim = self.dim_out if self.dim_mul_in_att else self.dim
        is_tuple = isinstance(x, tuple)
        if not is_tuple and not self.pool_first:
            # Run the block split (cls threaded separately); fold back at
            # the end so the array-in/array-out interface is unchanged.
            x = (x[:, :1], x[:, 1:]) if self.has_cls_embed else (None, x)
        split = isinstance(x, tuple)

        def _pair(fn, p):
            if not split:
                return fn(p)
            return (None if p[0] is None else fn(p[0]), fn(p[1]))

        norm1 = self.norm_layer(name="norm1")
        x_norm = _pair(lambda a: norm1(a, train=train), x)
        x_block, thw_new = MultiScaleAttention(
            dim_out=att_dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            dropout_rate=self.dropout_rate,
            kernel_q=self.kernel_q,
            kernel_kv=self.kernel_kv,
            stride_q=self.stride_q,
            stride_kv=self.stride_kv,
            norm_layer=self.attn_norm_layer,
            has_cls_embed=self.has_cls_embed,
            pool_mode=self.pool_mode,
            pool_first=self.pool_first,
            residual_pool=self.residual_pool,
            depthwise_conv=self.depthwise_conv,
            bias_on=self.bias_on,
            separate_qkv=self.separate_qkv,
            name="attn",
        )(x_norm, thw, train)
        if split and not isinstance(x_block, tuple):
            # pool_first attention returns an array even for tuple input.
            x_block = (
                (x_block[:, :1], x_block[:, 1:])
                if self.has_cls_embed
                else (None, x_block)
            )

        needs_proj = self.dim != self.dim_out
        if self.dim_mul_in_att and needs_proj:
            proj_att = nn.Dense(self.dim_out, use_bias=self.bias_on, name="proj")
            x = _pair(proj_att, x_norm)

        # Residual-path pooling: maxpool with kernel s+1 (s>1), stride s
        # (reference attention.py:680-683, 746).
        stride_skip = triple(self.stride_q)
        if int(np.prod(stride_skip)) > 1:
            kernel_skip = tuple(s + 1 if s > 1 else s for s in stride_skip)
            x_res, _ = TokenPool(
                pool_mode="max",
                kernel=kernel_skip,
                stride=stride_skip,
                has_cls_embed=self.has_cls_embed,
                norm_layer=None,
                name="pool_skip",
            )(x, thw, train)
        else:
            x_res = x

        if split:
            dp_block = self._drop_path_pair(x_block, train)
            x = (
                None
                if x_res[0] is None
                else x_res[0] + dp_block[0],
                x_res[1] + dp_block[1],
            )
        else:
            x = x_res + DropPath(self.droppath_rate)(x_block, train=train)

        norm2 = self.norm_layer(name="norm2")
        x_norm = _pair(lambda a: norm2(a, train=train), x)
        mlp = Mlp(
            hidden_features=int(att_dim * self.mlp_ratio),
            out_features=self.dim_out,
            act_layer=self.act_layer,
            dropout_rate=self.dropout_rate,
            bias_on=self.bias_on,
            name="mlp",
        )
        x_mlp = _pair(lambda a: mlp(a, train=train), x_norm)
        if not self.dim_mul_in_att and needs_proj:
            proj_mlp = nn.Dense(self.dim_out, use_bias=self.bias_on, name="proj")
            x = _pair(proj_mlp, x_norm)
        if split:
            dp_mlp = self._drop_path_pair(x_mlp, train)
            x = (
                None if x[0] is None else x[0] + dp_mlp[0],
                x[1] + dp_mlp[1],
            )
        else:
            x = x + DropPath(self.droppath_rate)(x_mlp, train=train)

        if split and not is_tuple:
            x = x[1] if x[0] is None else jnp.concatenate([x[0], x[1]], axis=1)
        return x, thw_new
