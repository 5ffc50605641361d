"""Fused pooled-attention kernel (Pallas/TPU) with XLA fallback.

MViT's attention (layers/attention.py scaled_dot_product_attention;
reference pytorchvideo/layers/attention.py:531-537) is tall-skinny after kv
pooling: L_q up to ~25k tokens, L_k pooled to a few hundred. K/V therefore
fit in VMEM, so the kernel is a single pass per q-tile: scores -> row softmax
-> @V -> (+q residual), never materializing the (L_q, L_k) attention matrix
in HBM.

Grid: (B*H, L_q tiles). Inputs are padded to MXU-friendly tiles in the
wrapper; the L_k pad is masked with -inf before softmax.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas import kept optional: CPU test envs use interpret mode
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_TILE_Q = 512


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, lk_valid, residual):
    """One (bh, q-tile) step: softmax(q@k^T * scale) @ v (+q)."""
    q = q_ref[0]  # (TILE_Q, c)
    k = k_ref[0]  # (Lk_pad, c)
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale
    # mask padded keys
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < lk_valid, scores, -jnp.inf)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        probs.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if residual:
        out = out + q.astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _attention_bwd_kernel(
    q_ref,
    k_ref,
    v_ref,
    g_ref,
    dq_ref,
    dk_ref,
    dv_ref,
    *,
    scale,
    lk_valid,
    residual,
    tile_axis=1,
):
    """One (bh, q-tile) backward step.

    Recomputes probs for the tile (flash-style — the (L_q, L_k) matrix is
    never stored), emits dq for the tile, and accumulates dk/dv into a
    single VMEM-resident (L_k, c) block across the sequential q-tile grid
    dimension (the dk/dv out blocks map every tile index to block 0, so
    the accumulator stays in VMEM for the whole bh row). ``tile_axis`` is
    the grid axis that walks q-tiles (1 for the (B*H, tiles) grid, 2 for
    the packed (B, H, tiles) grid).
    """
    i = pl.program_id(tile_axis)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < lk_valid, scores, -jnp.inf)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

    vf = v.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qf = q.astype(jnp.float32)
    # dp = g @ v^T ; softmax bwd: ds = p * (dp - rowsum(dp * p))
    dp = jax.lax.dot_general(
        g, vf, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dq = (
        jax.lax.dot_general(
            ds, kf, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    if residual:
        dq = dq + g
    dq_ref[0] = dq.astype(dq_ref.dtype)

    dk_t = (
        jax.lax.dot_general(
            ds, qf, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    dv_t = jax.lax.dot_general(
        probs, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = dk_t
        dv_ref[0] = dv_t

    @pl.when(i > 0)
    def _accum():
        dk_ref[0] += dk_t
        dv_ref[0] += dv_t


def _attention_kernel_packed(
    q_ref, k_ref, v_ref, o_ref, *, scale, heads, head_dim, residual
):
    """One (b, q-tile) step over head-PACKED tokens (tile, H*c).

    Processing all heads inside the kernel lets q/k/v/out keep the Dense
    projection layout (B, L, H*c) — no (B, L, H, c)->(B, H, L, c)
    transposes in HBM. Head slices at h*c offsets are lane-misaligned for
    c=96, so per-head outputs are concatenated in registers and written
    once as an aligned (tile, H*c) store. (BlockSpec-level head slicing
    would align everything, but Mosaic requires the minor block dim to be
    divisible by 128 or equal to the array dim — 96 is neither.)
    """
    q = q_ref[0]  # (tile_q, H*c)
    k = k_ref[0]  # (Lk, H*c)
    v = v_ref[0]
    outs = []
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q[:, sl]
        scores = jax.lax.dot_general(
            qh,
            k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = scores * scale
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        probs = jnp.exp(scores)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            probs.astype(v.dtype),
            v[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if residual:
            out = out + qh.astype(jnp.float32)
        outs.append(out.astype(o_ref.dtype))
    o_ref[0] = outs[0] if heads == 1 else jnp.concatenate(outs, axis=1)


def _attention_bwd_kernel_packed(
    q_ref,
    k_ref,
    v_ref,
    g_ref,
    dq_ref,
    dk_ref,
    dv_ref,
    *,
    scale,
    heads,
    head_dim,
    residual,
):
    """Packed backward: per-head flash-style recompute; dk/dv accumulate in
    a VMEM-resident (Lk, H*c) block across the sequential q-tile grid dim.
    Like the forward, per-head results are concatenated in registers and
    stored once per ref (aligned writes)."""
    i = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q[:, sl]
        kh = k[:, sl]
        vh = v[:, sl]
        gh = g[:, sl].astype(jnp.float32)
        scores = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = scores * scale
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        probs = jnp.exp(scores)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

        vf = vh.astype(jnp.float32)
        kf = kh.astype(jnp.float32)
        qf = qh.astype(jnp.float32)
        dp = jax.lax.dot_general(
            gh, vf, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
        dq = (
            jax.lax.dot_general(
                ds, kf, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        if residual:
            dq = dq + gh
        dqs.append(dq.astype(dq_ref.dtype))

        dks.append(
            jax.lax.dot_general(
                ds, qf, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        dvs.append(
            jax.lax.dot_general(
                probs, gh, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    dq_ref[0] = dqs[0] if heads == 1 else jnp.concatenate(dqs, axis=1)
    dk_t = dks[0] if heads == 1 else jnp.concatenate(dks, axis=1)
    dv_t = dvs[0] if heads == 1 else jnp.concatenate(dvs, axis=1)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = dk_t
        dv_ref[0] = dv_t

    @pl.when(i > 0)
    def _accum():
        dk_ref[0] += dk_t
        dv_ref[0] += dv_t


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def pooled_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    residual_pool: bool = False,
    interpret: bool = False,
    tile_q: int = _TILE_Q,
) -> jnp.ndarray:
    """q/k/v: (B, H, L, c). Returns (B, H, L_q, c).

    SPMD: batch-, head- and q-length-parallel under a mesh; key length and
    head_dim replicated (ops/spmd.py).
    """
    from pytorchvideo_tpu.ops.spmd import shard_by_rule

    fn = shard_by_rule(
        lambda a, b, c_: _pooled_attention_pallas_local(
            a, b, c_, scale, residual_pool, interpret, tile_q
        ),
        "b h lq c, b h lk c, b h lk c -> b h lq c",
        need_replication=("lk", "c"),
    )
    return fn(q, k, v)


def _pooled_attention_pallas_local(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    residual_pool: bool = False,
    interpret: bool = False,
    tile_q: int = _TILE_Q,
) -> jnp.ndarray:
    """Per-shard body. Forward runs on a cdiv grid without materialized
    padding: Mosaic handles the ragged final q-tile and the non-128 minor
    dims internally (measured v5e: bit-identical to the padded wrapper,
    ~16% faster at the MViT d0 shape, neutral at d1/d3 — see
    benchmarks/mvit_micro.py attention_nopad). Interpret mode (CPU tests)
    keeps the padded path, whose semantics the interpreter models exactly.
    """
    B, H, Lq, c = q.shape
    Lk = k.shape[2]

    if interpret:
        qf = _pad_to(_pad_to(q.reshape(B * H, Lq, c), 1, tile_q), 2, 128)
        kf = _pad_to(_pad_to(k.reshape(B * H, Lk, c), 1, 128), 2, 128)
        vf = _pad_to(_pad_to(v.reshape(B * H, Lk, c), 1, 128), 2, 128)
        Lq_pad, c_pad = qf.shape[1], qf.shape[2]
        Lk_pad = kf.shape[1]
        grid = (B * H, Lq_pad // tile_q)
        out = pl.pallas_call(
            functools.partial(
                _attention_kernel,
                scale=scale,
                lk_valid=Lk,
                residual=residual_pool,
            ),
            out_shape=jax.ShapeDtypeStruct((B * H, Lq_pad, c_pad), q.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, tile_q, c_pad), lambda b, i: (b, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, Lk_pad, c_pad), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lk_pad, c_pad), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, tile_q, c_pad), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            interpret=True,
        )(qf, kf, vf)
        return out[:, :Lq, :c].reshape(B, H, Lq, c)

    qf = q.reshape(B * H, Lq, c)
    kf = k.reshape(B * H, Lk, c)
    vf = v.reshape(B * H, Lk, c)
    tile_q = min(tile_q, Lq)
    grid = (B * H, pl.cdiv(Lq, tile_q))
    out = pl.pallas_call(
        functools.partial(
            _attention_kernel, scale=scale, lk_valid=Lk, residual=residual_pool
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, c), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_q, c), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
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


def pooled_attention_pallas_bwd(
    q, k, v, g, scale, residual_pool=False, interpret=False, tile_q=_TILE_Q
):
    """Backward pass: returns (dq, dk, dv), each shaped like its input.
    SPMD: batch/head-parallel; sequence lengths and head_dim replicated."""
    from pytorchvideo_tpu.ops.spmd import shard_by_rule

    fn = shard_by_rule(
        lambda a, b, c_, d: _pooled_attention_pallas_bwd_local(
            a, b, c_, d, scale, residual_pool, interpret, tile_q
        ),
        "b h lq c, b h lk c, b h lk c, b h lq c -> "
        "b h lq c, b h lk c, b h lk c",
        need_replication=("lq", "lk", "c"),
    )
    return fn(q, k, v, g)


def _pooled_attention_pallas_bwd_local(
    q, k, v, g, scale, residual_pool=False, interpret=False, tile_q=_TILE_Q
):
    B, H, Lq, c = q.shape
    Lk = k.shape[2]

    qf = _pad_to(_pad_to(q.reshape(B * H, Lq, c), 1, tile_q), 2, 128)
    kf = _pad_to(_pad_to(k.reshape(B * H, Lk, c), 1, 128), 2, 128)
    vf = _pad_to(_pad_to(v.reshape(B * H, Lk, c), 1, 128), 2, 128)
    gf = _pad_to(_pad_to(g.reshape(B * H, Lq, c), 1, tile_q), 2, 128)
    Lq_pad, c_pad = qf.shape[1], qf.shape[2]
    Lk_pad = kf.shape[1]

    grid = (B * H, Lq_pad // tile_q)
    kv_spec = pl.BlockSpec(
        (1, Lk_pad, c_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    q_spec = pl.BlockSpec(
        (1, tile_q, c_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _attention_bwd_kernel,
            scale=scale,
            lk_valid=Lk,
            residual=residual_pool,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Lq_pad, c_pad), q.dtype),
            jax.ShapeDtypeStruct((B * H, Lk_pad, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((B * H, Lk_pad, c_pad), jnp.float32),
        ],
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, q_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
        interpret=interpret,
    )(qf, kf, vf, gf)
    dq = dq[:, :Lq, :c].reshape(B, H, Lq, c)
    dk = dk[:, :Lk, :c].reshape(B, H, Lk, c).astype(k.dtype)
    dv = dv[:, :Lk, :c].reshape(B, H, Lk, c).astype(v.dtype)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def pooled_attention_pallas_ad(
    q, k, v, scale, residual_pool=False, interpret=False, tile_q=_TILE_Q
):
    """Differentiable fused pooled attention (Pallas fwd + Pallas bwd).

    Same math as :func:`pooled_attention_xla`; the backward recomputes
    probs per q-tile (flash-attention style) so the (L_q, L_k) matrix
    never reaches HBM in either direction. Use in training.
    """
    return pooled_attention_pallas(
        q, k, v, scale, residual_pool, interpret, tile_q
    )


def _ad_fwd(q, k, v, scale, residual_pool, interpret, tile_q):
    out = pooled_attention_pallas(
        q, k, v, scale, residual_pool, interpret, tile_q
    )
    return out, (q, k, v)


def _ad_bwd(scale, residual_pool, interpret, tile_q, res, g):
    q, k, v = res
    dq, dk, dv = pooled_attention_pallas_bwd(
        q, k, v, g, scale, residual_pool, interpret, tile_q
    )
    return dq, dk, dv


pooled_attention_pallas_ad.defvjp(_ad_fwd, _ad_bwd)


def _packed_pallas_local(q, k, v, head_dim, scale, residual_pool, tile_q,
                         interpret):
    """Per-shard packed attention: the head count comes from the LOCAL
    channel width, so a head-parallel (TP) shard of the packed dim just
    runs the kernel on its own heads."""
    B, Lq, HC = q.shape
    Lk = k.shape[1]
    assert HC % head_dim == 0, (
        f"packed channel shard {HC} does not divide into head_dim "
        f"{head_dim}; shard the model axis over whole heads"
    )
    heads = HC // head_dim
    tile_q = min(tile_q, Lq)
    grid = (B, pl.cdiv(Lq, tile_q))
    q_spec = pl.BlockSpec(
        (1, tile_q, HC), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, Lk, HC), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _attention_kernel_packed,
            scale=scale,
            heads=heads,
            head_dim=head_dim,
            residual=residual_pool,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Lq, HC), q.dtype),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        interpret=interpret,
    )(q, k, v)


def pooled_attention_packed_pallas(
    q,
    k,
    v,
    num_heads,
    scale,
    residual_pool=False,
    tile_q=_TILE_Q,
    interpret=False,
):
    """q/k/v: (B, L, H*c) head-packed (the Dense projection layout).
    Returns (B, L_q, H*c).

    SPMD: batch-, q-length- and head-parallel under a mesh (a shard of the
    packed channel dim = a set of whole heads, asserted in the local fn);
    the key length stays replicated (ops/spmd.py).
    """
    from pytorchvideo_tpu.ops.spmd import shard_by_rule

    head_dim = q.shape[-1] // num_heads
    fn = shard_by_rule(
        lambda a, b, c: _packed_pallas_local(
            a, b, c, head_dim, scale, residual_pool, tile_q, interpret
        ),
        "b lq hc, b lk hc, b lk hc -> b lq hc",
        need_replication=("lk",),
    )
    return fn(q, k, v)


def pooled_attention_packed_pallas_bwd(
    q,
    k,
    v,
    g,
    num_heads,
    scale,
    residual_pool=False,
    tile_q=_TILE_Q,
    interpret=False,
):
    """SPMD: batch- and head-parallel; both sequence lengths replicated
    (dk/dv reduce over L_q, dq over L_k)."""
    from pytorchvideo_tpu.ops.spmd import shard_by_rule

    head_dim = q.shape[-1] // num_heads
    fn = shard_by_rule(
        lambda a, b, c, d: _packed_pallas_bwd_local(
            a, b, c, d, head_dim, scale, residual_pool, tile_q, interpret
        ),
        "b lq hc, b lk hc, b lk hc, b lq hc -> b lq hc, b lk hc, b lk hc",
        need_replication=("lq", "lk"),
    )
    return fn(q, k, v, g)


def _packed_pallas_bwd_local(
    q, k, v, g, head_dim, scale, residual_pool, tile_q, interpret
):
    B, Lq, HC = q.shape
    Lk = k.shape[1]
    assert HC % head_dim == 0, (
        f"packed channel shard {HC} does not divide into head_dim {head_dim}"
    )
    num_heads = HC // head_dim
    c = head_dim
    tile_q = min(tile_q, Lq)
    # Pad L_q to the tile so ragged final-tile rows can't pollute the dk/dv
    # accumulators (their g rows are zero => zero contribution).
    qf = _pad_to(q, 1, tile_q)
    gf = _pad_to(g, 1, tile_q)
    Lq_pad = qf.shape[1]
    grid = (B, Lq_pad // tile_q)
    q_spec = pl.BlockSpec(
        (1, tile_q, HC), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, Lk, HC), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _attention_bwd_kernel_packed,
            scale=scale,
            heads=num_heads,
            head_dim=c,
            residual=residual_pool,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Lq_pad, HC), q.dtype),
            jax.ShapeDtypeStruct((B, Lk, HC), jnp.float32),
            jax.ShapeDtypeStruct((B, Lk, HC), jnp.float32),
        ],
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, q_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
        interpret=interpret,
    )(qf, k, v, gf)
    return dq[:, :Lq], dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def pooled_attention_packed_ad(
    q, k, v, num_heads, scale, residual_pool=False, tile_q=_TILE_Q,
    interpret=False,
):
    """Differentiable packed-layout fused pooled attention."""
    return pooled_attention_packed_pallas(
        q, k, v, num_heads, scale, residual_pool, tile_q, interpret
    )


def _packed_ad_fwd(q, k, v, num_heads, scale, residual_pool, tile_q, interpret):
    out = pooled_attention_packed_pallas(
        q, k, v, num_heads, scale, residual_pool, tile_q, interpret
    )
    return out, (q, k, v)


def _packed_ad_bwd(num_heads, scale, residual_pool, tile_q, interpret, res, g):
    q, k, v = res
    return pooled_attention_packed_pallas_bwd(
        q, k, v, g, num_heads, scale, residual_pool, tile_q, interpret
    )


pooled_attention_packed_ad.defvjp(_packed_ad_fwd, _packed_ad_bwd)


def pooled_attention_packed_xla(q, k, v, num_heads, scale, residual_pool=False):
    """XLA path over packed (B, L, H*c) tokens (same math)."""
    B, Lq, HC = q.shape
    Lk = k.shape[1]
    c = HC // num_heads
    qh = q.reshape(B, Lq, num_heads, c)
    kh = k.reshape(B, Lk, num_heads, c)
    vh = v.reshape(B, Lk, num_heads, c)
    attn = jnp.einsum(
        "bqhc,bkhc->bhqk", qh * scale, kh, preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhc->bqhc", attn, vh).reshape(B, Lq, HC)
    if residual_pool:
        out = out + q
    return out


def pooled_attention_packed(
    q,
    k,
    v,
    num_heads: int,
    scale,
    residual_pool: bool = False,
    use_pallas: Optional[bool] = None,
):
    """Packed-layout dispatch (tokens stay (B, L, H*c) end to end).

    Same policy as :func:`pooled_attention`: Pallas on TPU for long
    sequences, XLA otherwise; ``PVT_POOLED_ATTENTION`` overrides.
    """
    if use_pallas is None:
        import os

        mode = os.environ.get("PVT_POOLED_ATTENTION", "auto")
        if mode == "pallas":
            use_pallas = True
        elif mode == "xla":
            use_pallas = False
        else:
            # Measured v5e across the real MViT-B depth shapes (B16): the
            # packed kernel at tile 512 beats the XLA einsum path at every
            # depth incl. the short late blocks (Lq=393: 0.10 vs 0.15 ms
            # micro; in-model the XLA path costs ~2.5 ms in unfused fp32
            # softmax HBM traffic), so the threshold is only a floor for
            # degenerate sequences.
            use_pallas = (
                _HAS_PALLAS
                and jax.default_backend() == "tpu"
                and q.shape[1] >= 128
            )
    if use_pallas:
        # The kernel keeps the full (Lk, H*c) k+v block VMEM-resident, so
        # the q-tile must shrink as Lk grows to stay inside the 16 MB
        # scoped-VMEM stack. Measured on v5e at the MViT-B geometries:
        #   Lk<=1024 (16x4 depths): tile 512 optimal;
        #   Lk<=2048 (16x4 late 1569-kv blocks): 256 (512 OOMs the stack);
        #   beyond (32x3 block 14: Lq 784, Lk 3137, H*c 768): 256 OOMs at
        #   19.17M/16M, tile 128 fits and runs 0.906 ms vs 1.855 XLA.
        # If k+v residency gets large, fall back to XLA: in-model (baked
        # weights) XLA may additionally pin the kernel's OUTPUT in scoped
        # VMEM (observed: MViT-B 32x3 block 14, Lq 784 x Lk 3137 x H*c 768
        # -> out 9.6M S(1) + kv 9.6M = 18.8M/16M stack OOM at ANY q-tile,
        # even though the standalone kernel at tile 128 compiles and runs
        # 0.906 ms vs 1.855 XLA). The placement is XLA's choice and not
        # observable here, so gate on kv residency alone: >8 MB routes to
        # XLA (costs ~1 ms on that one block; every 16x4 geometry, max kv
        # 4.8 MB, keeps the kernel).
        hc_pad = -(-q.shape[-1] // 128) * 128
        # k.dtype.itemsize, not a hard-coded 2: with f32 activations (e.g.
        # non-deploy eval) the k+v residency doubles, and underestimating
        # it kept the Pallas kernel on geometries that OOM the 16 MB
        # scoped-VMEM stack (ADVICE r4). The tile ladder below was
        # measured at bf16, so it keys on an itemsize-scaled effective Lk
        # (f32 halves both thresholds — same VMEM residency per tile).
        itemsize = jnp.dtype(k.dtype).itemsize
        kv_bytes = 2 * k.shape[1] * hc_pad * itemsize
        if kv_bytes > 8 * 2**20:
            return pooled_attention_packed_xla(
                q, k, v, num_heads, scale, residual_pool
            )
        lk = k.shape[1]
        eff_lk = lk * itemsize // 2
        tile_q = (
            _TILE_Q if eff_lk <= 1024 else (256 if eff_lk <= 2048 else 128)
        )
        return pooled_attention_packed_ad(
            q, k, v, num_heads, scale, residual_pool, tile_q
        )
    return pooled_attention_packed_xla(q, k, v, num_heads, scale, residual_pool)


def pooled_attention_xla(q, k, v, scale, residual_pool=False):
    """Reference XLA path (same math as layers.attention)."""
    attn = jnp.einsum(
        "bhqc,bhkc->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
    if residual_pool:
        out = out + q
    return out


def pooled_attention(
    q,
    k,
    v,
    scale,
    residual_pool: bool = False,
    use_pallas: Optional[bool] = None,
):
    """Dispatch: Pallas on TPU for long sequences, XLA otherwise.

    Env override ``PVT_POOLED_ATTENTION`` = ``pallas`` | ``xla`` | ``auto``
    (default auto). Note auto keys off the default backend — computations
    explicitly placed on another device (e.g. ``jax.default_device(cpu)``
    while a TPU is present) should set the env var to ``xla``.
    """
    if use_pallas is None:
        import os

        mode = os.environ.get("PVT_POOLED_ATTENTION", "auto")
        if mode == "pallas":
            use_pallas = True
        elif mode == "xla":
            use_pallas = False
        else:
            use_pallas = (
                _HAS_PALLAS
                and jax.default_backend() == "tpu"
                and q.shape[2] >= 1024
            )
    if use_pallas:
        # Measured on v5e across the real MViT-B depth shapes: the smaller
        # q-tile wins once Lq padding waste matters (Lq 1569 pads to 2048
        # at tile 512 vs 1792 at 256); the large tile wins for Lq >= 8k.
        tile_q = _TILE_Q if q.shape[2] >= 8192 else 256
        return pooled_attention_pallas_ad(
            q, k, v, scale, residual_pool, False, tile_q
        )
    return pooled_attention_xla(q, k, v, scale, residual_pool)
