"""Sequence parallelism for pooled attention (beyond the reference).

The reference parallelizes only over batch (Lightning DDP,
pytorchvideo_trainer/module/video_classification.py:104-223). MViT's
long-token regimes (32x3: 50k tokens before the first pool) also admit
TPU-native SEQUENCE parallelism: attention rows are independent given
the full keys/values, so the query/token axis of the packed layout
(B, L, H*c) shards across a mesh axis while each device computes its
rows' attention locally — the classic context-parallel decomposition.

Two kv layouts:

- ``kv_sharded=False``: k/v are replicated (the layout after a
  replicated kv-pool). Zero collectives inside; pure row partition.
- ``kv_sharded=True``: k/v arrive token-sharded like every other
  activation (the all-L-sharded training layout). Each shard
  ``all_gather``s the (pooled, small) kv blocks over ICI before its
  local attention — the same gather the scaling-book recipe inserts
  for context parallelism; kv after MViT pooling is 8-64x smaller
  than q, so the gathered bytes are the cheap direction.

The local compute reuses :func:`pooled_attention_packed` unchanged, so
each shard keeps the measured Pallas tiling ladder (TPU) or the XLA
einsum path (CPU test mesh), and the custom VJP: the whole thing is
differentiable and `shard_map` partitions the backward the same way.

Composes with the TP head sharding in ``parallel/sharding.py``
(MEGATRON_ATTENTION_RULES): heads shard the packed channel axis, this
shards the token axis — distinct mesh axes.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pytorchvideo_tpu.ops.pooled_attention import pooled_attention_packed


def sequence_parallel_attention(
    q,
    k,
    v,
    num_heads: int,
    scale,
    residual_pool: bool = False,
    *,
    mesh: Mesh,
    axis: str = "model",
    batch_axis: Optional[str] = None,
    kv_sharded: bool = False,
):
    """Packed pooled attention with the token axis sharded over ``axis``.

    Args:
      q: (B, Lq, H*c) packed queries; ``Lq`` must divide evenly by the
        ``axis`` mesh size (MViT's grid tokens do once the cls row is
        split off — ``layers/attention.py`` already threads cls
        separately, reference layers/attention.py:341-404).
      k, v: (B, Lk, H*c); replicated, or token-sharded with
        ``kv_sharded=True`` (``Lk`` must then also divide evenly).
      mesh / axis: mesh axis to shard tokens over.
      batch_axis: optional mesh axis the batch is already sharded on
        (compose sp with dp).
    """
    ax_size = mesh.shape[axis]
    if q.shape[1] % ax_size:
        raise ValueError(
            f"sequence axis Lq={q.shape[1]} must divide the '{axis}' mesh "
            f"size {ax_size}; pad the token grid or split the cls row "
            "off first (layers/attention.py does)"
        )
    if kv_sharded and k.shape[1] % ax_size:
        raise ValueError(
            f"kv_sharded=True needs Lk={k.shape[1]} divisible by the "
            f"'{axis}' mesh size {ax_size}"
        )
    qspec = P(batch_axis, axis, None)
    kvspec = P(batch_axis, axis if kv_sharded else None, None)

    def local(q_, k_, v_):
        if kv_sharded:
            k_ = jax.lax.all_gather(k_, axis, axis=1, tiled=True)
            v_ = jax.lax.all_gather(v_, axis, axis=1, tiled=True)
        return pooled_attention_packed(
            q_, k_, v_, num_heads, scale, residual_pool
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(qspec, kvspec, kvspec),
        out_specs=qspec,
    )(q, k, v)
