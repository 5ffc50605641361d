"""SPMD partitioning for Pallas kernels (Shardy custom_partitioning).

A bare ``pallas_call`` is an opaque custom call to the partitioner: under
``jit`` over a Mesh, GSPMD/Shardy replicates it — every kernel invocation
all-gathers its full global operands (measured on the 8-device CPU mesh:
12 all-gathers around one pooled conv). That silently destroys multi-chip
scaling for any model whose hot path runs through Pallas.

``shard_by_rule`` wraps a per-shard computation with
``jax.experimental.custom_partitioning`` and an einsum-style Shardy
sharding rule, so the partitioner knows which dimensions are parallel
(batch, channels/heads) and which must stay replicated (sequence,
spatial). The wrapped function must derive every static (tile counts,
head counts) from its *local* operand shapes — it is lowered once per
shard shape.

Reduction outputs (e.g. depthwise-conv weight grads, reduced over batch)
get their cross-shard ``psum`` inserted inside the per-shard lowering,
over whatever mesh axes actually shard the reduced dimension.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence, Tuple

import jax

try:
    from jax.experimental.custom_partitioning import custom_partitioning

    _HAS_CUSTOM_PARTITIONING = True
except Exception:  # pragma: no cover
    _HAS_CUSTOM_PARTITIONING = False


def _spec_axes(sharding, dim: int):
    """Mesh axis name(s) sharding dimension ``dim`` of a NamedSharding."""
    try:
        spec = sharding.spec
    except AttributeError:
        return None
    if spec is None or dim >= len(spec):
        return None
    return spec[dim]


def shard_by_rule(
    fn: Callable,
    rule: str,
    *,
    need_replication: Sequence[str] = (),
    reduction: Sequence[str] = (),
    psum_over_arg_dim: Optional[Tuple[int, int]] = None,
):
    """Wrap ``fn`` with a Shardy sharding rule.

    ``fn`` runs per-shard and must compute all statics from local shapes.
    ``rule`` is the einsum-like factor notation ("b t h w c, k c -> ...").
    ``psum_over_arg_dim`` = (arg_index, dim): when that operand dimension is
    sharded, the per-shard result is psum'd over its mesh axes (use with a
    ``reduction`` factor on that dimension).
    """
    if not _HAS_CUSTOM_PARTITIONING:  # pragma: no cover
        return fn

    # Single-device processes cannot shard, so the wrapper is pure cost:
    # custom_partitioning is an opaque call boundary to XLA's fusion passes
    # (measured v5e, MViT-B 16x4 b16: 268 clips/s wrapped vs 289 bypassed —
    # the round-2 0.829x bench regression was exactly this wrapper landing
    # in acb5426). PVT_SPMD_WRAP=1 forces the wrapper for debugging.
    wrap = os.environ.get("PVT_SPMD_WRAP", "auto")
    if wrap == "0" or (wrap == "auto" and jax.device_count() == 1):
        return fn

    cp = custom_partitioning(fn)

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = jax.tree.map(lambda s: s.sharding, arg_shapes)
        result_shardings = jax.tree.map(lambda s: s.sharding, result_shape)

        lower = fn
        if psum_over_arg_dim is not None:
            idx, dim = psum_over_arg_dim
            axes = _spec_axes(jax.tree.leaves(arg_shardings)[idx], dim)
            if axes is not None:

                def lower(*args, _axes=axes):
                    return jax.lax.psum(fn(*args), _axes)

        return mesh, lower, result_shardings, arg_shardings

    def infer_sharding_from_operands(mesh, arg_shapes, shape):
        # Only consulted on the non-Shardy path; the sharding_rule drives
        # propagation under Shardy. Conservative default: replicate.
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.tree.map(
            lambda s: NamedSharding(mesh, PartitionSpec()), shape
        )

    # Shardy requires special-factor lists sorted by the factors' indices,
    # which are assigned by first appearance in the rule string.
    order = []
    for tok in rule.replace(",", " ").replace("->", " ").split():
        if tok not in order:
            order.append(tok)

    def _sorted(factors):
        return tuple(sorted(factors, key=order.index))

    cp.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=rule,
        need_replication_factors=_sorted(need_replication),
        reduction_factors=_sorted(reduction),
    )
    return cp
