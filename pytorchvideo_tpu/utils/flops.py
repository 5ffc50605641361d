"""Model complexity analysis: FLOPs / parameter counts.

The reference reports per-model "Flops x views" and params in its zoo
tables, computed with fvcore's flop counter (docs/source/model_zoo.md:63,
tests/benchmark_accelerator_efficient_blocks.py:9). TPU-native analogue:
XLA's own compiled-HLO cost model (`Compiled.cost_analysis()["flops"]`) —
it measures exactly what the chip will execute, including fusion effects,
instead of re-deriving per-op formulas.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def count_params(variables: Dict[str, Any]) -> int:
    """Total trainable parameter count (``params`` collection only)."""
    return sum(
        int(np.prod(a.shape))
        for a in jax.tree_util.tree_leaves(variables.get("params", variables))
    )


def flops_of(fn, *args, backend: Optional[str] = None) -> float:
    """FLOPs of one call of ``fn(*args)`` per XLA cost analysis.

    Returns total flops (adds + multiplies both counted, matching
    fvcore's convention of 2*MACs only when XLA reports it that way —
    XLA counts multiply-add as 2 flops for dots/convs).
    """
    compiled = (
        jax.jit(fn, backend=backend) if backend else jax.jit(fn)
    ).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def model_complexity(
    model,
    input_shape: Tuple[int, ...],
    dtype=jnp.float32,
    train: bool = False,
) -> Dict[str, float]:
    """{"gflops": single-clip forward GFLOPs, "params_m": params in 1e6}.

    ``input_shape`` excludes the batch dim (single-view convention of
    the reference tables: GFLOPs per one clip). Params match the
    reference tables exactly (e.g. x3d_s 3.794M, slow_r50 32.454M);
    GFLOPs run ~1.4x the reference numbers because fvcore counts a
    conv/dot multiply-add as one flop and skips most elementwise ops,
    while XLA's cost model counts what the compiled program executes.
    """
    x = jnp.zeros((1,) + tuple(input_shape), dtype)
    variables = model.init(jax.random.PRNGKey(0), x, False)

    def fwd(v, x):
        return model.apply(v, x, train)

    flops = flops_of(fwd, variables, x)
    return {
        "gflops": flops / 1e9,
        "params_m": count_params(variables) / 1e6,
    }
