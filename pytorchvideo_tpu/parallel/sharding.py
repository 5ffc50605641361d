"""Parameter sharding rules (tensor parallelism via GSPMD).

The reference has no TP (SURVEY §2.10); this is the TPU-native extension
point: Megatron-style column/row sharding of attention/MLP Dense kernels
over the ``model`` mesh axis. Under jit, XLA inserts the all-reduces.
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-regex, PartitionSpec) — first match wins. Dense kernels are (in, out):
# column-parallel on out for q/k/v/fc1, row-parallel on in for proj/fc2.
MEGATRON_ATTENTION_RULES: List[Tuple[str, P]] = [
    (r".*/attn/(q|k|v|qkv)/kernel$", P(None, "model")),
    (r".*/attn/proj/kernel$", P("model", None)),
    (r".*/mlp/fc1/kernel$", P(None, "model")),
    (r".*/mlp/fc2/kernel$", P("model", None)),
]


def infer_param_shardings(
    params,
    mesh: Mesh,
    rules: Sequence[Tuple[str, P]] = (),
):
    """Map a params pytree to NamedShardings by path rules (default:
    replicate everything not matched)."""
    compiled = [(re.compile(pat), spec) for pat, spec in rules]
    flat = jax.tree_util.tree_flatten_with_path(params)

    def spec_for(path_str, leaf):
        for pat, spec in compiled:
            if pat.match(path_str):
                # sanity: sharded dims must divide
                ok = True
                for dim, axis in enumerate(spec):
                    if axis is None:
                        continue
                    size = mesh.shape[axis]
                    if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
                        ok = False
                if ok:
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return spec_for("/" + "/".join(path), tree)

    return walk(params)
