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
    fsdp_axis: str = None,
    fsdp_min_size: int = 2**16,
):
    """Map a params pytree to NamedShardings by path rules.

    Unmatched params replicate — unless ``fsdp_axis`` is given, in which
    case every unmatched param with ``>= fsdp_min_size`` elements is
    sharded along its largest evenly-divisible dimension over that mesh
    axis (FSDP/ZeRO-3 under GSPMD: XLA all-gathers params for compute
    and reduce-scatters grads). Shard the optimizer state to match with
    :func:`optimizer_state_shardings` — that's where the ZeRO memory win
    for master weights + momenta comes from. Models here are small
    (<= 63M params) so this is an extension beyond reference parity,
    useful once per-chip HBM is tight (e.g. long-clip MViT training with
    big batches).
    """
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def fsdp_spec(leaf):
        if leaf.ndim == 0 or leaf.size < fsdp_min_size:
            return None
        n = mesh.shape[fsdp_axis]
        # shard the largest divisible dim (ties -> last such dim, which
        # for conv/dense kernels is the output-features dim)
        best_dim, best = None, 0
        for dim, s in enumerate(leaf.shape):
            if s % n == 0 and s >= best:
                best_dim, best = dim, s
        if best_dim is None:
            return None
        spec = [None] * leaf.ndim
        spec[best_dim] = fsdp_axis
        return P(*spec)

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
        if fsdp_axis is not None:
            spec = fsdp_spec(leaf)
            if spec is not None:
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return spec_for("/" + "/".join(path), tree)

    return walk(params)


def optimizer_state_shardings(opt_state, param_shardings, mesh: Mesh):
    """Shardings for an optax state mirroring the param shardings.

    optax states embed params-shaped subtrees (SGD momentum `trace`,
    Adam `mu`/`nu`, ...): each such subtree inherits ``param_shardings``
    wholesale, so sharded params (FSDP/TP) get equally-sharded optimizer
    state — the ZeRO memory benefit. Everything else (step counts,
    scalars) replicates.
    """
    repl = NamedSharding(mesh, P())
    pdef = jax.tree_util.tree_structure(param_shardings)

    def is_params_shaped(node):
        try:
            return jax.tree_util.tree_structure(node) == pdef
        except Exception:
            return False

    return jax.tree_util.tree_map(
        lambda node: param_shardings
        if is_params_shaped(node)
        else jax.tree_util.tree_map(lambda _: repl, node),
        opt_state,
        is_leaf=is_params_shaped,
    )
