"""Training/eval step builders: SPMD data-parallel over a Mesh.

The reference trains via PyTorch Lightning DDP with manual optimization
(pytorchvideo_trainer/module/video_classification.py:104-223). TPU-native
equivalent: a pure jitted step over a ``jax.sharding.Mesh`` — params
replicated (or TP-sharded), batch sharded on the ``data`` axis, gradients
globally correct by construction (GSPMD inserts the all-reduce that DDP did
with NCCL). BatchNorm under jit sees the *global* batch, giving SyncBN
semantics (reference NaiveSyncBatchNorm) with zero extra code.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from pytorchvideo_tpu.losses import soft_target_cross_entropy


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(variables, tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Callable = soft_target_cross_entropy,
    batch_transform: Optional[Callable] = None,
    clip_grad_norm: Optional[float] = None,
    input_key: str = "video",
    label_key: str = "label",
    compute_dtype: Optional[Any] = None,
    remat_policy: Optional[str] = None,
    grad_accum_steps: int = 1,
):
    """Build a pure (state, batch, rng) -> (state, metrics) step.

    ``batch_transform``: optional (key, video, labels) -> (video, labels)
    on-device batch op (MixUp/CutMix — the reference's MixVideoBatchWrapper).
    Wrap the result in jit with shardings from parallel.mesh.

    ``compute_dtype``: optional mixed-precision policy (e.g.
    ``jnp.bfloat16``). Master params, optimizer state, BN running stats
    (flax computes batch stats in f32 regardless of input dtype), logits,
    and loss stay f32; the forward/backward matmuls and activations run in
    ``compute_dtype`` — params and inputs are cast at the top of the loss
    so gradients come out f32 against the f32 masters.

    ``remat_policy``: optional activation rematerialization (HBM-for-FLOPs
    trade to fit bigger batches / longer clips). ``"full"`` saves nothing
    across the fwd/bwd boundary (max memory savings, ~1 extra forward);
    any other string names a ``jax.checkpoint_policies`` member, e.g.
    ``"dots_with_no_batch_dims_saveable"`` (save matmul outputs, recompute
    elementwise chains — the usual TPU sweet spot).

    ``grad_accum_steps``: split the batch into N microbatches and
    ``lax.scan`` over them — gradients averaged, ONE optimizer update, BN
    stats threaded sequentially through microbatches. Effective batches
    larger than HBM allows, with jit-static shapes (batch size must divide
    evenly). Batch transforms (MixUp) run once on the whole batch first,
    so mixing pairs span the full effective batch.
    """

    def step(state: TrainState, batch: Dict[str, Any], rng) -> Tuple[TrainState, Dict]:
        video = batch[input_key]
        labels = batch[label_key]
        mix_key, dropout_key = jax.random.split(jax.random.fold_in(rng, state.step))
        if batch_transform is not None:
            video, labels = batch_transform(mix_key, video, labels)

        def forward(params, stats, x, key):
            fwd = lambda p, xx: model.apply(
                {"params": p, "batch_stats": stats},
                xx,
                True,
                mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            if remat_policy is not None:
                policy = (
                    None
                    if remat_policy == "full"
                    else getattr(jax.checkpoint_policies, remat_policy)
                )
                fwd = jax.checkpoint(fwd, policy=policy)
            return fwd(params, x)

        def loss_of(params, stats, x, y, key):
            if compute_dtype is not None:
                params = jax.tree_util.tree_map(
                    lambda a: a.astype(compute_dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating)
                    else a,
                    params,
                )
                x = jax.tree_util.tree_map(
                    lambda a: a.astype(compute_dtype), x
                )
            out, mutated = forward(params, stats, x, key)
            loss = loss_fn(out.astype(jnp.float32), y)
            return loss, (out, mutated.get("batch_stats", stats))

        grad_fn = jax.value_and_grad(loss_of, has_aux=True)

        if grad_accum_steps > 1:
            def split(a):
                if a.shape[0] % grad_accum_steps != 0:
                    raise ValueError(
                        f"batch size {a.shape[0]} is not divisible by "
                        f"grad_accum_steps={grad_accum_steps}"
                    )
                return a.reshape(
                    (grad_accum_steps, a.shape[0] // grad_accum_steps)
                    + a.shape[1:]
                )
            micro_videos = jax.tree_util.tree_map(split, video)
            micro_labels = jax.tree_util.tree_map(split, labels)
            micro_keys = jax.random.split(dropout_key, grad_accum_steps)

            def micro(carry, xs):
                stats, grad_sum, loss_sum, acc_sum = carry
                v, y, key = xs
                (loss, (logits, new_stats)), grads = grad_fn(
                    state.params, stats, v, y, key
                )
                grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
                if y.ndim == 1:
                    acc_sum = acc_sum + jnp.mean(
                        (jnp.argmax(logits, -1) == y).astype(jnp.float32)
                    )
                return (new_stats, grad_sum, loss_sum + loss, acc_sum), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (new_stats, grads, loss_sum, acc_sum), _ = jax.lax.scan(
                micro,
                (state.batch_stats, zero_grads, jnp.float32(0), jnp.float32(0)),
                (micro_videos, micro_labels, micro_keys),
            )
            inv = 1.0 / grad_accum_steps
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            loss = loss_sum * inv
            accuracy = acc_sum * inv if labels.ndim == 1 else None
        else:
            (loss, (logits, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, video, labels, dropout_key
            )
            accuracy = (
                jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
                if labels.ndim == 1
                else None
            )
        if clip_grad_norm is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, clip_grad_norm / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss}
        if accuracy is not None:
            metrics["accuracy"] = accuracy
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
            ),
            metrics,
        )

    return step


def make_eval_step(model, input_key: str = "video"):
    """(state, batch) -> logits, eval mode (running BN stats)."""

    def step(state: TrainState, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return model.apply(variables, batch[input_key], False)

    return step


def ensemble_video_level(
    logits_list, video_indices, num_videos: int, method: str = "sum"
):
    """Multi-clip / multi-crop test-time ensembling keyed by video index
    (reference module/video_classification.py:290-311): accumulate per-video
    predictions by sum or max over clips."""
    logits = jnp.concatenate(logits_list, axis=0)
    idx = jnp.concatenate(video_indices, axis=0)
    num_classes = logits.shape[-1]
    if method == "sum":
        out = jnp.zeros((num_videos, num_classes)).at[idx].add(logits)
    elif method == "max":
        out = (
            jnp.full((num_videos, num_classes), -jnp.inf).at[idx].max(logits)
        )
    else:
        raise NotImplementedError(method)
    return out
