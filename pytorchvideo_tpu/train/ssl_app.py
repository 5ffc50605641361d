"""SSL pretraining tasks: BYOL / SimCLR / MoCo v2 train steps + app.

Reference: pytorchvideo_trainer/pytorchvideo_trainer/module/{ssl_helper.py,
byol.py:196, simclr.py:120, moco_v2.py} task modules and the
byol/simclr/moco_v2_train_app_conf.yaml apps. TPU-native design: each task
is one pure jitted step holding (ssl_state, opt_state); momentum-encoder
EMA, queue rotation, and BN batch-stat threading are functional state
transitions inside the step (the reference mutates module buffers
in-place under Lightning); momentum annealing (ssl_helper.py:314-460) is
computed host-side per step and passed in as a scalar.

The two augmented views are produced data-side by ``TwoViewTransform``
(the reference's RepeatandConverttoList + ColorJitterVideoSSl pipeline,
datamodule/transforms.py:141-260) and arrive as one (B, 2, T, H, W, C)
array.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorchvideo_tpu.models.byol import BYOL
from pytorchvideo_tpu.models.simclr import SimCLR
from pytorchvideo_tpu.train.config import DataConfig, ModelConfig, OptimizerConfig
from pytorchvideo_tpu.train.ssl import (
    MoCoV2,
    batch_shuffle,
    batch_unshuffle,
    momentum_anneal_cosine,
)


def _l2n(x, eps=1e-12):
    return x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def _with(variables, params, stats_update):
    """variables with replaced params + merged mutated collections."""
    out = {**variables, "params": params}
    out.update(stats_update)
    return out


def make_byol_train_step(byol: BYOL, tx: optax.GradientTransformation):
    """(ssl_state, opt_state, x1, x2, rng, mmt) -> (state', opt', loss).

    Gradients flow to the online backbone + predictor; the momentum
    branch is a stop-gradient EMA updated after the optimizer step
    (reference byol.py:93-143 + module/byol.py momentum hook). BN batch
    stats thread view1 -> view2 (two sequential passes, like two
    minibatches through the same module).
    """

    def step(ssl_state, opt_state, x1, x2, rng, mmt):
        online0, pred0 = ssl_state["online"], ssl_state["predictor"]

        def branch(vars_on, vars_pr, x):
            proj, mut_on = byol.backbone.apply(
                vars_on, x, True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            p, mut_pr = byol.predictor.apply(
                vars_pr, proj, True, mutable=["batch_stats"]
            )
            return _l2n(p), dict(mut_on), dict(mut_pr)

        def loss_of(trainable):
            v_on = _with(online0, trainable["online"], {})
            v_pr = _with(pred0, trainable["predictor"], {})
            p1, s_on, s_pr = branch(v_on, v_pr, x1)
            p2, s_on, s_pr = branch(
                _with(v_on, trainable["online"], s_on),
                _with(v_pr, trainable["predictor"], s_pr),
                x2,
            )
            m1 = jax.lax.stop_gradient(
                _l2n(byol.backbone.apply(ssl_state["momentum"], x1, False))
            )
            m2 = jax.lax.stop_gradient(
                _l2n(byol.backbone.apply(ssl_state["momentum"], x2, False))
            )
            loss = (byol.sim_loss(p1, m2) + byol.sim_loss(p2, m1)) / 2.0
            return loss, (s_on, s_pr)

        trainable = {"online": online0["params"], "predictor": pred0["params"]}
        (loss, (s_on, s_pr)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(trainable)
        updates, new_opt = tx.update(grads, opt_state, trainable)
        new_t = optax.apply_updates(trainable, updates)
        new_online = _with(online0, new_t["online"], s_on)
        new_pred = _with(pred0, new_t["predictor"], s_pr)
        new_momentum = jax.tree_util.tree_map(
            lambda m, o: m * mmt + o * (1.0 - mmt),
            ssl_state["momentum"],
            new_online,
        )
        return (
            {"online": new_online, "momentum": new_momentum, "predictor": new_pred},
            new_opt,
            loss,
        )

    return step


def make_simclr_train_step(simclr: SimCLR, tx: optax.GradientTransformation):
    """NT-Xent step; negatives are the other in-batch keys (under jit over
    a data-sharded Mesh the batch is already global, giving the reference's
    all-gathered negatives, simclr.py:192, for free)."""

    def step(ssl_state, opt_state, x1, x2, rng):
        def embed(state, x, rng):
            stats = {}
            feat = x
            if simclr.backbone is not None:
                feat, mb = simclr.backbone.apply(
                    state["backbone"], x, True, mutable=["batch_stats"],
                    rngs={"dropout": rng},
                )
                stats["backbone"] = dict(mb)
            z, mm = simclr.mlp.apply(
                state["mlp"], feat, True, mutable=["batch_stats"]
            )
            stats["mlp"] = dict(mm)
            return _l2n(z), stats

        def loss_of(params_tree):
            state = {
                k: _with(ssl_state[k], params_tree[k], {}) for k in params_tree
            }
            z1, stats = embed(state, x1, rng)
            state2 = {k: {**state[k], **stats.get(k, {})} for k in state}
            z2, stats = embed(state2, x2, rng)
            b = z1.shape[0]
            logits = jnp.einsum("nc,kc->nk", z1, z2) / simclr.temperature
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            loss = -jnp.mean(
                jnp.take_along_axis(
                    log_probs, jnp.arange(b)[:, None], axis=1
                )
            )
            return loss, stats

        trainable = {k: v["params"] for k, v in ssl_state.items()}
        (loss, stats), grads = jax.value_and_grad(loss_of, has_aux=True)(
            trainable
        )
        updates, new_opt = tx.update(grads, opt_state, trainable)
        new_t = optax.apply_updates(trainable, updates)
        new_state = {
            k: _with(ssl_state[k], new_t[k], stats.get(k, {}))
            for k in ssl_state
        }
        return new_state, new_opt, loss

    return step


def make_moco_train_step(moco: MoCoV2, tx: optax.GradientTransformation):
    """InfoNCE with queue negatives; the key view goes through the
    momentum encoder on a shuffled batch (the reference's cross-rank
    batch shuffle, moco_v2.py:364-406, becomes a permutation under SPMD).
    Queue rotation + EMA run after the optimizer update."""

    def step(ssl_state, opt_state, x1, x2, rng, mmt):
        online0 = ssl_state["online"]
        shuffle_key, dropout_key = jax.random.split(rng)

        def loss_of(params):
            q_emb, mut = moco.backbone.apply(
                _with(online0, params, {}), x1, True,
                mutable=["batch_stats"], rngs={"dropout": dropout_key},
            )
            q = _l2n(q_emb)
            x2s, inv = batch_shuffle(shuffle_key, x2)
            k = moco.backbone.apply(ssl_state["momentum"], x2s, False)
            k = jax.lax.stop_gradient(_l2n(batch_unshuffle(k, inv)))
            l_pos = jnp.einsum("nc,nc->n", q, k)[:, None]
            l_neg = q @ ssl_state["queue"].T
            logits = (
                jnp.concatenate([l_pos, l_neg], axis=1) / moco.temperature
            )
            loss = -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[:, 0])
            return loss, (dict(mut), k)

        (loss, (stats, keys)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(online0["params"])
        updates, new_opt = tx.update(grads, opt_state, online0["params"])
        new_online = _with(
            online0, optax.apply_updates(online0["params"], updates), stats
        )
        new_momentum = jax.tree_util.tree_map(
            lambda m, o: m * mmt + o * (1.0 - mmt),
            ssl_state["momentum"],
            new_online,
        )
        state = {
            **ssl_state,
            "online": new_online,
            "momentum": new_momentum,
        }
        state = moco.dequeue_and_enqueue(state, keys)
        return state, new_opt, loss

    return step


class TwoViewTransform:
    """Apply a (stochastic) view transform twice and stack: (2, T, H, W, C).

    Reference: RepeatandConverttoList (datamodule/transforms.py:141) +
    per-view augmentation chains in the SSL yaml apps.
    """

    def __init__(self, view_transform: Callable):
        self.view_transform = view_transform

    def __call__(self, video):
        return np.stack(
            [np.asarray(self.view_transform(video)) for _ in range(2)]
        )


@dataclass
class SSLConfig:
    task: str = "byol"  # byol | simclr | moco_v2
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimizerConfig = field(default_factory=OptimizerConfig)
    feature_dim: int = 128
    predictor_inner: int = 512
    temperature: float = 0.2
    queue_size: int = 4096
    mmt: float = 0.994
    anneal_momentum: bool = True
    max_epochs: int = 1


class SSLTrainApp:
    """Self-supervised pretraining app over the classification datamodule.

    The backbone is a zoo model whose head projects to ``feature_dim``
    (the reference composes backbone+projector the same way via
    create_classification_model_from_ssl_checkpoint surgery,
    ssl_helper.py:67). After pretraining, ``state["online"]`` /
    ``state["backbone"]`` is importable into a classification app.
    """

    def __init__(self, cfg: SSLConfig, steps_per_epoch: int = 0):
        self.cfg = cfg
        self.steps_per_epoch = steps_per_epoch
        self.state = None
        self.opt_state = None
        self._loss_history = []

    def _build_backbone(self):
        from pytorchvideo_tpu.models import hub

        factory = getattr(hub, self.cfg.model.name)
        kwargs = dict(self.cfg.model.kwargs or {})
        if self.cfg.model.name.startswith("x3d"):
            # X3D head pools are sized for the input geometry
            kwargs.setdefault("input_clip_length", self.cfg.model.clip_length)
            kwargs.setdefault("input_crop_size", self.cfg.model.crop_size)
        return factory(model_num_class=self.cfg.feature_dim, **kwargs)

    def setup(self, rng=None):
        rng = jax.random.PRNGKey(0) if rng is None else rng
        backbone = self._build_backbone()
        x = jnp.zeros(
            (
                1,
                self.cfg.model.clip_length,
                self.cfg.model.crop_size,
                self.cfg.model.crop_size,
                3,
            ),
            jnp.float32,
        )
        from pytorchvideo_tpu.train.optimizer import construct_optimizer

        if self.cfg.task == "byol":
            self.task = BYOL(
                backbone,
                feature_dim=self.cfg.feature_dim,
                predictor_inner=self.cfg.predictor_inner,
                mmt=self.cfg.mmt,
            )
            self.state = self.task.init(rng, x)
            trainable = {
                "online": self.state["online"]["params"],
                "predictor": self.state["predictor"]["params"],
            }
            self.tx = construct_optimizer(trainable, self.cfg.optim)
            self.opt_state = self.tx.init(trainable)
            self._step = jax.jit(make_byol_train_step(self.task, self.tx))
        elif self.cfg.task == "simclr":
            import flax.linen as nn

            class _Mlp(nn.Module):
                dim: int

                @nn.compact
                def __call__(self, x, train: bool = False):
                    x = nn.Dense(self.dim, name="fc1")(x)
                    x = nn.relu(x)
                    return nn.Dense(self.dim, name="fc2")(x)

            self.task = SimCLR(
                _Mlp(self.cfg.feature_dim),
                backbone=backbone,
                temperature=self.cfg.temperature,
            )
            self.state = self.task.init(rng, x)
            trainable = {k: v["params"] for k, v in self.state.items()}
            self.tx = construct_optimizer(trainable, self.cfg.optim)
            self.opt_state = self.tx.init(trainable)
            self._step = jax.jit(make_simclr_train_step(self.task, self.tx))
        elif self.cfg.task == "moco_v2":
            self.task = MoCoV2(
                backbone,
                queue_size=self.cfg.queue_size,
                dim=self.cfg.feature_dim,
                temperature=self.cfg.temperature,
                mmt=self.cfg.mmt,
            )
            self.state = self.task.init(rng, x)
            self.tx = construct_optimizer(
                self.state["online"]["params"], self.cfg.optim
            )
            self.opt_state = self.tx.init(self.state["online"]["params"])
            self._step = jax.jit(make_moco_train_step(self.task, self.tx))
        else:
            raise ValueError(f"unknown ssl task {self.cfg.task}")
        return self.state

    def _datamodule(self):
        from pytorchvideo_tpu.train.datamodule import (
            VideoClassificationDataModule,
        )

        dm = VideoClassificationDataModule(self.cfg.data, self.cfg.model)
        base = dm._transform("train")

        # Two-view path: run the stochastic train transform twice on the
        # raw sample (fresh augmentation draws per view), stack to
        # (2, T, H, W, C).
        def transform(sample):
            out = base(dict(sample))
            out["video"] = np.stack(
                [np.asarray(base(dict(sample))["video"]) for _ in range(2)]
            )
            return out

        orig = dm._transform
        dm._transform = lambda mode: (
            transform if mode == "train" else orig(mode)
        )
        return dm

    def train(self, rng=None):
        rng = jax.random.PRNGKey(1) if rng is None else rng
        dm = self._datamodule()
        step_idx = 0
        for epoch in range(self.cfg.max_epochs):
            for batch in dm.train_dataloader(
                self.steps_per_epoch or None
            ):
                video = jnp.asarray(batch["video"])  # (B, 2, T, H, W, C)
                x1, x2 = video[:, 0], video[:, 1]
                exact_epoch = epoch + (
                    step_idx / max(1, self.steps_per_epoch)
                    if self.steps_per_epoch
                    else 0.0
                )
                mmt = (
                    momentum_anneal_cosine(
                        self.cfg.mmt, exact_epoch, self.cfg.max_epochs
                    )
                    if self.cfg.anneal_momentum
                    else self.cfg.mmt
                )
                key = jax.random.fold_in(rng, step_idx)
                if self.cfg.task == "simclr":
                    self.state, self.opt_state, loss = self._step(
                        self.state, self.opt_state, x1, x2, key
                    )
                else:
                    self.state, self.opt_state, loss = self._step(
                        self.state, self.opt_state, x1, x2, key, mmt
                    )
                self._loss_history.append(float(loss))
                step_idx += 1
        return self._loss_history

    def backbone_variables(self):
        """Pretrained backbone variables for classification fine-tuning
        (the reference's SSL->classification surgery, ssl_helper.py:67)."""
        if self.cfg.task == "simclr":
            return self.state["backbone"]
        return self.state["online"]
