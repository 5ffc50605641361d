"""SSL task train steps + SSLTrainApp e2e (reference
pytorchvideo_trainer/tests/test_task_{byol,simclr,moco_v2}.py analogue)."""

import os

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorchvideo_tpu.models.byol import BYOL
from pytorchvideo_tpu.models.simclr import SimCLR
from pytorchvideo_tpu.train import (
    MoCoV2,
    OptimizerConfig,
    SSLConfig,
    SSLTrainApp,
    construct_optimizer,
    make_byol_train_step,
    make_moco_train_step,
    make_simclr_train_step,
)
from pytorchvideo_tpu.train.config import DataConfig, ModelConfig

from fixtures import temp_encoded_video


class _BnEncoder(nn.Module):
    """Tiny encoder WITH BatchNorm so steps must thread batch_stats."""

    dim: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.dim, name="fc")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="bn"
        )(x)
        return nn.relu(x)


def _x(b=4, d=10, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(b, d)), jnp.float32
    )


def test_byol_step_updates_all_parts():
    byol = BYOL(_BnEncoder(), feature_dim=16, predictor_inner=8, mmt=0.9)
    x1, x2 = _x(seed=0), _x(seed=1)
    state = byol.init(jax.random.PRNGKey(0), x1)
    trainable = {
        "online": state["online"]["params"],
        "predictor": state["predictor"]["params"],
    }
    tx = construct_optimizer(trainable, OptimizerConfig(method="sgd", lr=0.1))
    opt_state = tx.init(trainable)
    step = jax.jit(make_byol_train_step(byol, tx))

    losses = []
    for i in range(3):
        state, opt_state, loss = step(
            state, opt_state, x1, x2, jax.random.PRNGKey(i), 0.9
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    # online params updated; momentum EMA moved off its init copy
    init = byol.init(jax.random.PRNGKey(0), x1)
    on0 = jax.tree_util.tree_leaves(init["online"]["params"])[0]
    on1 = jax.tree_util.tree_leaves(state["online"]["params"])[0]
    assert not np.allclose(np.asarray(on0), np.asarray(on1))
    m0 = jax.tree_util.tree_leaves(init["momentum"]["params"])[0]
    m1 = jax.tree_util.tree_leaves(state["momentum"]["params"])[0]
    assert not np.allclose(np.asarray(m0), np.asarray(m1))
    # BN batch stats were threaded (running mean moved off zero)
    bs = jax.tree_util.tree_leaves(state["online"]["batch_stats"])
    assert any(float(jnp.abs(a).max()) > 0 for a in bs)


def test_simclr_step_decreases_loss():
    class _Mlp(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return nn.Dense(8, name="fc")(x)

    simclr = SimCLR(_Mlp(), backbone=_BnEncoder(), temperature=0.2)
    x1, x2 = _x(seed=0), _x(seed=1)
    state = simclr.init(jax.random.PRNGKey(0), x1)
    trainable = {k: v["params"] for k, v in state.items()}
    tx = construct_optimizer(trainable, OptimizerConfig(method="sgd", lr=0.5))
    opt_state = tx.init(trainable)
    step = jax.jit(make_simclr_train_step(simclr, tx))
    losses = []
    for i in range(10):
        state, opt_state, loss = step(
            state, opt_state, x1, x2, jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_moco_step_rotates_queue_and_updates_momentum():
    moco = MoCoV2(_BnEncoder(), queue_size=32, dim=16, mmt=0.5)
    x1, x2 = _x(seed=0), _x(seed=1)
    state = moco.init(jax.random.PRNGKey(0), x1)
    tx = construct_optimizer(
        state["online"]["params"], OptimizerConfig(method="sgd", lr=0.1)
    )
    opt_state = tx.init(state["online"]["params"])
    step = jax.jit(make_moco_train_step(moco, tx))
    state2, opt_state, loss = step(
        state, opt_state, x1, x2, jax.random.PRNGKey(1), 0.5
    )
    assert np.isfinite(float(loss))
    assert int(state2["queue_ptr"]) == 4
    m0 = jax.tree_util.tree_leaves(state["momentum"]["params"])[0]
    m1 = jax.tree_util.tree_leaves(state2["momentum"]["params"])[0]
    assert not np.allclose(np.asarray(m0), np.asarray(m1))


@pytest.mark.parametrize("task", ["byol", "simclr", "moco_v2"])
@pytest.mark.slow
def test_ssl_app_end_to_end(task, tmp_path):
    ctx = temp_encoded_video(num_frames=12, fps=6, height=48, width=48)
    path, _ = ctx.__enter__()
    try:
        csv_path = os.path.join(str(tmp_path), "data.csv")
        with open(csv_path, "w") as f:
            for i in range(2):
                f.write(f"{path} {i}\n")
        cfg = SSLConfig(task=task)
        cfg.model = ModelConfig(
            name="x3d_xs",
            num_classes=2,
            kwargs=dict(
                stem_dim_in=8,
                input_clip_length=4,
                input_crop_size=32,
                depth_factor=0.1,
            ),
            clip_length=4,
            crop_size=32,
        )
        cfg.data = DataConfig(
            data_path=csv_path,
            clip_duration=1.0,
            batch_size=2,
            num_samples=4,
            min_size=36,
            max_size=44,
            crop_size=32,
        )
        cfg.optim.lr = 0.01
        cfg.feature_dim = 8
        cfg.predictor_inner = 8
        cfg.queue_size = 16
        cfg.max_epochs = 1
        app = SSLTrainApp(cfg, steps_per_epoch=2)
        app.setup()
        history = app.train()
        assert len(history) >= 1 and all(np.isfinite(history))
        bb = app.backbone_variables()
        assert "params" in bb
    finally:
        ctx.__exit__(None, None, None)
