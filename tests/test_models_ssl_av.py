"""Tests: audio-visual SlowFast, SSL wrappers, masked multistream."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorchvideo_tpu import models


@pytest.mark.slow
def test_audio_visual_slowfast_forward():
    model = models.create_audio_visual_slowfast(
        model_num_class=7,
        head_pool_kernel_sizes=((2, 1, 1), (8, 1, 1), (4, 1, 2)),
    )
    # slow 2f, fast 8f, audio spectrogram (B, T=32, 1, F=16, C=1)
    xs = [
        jnp.zeros((1, 2, 32, 32, 3)),
        jnp.zeros((1, 8, 32, 32, 3)),
        jnp.zeros((1, 32, 1, 16, 1)),
    ]
    variables = model.init(jax.random.PRNGKey(0), xs, False)
    out = model.apply(variables, xs, False)
    assert out.shape == (1, 7)


class _TinyBackbone(nn.Module):
    feature_dim: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(32)(x)
        x = __import__("pytorchvideo_tpu.layers.norms", fromlist=["BatchNorm"]).BatchNorm()(x, train=train)
        x = nn.relu(x)
        return nn.Dense(self.feature_dim)(x)


def test_byol_loss_and_momentum():
    backbone = _TinyBackbone()
    byol = models.BYOL(backbone, feature_dim=16, predictor_inner=32, mmt=0.9)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)), jnp.float32)
    state = byol.init(jax.random.PRNGKey(0), x)
    loss = byol.loss(state, x, x + 0.1, train=False)
    assert np.isfinite(float(loss))
    # momentum update moves momentum params toward online
    state2 = {
        **state,
        "online": jax.tree_util.tree_map(lambda a: a + 1.0, state["online"]),
    }
    state3 = byol.momentum_update(state2)
    leaf_before = jax.tree_util.tree_leaves(state2["momentum"])[0]
    leaf_after = jax.tree_util.tree_leaves(state3["momentum"])[0]
    np.testing.assert_allclose(
        np.asarray(leaf_after),
        np.asarray(leaf_before) * 0.9 + (np.asarray(leaf_before) + 1.0) * 0.1,
        rtol=1e-5,
    )


def test_simclr_loss():
    mlp = nn.Dense(8)

    class MLPWrap(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return nn.Dense(8)(x)

    simclr = models.SimCLR(MLPWrap(), backbone=None, temperature=0.1)
    x1 = jnp.asarray(np.random.default_rng(0).normal(size=(6, 12)), jnp.float32)
    x2 = x1 + 0.01 * np.random.default_rng(1).normal(size=(6, 12)).astype(np.float32)
    state = simclr.init(jax.random.PRNGKey(0), x1)
    loss_aligned = simclr.loss(state, x1, x2, train=False)
    loss_shuffled = simclr.loss(state, x1, jnp.flip(x2, 0), train=False)
    assert float(loss_aligned) < float(loss_shuffled)


def test_memory_bank():
    class Flat(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return nn.Dense(8)(x)

    mb = models.MemoryBank(Flat(), neg_size=16, bank_size=100, dim=8, mmt=0.5)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 10)), jnp.float32)
    x_ind = jnp.asarray([1, 5, 9, 42])
    state = mb.init(jax.random.PRNGKey(0), x)
    loss, new_memory = mb.loss(state, x, x_ind, jax.random.PRNGKey(1), train=True)
    assert np.isfinite(float(loss))
    # updated slots are normalized and changed
    changed = np.asarray(new_memory[np.asarray(x_ind)])
    np.testing.assert_allclose(
        np.linalg.norm(changed, axis=-1), np.ones(4), rtol=1e-5
    )
    untouched = np.array([i for i in range(100) if i not in [1, 5, 9, 42]])
    np.testing.assert_array_equal(
        np.asarray(new_memory[untouched]), np.asarray(state["memory"][untouched])
    )


def test_masked_temporal_pooling():
    x = jnp.asarray(np.arange(24).reshape(2, 3, 4), jnp.float32)
    mask = jnp.asarray([[True, True, False], [False, False, False]])
    pool_avg = models.MaskedTemporalPooling(method="avg")
    out = pool_avg.apply({}, x, mask)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x[0, :2].mean(0)))
    np.testing.assert_allclose(np.asarray(out[1]), np.zeros(4))
    pool_max = models.MaskedTemporalPooling(method="max")
    out_max = pool_max.apply({}, x, mask)
    np.testing.assert_allclose(np.asarray(out_max[0]), np.asarray(x[0, 1]))
    np.testing.assert_allclose(np.asarray(out_max[1]), np.zeros(4))


def test_learn_masked_default():
    mod = models.LearnMaskedDefault(feature_dim=4, init_method="gaussian")
    x = jnp.ones((2, 4))
    mask = jnp.asarray([[True], [False]])
    variables = mod.init(jax.random.PRNGKey(0), x, mask)
    out = mod.apply(variables, x, mask)
    np.testing.assert_allclose(np.asarray(out[0]), np.ones(4))
    defaults = variables["params"]["_learned_defaults"]
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(defaults))


def test_lstm_masked():
    lstm = models.LSTM(dim_in=6, hidden_dim=5, bidirectional=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 7, 6)), jnp.float32)
    mask = jnp.asarray(
        [[True] * 7, [True] * 3 + [False] * 4, [True] + [False] * 6]
    )
    variables = lstm.init(jax.random.PRNGKey(0), x, mask)
    out = lstm.apply(variables, x, mask)
    assert out.shape == (3, 10)
    # masked-out tail must not affect result
    x_mod = x.at[1, 4:].set(99.0)
    out_mod = lstm.apply(variables, x_mod, mask)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out_mod[1]), rtol=1e-5)


def test_masked_sequential_and_multipathway():
    stream = models.MaskedSequential(
        layers=(
            models.TransposeMultiheadAttention(feature_dim=8),
            models.MaskedTemporalPooling(method="avg"),
            models.LearnMaskedDefault(feature_dim=8),
        )
    )
    from pytorchvideo_tpu.layers import make_fusion_layer

    mp = models.MaskedMultiPathWay(
        multipathway_blocks=(stream,),
        multipathway_fusion=make_fusion_layer("concat", [8]),
    )
    x = jnp.zeros((2, 5, 8))
    mask = jnp.ones((2, 5), bool)
    variables = mp.init(jax.random.PRNGKey(0), [(x, mask)])
    out = mp.apply(variables, [(x, mask)])
    assert out.shape == (2, 8)


def test_transpose_transformer_encoder():
    enc = models.TransposeTransformerEncoder(dim_in=8, num_heads=2, num_layers=2)
    x = jnp.zeros((2, 5, 8))
    mask = jnp.ones((2, 5), bool)
    variables = enc.init(jax.random.PRNGKey(0), x, mask)
    out = enc.apply(variables, x, mask)
    assert out.shape == (2, 8)
