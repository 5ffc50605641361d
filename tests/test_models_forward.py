"""Shape/smoke tests for model builders (reference test pattern:
tests/test_models_resnet.py etc. — builder-level forward shape checks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchvideo_tpu import models


def _forward(model, *args):
    variables = model.init(jax.random.PRNGKey(0), *args, False)
    return model.apply(variables, *args, False)


def test_bottleneck_block_shapes():
    block = models.create_bottleneck_block(
        dim_in=16,
        dim_inner=8,
        dim_out=32,
        conv_a_kernel_size=(3, 1, 1),
        conv_a_stride=(1, 1, 1),
        conv_a_padding=(1, 0, 0),
        conv_b_kernel_size=(1, 3, 3),
        conv_b_stride=(1, 2, 2),
        conv_b_padding=(0, 1, 1),
    )
    x = jnp.zeros((2, 4, 8, 8, 16))
    out = _forward(block, x)
    assert out.shape == (2, 4, 4, 4, 32)


def test_res_block_shortcut():
    block = models.create_res_block(
        dim_in=16,
        dim_inner=8,
        dim_out=32,
        bottleneck=models.create_bottleneck_block,
        conv_a_kernel_size=(3, 1, 1),
        conv_a_stride=(1, 1, 1),
        conv_a_padding=(1, 0, 0),
        conv_b_kernel_size=(1, 3, 3),
        conv_b_stride=(1, 2, 2),
        conv_b_padding=(0, 1, 1),
    )
    x = jnp.zeros((2, 4, 8, 8, 16))
    assert _forward(block, x).shape == (2, 4, 4, 4, 32)






def test_r2plus1d():
    # default config expects 16x224 inputs; use 8 frames w/ matching head pool
    model = models.create_r2plus1d(
        model_num_class=6, head_pool_kernel_size=(2, 2, 2)
    )
    x = jnp.zeros((1, 8, 64, 64, 3))
    out = _forward(model, x)
    assert out.shape == (1, 6)
    # Softmax head -> probabilities sum to 1.
    np.testing.assert_allclose(np.asarray(out).sum(), 1.0, rtol=1e-4)



def test_mvit_tiny():
    model = models.create_multiscale_vision_transformers(
        spatial_size=32,
        temporal_size=4,
        depth=3,
        num_heads=2,
        patch_embed_dim=32,
        embed_dim_mul=[[1, 2.0]],
        atten_head_mul=[[1, 2.0]],
        pool_q_stride_size=[[1, 1, 2, 2]],
        pool_kv_stride_adaptive=(1, 4, 4),
        pool_kvq_kernel=(3, 3, 3),
        head_num_classes=17,
    )
    x = jnp.zeros((1, 4, 32, 32, 3))
    assert _forward(model, x).shape == (1, 17)


def test_mvit_batchnorm_variant():
    model = models.create_multiscale_vision_transformers(
        spatial_size=32,
        temporal_size=2,
        depth=2,
        num_heads=2,
        patch_embed_dim=16,
        norm="batchnorm",
        head_num_classes=4,
    )
    x = jnp.zeros((2, 2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    assert "batch_stats" in variables
    out = model.apply(variables, x, False)
    assert out.shape == (2, 4)
    # train step should mutate batch stats
    out, mutated = model.apply(
        variables, x, True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert "batch_stats" in mutated


def test_vit_case():
    model = models.create_multiscale_vision_transformers(
        spatial_size=32,
        temporal_size=2,
        depth=2,
        num_heads=2,
        patch_embed_dim=16,
        sep_pos_embed=False,
        head_num_classes=4,
    )
    x = jnp.zeros((1, 2, 32, 32, 3))
    assert _forward(model, x).shape == (1, 4)
