"""Tests: roi_align op semantics + detection heads/models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchvideo_tpu import models
from pytorchvideo_tpu.ops import roi_align


def test_roi_align_constant_map():
    fmap = jnp.full((1, 8, 8, 3), 7.0)
    boxes = jnp.asarray([[0, 1.0, 1.0, 5.0, 5.0]])
    out = roi_align(fmap, boxes, (2, 2))
    np.testing.assert_allclose(np.asarray(out), 7.0)


def test_roi_align_gradient_map_center():
    # fmap value = x coordinate; a box centered at x=4 with out 1x1 and
    # dense-enough sampling averages to the box's x center
    xs = jnp.broadcast_to(jnp.arange(8.0)[None, :, None], (8, 8, 1))
    fmap = xs[None]
    boxes = jnp.asarray([[0, 2.0, 2.0, 6.0, 6.0]])
    out = roi_align(fmap, boxes, (1, 1), sampling_ratio=4)
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), 4.0 - 0.5 + 0.5, atol=0.01)


def test_roi_align_batch_index_routing():
    fmap = jnp.stack([jnp.zeros((4, 4, 1)), jnp.ones((4, 4, 1))])
    boxes = jnp.asarray([[0, 0.0, 0.0, 4.0, 4.0], [1, 0.0, 0.0, 4.0, 4.0]])
    out = roi_align(fmap, boxes, (2, 2))
    np.testing.assert_allclose(np.asarray(out[0]), 0.0)
    np.testing.assert_allclose(np.asarray(out[1]), 1.0)


def test_roi_align_spatial_scale():
    fmap = jnp.broadcast_to(
        jnp.arange(8.0)[None, :, None], (8, 8, 1)
    )[None]
    # boxes in input-image coords, features at 1/2 resolution
    boxes = jnp.asarray([[0, 4.0, 4.0, 12.0, 12.0]])
    out_half = roi_align(fmap, boxes, (1, 1), spatial_scale=0.5, sampling_ratio=4)
    boxes_feat = jnp.asarray([[0, 2.0, 2.0, 6.0, 6.0]])
    out_direct = roi_align(fmap, boxes_feat, (1, 1), sampling_ratio=4)
    np.testing.assert_allclose(np.asarray(out_half), np.asarray(out_direct))


def test_resnet_roi_head_forward():
    head = models.create_res_roi_pooling_head(
        in_features=16,
        out_features=5,
        resolution=(4, 4),
        spatial_scale=1.0,
        dropout_rate=0.0,
        pool_kernel_size=(2, 1, 1),
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2, 8, 8, 16)), jnp.float32)
    bboxes = jnp.asarray([[0, 0.0, 0.0, 8.0, 8.0], [1, 2.0, 2.0, 6.0, 6.0]])
    variables = head.init(jax.random.PRNGKey(0), x, bboxes, False)
    out = head.apply(variables, x, bboxes, False)
    assert out.shape == (2, 5)


@pytest.mark.slow
def test_resnet_with_roi_head_forward():
    model = models.create_resnet_with_roi_head(
        model_num_class=6,
        head_pool_kernel_size=(4, 1, 1),
        head_spatial_scale=1.0 / 16.0,
        stage_depths=(1, 1, 1, 1),
    )
    x = jnp.zeros((1, 4, 64, 64, 3))
    bboxes = jnp.asarray([[0, 0.0, 0.0, 60.0, 60.0], [0, 8.0, 8.0, 32.0, 32.0]])
    variables = model.init(jax.random.PRNGKey(0), x, bboxes, False)
    out = model.apply(variables, x, bboxes, False)
    assert out.shape == (2, 1, 1, 1, 6)
    # sigmoid activation -> [0, 1]
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


@pytest.mark.slow
def test_slowfast_with_roi_head_forward():
    model = models.create_slowfast_with_roi_head(
        model_num_class=4,
        head_pool_kernel_sizes=((4, 1, 1), (16, 1, 1)),
        stage_depths=(1, 1, 1, 1),
    )
    xs = [jnp.zeros((1, 4, 64, 64, 3)), jnp.zeros((1, 16, 64, 64, 3))]
    bboxes = jnp.asarray([[0, 0.0, 0.0, 32.0, 32.0]])
    variables = model.init(jax.random.PRNGKey(0), xs, bboxes, False)
    out = model.apply(variables, xs, bboxes, False)
    assert out.shape == (1, 1, 1, 1, 4)
