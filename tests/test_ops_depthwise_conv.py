"""Tests: fused depthwise 3x3x3 Pallas kernel (interpret mode) vs XLA."""

import numpy as np
import pytest

import jax.numpy as jnp

from pytorchvideo_tpu.ops.depthwise_conv import (
    depthwise3x3x3_bn_swish_pallas,
    depthwise3x3x3_bn_swish_xla,
)


@pytest.mark.parametrize("apply_swish", [False, True])
def test_depthwise_pallas_matches_xla(apply_swish):
    rng = np.random.default_rng(0)
    B, T, H, W, C = 2, 4, 6, 6, 5  # odd C exercises lane padding
    x = jnp.asarray(rng.normal(size=(B, T, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C)), jnp.float32) * 0.2
    s = jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32)
    b = jnp.asarray(rng.normal(size=C), jnp.float32) * 0.1
    ref = depthwise3x3x3_bn_swish_xla(x, w, s, b, apply_swish)
    out = depthwise3x3x3_bn_swish_pallas(x, w, s, b, apply_swish, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_depthwise_pallas_no_affine():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 3, 4, 4, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 3)), jnp.float32)
    ref = depthwise3x3x3_bn_swish_xla(x, w)
    out = depthwise3x3x3_bn_swish_pallas(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
