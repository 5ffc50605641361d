"""WBlockedConv: exact-equivalence vs nn.Conv across stride/kernel geometries.

The patch-embed stem swaps nn.Conv for the W-blocked rewrite on TPU-hostile
tiny-C_in shapes (layers/common.py WBlockedConv); these tests pin the rewrite
to the plain conv bit-for-bit (fp32) over ragged and exact-fit widths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from pytorchvideo_tpu.layers.common import WBlockedConv


@pytest.mark.parametrize(
    "kernel,stride,padding,size",
    [
        ((3, 7, 7), (2, 4, 4), (1, 3, 3), (16, 64, 64)),  # MViT patch embed
        ((3, 7, 7), (2, 4, 4), (1, 3, 3), (16, 56, 60)),  # ragged widths
        ((1, 3, 3), (1, 2, 2), (0, 1, 1), (4, 33, 35)),  # X3D-stem-like
        ((1, 7, 7), (1, 2, 2), (0, 3, 3), (2, 31, 29)),  # ResNet-stem-like
        ((1, 16, 16), (1, 16, 16), (0, 0, 0), (2, 32, 48)),  # ViT exact-fit
        ((3, 3, 3), (1, 1, 1), (1, 1, 1), (4, 12, 12)),  # stride-1 fallback
    ],
)
def test_wblocked_conv_matches_nn_conv(kernel, stride, padding, size):
    rng = np.random.default_rng(42)
    T, H, W = size
    x = jnp.asarray(rng.normal(size=(2, T, H, W, 3)), jnp.float32)
    pads = tuple((p, p) for p in padding)
    mod = WBlockedConv(
        features=24, kernel_size=kernel, strides=stride, padding=pads
    )
    v = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(v, x)

    ref_mod = nn.Conv(
        features=24, kernel_size=kernel, strides=stride, padding=pads
    )
    ref = ref_mod.apply(v, x)  # identical param tree by construction
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_wblocked_conv_grad_matches():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 4, 16, 16, 3)), jnp.float32)
    pads = ((1, 1), (3, 3), (3, 3))
    mod = WBlockedConv(
        features=8, kernel_size=(3, 7, 7), strides=(2, 4, 4), padding=pads
    )
    ref_mod = nn.Conv(
        features=8, kernel_size=(3, 7, 7), strides=(2, 4, 4), padding=pads
    )
    v = mod.init(jax.random.PRNGKey(1), x)
    g = jax.grad(lambda v: jnp.sum(mod.apply(v, x) ** 2))(v)
    g_ref = jax.grad(lambda v: jnp.sum(ref_mod.apply(v, x) ** 2))(v)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        ),
        g,
        g_ref,
    )
