"""Pallas depthwise token-pool kernel: interpret-mode parity vs XLA conv."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchvideo_tpu.ops.token_pool import (
    _token_pool_ad,
    _xla_depthwise_pool,
    depthwise_token_pool,
    depthwise_token_pool_pallas,
)


@pytest.mark.parametrize(
    "shape,kernel,stride",
    [
        # real MViT-B 16x4 pool geometries (kv strides 8/4/2/1, q stride 2)
        ((2, 8, 56, 56, 96), (3, 3, 3), (1, 8, 8)),
        ((2, 8, 56, 56, 192), (3, 3, 3), (1, 2, 2)),
        ((2, 8, 28, 28, 192), (3, 3, 3), (1, 4, 4)),
        ((2, 8, 14, 14, 384), (3, 3, 3), (1, 2, 2)),
        ((2, 8, 7, 7, 768), (3, 3, 3), (1, 1, 1)),
        # odd geometry + T stride + kt=1
        ((2, 5, 9, 11, 64), (3, 3, 3), (2, 2, 2)),
        ((2, 4, 10, 10, 32), (1, 3, 3), (1, 2, 2)),
    ],
)
def test_pallas_matches_xla_conv(shape, kernel, stride):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    w = jnp.asarray(rng.normal(size=kernel + (shape[-1],)), jnp.float32)
    pad = tuple(k // 2 for k in kernel)
    ref = _xla_depthwise_pool(x, w, stride, pad)
    out = depthwise_token_pool_pallas(x, w, stride, pad, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_grad_matches_xla_conv():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 32)), jnp.float32)
    stride, pad = (1, 2, 2), (1, 1, 1)

    def loss_pallas(x, w):
        return jnp.sum(jnp.sin(_token_pool_ad(x, w, stride, pad, True)))

    def loss_xla(x, w):
        return jnp.sum(jnp.sin(_xla_depthwise_pool(x, w, stride, pad)))

    gx1, gw1 = jax.grad(loss_pallas, (0, 1))(x, w)
    gx2, gw2 = jax.grad(loss_xla, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), atol=1e-3)


def test_dispatch_falls_back_on_cpu():
    # auto mode on a CPU backend must route to the XLA grouped conv.
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 16)), jnp.float32)
    out = depthwise_token_pool(x, w, (1, 2, 2), (1, 1, 1))
    ref = _xla_depthwise_pool(x, w, (1, 2, 2), (1, 1, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize(
    "shape,kernel,stride",
    [
        # disjoint-window rewrite geometries (sh>=kh, sw>=kw): the MViT kv
        # pools at every depth, plus a non-divisible edge case
        ((2, 8, 56, 56, 96), (3, 3, 3), (1, 8, 8)),
        ((2, 8, 28, 28, 192), (3, 3, 3), (1, 4, 4)),
        ((2, 4, 14, 14, 384), (1, 3, 3), (1, 4, 4)),
        ((1, 5, 13, 11, 32), (3, 3, 3), (1, 4, 4)),
        ((1, 3, 9, 9, 16), (1, 1, 1), (1, 2, 3)),
    ],
)
def test_window_pool_matches_grouped_conv(shape, kernel, stride):
    from pytorchvideo_tpu.ops.token_pool import (
        _window_depthwise_pool,
        _window_pool_applicable,
    )

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    w = jnp.asarray(rng.normal(size=kernel + (shape[-1],)), jnp.float32)
    pad = tuple(k // 2 for k in kernel)
    assert _window_pool_applicable(kernel, stride)
    ref = _xla_depthwise_pool(x, w, stride, pad)
    out = _window_depthwise_pool(x, w, stride, pad)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # gradients: linear op, plain JAX AD must match the conv vjp
    gx1, gw1 = jax.grad(
        lambda a, b: jnp.sum(jnp.sin(_window_depthwise_pool(a, b, stride, pad))),
        (0, 1),
    )(x, w)
    gx2, gw2 = jax.grad(
        lambda a, b: jnp.sum(jnp.sin(_xla_depthwise_pool(a, b, stride, pad))),
        (0, 1),
    )(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), atol=1e-3)


def test_strided_hw_dispatch_allows_pallas():
    # Strided taps are written as unit slice + dim-split reshape + take
    # (tap_slice), which Mosaic lowers for any stride — strided geometry
    # is hardware-dispatchable (measured on v5e: the stride-8 kv pool
    # compiles and runs; stride-2 W splits still crash the v5e compile
    # helper, which is why the pallas_kv mode gates on stride >= 4).
    from pytorchvideo_tpu.ops.token_pool import _hw_supported

    assert _hw_supported((3, 3, 3), (1, 8, 8), (1, 1, 1))
    assert _hw_supported((3, 3, 3), (1, 1, 1), (1, 1, 1))


def test_unsupported_geometry_raises_under_forced_pallas():
    x = jnp.zeros((1, 4, 8, 8, 16))
    w = jnp.zeros((4, 3, 3, 16))  # kt=4 unsupported
    with pytest.raises(NotImplementedError):
        depthwise_token_pool(x, w, (1, 1, 1), (2, 1, 1), use_pallas=True)


@pytest.mark.parametrize(
    "shape,kernel,stride",
    [
        # pool_skip geometries: kernel s+1, stride s, pad k//2
        ((2, 8, 56, 56, 192), (1, 3, 3), (1, 2, 2)),
        ((2, 8, 14, 14, 384), (1, 3, 3), (1, 2, 2)),
        ((2, 5, 9, 11, 64), (3, 3, 3), (2, 2, 2)),
    ],
)
def test_max_pool_matches_xla(shape, kernel, stride):
    from pytorchvideo_tpu.ops.token_pool import (
        _xla_max_pool,
        max_token_pool_pallas,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    pad = tuple(k // 2 for k in kernel)
    ref = _xla_max_pool(x, kernel, stride, pad)
    out = max_token_pool_pallas(x, kernel, stride, pad, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


def test_max_pool_grad_matches_xla():
    from pytorchvideo_tpu.ops.token_pool import _max_pool_ad, _xla_max_pool

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 32)), jnp.float32)
    kernel, stride, pad = (1, 3, 3), (1, 2, 2), (0, 1, 1)

    g1 = jax.grad(
        lambda a: jnp.sum(jnp.sin(_max_pool_ad(a, kernel, stride, pad, True)))
    )(x)
    g2 = jax.grad(
        lambda a: jnp.sum(jnp.sin(_xla_max_pool(a, kernel, stride, pad)))
    )(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_full_mvit_interpret_matches_xla_pool(monkeypatch):
    """End-to-end wiring check: a small MViT forward with the pool kernel in
    interpret mode must reproduce the XLA-conv pool path exactly (weight
    tiling, cls/grid threading, skip max pool)."""
    from pytorchvideo_tpu import models

    model = models.create_multiscale_vision_transformers(
        spatial_size=32,
        temporal_size=4,
        depth=3,
        num_heads=2,
        patch_embed_dim=32,
        pool_q_stride_size=[[1, 1, 2, 2]],
        pool_kv_stride_adaptive=[1, 2, 2],
        pool_kvq_kernel=[3, 3, 3],
        head_num_classes=7,
    )
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 4, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, False)

    monkeypatch.setenv("PVT_TOKEN_POOL", "xla")
    ref = model.apply(variables, x, False)
    monkeypatch.setenv("PVT_TOKEN_POOL", "interpret")
    out = model.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize(
    "shape,kernel,stride",
    [
        ((2, 8, 14, 14, 96), (3, 3, 3), (1, 2, 2)),
        ((2, 5, 9, 11, 64), (3, 3, 3), (2, 2, 2)),
    ],
)
def test_avg_pool_matches_xla(shape, kernel, stride):
    from pytorchvideo_tpu.layers.common import avg_pool3d
    from pytorchvideo_tpu.ops.token_pool import _avg_pool_ad

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    pad = tuple(k // 2 for k in kernel)
    ref = avg_pool3d(x, kernel, stride, pad)
    out = _avg_pool_ad(x, kernel, stride, pad, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5
    )

    g1 = jax.grad(lambda a: jnp.sum(jnp.sin(_avg_pool_ad(a, kernel, stride, pad, True))))(x)
    g2 = jax.grad(lambda a: jnp.sum(jnp.sin(avg_pool3d(a, kernel, stride, pad))))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


@pytest.mark.parametrize(
    "shape,kernel,stride",
    [
        ((2, 8, 12, 12, 32), (3, 3, 3), (1, 8, 8)),
        ((2, 7, 9, 11, 16), (3, 3, 3), (2, 2, 2)),
        ((1, 4, 10, 10, 8), (1, 3, 3), (1, 2, 2)),
        ((2, 8, 14, 14, 64), (3, 3, 3), (1, 1, 1)),
    ],
)
def test_pallas_bwd_matches_xla_grads(shape, kernel, stride):
    """The all-Pallas backward (dilate+flipped-forward dx, grid-accumulated
    dw) must match the XLA transposed-conv gradients."""
    rng = np.random.default_rng(7)
    pad = tuple(k // 2 for k in kernel)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    w = jnp.asarray(rng.normal(size=kernel + (shape[-1],)), jnp.float32)
    g = jnp.asarray(
        rng.normal(size=_xla_depthwise_pool(x, w, stride, pad).shape),
        jnp.float32,
    )

    def f_p(a, b):
        return jnp.vdot(_token_pool_ad(a, b, stride, pad, True), g)

    def f_x(a, b):
        return jnp.vdot(_xla_depthwise_pool(a, b, stride, pad), g)

    gx1, gw1 = jax.grad(f_p, (0, 1))(x, w)
    gx2, gw2 = jax.grad(f_x, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), atol=5e-3)


def test_tiny_mvit_grads_interpret_matches_xla_pool(monkeypatch):
    """Fast-tier training-path wiring check (ADVICE r2): a depth-1,
    8x8-spatial MViT keeps gradients flowing through the Pallas pool's
    custom backward without the slow test's 60 s cost. The full-size
    sibling below stays in the slow tier."""
    from pytorchvideo_tpu import models

    model = models.create_multiscale_vision_transformers(
        spatial_size=8,
        temporal_size=2,
        depth=1,
        num_heads=1,
        patch_embed_dim=16,
        pool_q_stride_size=[[0, 1, 2, 2]],
        pool_kv_stride_adaptive=[1, 2, 2],
        pool_kvq_kernel=[3, 3, 3],
        head_num_classes=3,
    )
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(1, 2, 8, 8, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, False)

    def loss(params):
        out = model.apply({**variables, "params": params}, x, False)
        return jnp.sum(jnp.sin(out))

    monkeypatch.setenv("PVT_TOKEN_POOL", "xla")
    g_ref = jax.grad(loss)(variables["params"])
    monkeypatch.setenv("PVT_TOKEN_POOL", "interpret")
    g_out = jax.grad(loss)(variables["params"])
    for (p, ref), (_, out) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_out),
    ):
        scale = float(np.max(np.abs(np.asarray(ref))))
        np.testing.assert_allclose(
            np.asarray(out),
            np.asarray(ref),
            rtol=0,
            atol=max(1e-6, 1e-4 * scale),
            err_msg=jax.tree_util.keystr(p),
        )


@pytest.mark.slow  # ~60 s: full-model grads twice in interpret mode; the
# forward sibling above stays in the fast tier
def test_full_mvit_grads_interpret_matches_xla_pool(monkeypatch):
    """Training-path wiring: gradients through a small MViT with the Pallas
    pool (interpret) must match the XLA-conv pool path."""
    from pytorchvideo_tpu import models

    model = models.create_multiscale_vision_transformers(
        spatial_size=16,
        temporal_size=4,
        depth=2,
        num_heads=2,
        patch_embed_dim=32,
        pool_q_stride_size=[[1, 1, 2, 2]],
        pool_kv_stride_adaptive=[1, 2, 2],
        pool_kvq_kernel=[3, 3, 3],
        head_num_classes=5,
    )
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, False)

    def loss(params):
        out = model.apply({**variables, "params": params}, x, False)
        return jnp.sum(jnp.sin(out))

    monkeypatch.setenv("PVT_TOKEN_POOL", "xla")
    g_ref = jax.grad(loss)(variables["params"])
    monkeypatch.setenv("PVT_TOKEN_POOL", "interpret")
    g_out = jax.grad(loss)(variables["params"])
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_out = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g_out)
    )
    for path, ref in flat_ref:
        out = flat_out[jax.tree_util.keystr(path)]
        # rel tolerance scaled to the tensor's magnitude: grads span 1e-8
        # (LN biases) to 1e5 (patch embed) and both paths accumulate in a
        # different order.
        scale = float(np.max(np.abs(np.asarray(ref))))
        np.testing.assert_allclose(
            np.asarray(out),
            np.asarray(ref),
            rtol=0,
            atol=max(1e-6, 1e-4 * scale),
            err_msg=jax.tree_util.keystr(path),
        )
