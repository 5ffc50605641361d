"""Exactness tests for batch-packed layers (layers/batchpack.py).

Batch-packing folds b batch elements into the channel minor; every packed
op must equal its unpacked counterpart bitwise up to float reassociation,
with an IDENTICAL parameter tree (checkpoint import + BN folding depend on
it). Covers: conv variants (pointwise / strided pointwise / depthwise /
strided depthwise / dense spatial), SE, pack/unpack roundtrip, the full
X3D builder A/B (eval outputs + train-mode batch_stats), and the
non-divisible-batch fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchvideo_tpu.layers.batchpack import (
    BatchPackedConv3d,
    BatchPackedSE,
    pack_batch,
    unpack_batch,
)
from pytorchvideo_tpu.layers.squeeze_excitation import SqueezeExcitation


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape), jnp.float32
    )


def test_pack_unpack_roundtrip():
    x = _rand((8, 3, 4, 4, 5))
    for b in (1, 2, 4):
        assert jnp.array_equal(unpack_batch(pack_batch(x, b), b), x)
    p = pack_batch(x, 2)
    assert p.shape == (4, 3, 4, 4, 10)
    # minor order is (batch, channel): lanes [0:C] = batch element 0
    np.testing.assert_array_equal(np.asarray(p[0, ..., :5]), np.asarray(x[0]))
    np.testing.assert_array_equal(np.asarray(p[0, ..., 5:]), np.asarray(x[1]))


@pytest.mark.parametrize(
    "cin,cout,k,s,groups",
    [
        (6, 10, (1, 1, 1), (1, 1, 1), 1),  # pointwise
        (6, 10, (1, 1, 1), (1, 2, 2), 1),  # strided pointwise (skip conv)
        (6, 6, (3, 3, 3), (1, 1, 1), 6),  # depthwise
        (6, 6, (3, 3, 3), (1, 2, 2), 6),  # strided depthwise
        (3, 8, (1, 3, 3), (1, 2, 2), 1),  # dense spatial (stem conv_xy)
        (6, 6, (5, 1, 1), (1, 1, 1), 6),  # depthwise temporal (stem conv_t)
    ],
)
def test_conv_parity(cin, cout, k, s, groups):
    B, T, H, W = 8, 5, 8, 8
    pad = tuple(kk // 2 for kk in k)
    x = _rand((B, T, H, W, cin), seed=1)
    m = BatchPackedConv3d(
        features=cout, kernel_size=k, in_channels=cin, batch=2,
        strides=s, padding=pad, groups=groups, use_bias=True,
    )
    v = m.init(jax.random.PRNGKey(0), pack_batch(x, 2))
    assert set(v["params"]) == {"kernel", "bias"}
    assert v["params"]["kernel"].shape == k + (cin // groups, cout)

    ref = jax.lax.conv_general_dilated(
        x, v["params"]["kernel"],
        window_strides=s, padding=[(p, p) for p in pad],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        feature_group_count=groups,
    ) + v["params"]["bias"]

    out_packed = m.apply(v, pack_batch(x, 2))
    np.testing.assert_allclose(
        np.asarray(unpack_batch(out_packed, 2)), np.asarray(ref),
        rtol=0, atol=1e-5,
    )
    # unpacked input falls back to the plain conv
    np.testing.assert_allclose(
        np.asarray(m.apply(v, x)), np.asarray(ref), rtol=0, atol=1e-5
    )
    # pack_input packs (and the output stays packed)
    m2 = m.clone(pack_input=True)
    np.testing.assert_allclose(
        np.asarray(unpack_batch(m2.apply(v, x), 2)), np.asarray(ref),
        rtol=0, atol=1e-5,
    )


def test_conv_declines_non_divisible_batch():
    x = _rand((3, 2, 4, 4, 6), seed=2)
    m = BatchPackedConv3d(
        features=6, kernel_size=(1, 1, 1), in_channels=6, batch=2,
        use_bias=False, pack_input=True,
    )
    v = m.init(jax.random.PRNGKey(0), x)
    ref = jax.lax.conv_general_dilated(
        x, v["params"]["kernel"], window_strides=(1, 1, 1),
        padding=[(0, 0)] * 3,
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
    )
    out = m.apply(v, x)
    assert out.shape == ref.shape  # stayed unpacked
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_se_parity():
    C, r, b = 6, 3, 2
    x = _rand((8, 3, 4, 4, C), seed=3)
    se_ref = SqueezeExcitation(num_channels_reduced=r)
    v = se_ref.init(jax.random.PRNGKey(1), x)
    ref = se_ref.apply(v, x)

    se_p = BatchPackedSE(num_channels_reduced=r, channels=C, batch=b)
    vp = se_p.init(jax.random.PRNGKey(2), pack_batch(x, b))
    assert jax.tree_util.tree_structure(vp) == jax.tree_util.tree_structure(v)
    out = se_p.apply(v, pack_batch(x, b))
    np.testing.assert_allclose(
        np.asarray(unpack_batch(out, b)), np.asarray(ref), rtol=0, atol=1e-5
    )
    # adapts to an unpacked input
    np.testing.assert_allclose(
        np.asarray(se_p.apply(v, x)), np.asarray(ref), rtol=0, atol=1e-5
    )


def _tiny_x3d(batch_pack):
    from pytorchvideo_tpu.models import create_x3d

    return create_x3d(
        input_clip_length=4,
        input_crop_size=64,
        model_num_class=7,
        depth_factor=0.2,  # one block per stage
        dropout_rate=0.0,
        batch_pack=batch_pack,
    )


@pytest.mark.parametrize("entry", ["input", "late"])
def test_x3d_batch_pack_full_model_parity(entry, monkeypatch):
    monkeypatch.setenv("PVT_X3D_BPACK_ENTRY", entry)
    x = _rand((4, 4, 64, 64, 3), seed=4)
    plain = _tiny_x3d(0)
    packed = _tiny_x3d(2)
    v = plain.init(jax.random.PRNGKey(0), x, False)
    vp = packed.init(jax.random.PRNGKey(0), x, False)
    assert jax.tree_util.tree_structure(vp) == jax.tree_util.tree_structure(v)
    for (path, a), (_, bb) in zip(
        jax.tree_util.tree_leaves_with_path(vp),
        jax.tree_util.tree_leaves_with_path(v),
    ):
        assert a.shape == bb.shape, jax.tree_util.keystr(path)

    ref = plain.apply(v, x, False)
    out = packed.apply(v, x, False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=2e-4
    )

    # train mode: batch statistics must update identically (the packed BN
    # reduces the (b, C) minor per original channel)
    ref_out, ref_st = plain.apply(
        v, x, True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(5)},
    )
    out_p, st_p = packed.apply(
        v, x, True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(5)},
    )
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(ref_out), rtol=0, atol=2e-4
    )
    for (path, a), (_, bb) in zip(
        jax.tree_util.tree_leaves_with_path(st_p),
        jax.tree_util.tree_leaves_with_path(ref_st),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=0, atol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_x3d_batch_pack_grad_parity():
    """Gradients flow identically through the packed segment (training
    would otherwise silently diverge from the reference semantics)."""
    x = _rand((4, 4, 64, 64, 3), seed=6)
    plain = _tiny_x3d(0)
    packed = _tiny_x3d(2)
    v = plain.init(jax.random.PRNGKey(0), x, False)

    def loss(m):
        def f(params):
            out = m.apply({**v, "params": params}, x, False)
            return jnp.sum(jnp.sin(out))

        return f

    g_ref = jax.grad(loss(plain))(v["params"])
    g_out = jax.grad(loss(packed))(v["params"])
    for (path, a), (_, bb) in zip(
        jax.tree_util.tree_leaves_with_path(g_out),
        jax.tree_util.tree_leaves_with_path(g_ref),
    ):
        scale = max(1e-6, float(np.max(np.abs(np.asarray(bb)))))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=0, atol=5e-4 * scale,
            err_msg=jax.tree_util.keystr(path),
        )


def test_x3d_dw_only_pack_parity():
    """Depthwise-only local packing (batch_pack_mode="dw",
    VERDICT r4 item 3): identical param tree, exact outputs at packable
    and non-divisible batches, and plain fallback for wide blocks."""
    import functools

    from pytorchvideo_tpu.models.x3d import create_x3d_bottleneck_block

    kw = dict(dim_in=16, dim_inner=24, dim_out=16, conv_stride=(1, 1, 1))
    plain = create_x3d_bottleneck_block(**kw)
    dw = create_x3d_bottleneck_block(
        batch_pack=2, batch_pack_mode="dw", **kw
    )
    x = _rand((4, 3, 8, 8, 16), seed=3)
    v = plain.init(jax.random.PRNGKey(0), x, False)
    assert jax.tree_util.tree_structure(
        dw.init(jax.random.PRNGKey(0), x, False)
    ) == jax.tree_util.tree_structure(v)
    np.testing.assert_allclose(
        np.asarray(dw.apply(v, x, False)),
        np.asarray(plain.apply(v, x, False)),
        rtol=0, atol=1e-5,
    )
    # odd batch falls back to the plain path inside the module
    np.testing.assert_allclose(
        np.asarray(dw.apply(v, x[:3], False)),
        np.asarray(plain.apply(v, x[:3], False)),
        rtol=0, atol=1e-5,
    )
    # wide inner (>=128) builds plain even with mode="dw"
    wide = create_x3d_bottleneck_block(
        batch_pack=2, batch_pack_mode="dw",
        dim_in=16, dim_inner=128, dim_out=16, conv_stride=(1, 1, 1),
    )
    xw = _rand((2, 3, 8, 8, 16), seed=4)
    vw = create_x3d_bottleneck_block(
        dim_in=16, dim_inner=128, dim_out=16, conv_stride=(1, 1, 1)
    ).init(jax.random.PRNGKey(0), xw, False)
    out = wide.apply(vw, xw, False)
    assert out.shape == (2, 3, 8, 8, 16)
