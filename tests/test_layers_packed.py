"""Exactness tests for packed-channel (space-to-depth) convs.

The packed formulations must equal plain ``lax.conv_general_dilated`` on the
same weights up to float reassociation — they are layout rewrites, not
approximations (reference conv semantics: models/resnet.py:17-148 bottleneck
convs, models/slowfast.py:699-729 fusion conv).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchvideo_tpu.layers.packed import (
    PackedBatchNorm,
    PackedConv3d,
    pack_hw,
    packed_conv_factory,
    unpack_hw,
)


def _ref_conv(x, w, b, strides, padding):
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=strides,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
    )
    if b is not None:
        out = out + b
    return out


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 8, 12, 5)), jnp.float32)
    for ph, pw in [(1, 1), (1, 2), (2, 2), (4, 4), (2, 4)]:
        p = pack_hw(x, ph, pw)
        assert p.shape == (2, 3, 8 // ph, 12 // pw, ph * pw * 5)
        np.testing.assert_array_equal(unpack_hw(p, ph, pw), x)


# (kernel, stride, pad, pack cap, T, H, W, Cin, Cout) — SlowFast fast-pathway
# conv geometries plus stress cases. The cap is adaptive: the module picks
# the largest legal in/out packs, including 4->2 transitions at stride
# boundaries and direct-to-unpacked (p_out=1) where output dims go odd.
CASES = [
    ((1, 1, 1), (1, 1, 1), (0, 0, 0), 2, 4, 8, 8, 8, 32),    # conv_c res2
    ((3, 1, 1), (1, 1, 1), (1, 0, 0), 2, 6, 8, 8, 8, 8),     # conv_a
    ((1, 3, 3), (1, 1, 1), (0, 1, 1), 2, 4, 8, 12, 8, 8),    # conv_b s1
    ((1, 3, 3), (1, 2, 2), (0, 1, 1), 2, 4, 12, 8, 16, 16),  # conv_b s2
    ((1, 1, 1), (1, 2, 2), (0, 0, 0), 2, 4, 8, 8, 8, 32),    # shortcut s2
    ((7, 1, 1), (4, 1, 1), (3, 0, 0), 2, 32, 4, 4, 8, 16),   # fusion
    ((1, 3, 3), (1, 1, 1), (0, 1, 1), 4, 4, 8, 8, 8, 8),     # pack 4
    ((1, 3, 3), (1, 2, 2), (0, 1, 1), 4, 2, 16, 16, 4, 8),   # pack 4 s2
    ((3, 3, 3), (1, 1, 1), (1, 1, 1), 2, 4, 8, 8, 4, 4),     # 3d kernel
    ((1, 5, 5), (1, 1, 1), (0, 2, 2), 2, 2, 10, 10, 4, 4),   # k5 > pack
    ((1, 3, 3), (1, 2, 2), (0, 0, 0), 2, 2, 8, 8, 4, 4),     # n_out odd
    ((1, 3, 3), (1, 3, 3), (0, 1, 1), 2, 2, 12, 12, 4, 4),   # stride 3
    ((1, 3, 3), (1, 2, 2), (0, 1, 1), 4, 2, 28, 28, 4, 4),   # 4->2 (n_out 14)
    ((1, 1, 1), (1, 2, 2), (0, 0, 0), 4, 2, 28, 28, 4, 8),   # 4->2 pointwise
    ((1, 3, 3), (1, 2, 2), (0, 1, 1), 2, 2, 14, 14, 4, 4),   # 2->1 (n_out 7)
    ((1, 3, 3), (1, 1, 1), (0, 1, 1), 4, 2, 6, 6, 4, 4),     # cap 4, dims %2
]


@pytest.mark.parametrize("case", CASES, ids=[str(i) for i in range(len(CASES))])
def test_packed_conv_matches_plain(case):
    kernel, stride, pad, cap, T, H, W, Cin, Cout = case
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((2, T, H, W, Cin)), jnp.float32)
    m = PackedConv3d(
        features=Cout, kernel_size=kernel, in_channels=Cin, pack=cap,
        strides=stride, padding=pad, use_bias=True, unpack_output=True,
    )
    variables = m.init(jax.random.PRNGKey(0), x)
    w = variables["params"]["kernel"]
    b = variables["params"]["bias"]
    ref = _ref_conv(x, w, b, stride, pad)
    # unpacked input (packs in-kernel)
    out = m.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # pre-packed input at the largest dividing pack
    p_in = next((p for p in range(cap, 1, -1) if H % p == 0 and W % p == 0), 1)
    if p_in > 1:
        out2 = m.apply(variables, pack_hw(x, p_in, p_in))
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=2e-5)
    # packed output: unpack externally with the module's adaptive p_out
    from pytorchvideo_tpu.layers.packed import infer_pack

    out3 = m.clone(unpack_output=False).apply(variables, x)
    q = infer_pack(out3.shape[-1], Cout)
    got = unpack_hw(out3, q, q, ref.shape[2], ref.shape[3])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


# (kernel, stride, pad, q, b_in, T, H, W, Cin, Cout) — stem geometries:
# SlowFast fast stem k(5,7,7) s(1,2,2) 3->8, X3D stem spatial conv, MViT
# patch embed, plus stress cases (q not dividing n_out -> auto-shrink,
# odd W -> plain fallback).
WCASES = [
    ((5, 7, 7), (1, 2, 2), (2, 3, 3), 16, 1, 4, 16, 32, 3, 8),
    ((5, 7, 7), (1, 2, 2), (2, 3, 3), 8, 2, 4, 16, 32, 3, 8),
    ((1, 3, 3), (1, 2, 2), (0, 1, 1), 4, 4, 2, 16, 16, 3, 24),
    ((3, 7, 7), (2, 4, 4), (1, 3, 3), 2, 1, 8, 16, 32, 3, 96),
    ((1, 1, 1), (1, 1, 1), (0, 0, 0), 8, 1, 2, 4, 16, 4, 8),
    ((1, 3, 3), (1, 2, 2), (0, 1, 1), 0, 1, 2, 8, 20, 3, 8),  # auto q, W=20
    ((1, 3, 3), (1, 2, 2), (0, 1, 1), 16, 1, 2, 8, 14, 3, 8),  # odd n_out
]


@pytest.mark.parametrize("case", WCASES, ids=[str(i) for i in range(len(WCASES))])
def test_wpacked_conv_matches_plain(case):
    from pytorchvideo_tpu.layers.packed import WPackedConv3d

    kernel, stride, pad, q, b_in, T, H, W, Cin, Cout = case
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, T, H, W, Cin)), jnp.float32)
    m = WPackedConv3d(
        features=Cout, kernel_size=kernel, out_block=q, in_block=b_in,
        strides=stride, padding=pad, use_bias=True,
    )
    variables = m.init(jax.random.PRNGKey(0), x)
    ref_conv = nn.Conv(
        features=Cout, kernel_size=kernel, strides=stride,
        padding=[(p, p) for p in pad], use_bias=True,
    )
    ref = ref_conv.apply(variables, x)
    out = m.apply(variables, x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_wpacked_conv_param_tree_matches_nn_conv():
    from pytorchvideo_tpu.layers.packed import WPackedConv3d

    x = jnp.zeros((1, 2, 8, 16, 3))
    m = WPackedConv3d(features=8, kernel_size=(1, 3, 3), out_block=8,
                      strides=(1, 2, 2), padding=(0, 1, 1))
    v = m.init(jax.random.PRNGKey(0), x)
    ref = nn.Conv(features=8, kernel_size=(1, 3, 3), strides=(1, 2, 2),
                  padding=[(0, 0), (1, 1), (1, 1)]).init(
        jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(ref)
    for (ka, a), (kb, bb) in zip(
        jax.tree_util.tree_leaves_with_path(v),
        jax.tree_util.tree_leaves_with_path(ref),
    ):
        assert ka == kb and a.shape == bb.shape


def test_packed_conv_param_tree_matches_nn_conv():
    x = jnp.zeros((1, 2, 8, 8, 8))
    m = PackedConv3d(
        features=16, kernel_size=(1, 3, 3), in_channels=8, pack=2,
        padding=(0, 1, 1),
    )
    v = m.init(jax.random.PRNGKey(0), x)
    assert set(v["params"].keys()) == {"kernel", "bias"}
    assert v["params"]["kernel"].shape == (1, 3, 3, 8, 16)
    assert v["params"]["bias"].shape == (16,)


def test_packed_conv_plain_mode():
    # pack cap 1: plain conv passthrough (odd dims also force it)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 3, 7, 9, 4)), jnp.float32)
    m = PackedConv3d(
        features=6, kernel_size=(1, 3, 3), in_channels=4, pack=1,
        padding=(0, 1, 1),
    )
    v = m.init(jax.random.PRNGKey(0), x)
    ref = _ref_conv(x, v["params"]["kernel"], v["params"]["bias"],
                    (1, 1, 1), (0, 1, 1))
    np.testing.assert_allclose(
        np.asarray(m.apply(v, x)), np.asarray(ref), atol=2e-5
    )


def test_packed_batchnorm_matches_plain():
    rng = np.random.default_rng(2)
    from pytorchvideo_tpu.layers.norms import BatchNorm

    x = jnp.asarray(rng.standard_normal((2, 3, 8, 8, 4)), jnp.float32)
    plain = BatchNorm()
    packed = PackedBatchNorm(channels=4)
    vp = plain.init(jax.random.PRNGKey(0), x, train=True)
    xp = pack_hw(x, 2, 2)
    vk = packed.init(jax.random.PRNGKey(0), xp, train=True)
    assert jax.tree_util.tree_structure(vp) == jax.tree_util.tree_structure(vk)

    for train in (False, True):
        ref, refmut = plain.apply(vp, x, train=train, mutable=["batch_stats"])
        out, outmut = packed.apply(vk, xp, train=train, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(unpack_hw(out, 2, 2)), np.asarray(ref), atol=1e-5
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            refmut, outmut,
        )


def test_factory_signature():
    f = packed_conv_factory(2)
    m = f(in_channels=8, out_channels=16, kernel_size=(1, 3, 3),
          stride=(1, 1, 1), padding=(0, 1, 1), bias=False)
    assert isinstance(m, PackedConv3d)
    assert m.use_bias is False
