"""Packed-pathway SlowFast parity: pathway_packs is a pure layout rewrite.

The packed fast pathway (layers/packed.py; see VERDICT round-2 item 2 —
fast pathway measured at 7% MFU) must be numerically identical to the plain
build given the same parameters, with an IDENTICAL parameter tree
(checkpoint import / BN-fold passes see no difference). Reference geometry:
models/slowfast.py:56 (stem), resnet.py:1345-1365 (bottlenecks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchvideo_tpu.models.slowfast import create_slowfast


def _tiny_kwargs():
    # 2-pathway tiny SlowFast: depths (1,1,1,1), 32x32 crop -> stage dims
    # 8/8/4/2 (res5 unpacked). T slow 4, fast 16.
    return dict(
        model_num_class=7,
        stage_depths=(1, 1, 1, 1),
        head_pool_kernel_sizes=((4, 1, 1), (16, 1, 1)),
        dropout_rate=0.0,
    )


def _inputs(rng):
    return [
        jnp.asarray(rng.standard_normal((2, 4, 32, 32, 3)), jnp.float32),
        jnp.asarray(rng.standard_normal((2, 16, 32, 32, 3)), jnp.float32),
    ]


@pytest.mark.parametrize(
    "pack,stages",
    [(2, None), (4, None), (4, 2), ((4, 2, 2, 2), None), ((2, 4, 1, 2), None)],
)
def test_packed_matches_plain(pack, stages):
    # pack factors are adaptive caps: at pack 4 the pathway self-transitions
    # 4->2 at the stride boundary whose output stops dividing 4, and to
    # unpacked (p_out=1) where dims go odd; packed_stages=2 additionally
    # pins the tail stages to plain convs (explicit unpack boundary)
    rng = np.random.default_rng(0)
    x = _inputs(rng)
    plain = create_slowfast(**_tiny_kwargs())
    packed = create_slowfast(
        **_tiny_kwargs(), pathway_packs=(1, pack), packed_stages=stages
    )

    v = plain.init(jax.random.PRNGKey(0), x, False)
    v2 = packed.init(jax.random.PRNGKey(0), x, False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(v2)):
        assert a.shape == b.shape

    # identical params -> identical outputs (eval mode)
    ref = plain.apply(v, x, False)
    out = packed.apply(v, x, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_matches_plain_train_mode():
    # train mode exercises batch statistics through PackedBatchNorm
    rng = np.random.default_rng(1)
    x = _inputs(rng)
    plain = create_slowfast(**_tiny_kwargs())
    packed = create_slowfast(**_tiny_kwargs(), pathway_packs=(1, 2))
    v = plain.init(jax.random.PRNGKey(0), x, False)

    ref, refmut = plain.apply(v, x, True, mutable=["batch_stats"])
    out, outmut = packed.apply(v, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-4),
        refmut, outmut,
    )


def test_packed_gradients_match():
    rng = np.random.default_rng(2)
    x = _inputs(rng)
    plain = create_slowfast(**_tiny_kwargs())
    packed = create_slowfast(**_tiny_kwargs(), pathway_packs=(1, 2))
    v = plain.init(jax.random.PRNGKey(0), x, False)

    def loss(model, params):
        out = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x, False
        )
        return (out**2).mean()

    g_ref = jax.grad(lambda p: loss(plain, p))(v["params"])
    g_pk = jax.grad(lambda p: loss(packed, p))(v["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5
        ),
        g_ref, g_pk,
    )
