"""Fused kv-pool+LN+attention kernel vs the unfused XLA reference.

The fused kernel (ops/fused_kvpool_attention.py) must reproduce, in one
pallas_call, exactly what the unfused path computes: depthwise conv pool
of the raw k/v grids (reference pytorchvideo/layers/attention.py:341-465),
per-head-segment LayerNorm post-pool, cls-row concat, and packed
attention. Gradients route through the custom_vjp XLA-recompute backward
and must match plain jax.grad of the reference composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchvideo_tpu.ops.fused_kvpool_attention import (
    fusable,
    fused_kvpool_attention,
    fused_kvpool_attention_xla,
    pool_out,
)

CASES = [
    # (thw, heads, head_dim, stride, has_cls, residual)
    ((4, 16, 16), 1, 32, (1, 8, 8), True, True),
    ((4, 16, 16), 2, 16, (1, 4, 4), True, False),
    ((2, 8, 8), 1, 96, (1, 4, 4), False, True),
    ((4, 12, 20), 2, 32, (1, 4, 4), True, True),  # H != W, ragged /4 -> 3,5
]


def _make(case, seed=0):
    thw, heads, head_dim, stride, has_cls, residual = case
    T, H, W = thw
    rng = np.random.default_rng(seed)
    B, HC = 2, heads * head_dim
    L = T * H * W
    kernel = (3, 3, 3)
    q = jnp.asarray(rng.standard_normal((B, L, HC)), jnp.float32)
    kg = jnp.asarray(rng.standard_normal((B, L, HC)), jnp.float32)
    vg = jnp.asarray(rng.standard_normal((B, L, HC)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((27, HC)) * 0.2, jnp.float32)
    wv = jnp.asarray(rng.standard_normal((27, HC)) * 0.2, jnp.float32)
    lnk = jnp.asarray(rng.standard_normal((2, HC)) * 0.3 + 1.0, jnp.float32)
    lnv = jnp.asarray(rng.standard_normal((2, HC)) * 0.3 + 1.0, jnp.float32)
    cls_k = (
        jnp.asarray(rng.standard_normal((B, 1, HC)), jnp.float32)
        if has_cls
        else None
    )
    cls_v = (
        jnp.asarray(rng.standard_normal((B, 1, HC)), jnp.float32)
        if has_cls
        else None
    )
    return (q, kg, vg, wk, wv, lnk, lnv, cls_k, cls_v), dict(
        thw=thw, num_heads=heads, scale=head_dim**-0.5, residual=residual,
        kernel=kernel, stride=stride,
    )


@pytest.mark.parametrize("case", CASES, ids=[str(i) for i in range(len(CASES))])
def test_fused_matches_xla_reference(case):
    args, kw = _make(case)
    ref, kp_ref, vp_ref = fused_kvpool_attention_xla(*args, **kw)
    out, kp, vp = fused_kvpool_attention(
        *args, kw["thw"], kw["num_heads"], kw["scale"], kw["residual"],
        kw["kernel"], kw["stride"], 1e-6, 128, True,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(kp_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vp_ref), atol=2e-4)


def test_fused_grads_match_reference():
    case = CASES[1]
    args, kw = _make(case, seed=3)
    q, kg, vg, wk, wv, lnk, lnv, cls_k, cls_v = args

    def loss_fused(q, kg, vg, wk, wv, lnk, lnv, cls_k, cls_v):
        out, kp, vp = fused_kvpool_attention(
            q, kg, vg, wk, wv, lnk, lnv, cls_k, cls_v,
            kw["thw"], kw["num_heads"], kw["scale"], kw["residual"],
            kw["kernel"], kw["stride"], 1e-6, 128, True,
        )
        # touch all three outputs: the pooled grids feed the cls path
        return jnp.sum(out * jnp.cos(out)) + jnp.sum(kp * vp)

    def loss_ref(q, kg, vg, wk, wv, lnk, lnv, cls_k, cls_v):
        out, kp, vp = fused_kvpool_attention_xla(
            q, kg, vg, wk, wv, lnk, lnv, cls_k, cls_v, **kw
        )
        return jnp.sum(out * jnp.cos(out)) + jnp.sum(kp * vp)

    gf = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_fusable_gate():
    assert fusable((8, 56, 56), 96, (3, 3, 3), (1, 8, 8))
    assert fusable((8, 28, 28), 192, (3, 3, 3), (1, 4, 4))
    assert not fusable((8, 14, 14), 384, (3, 3, 3), (1, 2, 2))  # stride 2
    assert not fusable((8, 56, 56), 96, None, (1, 8, 8))  # no pool
    assert not fusable((8, 56, 56), 96, (3, 3, 3), (2, 8, 8))  # t stride
    assert not fusable((16, 112, 112), 768, (3, 3, 3), (1, 8, 8))  # VMEM


def test_msa_fused_matches_unfused(monkeypatch):
    """Whole MultiScaleBlock: PVT_FUSED_KVPOOL=1 must be numerically
    identical to the unfused path with the SAME params (the fused path
    reads TokenPool's params through the tree twins)."""
    from pytorchvideo_tpu.layers.attention import MultiScaleBlock

    block = MultiScaleBlock(
        dim=32,
        dim_out=32,
        num_heads=2,
        stride_q=(1, 2, 2),
        stride_kv=(1, 4, 4),
        kernel_q=(3, 3, 3),
        kernel_kv=(3, 3, 3),
        residual_pool=True,
    )
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 1 + 4 * 8 * 8, 32)), jnp.float32)
    monkeypatch.setenv("PVT_FUSED_KVPOOL", "0")
    params = block.init(jax.random.PRNGKey(0), x, (4, 8, 8), False)
    ref, thw_ref = block.apply(params, x, (4, 8, 8), False)
    monkeypatch.setenv("PVT_FUSED_KVPOOL", "1")
    out, thw_out = block.apply(params, x, (4, 8, 8), False)
    assert tuple(thw_out) == tuple(thw_ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    # gradients flow through the custom_vjp recompute path
    def loss(p, env):
        return jnp.sum(jnp.square(block.apply(p, x, (4, 8, 8), False)[0]))

    monkeypatch.setenv("PVT_FUSED_KVPOOL", "1")
    g1 = jax.grad(loss)(params, "1")
    monkeypatch.setenv("PVT_FUSED_KVPOOL", "0")
    g0 = jax.grad(loss)(params, "0")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-3
        ),
        g1, g0,
    )


def test_pool_out():
    assert pool_out(56, 3, 8, 1) == 7
    assert pool_out(28, 3, 4, 1) == 7
    assert pool_out(12, 3, 4, 1) == 3
