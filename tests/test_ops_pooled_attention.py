"""Pallas pooled-attention kernel: interpret-mode parity vs the XLA path."""

import numpy as np
import pytest

import jax.numpy as jnp

from pytorchvideo_tpu.ops.pooled_attention import (
    pooled_attention,
    pooled_attention_pallas,
    pooled_attention_xla,
)


@pytest.mark.parametrize(
    "B,H,Lq,Lk,c,residual",
    [
        (1, 2, 1000, 137, 96, True),
        (2, 1, 300, 50, 64, False),
        (1, 4, 513, 1, 32, True),  # singleton kv
    ],
)
def test_pallas_matches_xla(B, H, Lq, Lk, c, residual):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, Lq, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, Lk, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, Lk, c)), jnp.float32)
    ref = pooled_attention_xla(q, k, v, 0.125, residual)
    out = pooled_attention_pallas(
        q, k, v, 0.125, residual, interpret=True, tile_q=256
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize(
    "B,H,Lq,Lk,c,residual",
    [
        (1, 2, 700, 137, 96, True),
        (2, 1, 300, 50, 64, False),
    ],
)
def test_pallas_grad_matches_xla(B, H, Lq, Lk, c, residual):
    import jax

    from pytorchvideo_tpu.ops.pooled_attention import (
        pooled_attention_pallas_ad,
    )

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, H, Lq, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, Lk, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, Lk, c)), jnp.float32)
    # random cotangent projection so every output element contributes
    w = jnp.asarray(rng.normal(size=(B, H, Lq, c)), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(pooled_attention_xla(q, k, v, 0.125, residual) * w)

    def loss_pallas(q, k, v):
        return jnp.sum(
            pooled_attention_pallas_ad(
                q, k, v, 0.125, residual, True  # interpret mode
            )
            * w
        )

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    out_grads = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for name, r, o in zip("qkv", ref_grads, out_grads):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), atol=5e-4, rtol=1e-4,
            err_msg=f"d{name} mismatch",
        )


def test_dispatch_default_cpu_uses_xla():
    q = jnp.zeros((1, 1, 2048, 16))
    k = jnp.zeros((1, 1, 64, 16))
    out = pooled_attention(q, k, k, 0.25)
    assert out.shape == (1, 1, 2048, 16)


@pytest.mark.parametrize(
    "B,Lq,Lk,H,c,residual",
    [
        (2, 300, 57, 4, 96, True),
        (1, 515, 130, 2, 64, False),
        (2, 128, 128, 1, 96, True),
    ],
)
def test_packed_pallas_matches_packed_xla(B, Lq, Lk, H, c, residual):
    """Head-packed (B, L, H*c) kernel: interpret-mode fwd parity."""
    from pytorchvideo_tpu.ops.pooled_attention import (
        pooled_attention_packed_pallas,
        pooled_attention_packed_xla,
    )

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, Lq, H * c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Lk, H * c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Lk, H * c)), jnp.float32)
    ref = pooled_attention_packed_xla(q, k, v, H, 0.125, residual)
    out = pooled_attention_packed_pallas(
        q, k, v, H, 0.125, residual, tile_q=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


@pytest.mark.parametrize(
    "B,Lq,Lk,H,c,residual",
    [(2, 300, 57, 4, 96, True), (1, 515, 130, 2, 64, False)],
)
def test_packed_pallas_grad_matches_packed_xla(B, Lq, Lk, H, c, residual):
    """Packed custom-VJP (flash-style bwd w/ in-VMEM dk/dv accumulation)."""
    import jax

    from pytorchvideo_tpu.ops.pooled_attention import (
        pooled_attention_packed_ad,
        pooled_attention_packed_xla,
    )

    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(B, Lq, H * c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Lk, H * c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Lk, H * c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(B, Lq, H * c)), jnp.float32)

    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(
            pooled_attention_packed_xla(q, k, v, H, 0.125, residual) * w
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_pal = jax.grad(
        lambda q, k, v: jnp.sum(
            pooled_attention_packed_ad(q, k, v, H, 0.125, residual, 128, True)
            * w
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
