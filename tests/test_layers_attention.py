"""Weight-synced parity tests: MViT attention layers vs reference torch.

Strategy: build the reference torch module and our linen module with the same
config, copy the torch weights into our pytree (layout-converted), and
compare forward outputs on identical inputs.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pytorchvideo_tpu.layers import MultiScaleBlock, LayerNorm
from pytorchvideo_tpu.zoo.torch_weights import (
    conv3d_params,
    dense_params,
    ln_params,
    to_numpy,
)
from ref_loader import load_ref

ref_attention = load_ref("pytorchvideo.layers.attention")


def _map_token_pool(sd, t_prefix, has_conv):
    out = {}
    if has_conv:
        out["pool"] = conv3d_params(sd, f"{t_prefix}.pool")
        out["norm"] = {"ln": ln_params(sd, f"{t_prefix}.norm")}
    return out


def _map_block_params(sd, cfg):
    """Torch MultiScaleBlock state_dict -> our params tree."""
    attn = {
        "q": dense_params(sd, "attn.q"),
        "k": dense_params(sd, "attn.k"),
        "v": dense_params(sd, "attn.v"),
        "proj": dense_params(sd, "attn.proj"),
    }
    if any(k.startswith("attn._attention_pool_q.pool") for k in sd):
        attn["pool_q"] = _map_token_pool(sd, "attn._attention_pool_q", True)
    if any(k.startswith("attn._attention_pool_k.pool") for k in sd):
        attn["pool_k"] = _map_token_pool(sd, "attn._attention_pool_k", True)
        attn["pool_v"] = _map_token_pool(sd, "attn._attention_pool_v", True)
    params = {
        "norm1": {"ln": ln_params(sd, "norm1")},
        "norm2": {"ln": ln_params(sd, "norm2")},
        "attn": attn,
        "mlp": {
            "fc1": dense_params(sd, "mlp.fc1"),
            "fc2": dense_params(sd, "mlp.fc2"),
        },
    }
    if "proj.weight" in sd:
        params["proj"] = dense_params(sd, "proj")
    return params


@pytest.mark.parametrize(
    "dim,dim_out,stride_q,stride_kv,residual_pool,dim_mul_in_att",
    [
        (48, 48, (1, 1, 1), (1, 1, 1), False, False),
        (48, 48, (1, 2, 2), (1, 4, 4), True, False),
        (48, 96, (2, 2, 2), (1, 2, 2), True, True),
        (48, 96, (1, 2, 2), (1, 2, 2), False, False),
    ],
)
def test_multiscale_block_parity(
    dim, dim_out, stride_q, stride_kv, residual_pool, dim_mul_in_att
):
    torch.manual_seed(0)
    num_heads = 4
    thw = (4, 8, 8)
    L = 1 + int(np.prod(thw))
    B = 2
    kernel = (3, 3, 3)

    ref_block = ref_attention.MultiScaleBlock(
        dim=dim,
        dim_out=dim_out,
        num_heads=num_heads,
        qkv_bias=True,
        kernel_q=kernel,
        kernel_kv=kernel,
        stride_q=stride_q,
        stride_kv=stride_kv,
        residual_pool=residual_pool,
        dim_mul_in_att=dim_mul_in_att,
    ).eval()

    our_block = MultiScaleBlock(
        dim=dim,
        dim_out=dim_out,
        num_heads=num_heads,
        qkv_bias=True,
        kernel_q=kernel,
        kernel_kv=kernel,
        stride_q=stride_q,
        stride_kv=stride_kv,
        residual_pool=residual_pool,
        dim_mul_in_att=dim_mul_in_att,
    )

    x = np.random.default_rng(0).normal(size=(B, L, dim)).astype(np.float32)

    with torch.no_grad():
        ref_out, ref_thw = ref_block(torch.from_numpy(x), list(thw))

    sd = {k: v for k, v in ref_block.state_dict().items()}
    params = _map_block_params(sd, None)
    our_out, our_thw = our_block.apply(
        {"params": params}, jnp.asarray(x), thw, False
    )

    assert tuple(our_thw) == tuple(ref_thw)
    np.testing.assert_allclose(
        np.asarray(our_out), ref_out.numpy(), rtol=2e-4, atol=2e-4
    )


def test_multiscale_block_shapes_jit():
    block = MultiScaleBlock(
        dim=32, dim_out=64, num_heads=2, stride_q=(1, 2, 2), stride_kv=(1, 2, 2)
    )
    x = jnp.zeros((2, 1 + 4 * 8 * 8, 32))
    params = block.init(jax.random.PRNGKey(0), x, (4, 8, 8), False)
    fn = jax.jit(
        lambda p, x: block.apply(p, x, (4, 8, 8), False), static_argnums=()
    )
    out, thw = fn(params, x)
    assert out.shape == (2, 1 + 4 * 4 * 4, 64)
    assert tuple(thw) == (4, 4, 4)


def test_pool_first_mode_runs():
    from pytorchvideo_tpu.layers import MultiScaleAttention

    attn = MultiScaleAttention(
        dim_out=64,
        num_heads=4,
        pool_first=True,
        kernel_q=(3, 3, 3),
        kernel_kv=(3, 3, 3),
        stride_q=(1, 2, 2),
        stride_kv=(1, 2, 2),
    )
    x = jnp.zeros((2, 1 + 4 * 8 * 8, 64))
    params = attn.init(jax.random.PRNGKey(0), x, (4, 8, 8), False)
    out, thw = attn.apply(params, x, (4, 8, 8), False)
    assert out.shape == (2, 1 + 4 * 4 * 4, 64)


def test_block_tuple_input_matches_array_input():
    """The model threads (cls, grid) pairs through blocks; a tuple-in run
    must be numerically identical to the array-in run (same params)."""
    block = MultiScaleBlock(
        dim=32,
        dim_out=64,
        num_heads=2,
        stride_q=(1, 2, 2),
        stride_kv=(1, 2, 2),
        kernel_q=(3, 3, 3),
        kernel_kv=(3, 3, 3),
        residual_pool=True,
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 1 + 4 * 8 * 8, 32)), jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x, (4, 8, 8), False)
    out_a, thw_a = block.apply(params, x, (4, 8, 8), False)
    (cls_o, grid_o), thw_t = block.apply(
        params, (x[:, :1], x[:, 1:]), (4, 8, 8), False
    )
    out_t = jnp.concatenate([cls_o, grid_o], axis=1)
    assert tuple(thw_a) == tuple(thw_t)
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_t), rtol=1e-5, atol=1e-5
    )


def test_block_no_cls_tuple_matches_array():
    block = MultiScaleBlock(
        dim=32,
        dim_out=32,
        num_heads=2,
        stride_q=(1, 2, 2),
        stride_kv=(1, 2, 2),
        kernel_q=(3, 3, 3),
        kernel_kv=(3, 3, 3),
        has_cls_embed=False,
    )
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 4 * 8 * 8, 32)), jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x, (4, 8, 8), False)
    out_a, _ = block.apply(params, x, (4, 8, 8), False)
    (cls_o, grid_o), _ = block.apply(params, (None, x), (4, 8, 8), False)
    assert cls_o is None
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(grid_o), rtol=1e-5, atol=1e-5
    )
