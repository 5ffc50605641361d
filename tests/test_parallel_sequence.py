"""Sequence-parallel pooled attention (parallel/sequence.py).

Parity of the token-sharded computation against the single-device packed
op on the 8-device virtual CPU mesh (conftest) — values and gradients,
replicated-kv and token-sharded-kv (all_gather) layouts, with and
without a composed data axis. Row independence given full kv is the
invariant that makes the decomposition exact, so parity is the whole
correctness story.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pytorchvideo_tpu.ops.pooled_attention import pooled_attention_packed_xla
from pytorchvideo_tpu.parallel import sequence_parallel_attention


def _mk(b=2, lq=64, lk=24, h=2, c=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, lq, h * c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, lk, h * c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, lk, h * c)), jnp.float32)
    return q, k, v, h, c**-0.5


@pytest.mark.parametrize("kv_sharded", [False, True])
@pytest.mark.parametrize("residual_pool", [False, True])
def test_value_parity(kv_sharded, residual_pool):
    q, k, v, h, scale = _mk()
    devices = np.array(jax.devices()[:4])
    with Mesh(devices, ("model",)) as mesh:
        out = sequence_parallel_attention(
            q, k, v, h, scale, residual_pool,
            mesh=mesh, kv_sharded=kv_sharded,
        )
    ref = pooled_attention_packed_xla(q, k, v, h, scale, residual_pool)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_composes_with_data_axis():
    q, k, v, h, scale = _mk(b=4)
    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    with Mesh(devices, ("data", "model")) as mesh:
        out = sequence_parallel_attention(
            q, k, v, h, scale,
            mesh=mesh, batch_axis="data", kv_sharded=True,
        )
    ref = pooled_attention_packed_xla(q, k, v, h, scale, False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_gradient_parity():
    q, k, v, h, scale = _mk()
    devices = np.array(jax.devices()[:4])

    def loss_sp(q, k, v, mesh):
        out = sequence_parallel_attention(
            q, k, v, h, scale, mesh=mesh, kv_sharded=True
        )
        return jnp.sum(out * out)

    def loss_ref(q, k, v):
        out = pooled_attention_packed_xla(q, k, v, h, scale, False)
        return jnp.sum(out * out)

    with Mesh(devices, ("model",)) as mesh:
        gq, gk, gv = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v, mesh)
    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, ref in ((gq, rq), (gk, rk), (gv, rv)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )


def test_indivisible_sequence_raises():
    q, k, v, h, scale = _mk(lq=63)
    devices = np.array(jax.devices()[:4])
    with Mesh(devices, ("model",)) as mesh:
        with pytest.raises(ValueError, match="divide"):
            sequence_parallel_attention(q, k, v, h, scale, mesh=mesh)
