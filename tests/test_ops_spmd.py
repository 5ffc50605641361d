"""SPMD partitioning of the Pallas kernels (ops/spmd.py).

A bare pallas_call is opaque to the partitioner: under jit over a Mesh it
gets replicated (observed: 12 all-gathers of the global batch around one
pooled conv). These tests pin the custom_partitioning rules: sharded runs
must compile with NO all-gathers (one all-reduce for the reduced weight
grad) and reproduce the single-device math exactly. Runs in interpret
mode on the 8-device CPU mesh from conftest.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorchvideo_tpu.ops import token_pool as tp
from pytorchvideo_tpu.ops.pooled_attention import (
    pooled_attention_packed_pallas,
    pooled_attention_packed_pallas_bwd,
    pooled_attention_packed_xla,
)


def _data_mesh():
    return Mesh(np.array(jax.devices()).reshape(8), ("data",))


def test_pool_fwd_batch_sharded_no_allgather():
    mesh = _data_mesh()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 4, 8, 8, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 32)), jnp.float32)
    ds = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    f = jax.jit(
        lambda a, b: tp._token_pool_ad(a, b, (1, 2, 2), (1, 1, 1), True),
        in_shardings=(ds, repl),
        out_shardings=ds,
    )
    hlo = f.lower(x, w).compile().as_text()
    assert hlo.count("all-gather") == 0, "pool fwd got replicated"
    out = f(jax.device_put(x, ds), jax.device_put(w, repl))
    ref = tp._xla_depthwise_pool(x, w, (1, 2, 2), (1, 1, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pool_bwd_batch_sharded_single_allreduce():
    mesh = _data_mesh()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 4, 8, 8, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 32)), jnp.float32)
    ds = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def loss(a, b):
        return jnp.sum(
            jnp.sin(tp._token_pool_ad(a, b, (1, 2, 2), (1, 1, 1), True))
        )

    gf = jax.jit(
        jax.grad(loss, (0, 1)),
        in_shardings=(ds, repl),
        out_shardings=(ds, repl),
    )
    hlo = gf.lower(x, w).compile().as_text()
    assert hlo.count("all-gather") == 0
    assert hlo.count("all-reduce") == 1  # the dw psum over the batch axis
    gx, gw = gf(jax.device_put(x, ds), jax.device_put(w, repl))
    gx2, gw2 = jax.grad(
        lambda a, b: jnp.sum(
            jnp.sin(tp._xla_depthwise_pool(a, b, (1, 2, 2), (1, 1, 1)))
        ),
        (0, 1),
    )(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw2), atol=1e-3)


def test_packed_attention_dp_tp_sharded():
    """Batch over 'data' AND packed head-channels over 'model' (2 heads per
    shard): the kernel must run purely locally (no collectives) because the
    per-shard lowering derives its head count from the local channel width."""
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    rng = np.random.default_rng(2)
    B, Lq, Lk, H, hd = 4, 96, 40, 4, 16
    q = jnp.asarray(rng.normal(size=(B, Lq, H * hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Lk, H * hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Lk, H * hd)), jnp.float32)
    sh = NamedSharding(mesh, P("data", None, "model"))
    f = jax.jit(
        lambda a, b, c: pooled_attention_packed_pallas(
            a, b, c, H, 0.125, True, 64, True
        ),
        in_shardings=(sh, sh, sh),
        out_shardings=sh,
    )
    hlo = f.lower(q, k, v).compile().as_text()
    assert hlo.count("all-gather") == 0
    assert hlo.count("all-reduce") == 0
    out = f(*(jax.device_put(a, sh) for a in (q, k, v)))
    ref = pooled_attention_packed_xla(q, k, v, H, 0.125, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_attention_bwd_dp_sharded():
    mesh = _data_mesh()
    rng = np.random.default_rng(3)
    B, Lq, Lk, H, hd = 8, 64, 24, 2, 16
    q = jnp.asarray(rng.normal(size=(B, Lq, H * hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Lk, H * hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Lk, H * hd)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, Lq, H * hd)), jnp.float32)
    ds = NamedSharding(mesh, P("data"))
    f = jax.jit(
        lambda a, b, c, d: pooled_attention_packed_pallas_bwd(
            a, b, c, d, H, 0.125, False, 64, True
        ),
        in_shardings=(ds,) * 4,
        out_shardings=(ds,) * 3,
    )
    hlo = f.lower(q, k, v, g).compile().as_text()
    assert hlo.count("all-gather") == 0
    outs = f(*(jax.device_put(a, ds) for a in (q, k, v, g)))
    refs = pooled_attention_packed_pallas_bwd(
        q, k, v, g, H, 0.125, False, 64, True
    )
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=2e-5)
