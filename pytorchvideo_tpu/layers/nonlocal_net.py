"""Non-local block (Wang et al. 2018), channels-last.

Parity: pytorchvideo/layers/nonlocal_net.py (NonLocal :10-92,
create_nonlocal :95-153). The affinity matmuls are expressed as einsums over
(B, L, C) so XLA maps them onto the MXU; optional spatiotemporal max pool
shrinks phi/g.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorchvideo_tpu.layers.common import apply_with_train, conv3d, max_pool3d
from pytorchvideo_tpu.layers.norms import BatchNorm


class NonLocal(nn.Module):
    """theta/phi/g 1x1x1 projections, affinity, out conv + norm, residual."""

    dim_inner: int
    dim_in: int
    pool_size: Tuple[int, int, int] = (1, 1, 1)
    instantiation: str = "dot_product"
    norm: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.instantiation in ("dot_product", "softmax")
        identity = x
        B, T, H, W, C = x.shape

        theta = conv3d(self.dim_inner, 1, name="conv_theta")(x)
        pooled = x
        if any(s > 1 for s in self.pool_size):
            pooled = max_pool3d(x, self.pool_size, self.pool_size, (0, 0, 0))
        phi = conv3d(self.dim_inner, 1, name="conv_phi")(pooled)
        g = conv3d(self.dim_inner, 1, name="conv_g")(pooled)

        theta_f = theta.reshape(B, -1, self.dim_inner)
        phi_f = phi.reshape(B, -1, self.dim_inner)
        g_f = g.reshape(B, -1, self.dim_inner)

        affinity = jnp.einsum(
            "btc,bpc->btp", theta_f, phi_f, preferred_element_type=jnp.float32
        )
        if self.instantiation == "softmax":
            affinity = affinity * (self.dim_inner**-0.5)
            affinity = jax.nn.softmax(affinity, axis=2)
        else:
            affinity = affinity / affinity.shape[2]
        affinity = affinity.astype(g_f.dtype)

        out = jnp.einsum("btp,bpc->btc", affinity, g_f)
        out = out.reshape(B, T, H, W, self.dim_inner)
        out = conv3d(self.dim_in, 1, name="conv_out")(out)
        out = apply_with_train(self.norm, out, train)
        return identity + out


def create_nonlocal(
    *,
    dim_in: int,
    dim_inner: int,
    pool_size: Optional[Tuple[int, int, int]] = (1, 1, 1),
    instantiation: str = "softmax",
    norm: Optional[Callable] = BatchNorm,
    norm_eps: float = 1e-5,
    norm_momentum: float = 0.1,
) -> NonLocal:
    """Builder (reference nonlocal_net.py:95-153)."""
    if pool_size is None:
        pool_size = (1, 1, 1)
    norm_model = (
        None
        if norm is None
        else norm(momentum=1.0 - norm_momentum, epsilon=norm_eps)
    )
    return NonLocal(
        dim_inner=dim_inner,
        dim_in=dim_in,
        pool_size=tuple(pool_size),
        instantiation=instantiation,
        norm=norm_model,
    )
