"""BYOL (https://arxiv.org/pdf/2006.07733.pdf).

Parity: pytorchvideo/models/byol.py:11-143. JAX design: the momentum backbone
is an explicit second variables tree updated functionally by
:func:`momentum_update` (the reference mutates a deepcopy in-place,
byol.py:93-101); loss is the symmetric negative cosine similarity.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorchvideo_tpu.layers.norms import BatchNorm


class _Predictor(nn.Module):
    """Dense -> BN -> ReLU -> Dense (reference default predictor)."""

    inner_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.inner_dim, use_bias=False, name="fc1")(x)
        x = BatchNorm(name="norm")(x, train=train)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, use_bias=True, name="fc2")(x)


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


class BYOL:
    """Functional BYOL wrapper around a backbone linen module."""

    def __init__(
        self,
        backbone: nn.Module,
        projector: Optional[nn.Module] = None,
        predictor: Optional[nn.Module] = None,
        feature_dim: int = 2048,
        predictor_inner: int = 4096,
        mmt: float = 0.99,
    ):
        self.backbone = backbone
        self.projector = projector
        self.predictor = predictor or _Predictor(
            inner_dim=predictor_inner, out_dim=feature_dim
        )
        self.mmt = mmt

    def _backbone_apply(self, variables, x, train, rngs=None, mutable=False):
        out = self.backbone.apply(
            variables, x, train, rngs=rngs, mutable=mutable
        )
        if mutable:
            out, mutated = out
        else:
            mutated = None
        if self.projector is not None:
            raise NotImplementedError(
                "pass a backbone already composed with its projector"
            )
        return out, mutated

    def init(self, key, x_example):
        k1, k2 = jax.random.split(key)
        online = self.backbone.init(k1, x_example, False)
        feat, _ = self._backbone_apply(online, x_example, False)
        pred = self.predictor.init(k2, feat, False)
        # momentum copy starts identical to online (reference deepcopy)
        momentum = jax.tree_util.tree_map(lambda a: a, online)
        return {"online": online, "momentum": momentum, "predictor": pred}

    def sim_loss(self, q, k):
        """-mean(<q, k>) (reference byol.py:62-72)."""
        return -jnp.mean(jnp.einsum("nc,nc->n", q, k))

    def momentum_update(self, state, mmt: Optional[float] = None):
        """m = m*mmt + online*(1-mmt) over every variable."""
        mmt = self.mmt if mmt is None else mmt
        new_m = jax.tree_util.tree_map(
            lambda m, o: m * mmt + o * (1.0 - mmt),
            state["momentum"],
            state["online"],
        )
        return {**state, "momentum": new_m}

    def forward_backbone(self, state, x, train=True, rngs=None):
        proj, _ = self._backbone_apply(state["online"], x, train)
        pred = self.predictor.apply(state["predictor"], proj, train, rngs=rngs)
        return _l2_normalize(pred)

    def forward_backbone_mmt(self, state, x):
        proj, _ = self._backbone_apply(state["momentum"], x, False)
        return _l2_normalize(proj)

    def loss(self, state, x1, x2, train=True, rngs=None):
        """Symmetric BYOL loss (reference byol.py:124-143). Call
        :func:`momentum_update` separately per step (explicit state)."""
        pred_1 = self.forward_backbone(state, x1, train, rngs)
        pred_2 = self.forward_backbone(state, x2, train, rngs)
        proj_mmt_1 = jax.lax.stop_gradient(self.forward_backbone_mmt(state, x1))
        proj_mmt_2 = jax.lax.stop_gradient(self.forward_backbone_mmt(state, x2))
        return (
            self.sim_loss(pred_1, proj_mmt_2) + self.sim_loss(pred_2, proj_mmt_1)
        ) / 2.0
