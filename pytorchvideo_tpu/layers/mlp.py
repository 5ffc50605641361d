"""Multi-layer perceptron factory (reference pytorchvideo/layers/mlp.py:8-62)."""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import flax.linen as nn

from pytorchvideo_tpu.layers.common import apply_with_train


class MultilayerPerceptron(nn.Module):
    """Linear(+norm+act) stack with final dropout/activation."""

    fully_connected_dims: List[int]
    norm: Optional[Callable] = None
    mid_activation: Callable = nn.relu
    final_activation: Optional[Callable] = nn.relu
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = list(self.fully_connected_dims)
        assert len(dims) > 1
        for i, dim in enumerate(dims[1:-1]):
            x = nn.Dense(dim, name=f"fc_{i}")(x)
            if self.norm is not None:
                x = apply_with_train(self.norm(), x, train)
            x = self.mid_activation(x)
        x = nn.Dense(dims[-1], name=f"fc_{len(dims) - 2}")(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        if self.final_activation is not None:
            x = self.final_activation(x)
        return x


def make_multilayer_perceptron(
    fully_connected_dims: List[int],
    norm: Optional[Callable] = None,
    mid_activation: Callable = nn.relu,
    final_activation: Optional[Callable] = nn.relu,
    dropout_rate: float = 0.0,
) -> Tuple[nn.Module, int]:
    """Factory mirroring the reference API; returns (module, output_dim)."""
    assert all(isinstance(x, int) and x >= 0 for x in fully_connected_dims)
    mlp = MultilayerPerceptron(
        fully_connected_dims=list(fully_connected_dims),
        norm=norm,
        mid_activation=mid_activation,
        final_activation=final_activation,
        dropout_rate=dropout_rate,
    )
    return mlp, fully_connected_dims[-1]
