"""Masked multi-stream building blocks for variable-length multimodal input.

Parity: pytorchvideo/models/masked_multistream.py — MaskedTemporalPooling
:35, TransposeMultiheadAttention :96, LearnMaskedDefault :154, LSTM :208,
TransposeTransformerEncoder :275, MaskedSequential :322,
MaskedMultiPathWay :347.

All modules take (x, mask) where x is (B, L, C) and mask is a (B, L) bool
tensor of valid positions. The LSTM runs as a lax.scan (compiler-friendly
recurrence; the torch version packs sequences — here masked steps simply
hold the carry).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedTemporalPooling(nn.Module):
    """max/avg/sum pooling over valid timesteps (reference :35-93)."""

    method: str

    @nn.compact
    def __call__(self, x, mask=None):
        assert self.method in ("max", "avg", "sum")
        b, t = x.shape[0], x.shape[1]
        if mask is None:
            mask = jnp.ones((b, t), bool)
        if self.method == "max":
            masked = jnp.where(mask[..., None], x, -jnp.inf)
            # rows with no valid entries pool to 0
            all_invalid = ~jnp.any(mask, axis=-1)
            masked = jnp.where(all_invalid[:, None, None], 0.0, masked)
            return jnp.max(masked, axis=1)
        if self.method == "avg":
            masked = x * mask[..., None].astype(x.dtype)
            lengths = jnp.clip(mask.sum(axis=-1), 1, None).astype(x.dtype)
            return masked.sum(axis=1) / lengths[:, None]
        masked = x * mask[..., None].astype(x.dtype)
        return masked.sum(axis=1)


class TransposeMultiheadAttention(nn.Module):
    """Self-attention over (B, L, C) with key-padding mask (reference :96-151;
    position 0 is always treated as valid, matching the reference quirk)."""

    feature_dim: int
    num_heads: int = 1

    @nn.compact
    def __call__(self, x, mask=None):
        assert x.ndim == 3
        if mask is not None:
            mask = mask.at[:, 0].set(True)
            attn_mask = mask[:, None, None, :]  # (B, 1, 1(keys broadcast), L)
        else:
            attn_mask = None
        return nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.feature_dim,
            out_features=self.feature_dim,
            name="attention",
        )(x, x, mask=attn_mask)


class LearnMaskedDefault(nn.Module):
    """Learned fill vector for batch rows with no valid entries
    (reference :154-205)."""

    feature_dim: int
    init_method: str = "gaussian"
    freeze: bool = False

    @nn.compact
    def __call__(self, x, mask):
        assert self.init_method in ("gaussian", "zeros")
        init = (
            nn.initializers.zeros
            if self.init_method == "zeros"
            else nn.initializers.normal(stddev=1.0)
        )
        defaults = self.param("_learned_defaults", init, (self.feature_dim,))
        if self.freeze:
            defaults = jax.lax.stop_gradient(defaults)
        any_valid = jnp.any(mask.reshape(mask.shape[0], -1), axis=-1)
        m = any_valid.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        return x * m + defaults * (1 - m)


class LSTM(nn.Module):
    """Masked LSTM returning the last valid hidden state (reference :208-272).

    Recurrence via lax.scan with masked carry-holding; bidirectional
    concatenates the reverse pass's first-step state.
    """

    dim_in: int
    hidden_dim: int
    dropout: float = 0.0
    bidirectional: bool = False

    @property
    def output_dim(self):
        return 2 * self.hidden_dim if self.bidirectional else self.hidden_dim

    @nn.compact
    def __call__(self, data, mask=None):
        assert data.ndim == 3
        b, t = data.shape[0], data.shape[1]
        if mask is None:
            mask = jnp.ones((b, t), bool)
        # like the reference's pack_padded_sequence: mask is a valid-prefix,
        # so lengths fully describe it
        lengths = jnp.clip(jnp.sum(mask, axis=1), 1, t)
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_dim), name="fwd")
        carry_f, _ = fwd(data, seq_lengths=lengths, return_carry=True)
        h_fwd = carry_f[1]
        if self.bidirectional:
            bwd = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden_dim), reverse=True, name="bwd"
            )
            carry_b, _ = bwd(data, seq_lengths=lengths, return_carry=True)
            return jnp.concatenate([h_fwd, carry_b[1]], axis=-1)
        return h_fwd


class TransposeTransformerEncoder(nn.Module):
    """Transformer encoder over masked (B, L, C), returns position 0
    (reference :275-319)."""

    dim_in: int
    num_heads: int = 1
    num_layers: int = 1

    @nn.compact
    def __call__(self, data, mask=None):
        x = data
        if mask is not None:
            mask = mask.at[:, 0].set(True)
            attn_mask = mask[:, None, None, :]
        else:
            attn_mask = None
        for i in range(self.num_layers):
            # standard post-norm encoder layer (torch TransformerEncoderLayer)
            attn_out = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                qkv_features=self.dim_in,
                name=f"attn_{i}",
            )(x, x, mask=attn_mask)
            x = nn.LayerNorm(name=f"norm1_{i}")(x + attn_out)
            ff = nn.Dense(2048, name=f"ff1_{i}")(x)
            ff = nn.relu(ff)
            ff = nn.Dense(self.dim_in, name=f"ff2_{i}")(ff)
            x = nn.LayerNorm(name=f"norm2_{i}")(x + ff)
        return x[:, 0, :]


_MASK_MODULES = (
    MaskedTemporalPooling,
    LearnMaskedDefault,
    TransposeMultiheadAttention,
    LSTM,
    TransposeTransformerEncoder,
)


class MaskedSequential(nn.Module):
    """Sequential that forwards the mask to mask-aware modules
    (reference :322-344). Non-module callables (activations) also allowed."""

    layers: Sequence

    @nn.compact
    def __call__(self, x, mask):
        for layer in self.layers:
            if isinstance(layer, _MASK_MODULES):
                x = layer(x, mask=mask)
            else:
                x = layer(x)
        return x


class MaskedMultiPathWay(nn.Module):
    """Per-pathway masked streams + fusion (reference :347-384)."""

    multipathway_blocks: Sequence[nn.Module]
    multipathway_fusion: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, x_and_mask: List[Tuple]):
        out = [
            block(*x_and_mask[i])
            for i, block in enumerate(self.multipathway_blocks)
        ]
        if self.multipathway_fusion is not None:
            out = self.multipathway_fusion(out)
        return out
