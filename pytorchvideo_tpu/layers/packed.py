"""Packed-channel (space-to-depth) 3D convolutions for tiny-channel pathways.

Motivation (measured, benchmarks/slowfast_breakdown.py): the SlowFast fast
pathway's channel ladder (8/32/64/128/256 — reference models/slowfast.py:56
stem, resnet.py:1345-1365 bottlenecks) sits under the TPU's 128-lane tile on
nearly every conv. Channels-last activations are lane-padded (a C=8 tensor
occupies 16x its bytes) and every implicit GEMM is lane-starved: the pathway
runs at 7% MFU and burns 45% of SlowFast's wall time for 17% of its FLOPs.

Fix: keep the pathway's activations in a space-to-depth PACKED layout
``(B, T, H/ph, W/pw, ph*pw*C)`` — the minor dim grows ph*pw times, so lane
padding shrinks by the same factor — and re-express every conv EXACTLY in
that layout as a block convolution:

  For each spatial dim with original kernel k, stride s, symmetric pad p,
  input blocked by ``b_in`` and output blocked by ``b_out``: output phase
  v of packed output block j is original output ``j*b_out + v``, which
  reads original inputs ``[ (j*b_out+v)*s - p, ... + k )``. Embedding each
  phase's kernel taps at offset ``v*s - p + lb*b_in`` (lb leading zero
  blocks, the generalization of WBlockedConv's phase-offset trick,
  layers/common.py:122) turns the whole conv into ONE block conv with
  block stride ``S = b_out*s/b_in``, block kernel ``nblk`` and a dense
  block weight assembled from the original ``(kt,kh,kw,C,F)`` kernel by
  two constant 0/1 einsums. Pointwise convs become block-diagonal (ph*pw x
  FLOPs, but those convs are FLOP-light and lane-starved: padding K/N to
  the 128 lane/sublane tiles costs the MXU the same cycles as computing
  the dense zeros, while HBM traffic drops by the un-padding).

Exactness: the parameter tree is IDENTICAL to ``nn.Conv`` ("kernel"
(kt,kh,kw,C,F), "bias" (F,)) — checkpoint import and conv+BN folding see no
difference — and outputs equal ``lax.conv_general_dilated`` bitwise up to
float reassociation (parity-tested in tests/test_layers_packed.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pytorchvideo_tpu.layers.norms import BatchNorm

Size2 = Tuple[int, int]
Size3 = Tuple[int, int, int]


@dataclass(frozen=True)
class _DimPlan:
    """Block-conv plan for one spatial dimension."""

    n_in: int
    n_out: int
    b_in: int
    b_out: int
    nb_in: int
    nb_out: int
    stride: int  # block stride S
    lb: int  # leading zero blocks (conv low padding)
    rb: int  # trailing zero blocks (conv high padding)
    nblk: int  # block kernel size
    starts: Tuple[int, ...]  # phase-v kernel embed offset


def plan_dim(n_in: int, k: int, s: int, pad: int, b_in: int, b_out: int) -> _DimPlan:
    """Plan one dimension of a packed conv (symmetric zero padding).

    Requires ``b_out*s % b_in == 0`` (the packed conv must advance an
    integer number of input blocks per output block) and ``n_in % b_in == 0``
    (a padded pack would leak garbage positions into BN statistics and
    pooling; callers pick pack factors that divide their dims).
    """
    if n_in % b_in:
        raise ValueError(f"n_in={n_in} not divisible by pack b_in={b_in}")
    if (b_out * s) % b_in:
        raise ValueError(f"b_out*s={b_out * s} not a multiple of b_in={b_in}")
    n_out = (n_in + 2 * pad - k) // s + 1
    S = (b_out * s) // b_in
    nb_in = n_in // b_in
    nb_out = -(-n_out // b_out)
    lb = -(-pad // b_in)
    starts = tuple(v * s - pad + lb * b_in for v in range(b_out))
    assert min(starts) >= 0
    nblk = -(-(max(starts) + k) // b_in)
    rb = (nb_out - 1) * S + nblk - nb_in - lb
    rb = max(rb, 0)
    return _DimPlan(n_in, n_out, b_in, b_out, nb_in, nb_out, S, lb, rb, nblk, starts)


def _embed_matrix(plan: _DimPlan, k: int) -> np.ndarray:
    """0/1 embedding E[v, d, m, u] = 1 iff m*b_in + u == starts[v] + d."""
    E = np.zeros((plan.b_out, k, plan.nblk, plan.b_in), np.float32)
    for v in range(plan.b_out):
        for d in range(k):
            pos = plan.starts[v] + d
            E[v, d, pos // plan.b_in, pos % plan.b_in] = 1.0
    return E


def pack_hw(x: jax.Array, ph: int, pw: int) -> jax.Array:
    """(B, T, H, W, C) -> (B, T, H/ph, W/pw, ph*pw*C); packed channel order
    is (h-phase, w-phase, c). Requires divisible dims (see plan_dim)."""
    if ph == 1 and pw == 1:
        return x
    B, T, H, W, C = x.shape
    if H % ph or W % pw:
        raise ValueError(f"spatial dims ({H},{W}) not divisible by ({ph},{pw})")
    x = x.reshape(B, T, H // ph, ph, W // pw, pw, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # free when ph == 1
    return x.reshape(B, T, H // ph, W // pw, ph * pw * C)


def unpack_hw(x: jax.Array, ph: int, pw: int, h: Optional[int] = None,
              w: Optional[int] = None) -> jax.Array:
    """Inverse of :func:`pack_hw`; optionally slice to true (h, w)."""
    if ph == 1 and pw == 1:
        return x
    B, T, Hb, Wb, PC = x.shape
    C = PC // (ph * pw)
    x = x.reshape(B, T, Hb, Wb, ph, pw, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, T, Hb * ph, Wb * pw, C)
    if h is not None or w is not None:
        x = x[:, :, : (h or Hb * ph), : (w or Wb * pw), :]
    return x


class PackedConv3d(nn.Module):
    """Conv3D over space-to-depth packed activations; exact, nn.Conv params.

    ``in_channels`` is the ORIGINAL channel count; the input may arrive
    unpacked (minor dim == in_channels: it is packed in-kernel first — a
    reshape+transpose XLA CSEs across same-input consumers) or packed
    (minor dim == ph*pw*in_channels). Output stays packed unless
    ``unpack_output`` (or ``pack == (1, 1)``, the auto-unpacking plain-conv
    mode for a stage that consumes a packed producer).
    """

    features: int
    kernel_size: Size3
    in_channels: int
    pack: Size2 = (2, 2)
    strides: Size3 = (1, 1, 1)
    padding: Size3 = (0, 0, 0)  # symmetric per-dim counts
    use_bias: bool = True
    unpack_output: bool = False
    unpack_input: bool = False  # d2s-unpack a packed input, then plain conv

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        st, sh, sw = self.strides
        pt, ph_pad, pw_pad = self.padding
        ph, pw = self.pack
        C, F = self.in_channels, self.features
        w = self.param(
            "kernel", nn.linear.default_kernel_init, (kt, kh, kw, C, F)
        )
        b = (
            self.param("bias", nn.initializers.zeros_init(), (F,))
            if self.use_bias
            else None
        )
        w = w.astype(x.dtype)

        packed_minor = ph * pw * C
        if x.shape[-1] == packed_minor and packed_minor != C:
            packed_in = True
        elif x.shape[-1] == C:
            packed_in = False
        else:
            raise ValueError(
                f"input minor dim {x.shape[-1]} is neither C={C} nor "
                f"packed {packed_minor}"
            )

        if self.unpack_input:
            if packed_in:
                x = unpack_hw(x, ph, pw)
            out = jax.lax.conv_general_dilated(
                x, w,
                window_strides=self.strides,
                padding=[(pt, pt), (ph_pad, ph_pad), (pw_pad, pw_pad)],
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            )
            if b is not None:
                out = out + b.astype(out.dtype)
            return out

        plain = ph == 1 and pw == 1
        if not plain and not packed_in and (
            x.shape[2] % ph or x.shape[3] % pw
        ):
            # unpacked input whose dims don't divide the pack (e.g. a fusion
            # conv consuming a stage that stayed unpacked): plain conv is
            # semantically identical
            plain = True
        if plain:
            out = jax.lax.conv_general_dilated(
                x, w,
                window_strides=self.strides,
                padding=[(pt, pt), (ph_pad, ph_pad), (pw_pad, pw_pad)],
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            )
            if b is not None:
                out = out + b.astype(out.dtype)
            return out

        if not packed_in:
            h_in, w_in = x.shape[2], x.shape[3]
            x = pack_hw(x, ph, pw)
        else:
            h_in, w_in = x.shape[2] * ph, x.shape[3] * pw

        plan_h = plan_dim(h_in, kh, sh, ph_pad, ph, ph)
        plan_w = plan_dim(w_in, kw, sw, pw_pad, pw, pw)
        Eh = jnp.asarray(_embed_matrix(plan_h, kh), x.dtype)
        Ew = jnp.asarray(_embed_matrix(plan_w, kw), x.dtype)
        # w: (t, h, w, c, f); Eh: (V, h, M, U); Ew: (v, w, m, u)
        blk = jnp.einsum("thwcf,VhMU->tMUwcVf", w, Eh)
        blk = jnp.einsum("tMUwcVf,vwmu->tMmUucVvf", blk, Ew)
        blk = blk.reshape(
            kt, plan_h.nblk, plan_w.nblk, ph * pw * C, ph * pw * F
        )
        out = jax.lax.conv_general_dilated(
            x, blk,
            window_strides=(st, plan_h.stride, plan_w.stride),
            padding=[(pt, pt), (plan_h.lb, plan_h.rb), (plan_w.lb, plan_w.rb)],
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        )
        # rb=0 clamping can yield extra output blocks; keep the planned count
        if out.shape[2] > plan_h.nb_out or out.shape[3] > plan_w.nb_out:
            out = out[:, :, : plan_h.nb_out, : plan_w.nb_out, :]
        if b is not None:
            out = out + jnp.tile(b, ph * pw).astype(out.dtype)
        if self.unpack_output:
            out = unpack_hw(out, ph, pw, plan_h.n_out, plan_w.n_out)
        elif plan_h.n_out % ph or plan_w.n_out % pw:
            # garbage phases in a kept-packed output would poison downstream
            # shape inference, BN statistics and pooling
            raise ValueError(
                f"packed output spatial dims ({plan_h.n_out},{plan_w.n_out}) "
                f"not divisible by pack ({ph},{pw}); lower packed_stages or "
                f"the pack factor"
            )
        return out


class PackedBatchNorm(BatchNorm):
    """BatchNorm over packed channels: params/stats are per ORIGINAL channel
    (shape (C,), identical tree to BatchNorm) and batch statistics reduce
    over the phase dim too — numerically identical to unpacked BatchNorm
    (same element multiset per channel)."""

    pack: int = 1  # ph * pw

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.pack == 1:
            return super().__call__(x, train=train)
        lead, pc = x.shape[:-1], x.shape[-1]
        x = x.reshape(*lead, self.pack, pc // self.pack)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            use_bias=self.use_bias,
            use_scale=self.use_scale,
            axis_name=self.axis_name,
            axis_index_groups=self.axis_index_groups,
            dtype=self.dtype,
            name="bn",
        )(x)
        return x.reshape(*lead, pc)


def packed_conv_factory(pack: Size2, unpack_output: bool = False,
                        unpack_input: bool = False):
    """Conv3d-signature factory (the builders' injectable-callable idiom,
    reference models/resnet.py:17-41) producing :class:`PackedConv3d`."""

    def factory(*, in_channels=None, out_channels, kernel_size,
                stride=(1, 1, 1), padding=(0, 0, 0), bias=True, groups=1,
                dilation=(1, 1, 1), name=None):
        from pytorchvideo_tpu.layers.common import triple

        assert groups == 1, "packed convs do not support groups"
        assert tuple(triple(dilation)) == (1, 1, 1), "no dilation support"
        assert in_channels is not None, "packed convs need in_channels"
        return PackedConv3d(
            features=out_channels,
            kernel_size=triple(kernel_size),
            in_channels=in_channels,
            pack=pack,
            strides=triple(stride),
            padding=triple(padding),
            use_bias=bias,
            unpack_output=unpack_output,
            unpack_input=unpack_input,
            name=name,
        )

    return factory


def packed_norm(norm, pack: int):
    """Rewrite a BatchNorm-family norm factory to its packed equivalent
    (stats per original channel; identical param tree). ``None`` passes
    through; non-BatchNorm norms are rejected (their packed semantics would
    differ from the unpacked reference)."""
    import functools

    if norm is None:
        return None
    base = norm.func if isinstance(norm, functools.partial) else norm
    kw = dict(norm.keywords) if isinstance(norm, functools.partial) else {}
    if not (isinstance(base, type) and issubclass(base, BatchNorm)):
        raise ValueError(f"packed pathways require BatchNorm norms, got {base}")
    return functools.partial(PackedBatchNorm, pack=pack, **kw)
