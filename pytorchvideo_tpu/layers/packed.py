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


def infer_pack(minor: int, channels: int) -> int:
    """Pack factor p of a (possibly packed) tensor: minor == p*p*channels.
    Adaptive packing only ever produces SQUARE packs, so p is recoverable
    from the minor dim alone."""
    q, rem = divmod(minor, channels)
    p = math.isqrt(q)
    if rem or p * p != q:
        raise ValueError(
            f"minor dim {minor} is not a square pack of C={channels}"
        )
    return p


class WPackedConv3d(nn.Module):
    """W-only OUTPUT-blocked conv for tiny-``features`` stems (exact).

    A stem conv with few output channels is N-lane-bound on the MXU: the
    implicit GEMM's N dim is ``features``, so F=8 (SlowFast fast stem,
    reference models/slowfast.py:56) fills 8 of 128 lanes and the op runs
    at ~6% MFU no matter how the INPUT is fed (measured 27.5 ms of a
    116 ms SlowFast-R50 B64 step — benchmarks/fastpath_micro.py stages).
    This module emits the output with ``out_block`` consecutive W
    positions packed into the minor dim — N becomes ``out_block*F`` lanes
    — by embedding each output phase's kernel taps at its stride offset
    (plan_dim/_embed_matrix, the same machinery as PackedConv3d but along
    W only). K inflates to the union window ``(out_block-1)*s + k`` per
    tap row, which for q=16,s=2,k=7 is a 5.3x FLOP inflation against a
    16x lane gain. Because W-packing keeps row-major element order, the
    input needs NO reshape (b_in=1) and the packed output unpacks with a
    FREE reshape — no transpose ever reaches HBM (the same property
    WBlockedConv exploits on the input side, layers/common.py:122).

    ``in_block`` optionally blocks the input W axis too (a free reshape),
    which shrinks the conv's block-kernel taps while keeping K ~equal;
    whether that helps is an XLA scheduling question — both knobs are
    swept on hardware in benchmarks/fastpath_micro.py.

    Parameter tree is identical to ``nn.Conv``; falls back to the plain
    conv whenever the geometry doesn't fit (indivisible dims, q == 1).
    """

    features: int
    kernel_size: Size3
    out_block: int = 0  # q; 0 = auto (fill 128 lanes)
    in_block: int = 1  # b_in for the W axis
    strides: Size3 = (1, 1, 1)
    padding: Size3 = (0, 0, 0)  # symmetric per-dim counts
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        st, sh, sw = self.strides
        pt, hp, wp = self.padding
        C, F = x.shape[-1], self.features
        w = self.param(
            "kernel", nn.linear.default_kernel_init, (kt, kh, kw, C, F)
        )
        b = (
            self.param("bias", nn.initializers.zeros_init(), (F,))
            if self.use_bias
            else None
        )
        w = w.astype(x.dtype)

        def plain(xx):
            out = jax.lax.conv_general_dilated(
                xx, w,
                window_strides=self.strides,
                padding=[(pt, pt), (hp, hp), (wp, wp)],
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            )
            if b is not None:
                out = out + b.astype(out.dtype)
            return out

        q = self.out_block or max(1, 128 // F)
        W_in = x.shape[3]
        n_out = (W_in + 2 * wp - kw) // sw + 1
        while q > 1 and (n_out % q or (q * sw) % self.in_block):
            q -= 1
        if q <= 1 or W_in % self.in_block:
            return plain(x)

        plan = plan_dim(W_in, kw, sw, wp, self.in_block, q)
        Ew = jnp.asarray(_embed_matrix(plan, kw), x.dtype)
        # blk[t,h,m,(u,c),(v,f)] = sum_d w[t,h,d,c,f] * Ew[v,d,m,u]
        blk = jnp.einsum("thdcf,vdmu->thmucvf", w, Ew).reshape(
            kt, kh, plan.nblk, self.in_block * C, q * F
        )
        if self.in_block > 1:
            B, T, H = x.shape[:3]
            x = x.reshape(B, T, H, W_in // self.in_block, self.in_block * C)
        out = jax.lax.conv_general_dilated(
            x, blk,
            window_strides=(st, sh, plan.stride),
            padding=[(pt, pt), (hp, hp), (plan.lb, plan.rb)],
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        )
        if out.shape[3] > plan.nb_out:
            out = out[:, :, :, : plan.nb_out, :]
        B, T, H = out.shape[:3]
        out = out.reshape(B, T, H, plan.nb_out * q, F)  # free (row-major)
        if plan.nb_out * q > n_out:
            out = out[:, :, :, :n_out, :]
        if b is not None:
            out = out + b.astype(out.dtype)
        return out


class PackedConv3d(nn.Module):
    """Conv3D over space-to-depth packed activations; exact, nn.Conv params.

    ``pack`` is a CAP, not a prescription: at trace time the module infers
    the input's pack factor p_in from its minor dim (square packs only),
    packs an unpacked input up to the cap when the dims divide, and picks
    the LARGEST legal output pack p_out <= cap with

        (p_out * stride) % p_in == 0       (integer block stride) and
        n_out % p_out == 0                 (no garbage phases downstream)

    per spatial dim — so a pathway self-adapts per stage: pack-4 through
    the 56x56/28x28 stages, 4->2 at a stride-2 boundary whose output is
    14, and a direct-to-unpacked block conv (p_out=1) where dims go odd
    (the 7x7 res5). Measured per-op on v5e (benchmarks/fastpath_micro.py,
    B64 bf16): pack-4 runs res2's pointwise/temporal convs 2.3-3.2x faster
    and res3's strided conv 1.4x; uniform pack-2 (the first shipped
    config) is neutral — the win comes from filling the 128-lane tile,
    which C=8..32 at pack 2 still does not.
    """

    features: int
    kernel_size: Size3
    in_channels: int
    pack: int = 4  # cap per spatial dim (square packs)
    strides: Size3 = (1, 1, 1)
    padding: Size3 = (0, 0, 0)  # symmetric per-dim counts
    use_bias: bool = True
    unpack_output: bool = False
    unpack_input: bool = False  # d2s-unpack a packed input, then plain conv

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        st, sh, sw = self.strides
        pt, hp, wp = self.padding
        cap = int(self.pack)
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

        def plain_conv(xx):
            out = jax.lax.conv_general_dilated(
                xx, w,
                window_strides=self.strides,
                padding=[(pt, pt), (hp, hp), (wp, wp)],
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            )
            if b is not None:
                out = out + b.astype(out.dtype)
            return out

        p_in = infer_pack(x.shape[-1], C)
        if self.unpack_input and p_in > 1:
            x, p_in = unpack_hw(x, p_in, p_in), 1
        h_in = x.shape[2] * (p_in if p_in > 1 else 1)
        w_in = x.shape[3] * (p_in if p_in > 1 else 1)
        n_out_h = (h_in + 2 * hp - kh) // sh + 1
        n_out_w = (w_in + 2 * wp - kw) // sw + 1

        def p_out_for(p):
            return next(
                (
                    po
                    for po in range(cap, 0, -1)
                    if (po * sh) % p == 0
                    and (po * sw) % p == 0
                    and n_out_h % po == 0
                    and n_out_w % po == 0
                ),
                0,
            )

        if p_in > 1:
            p_out = p_out_for(p_in)
            if p_out == 0:
                # no legal packed geometry from this input pack (e.g. a
                # pack-4 producer feeding a cap-2 stage): REPACK — unpack
                # and fall through to the unpacked-input selection below.
                # Identical repacks across a stage's consumers (conv_a +
                # conv_skip + the fusion conv) CSE into one relayout.
                x, p_in = unpack_hw(x, p_in, p_in), 1
        if p_in == 1:
            if self.unpack_input:
                return plain_conv(x)
            choice = next(
                (
                    (p, p_out_for(p))
                    for p in range(cap, 1, -1)
                    if h_in % p == 0 and w_in % p == 0 and p_out_for(p) > 0
                ),
                None,
            )
            if choice is None:
                return plain_conv(x)
            p_in, p_out = choice
            x = pack_hw(x, p_in, p_in)

        plan_h = plan_dim(h_in, kh, sh, hp, p_in, p_out)
        plan_w = plan_dim(w_in, kw, sw, wp, p_in, p_out)
        Eh = jnp.asarray(_embed_matrix(plan_h, kh), x.dtype)
        Ew = jnp.asarray(_embed_matrix(plan_w, kw), x.dtype)
        # w: (t, h, w, c, f); Eh: (V, h, M, U); Ew: (v, w, m, u)
        blk = jnp.einsum("thwcf,VhMU->tMUwcVf", w, Eh)
        blk = jnp.einsum("tMUwcVf,vwmu->tMmUucVvf", blk, Ew)
        blk = blk.reshape(
            kt, plan_h.nblk, plan_w.nblk,
            p_in * p_in * C, p_out * p_out * F,
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
            out = out + jnp.tile(b, p_out * p_out).astype(out.dtype)
        if self.unpack_output and p_out > 1:
            out = unpack_hw(out, p_out, p_out, plan_h.n_out, plan_w.n_out)
        return out


class PackedBatchNorm(BatchNorm):
    """BatchNorm over packed channels: params/stats are per ORIGINAL channel
    (shape (``channels``,), identical tree to BatchNorm); the pack factor is
    inferred from the minor dim at call time, so one norm instance serves
    mixed-pack positions (e.g. a pack-4 conv_a next to a pack-2 conv_b at a
    stride boundary). Batch statistics reduce over the phase dim too —
    numerically identical to unpacked BatchNorm (same element multiset per
    channel)."""

    channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pack = 1
        if self.channels is not None and x.shape[-1] != self.channels:
            pack = x.shape[-1] // self.channels
        if pack == 1:
            return super().__call__(x, train=train)
        lead, pc = x.shape[:-1], x.shape[-1]
        x = x.reshape(*lead, pack, pc // pack)
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


def packed_conv_factory(pack: int, unpack_output: bool = False,
                        unpack_input: bool = False):
    """Conv3d-signature factory (the builders' injectable-callable idiom,
    reference models/resnet.py:17-41) producing :class:`PackedConv3d` with
    pack cap ``pack``."""

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
            pack=int(pack),
            strides=triple(stride),
            padding=triple(padding),
            use_bias=bias,
            unpack_output=unpack_output,
            unpack_input=unpack_input,
            name=name,
        )

    return factory


def packed_norm(norm):
    """Rewrite a BatchNorm-family norm factory to its packed equivalent
    (stats per original channel; identical param tree; pack inferred per
    call from the minor dim — make_norm supplies ``channels``). ``None``
    passes through; non-BatchNorm norms are rejected (their packed
    semantics would differ from the unpacked reference)."""
    import functools

    if norm is None:
        return None
    base = norm.func if isinstance(norm, functools.partial) else norm
    kw = dict(norm.keywords) if isinstance(norm, functools.partial) else {}
    if not (isinstance(base, type) and issubclass(base, BatchNorm)):
        raise ValueError(f"packed pathways require BatchNorm norms, got {base}")
    return functools.partial(PackedBatchNorm, **kw)
