"""Batch-packed (batch-to-lanes) exact rewrites for depthwise-heavy models.

Motivation (measured, benchmarks/x3d_breakdown.py, v5e B128 bf16): X3D's
wall time is dominated by depthwise 3x3x3 convs (in-model knockouts: 2.9 /
4.8 / 5.7 ms of the 11.5 / 8.6 / 9.2 ms stages 1-3) plus the elementwise
BN/swish/SE chains around them. Both run on the VPU/HBM with the channel
dim in lanes, and X3D's channel ladder (stem 24, stage-1 inner 54 —
reference x3d.py:539-738) fills 19-42% of the 128-lane tile: a C=54 tensor
moves and computes 128/54 = 2.4x its useful work. A direct probe confirms
the padding is real end-to-end: an identical-element relu runs 5.11 ms at
(13,80,80,54) vs 2.26 ms re-tiled to a 96-channel minor.

The space-to-depth fix used for SlowFast's dense convs (layers/packed.py)
does not transfer: depthwise taps MIX spatial phases (cross-phase shuffles
per tap), and X3D's pointwise convs sit past the measured pack crossover.

Batch-packing is the depthwise-native alternative: fold ``b`` batch
elements into the channel minor,

    (B, T, H, W, C) -> (B/b, T, H, W, b*C)    minor order (batch, channel)

and re-express every op EXACTLY in that layout:

- depthwise conv: taps never mix batch, so it is the SAME depthwise conv
  with ``feature_group_count = b*C`` and the kernel tiled ``b`` times
  along its output dim — VPU work drops by the lane-fill factor (C=24:
  4x at b=4; C=54: 2x) because the batch grid shrinks while the lanes
  that were padding now carry other batch elements' channels.
- pointwise (1x1x1) conv: reshape the minor to (b, C) — free, row-major —
  and contract C with dot_general. The GEMM's M/K/N are IDENTICAL to the
  unpacked conv's (b merges into M), so the MXU path is exactly neutral.
- dense spatial conv: grouped conv with ``feature_group_count = b`` and
  the kernel tiled b times (per-group GEMM identical to the original).
- BatchNorm: layers/packed.PackedBatchNorm already reduces a (pack, C)
  minor per original channel — batch-major packing has the same minor
  order, so it is reused as-is (train-mode stats are EXACT: the phase dim
  is just more batch).
- SqueezeExcitation: pool over (T, H, W) keeps (b, C) slots separate;
  the fc1/fc2 Dense applies per b via the same free minor reshape.

Every module keeps the UNPACKED parameter tree (nn.Conv "kernel"/"bias",
SE "fc1"/"fc2") — checkpoint import and conv+BN deploy folding are
unaffected — and falls back to the plain op when the runtime batch does
not divide by ``b`` (modules detect packing from the minor dim, so a
declined pack at the stem degrades the whole net to the unpacked path
consistently). Parity-tested in tests/test_layers_batchpack.py.

MEASURED VERDICT (v5e, 2026-08-19, benchmarks/x3d_breakdown.py ab — whole
X3D-S B128 bf16 deploy, one session, hardware parity max_abs_err 1e-3):

    plain 3662.5 clips/s | bpack2 1236.4 | bpack2_late 1198.4 | bpack4 1142.9

a 3x NET LOSS, so batch-packing stays OFF by default (PVT_X3D_BPACK=0).
Per-op attribution (same session): the depthwise conv DOES win as predicted
(s1 3x3x3 C=54: 3.95 -> 2.62 ms at b=2), but the pointwise conv loses every
way it can be expressed in the packed minor — the "free" (..., b*C) ->
(..., b, C) minor reshape is NOT free on TPU (it re-tiles lanes around the
dot_general: 0.649 -> 1.254/1.964 ms at b=2/4), and keeping the b*C minor
with a feature_group_count=b grouped conv is worse still (XLA lowers
small-group convs poorly on v5e: s1 0.424 -> 1.245/2.402 ms, s2 0.119 ->
0.535/0.642 ms). X3D is pointwise-dominated (knockouts: ~60% of stage-1
wall is the 1x1x1 convs + elementwise, only 2.9 of 11.5 ms is depthwise),
so the packed pointwise penalty swamps the depthwise win. The module stays
as an exact, tested, opt-in layout for genuinely depthwise-dominated
workloads and as the recorded negative result.

Reference semantics covered: Conv3d/BN/SE inside create_x3d_bottleneck_block
and create_x3d_stem (reference models/x3d.py:19-228).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Size3 = Tuple[int, int, int]


def pack_batch(x: jax.Array, b: int) -> jax.Array:
    """(B, *spatial, C) -> (B/b, *spatial, b*C), minor order (batch, c).

    A relayout copy (the b slice of the batch dim moves to lanes); done
    ONCE at a segment boundary, not per op.
    """
    if b <= 1:
        return x
    B = x.shape[0]
    if B % b:
        raise ValueError(f"batch {B} not divisible by pack {b}")
    spatial = x.shape[1:-1]
    C = x.shape[-1]
    x = x.reshape((B // b, b) + spatial + (C,))
    perm = (0,) + tuple(range(2, 2 + len(spatial))) + (1, x.ndim - 1)
    x = x.transpose(perm)
    return x.reshape((B // b,) + spatial + (b * C,))


def unpack_batch(x: jax.Array, b: int) -> jax.Array:
    """Inverse of :func:`pack_batch`."""
    if b <= 1:
        return x
    Bo = x.shape[0]
    spatial = x.shape[1:-1]
    C = x.shape[-1] // b
    x = x.reshape((Bo,) + spatial + (b, C))
    perm = (0, x.ndim - 2) + tuple(range(1, 1 + len(spatial))) + (x.ndim - 1,)
    x = x.transpose(perm)
    return x.reshape((Bo * b,) + spatial + (C,))


class BatchPackedConv3d(nn.Module):
    """Conv3D over batch-packed activations; exact, nn.Conv param tree.

    The input is (B/b, T, H, W, b*in_channels) — or unpacked
    (B, T, H, W, in_channels), in which case the module runs the plain
    conv (``pack_input=True`` additionally packs an unpacked input when
    the batch divides). ``groups`` supports 1 (dense/pointwise) and
    ``in_channels`` (depthwise), the two cases the X3D family uses.
    """

    features: int
    kernel_size: Size3
    in_channels: int
    batch: int = 2  # b: batch elements folded into lanes
    strides: Size3 = (1, 1, 1)
    padding: Size3 = (0, 0, 0)  # symmetric per-dim counts
    groups: int = 1
    use_bias: bool = True
    pack_input: bool = False
    unpack_input: bool = False  # unpack a packed input, then plain conv

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        pt, ph, pw = self.padding
        C, F, b = self.in_channels, self.features, int(self.batch)
        w = self.param(
            "kernel",
            nn.linear.default_kernel_init,
            (kt, kh, kw, C // self.groups, F),
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (F,))
            if self.use_bias
            else None
        )
        w = w.astype(x.dtype)

        def plain(xx):
            out = jax.lax.conv_general_dilated(
                xx, w,
                window_strides=self.strides,
                padding=[(pt, pt), (ph, ph), (pw, pw)],
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
                feature_group_count=self.groups,
            )
            if bias is not None:
                out = out + bias.astype(out.dtype)
            return out

        packed = x.shape[-1] == b * C and b > 1
        if not packed:
            if (
                self.pack_input
                and b > 1
                and x.shape[-1] == C
                and x.shape[0] % b == 0
            ):
                x = pack_batch(x, b)
                packed = True
            else:
                return plain(x)
        elif self.unpack_input:
            return plain(unpack_batch(x, b))

        if (kt, kh, kw) == (1, 1, 1) and self.groups == 1:
            # Pointwise: free minor reshape + ONE dot_general whose M/K/N
            # equal the unpacked conv's (b folds into M). Stride on a 1x1
            # conv is pure subsampling.
            st, sh, sw = self.strides
            if (st, sh, sw) != (1, 1, 1):
                x = x[:, ::st, ::sh, ::sw, :]
            lead = x.shape[:-1]
            x = x.reshape(lead + (b, C))
            out = jax.lax.dot_general(
                x, w.reshape(C, F),
                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            )
            out = out.reshape(lead + (b * F,))
        else:
            # Dense spatial (fgc=b) or depthwise (fgc=b*groups): groups
            # never mix batch; tiling the kernel b times along its output
            # dim shares the weights across the b batch groups while
            # keeping the (batch, channel) minor order on both sides.
            out = jax.lax.conv_general_dilated(
                x, jnp.tile(w, (1, 1, 1, 1, b)),
                window_strides=self.strides,
                padding=[(pt, pt), (ph, ph), (pw, pw)],
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
                feature_group_count=b * self.groups,
            )
        if bias is not None:
            out = out + jnp.tile(bias, b).astype(out.dtype)
        return out


class BatchPackedSE(nn.Module):
    """SqueezeExcitation over a batch-packed minor; identical param tree
    (fc1/fc2 Dense of the ORIGINAL channel width). The global pool keeps
    (b, C) slots separate — per-sample statistics, exactly the unpacked
    op — and adapts to an unpacked input (plain SE) at call time."""

    num_channels_reduced: int
    channels: int
    batch: int = 2

    @nn.compact
    def __call__(self, x):
        b = x.shape[-1] // self.channels if self.batch > 1 else 1
        spatial_axes = tuple(range(1, x.ndim - 1))
        squeezed = jnp.mean(x, axis=spatial_axes, keepdims=True)
        lead = squeezed.shape[:-1]
        squeezed = squeezed.reshape(lead + (b, self.channels))
        e = nn.Dense(self.num_channels_reduced, name="fc1")(squeezed)
        e = nn.relu(e)
        e = nn.Dense(self.channels, name="fc2")(e)
        e = e.reshape(lead + (b * self.channels,))
        return x * nn.sigmoid(e)


class UnpackResStage(nn.Module):
    """Wraps a ResStage-shaped module sequence boundary: runs the inner
    blocks then unpacks the batch minor (the packed-segment exit). Kept
    structurally identical to models.resnet.ResStage ("res_blocks" field)
    so the parameter tree is unchanged."""

    res_blocks: tuple
    batch: int = 2
    channels: int = 0  # ORIGINAL channel width of the stage output

    @nn.compact
    def __call__(self, x, train: bool = False):
        for block in self.res_blocks:
            x = block(x, train=train)
        if self.batch > 1 and self.channels and x.shape[-1] != self.channels:
            x = unpack_batch(x, x.shape[-1] // self.channels)
        return x
