"""Fused depthwise 3x3x3 conv (+BN affine, + optional swish) Pallas kernel.

X3D's wall time is dominated by depthwise 3x3x3 convs: ablating them out of
the full X3D-S forward (B128, bf16, folded weights, one v5e chip) drops
35.8 ms -> 10.7 ms, i.e. ~70% of the model is this one op, and XLA's
conv_general_dilated runs it at ~45% VPU utilization (it is VPU
compute-bound: 27 taps/element of elementwise FMA; the MXU can't help a
depthwise conv).

Measured outcome (v5e, bf16, B128 T13, per non-strided dw+BN+swish op):
XLA 3.93/1.96/0.43/0.15 ms at S40C54/S20C108/S10C216/S5C432 — which is VPU
speed-of-light for the lane-padded layout (27 taps x 2 flops x H*W*Cpad*B*T
at ~7.7 TFLOP/s matches within noise). This kernel (v2) lands at
17.98/4.08/2.62/0.93 ms: the roll+mask+f32-temporary formulation costs
~3x the VPU ops of XLA's windowed scheduling. XLA therefore remains the
production path; the kernel is kept as a correct, tested extension point.
The only structural headroom left is the 54->128 lane padding at stage 1
(2.4x), which no same-layout kernel can recover — it would take batch-
packed lanes + block-diagonal pointwise weights, whose transpose/matmul
overhead roughly cancels the gain at these shapes.

Kernel design (v2 — the v1 slab kernel lost 10x to XLA because every tap
sliced the (H+2, W+2) halo slab at a different sublane offset, forcing a
relayout per tap):

- grid (B, T); per step three clamped temporal views of the same input
  (t-1, t, t+1) as (H, W, C) VMEM blocks — no spatial halo, no pre-padding.
- taps grouped by spatial offset: for each (dy, dx), the three temporal
  taps are a fused mul/FMA chain (per-channel weights broadcast along
  lanes), then ONE spatial shift of the partial sum via `pltpu.roll`
  (cyclic, vreg-level) and ONE border mask (iota compare), then
  accumulate. 9 rolls instead of 27 misaligned slices.
- temporal borders: the t±1 views are clamped copies; their tap weights
  are scalar-zeroed at t==0 / t==T-1 (weights, not masks — no extra
  full-slab ops).
- f32 accumulation; per-channel scale/bias epilogue (the eval-mode BN
  affine after fold_conv_bn) and optional swish fused into the same pass;
  bf16 in/out. Channels pad to the 128-lane boundary.

Stride-1 / padding-1 only (the X3D non-downsampling blocks — 22 of 26 dw
convs in X3D-S; strided blocks fall back to XLA).

Reference semantics covered: conv_b depthwise 3x3x3 inside
create_x3d_bottleneck_block (reference models/x3d.py:105-228) and the
accelerator Conv3d3x3x3DwBnAct (reference
layers/accelerator/mobile_cpu/convolutions.py:182).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _roll(x, shift, axis, interpret):
    if interpret:
        return jnp.roll(x, shift, axis)
    # pltpu.roll requires a non-negative shift; cyclic roll is modular.
    return pltpu.roll(x, shift=shift % x.shape[axis], axis=axis)


def _kernel(
    xm_ref,
    xc_ref,
    xn_ref,
    w_ref,
    scale_ref,
    bias_ref,
    o_ref,
    *,
    H,
    W,
    T,
    apply_swish,
    interpret,
):
    t = pl.program_id(1)
    xm = xm_ref[0, 0].astype(jnp.float32)  # (H, W, Cp)
    xc = xc_ref[0, 0].astype(jnp.float32)
    xn = xn_ref[0, 0].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)  # (3, 3, 3, Cp)
    # temporal validity: the t+-1 views are clamped copies at the sequence
    # edges; zero their taps through the (scalar) weights.
    wm = jnp.where(t > 0, 1.0, 0.0)
    wn = jnp.where(t < T - 1, 1.0, 0.0)

    iota_h = jax.lax.broadcasted_iota(jnp.int32, (H, W, 1), 0)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (H, W, 1), 1)
    acc = jnp.zeros_like(xc)
    for dy in range(3):
        d_h = dy - 1
        mh = {-1: iota_h >= 1, 0: None, 1: iota_h <= H - 2}[d_h]
        for dx in range(3):
            d_w = dx - 1
            mw = {-1: iota_w >= 1, 0: None, 1: iota_w <= W - 2}[d_w]
            # out[h, w] += x[t+dt-1, h+d_h, w+d_w] * w[dt, dy, dx]
            s = xc * w[1, dy, dx]
            s = s + xm * (w[0, dy, dx] * wm)
            s = s + xn * (w[2, dy, dx] * wn)
            if d_h:
                s = _roll(s, -d_h, 0, interpret)
            if d_w:
                s = _roll(s, -d_w, 1, interpret)
            if mh is None:
                m = mw
            elif mw is None:
                m = mh
            else:
                m = jnp.logical_and(mh, mw)
            if m is not None:
                s = jnp.where(m, s, 0.0)
            acc = acc + s
    out = acc * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
        jnp.float32
    )
    if apply_swish:
        out = out * jax.nn.sigmoid(out)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def depthwise3x3x3_bn_swish_pallas(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    apply_swish: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (B, T, H, W, C); w: (3, 3, 3, C) depthwise taps; optional per-
    channel scale/bias epilogue (BN eval affine) and swish. Stride 1,
    'same' (pad 1) — output shape == input shape."""
    B, T, H, W, C = x.shape
    assert w.shape[:3] == (3, 3, 3)
    c_pad = (-C) % 128
    if c_pad:
        x = jnp.pad(x, ((0, 0),) * 4 + ((0, c_pad),))
        w = jnp.pad(w, ((0, 0),) * 3 + ((0, c_pad),))
    Cp = C + c_pad
    if scale is None:
        scale = jnp.ones((C,), x.dtype)
    if bias is None:
        bias = jnp.zeros((C,), x.dtype)
    scale = jnp.pad(jnp.asarray(scale, x.dtype), (0, c_pad))
    bias = jnp.pad(jnp.asarray(bias, x.dtype), (0, c_pad))

    grid = (B, T)

    def frame_spec(dt):
        return pl.BlockSpec(
            (1, 1, H, W, Cp),
            lambda b, t, dt=dt: (b, jnp.clip(t + dt, 0, T - 1), 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            H=H,
            W=W,
            T=T,
            apply_swish=apply_swish,
            interpret=interpret,
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, H, W, Cp), x.dtype),
        grid=grid,
        in_specs=[
            frame_spec(-1),
            frame_spec(0),
            frame_spec(1),
            pl.BlockSpec(
                (3, 3, 3, Cp),
                lambda b, t: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((Cp,), lambda b, t: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp,), lambda b, t: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, H, W, Cp),
            lambda b, t: (b, t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(x, x, x, w, scale, bias)
    if c_pad:
        out = out[..., :C]
    return out


def depthwise3x3x3_bn_swish_xla(x, w, scale=None, bias=None, apply_swish=False):
    """XLA reference path (conv_general_dilated + epilogue)."""
    B, T, H, W, C = x.shape
    kernel = w[..., None]  # (3,3,3,C,1) -> linen depthwise layout (in/g=1)
    out = jax.lax.conv_general_dilated(
        x,
        kernel.reshape(3, 3, 3, 1, C),
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        feature_group_count=C,
    )
    if scale is not None:
        out = out * scale
    if bias is not None:
        out = out + bias
    if apply_swish:
        out = out * jax.nn.sigmoid(out)
    return out
