"""RoIAlign for channels-last feature maps, pure XLA.

The reference delegates to torchvision's C++/CUDA RoIAlign
(pytorchvideo/models/head.py:8,320). Here RoIAlign is expressed as a
vectorized bilinear gather (vmap over boxes), which XLA fuses into a single
gather/lerp kernel — static shapes, jit/grad-friendly.

Semantics match torchvision RoIAlign(aligned=False, sampling_ratio=s):
boxes scaled by spatial_scale, per-bin s x s (default 2 when s=0; the
dense per-box ``ceil`` rule is data-dependent and unjittable) sample points
averaged, bilinear interpolation with zero contribution outside [-1, size].
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample(fmap: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """fmap (H, W, C); ys/xs flat sample coords. Returns (N, C) values with
    torchvision border semantics (zero outside [-1, H] / [-1, W])."""
    H, W, C = fmap.shape
    valid = (ys > -1.0) & (ys < H) & (xs > -1.0) & (xs < W)
    y = jnp.clip(ys, 0.0, H - 1)
    x = jnp.clip(xs, 0.0, W - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, H - 1)
    x1i = jnp.minimum(x0i + 1, W - 1)
    ly = (y - y0)[:, None]
    lx = (x - x0)[:, None]
    v00 = fmap[y0i, x0i]
    v01 = fmap[y0i, x1i]
    v10 = fmap[y1i, x0i]
    v11 = fmap[y1i, x1i]
    val = (
        v00 * (1 - ly) * (1 - lx)
        + v01 * (1 - ly) * lx
        + v10 * ly * (1 - lx)
        + v11 * ly * lx
    )
    return jnp.where(valid[:, None], val, 0.0)


def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: Tuple[int, int],
    spatial_scale: float = 1.0,
    sampling_ratio: int = 0,
    aligned: bool = False,
) -> jnp.ndarray:
    """features (B, H, W, C); boxes (N, 5) = (batch_idx, x1, y1, x2, y2).
    Returns (N, out_h, out_w, C)."""
    out_h, out_w = output_size
    s = sampling_ratio if sampling_ratio > 0 else 2
    offset = 0.5 if aligned else 0.0

    def one_box(box):
        fmap = jnp.take(features, box[0].astype(jnp.int32), axis=0)
        x1 = box[1] * spatial_scale - offset
        y1 = box[2] * spatial_scale - offset
        x2 = box[3] * spatial_scale - offset
        y2 = box[4] * spatial_scale - offset
        roi_w = x2 - x1
        roi_h = y2 - y1
        if not aligned:
            roi_w = jnp.maximum(roi_w, 1.0)
            roi_h = jnp.maximum(roi_h, 1.0)
        bin_w = roi_w / out_w
        bin_h = roi_h / out_h

        # sample grid: out*s points per axis at bin-relative (i + (k+0.5)/s)
        iy = jnp.arange(out_h)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s
        ix = jnp.arange(out_w)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s
        ys = y1 + iy.reshape(-1) * bin_h  # (out_h*s,)
        xs = x1 + ix.reshape(-1) * bin_w  # (out_w*s,)
        grid_y = jnp.repeat(ys, out_w * s)
        grid_x = jnp.tile(xs, out_h * s)
        vals = _bilinear_sample(fmap, grid_y, grid_x)  # (out_h*s*out_w*s, C)
        vals = vals.reshape(out_h, s, out_w, s, -1)
        return vals.mean(axis=(1, 3))

    return jax.vmap(one_box)(boxes)


class RoIAlign:
    """Factory-style wrapper matching the torchvision constructor signature
    used by the reference head builder (head.py:320-327)."""

    def __init__(self, output_size, spatial_scale=1.0, sampling_ratio=0, aligned=False):
        self.output_size = tuple(output_size)
        self.spatial_scale = spatial_scale
        self.sampling_ratio = sampling_ratio
        self.aligned = aligned

    def __call__(self, features, boxes):
        return roi_align(
            features,
            boxes,
            self.output_size,
            self.spatial_scale,
            self.sampling_ratio,
            self.aligned,
        )
