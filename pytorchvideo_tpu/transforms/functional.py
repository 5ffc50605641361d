"""Pure-jnp video transform functional ops (TPU-native).

Behavioral parity targets: /root/reference/pytorchvideo/transforms/functional.py
(cited per-function below). Design differences from the reference (deliberate,
TPU-first):

- Native tensor layout is channels-last ``(..., T, H, W, C)`` ("THWC"), the
  layout XLA prefers on TPU. The reference uses (C, T, H, W); use
  :func:`cthw_to_thwc` / :func:`thwc_to_cthw` at import/export boundaries.
- Every op is jit-able with **static output shapes**. Random spatial crops are
  expressed as crop-and-resize with traced box coordinates (bilinear grid
  sampling) rather than python-int slicing, so a whole augmentation pipeline
  fuses into one XLA graph. Deterministic offset-based variants are also
  provided for exact parity with the reference's integer-slicing semantics.
- Randomness is explicit: ops that sample take a ``jax.random`` key.
- **Host/device polymorphism**: ops dispatch on input type. numpy input
  (the host data pipeline, where random output shapes would force an XLA
  recompile per call) takes a numpy/OpenCV fast path and returns numpy;
  jax input keeps the pure-jnp path for on-device fused pipelines. The
  reference has the same split (its opencv resize backend,
  functional.py:45-89).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Axis convention for the native THWC layout.
TEMPORAL_AXIS = -4
HEIGHT_AXIS = -3
WIDTH_AXIS = -2
CHANNEL_AXIS = -1


def _is_host(x) -> bool:
    """True for host-pipeline (numpy) data; False for jax arrays."""
    return isinstance(x, np.ndarray)


# ---------------------------------------------------------------------------
# Layout adapters
# ---------------------------------------------------------------------------


def cthw_to_thwc(x: jnp.ndarray) -> jnp.ndarray:
    """(..., C, T, H, W) -> (..., T, H, W, C)."""
    if _is_host(x):
        return np.moveaxis(x, -4, -1)
    return jnp.moveaxis(x, -4, -1)


def thwc_to_cthw(x: jnp.ndarray) -> jnp.ndarray:
    """(..., T, H, W, C) -> (..., C, T, H, W)."""
    if _is_host(x):
        return np.moveaxis(x, -1, -4)
    return jnp.moveaxis(x, -1, -4)


def thwc_from_numpy_thwc(x: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(x)


# ---------------------------------------------------------------------------
# Temporal ops
# ---------------------------------------------------------------------------


def uniform_temporal_subsample(
    x: jnp.ndarray, num_samples: int, temporal_axis: int = TEMPORAL_AXIS
) -> jnp.ndarray:
    """Uniformly subsample ``num_samples`` frames along the temporal axis.

    Matches reference index math (transforms/functional.py:19-41):
    ``indices = floor(linspace(0, t - 1, num_samples))`` (nearest-neighbor
    upsampling when num_samples > t). Where ``i*(t-1)/(num_samples-1)``
    lands exactly on an integer, torch.linspace's truncation is
    float-implementation-dependent and may pick the preceding frame; we
    use numpy's linspace consistently (randomized parity sweep permits
    only these one-frame integer-tie divergences).
    """
    t = x.shape[temporal_axis]
    assert num_samples > 0 and t > 0
    # Static computation: indices depend only on shapes, so compute in numpy
    # and let them be constants in the jitted graph.
    indices = np.linspace(0, t - 1, num_samples)
    indices = np.clip(indices, 0, t - 1).astype(np.int64)
    if _is_host(x):
        return np.take(x, indices, axis=temporal_axis)
    return jnp.take(x, jnp.asarray(indices), axis=temporal_axis)


def uniform_temporal_subsample_repeated(
    frames: jnp.ndarray,
    frame_ratios: Sequence[int],
    temporal_axis: int = TEMPORAL_AXIS,
) -> Tuple[jnp.ndarray, ...]:
    """Per-pathway temporal subsampling (reference functional.py:134-161)."""
    temporal_length = frames.shape[temporal_axis]
    return tuple(
        uniform_temporal_subsample(frames, temporal_length // ratio, temporal_axis)
        for ratio in frame_ratios
    )


# ---------------------------------------------------------------------------
# Spatial resize / crop
# ---------------------------------------------------------------------------

_INTERP_METHODS = {
    "nearest": "nearest",
    "linear": "linear",
    "bilinear": "linear",
    "bicubic": "cubic",
}


def resize(
    x: jnp.ndarray, size: Tuple[int, int], interpolation: str = "bilinear"
) -> jnp.ndarray:
    """Resize spatial dims (H, W) of a THWC tensor to ``size``.

    jax.image.resize with half-pixel centers == torch interpolate
    ``align_corners=False`` (the reference's only mode,
    functional.py:125-128). numpy input resizes via OpenCV (also
    half-pixel centers) — the host-pipeline fast path.
    """
    new_h, new_w = size
    if _is_host(x):
        import cv2

        inter = (
            cv2.INTER_LINEAR
            if interpolation == "bilinear"
            else cv2.INTER_NEAREST
        )
        flat = x.reshape((-1,) + x.shape[-3:])
        out = np.stack(
            [
                cv2.resize(f, (new_w, new_h), interpolation=inter)
                for f in flat
            ]
        )
        return out.reshape(x.shape[:-3] + out.shape[-3:])
    out_shape = x.shape[:HEIGHT_AXIS] + (new_h, new_w) + (x.shape[-1],)
    return jax.image.resize(
        x, out_shape, method=_INTERP_METHODS[interpolation], antialias=False
    )


def short_side_scale(
    x: jnp.ndarray, size: int, interpolation: str = "bilinear"
) -> jnp.ndarray:
    """Scale the short spatial side to ``size``, keeping aspect ratio.

    Long-side rounding is floor, matching reference functional.py:92-131.
    """
    h, w = x.shape[HEIGHT_AXIS], x.shape[WIDTH_AXIS]
    if w < h:
        new_h = int(math.floor((float(h) / w) * size))
        new_w = size
    else:
        new_h = size
        new_w = int(math.floor((float(w) / h) * size))
    return resize(x, (new_h, new_w), interpolation)


def crop(x: jnp.ndarray, y_offset, x_offset, size: int) -> jnp.ndarray:
    """Crop a ``size x size`` window at (y_offset, x_offset).

    Offsets may be traced scalars (lax.dynamic_slice under the hood), so a
    randomly-positioned crop stays a single static-shaped jitted op.
    """
    if _is_host(x) and isinstance(y_offset, (int, np.integer)):
        return x[
            ..., y_offset : y_offset + size, x_offset : x_offset + size, :
        ]
    h_ax = x.ndim + HEIGHT_AXIS
    w_ax = x.ndim + WIDTH_AXIS
    starts = [0] * x.ndim
    sizes = list(x.shape)
    starts[h_ax] = y_offset
    starts[w_ax] = x_offset
    sizes[h_ax] = size
    sizes[w_ax] = size
    return jax.lax.dynamic_slice(x, starts, sizes)


def random_crop(x: jnp.ndarray, size: int, key: jax.Array) -> jnp.ndarray:
    """Random spatial crop (reference functional.py:267-296 sans boxes)."""
    h, w = x.shape[HEIGHT_AXIS], x.shape[WIDTH_AXIS]
    if h == size and w == size:
        return x
    ky, kx = jax.random.split(key)
    y_offset = jax.random.randint(ky, (), 0, max(h - size, 0) + 1)
    x_offset = jax.random.randint(kx, (), 0, max(w - size, 0) + 1)
    return crop(x, y_offset, x_offset, size)


def _uniform_crop_offsets(h: int, w: int, size: int, spatial_idx: int):
    """Offset math for 3-crop evaluation (reference functional.py:494-516)."""
    assert spatial_idx in (0, 1, 2)
    y_offset = int(math.ceil((h - size) / 2))
    x_offset = int(math.ceil((w - size) / 2))
    if h > w:
        if spatial_idx == 0:
            y_offset = 0
        elif spatial_idx == 2:
            y_offset = h - size
    else:
        if spatial_idx == 0:
            x_offset = 0
        elif spatial_idx == 2:
            x_offset = w - size
    return y_offset, x_offset


def uniform_crop(x: jnp.ndarray, size: int, spatial_idx: int) -> jnp.ndarray:
    """Left/center/right (or top/center/bottom) crop (functional.py:328-347)."""
    h, w = x.shape[HEIGHT_AXIS], x.shape[WIDTH_AXIS]
    y_offset, x_offset = _uniform_crop_offsets(h, w, size, spatial_idx)
    return crop(x, y_offset, x_offset, size)


def center_crop(x: jnp.ndarray, size: int) -> jnp.ndarray:
    return uniform_crop(x, size, 1)


def horizontal_flip(x: jnp.ndarray) -> jnp.ndarray:
    if _is_host(x):
        return x[..., ::-1, :]
    return jnp.flip(x, axis=WIDTH_AXIS)


def random_horizontal_flip(x: jnp.ndarray, prob: float, key: jax.Array) -> jnp.ndarray:
    do_flip = jax.random.uniform(key) < prob
    return jnp.where(do_flip, horizontal_flip(x), x)


# ---------------------------------------------------------------------------
# Value transforms
# ---------------------------------------------------------------------------


def div_255(x: jnp.ndarray) -> jnp.ndarray:
    """x / 255 (reference functional.py:604-615)."""
    return x / 255.0


def normalize(
    x: jnp.ndarray, mean: Sequence[float], std: Sequence[float]
) -> jnp.ndarray:
    """Per-channel normalization, channels-last."""
    if _is_host(x):
        m = np.asarray(mean, dtype=x.dtype)
        s = np.asarray(std, dtype=x.dtype)
        return (x - m) / s
    mean = jnp.asarray(mean, dtype=x.dtype)
    std = jnp.asarray(std, dtype=x.dtype)
    return (x - mean) / std


def convert_to_one_hot(
    targets: jnp.ndarray, num_class: int, label_smooth: float = 0.0
) -> jnp.ndarray:
    """Index labels -> (smoothed) one-hot (reference functional.py:163-192)."""
    assert 0.0 <= label_smooth < 1.0
    non_target_value = label_smooth / num_class
    target_value = 1.0 - label_smooth + non_target_value
    one_hot = jax.nn.one_hot(targets, num_class)
    return one_hot * (target_value - non_target_value) + non_target_value


# ---------------------------------------------------------------------------
# Box ops (for detection / AVA)
# ---------------------------------------------------------------------------


def crop_boxes(boxes: jnp.ndarray, x_offset, y_offset) -> jnp.ndarray:
    """Shift boxes by crop offsets (reference functional.py:429-446)."""
    offsets = jnp.stack(
        [
            jnp.asarray(x_offset, boxes.dtype),
            jnp.asarray(y_offset, boxes.dtype),
            jnp.asarray(x_offset, boxes.dtype),
            jnp.asarray(y_offset, boxes.dtype),
        ]
    )
    return boxes - offsets


def clip_boxes_to_image(boxes: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Clip boxes to [0, dim - 1] (reference functional.py:407-427)."""
    x_clip = jnp.clip(boxes[..., 0::2], 0.0, width - 1.0)
    y_clip = jnp.clip(boxes[..., 1::2], 0.0, height - 1.0)
    out = jnp.stack(
        [x_clip[..., 0], y_clip[..., 0], x_clip[..., 1], y_clip[..., 1]], axis=-1
    )
    return out


def short_side_scale_with_boxes(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    size: int,
    interpolation: str = "bilinear",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference functional.py:195-236."""
    h, w = images.shape[HEIGHT_AXIS], images.shape[WIDTH_AXIS]
    images = short_side_scale(images, size, interpolation)
    new_h, new_w = images.shape[HEIGHT_AXIS], images.shape[WIDTH_AXIS]
    scale = float(new_h) / h if w < h else float(new_w) / w
    return images, boxes * scale


def random_short_side_scale_with_boxes(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    min_size: int,
    max_size: int,
    interpolation: str = "bilinear",
    rng=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spatial short-side scale jitter on images + boxes (reference
    functional.py:233-264).

    The size draw is host-side (the output shape is data-dependent, so this
    op cannot run under jit — same as the reference, which calls
    ``torch.randint(...).item()``). ``rng``: optional
    ``np.random.Generator`` for determinism.
    """
    import numpy as np

    rng = rng if rng is not None else np.random.default_rng()
    size = int(rng.integers(min_size, max_size + 1))
    return short_side_scale_with_boxes(images, boxes, size, interpolation)


def random_crop_with_boxes(
    images: jnp.ndarray, size: int, boxes: jnp.ndarray, key: jax.Array
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference functional.py:267-296."""
    h, w = images.shape[HEIGHT_AXIS], images.shape[WIDTH_AXIS]
    ky, kx = jax.random.split(key)
    y_offset = jax.random.randint(ky, (), 0, max(h - size, 0) + 1)
    x_offset = jax.random.randint(kx, (), 0, max(w - size, 0) + 1)
    cropped = crop(images, y_offset, x_offset, size)
    cropped_boxes = crop_boxes(boxes, x_offset, y_offset)
    return cropped, clip_boxes_to_image(cropped_boxes, size, size)


def uniform_crop_with_boxes(
    images: jnp.ndarray, size: int, spatial_idx: int, boxes: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference functional.py:350-378."""
    h, w = images.shape[HEIGHT_AXIS], images.shape[WIDTH_AXIS]
    y_offset, x_offset = _uniform_crop_offsets(h, w, size, spatial_idx)
    cropped = crop(images, y_offset, x_offset, size)
    cropped_boxes = crop_boxes(boxes, x_offset, y_offset)
    return cropped, clip_boxes_to_image(cropped_boxes, size, size)


def horizontal_flip_with_boxes(
    prob: float, images: jnp.ndarray, boxes: jnp.ndarray, key: jax.Array
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference functional.py:380-405."""
    width = images.shape[WIDTH_AXIS]
    do_flip = jax.random.uniform(key) < prob
    flipped = horizontal_flip(images)
    flipped_boxes = jnp.stack(
        [
            width - boxes[..., 2] - 1,
            boxes[..., 1],
            width - boxes[..., 0] - 1,
            boxes[..., 3],
        ],
        axis=-1,
    )
    images = jnp.where(do_flip, flipped, images)
    boxes = jnp.where(do_flip, flipped_boxes, boxes)
    return images, boxes


# ---------------------------------------------------------------------------
# Crop-and-resize core (the TPU-native random-resized-crop)
# ---------------------------------------------------------------------------


def crop_and_resize(
    frames: jnp.ndarray,
    i,
    j,
    h,
    w,
    target_height: int,
    target_width: int,
) -> jnp.ndarray:
    """Bilinearly sample a (possibly traced) box to a fixed output size.

    ``frames``: (T, H, W, C). (i, j) top-left corner; (h, w) crop size; all may
    be traced floats. Equivalent to slice-then-``interpolate`` with
    align_corners=False (half-pixel centers), but with static shapes so random
    crops compile once. This is how the reference's random_resized_crop
    (functional.py:518-601) maps onto XLA: gather + lerp instead of a python
    slicing loop.
    """
    H, W = frames.shape[HEIGHT_AXIS], frames.shape[WIDTH_AXIS]
    i = jnp.asarray(i, jnp.float32)
    j = jnp.asarray(j, jnp.float32)
    h = jnp.asarray(h, jnp.float32)
    w = jnp.asarray(w, jnp.float32)

    # Half-pixel-center source coordinates for each output pixel.
    ys = i + (jnp.arange(target_height, dtype=jnp.float32) + 0.5) * (
        h / target_height
    ) - 0.5
    xs = j + (jnp.arange(target_width, dtype=jnp.float32) + 0.5) * (
        w / target_width
    ) - 0.5

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[:, None]  # (Ho, 1)
    wx = (xs - x0)[None, :]  # (1, Wo)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)

    # Gather rows then columns; shapes stay (T, Ho, Wo, C).
    def gather_hw(yidx, xidx):
        g = jnp.take(frames, yidx, axis=HEIGHT_AXIS)
        return jnp.take(g, xidx, axis=WIDTH_AXIS)

    v00 = gather_hw(y0i, x0i)
    v01 = gather_hw(y0i, x1i)
    v10 = gather_hw(y1i, x0i)
    v11 = gather_hw(y1i, x1i)
    wy = wy[..., None]  # broadcast over C
    wx = wx[..., None]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def _sample_crop_params(
    key: jax.Array,
    scale: Tuple[float, float],
    ratio: Tuple[float, float],
    height: int,
    width: int,
    log_uniform_ratio: bool = True,
    num_tries: int = 10,
):
    """Traced Inception-style crop-box sampling with rejection.

    Mirrors reference _get_param_spatial_crop (functional.py:448-516): sample
    ``num_tries`` candidates, take the first whose (h, w) fits, else fall back
    to the aspect-preserving central crop. Vectorized (all tries sampled at
    once) so it stays jit-friendly.
    """
    scale = (min(scale), max(scale))
    ratio = (min(ratio), max(ratio))
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = float(height * width)
    target_area = area * jax.random.uniform(
        k1, (num_tries,), minval=scale[0], maxval=scale[1]
    )
    if log_uniform_ratio:
        aspect = jnp.exp(
            jax.random.uniform(
                k2,
                (num_tries,),
                minval=math.log(ratio[0]),
                maxval=math.log(ratio[1]),
            )
        )
    else:
        aspect = jax.random.uniform(
            k2, (num_tries,), minval=ratio[0], maxval=ratio[1]
        )
    w = jnp.round(jnp.sqrt(target_area * aspect))
    h = jnp.round(jnp.sqrt(target_area / aspect))
    valid = (w > 0) & (w <= width) & (h > 0) & (h <= height)
    # First valid candidate index (or 0; masked out below if none valid).
    first = jnp.argmax(valid)
    any_valid = jnp.any(valid)
    w_sel = w[first]
    h_sel = h[first]
    # Uniform offsets in [0, dim - crop].
    i_sel = jnp.floor(
        jax.random.uniform(k3) * (height - h_sel + 1.0)
    )
    j_sel = jnp.floor(jax.random.uniform(k4) * (width - w_sel + 1.0))

    # Central-crop fallback (reference functional.py:504-516).
    in_ratio = float(width) / float(height)
    if in_ratio < ratio[0]:
        fw = float(width)
        fh = float(round(fw / ratio[0]))
    elif in_ratio > ratio[1]:
        fh = float(height)
        fw = float(round(fh * ratio[1]))
    else:
        fw = float(width)
        fh = float(height)
    fi = float((height - fh) // 2)
    fj = float((width - fw) // 2)

    i_out = jnp.where(any_valid, i_sel, fi)
    j_out = jnp.where(any_valid, j_sel, fj)
    h_out = jnp.where(any_valid, h_sel, fh)
    w_out = jnp.where(any_valid, w_sel, fw)
    return i_out, j_out, h_out, w_out


def random_resized_crop(
    frames: jnp.ndarray,
    target_height: int,
    target_width: int,
    scale: Tuple[float, float],
    aspect_ratio: Tuple[float, float],
    key: jax.Array,
    shift: bool = False,
    log_uniform_ratio: bool = True,
    interpolation: str = "bilinear",
    num_tries: int = 10,
) -> jnp.ndarray:
    """Inception-style random resized crop (reference functional.py:518-601).

    ``shift=True`` samples a second box for the last frame and linearly
    interpolates per-frame boxes between them (the reference's per-frame loop
    becomes a vmap over per-frame boxes).
    """
    assert scale[0] > 0 and scale[1] > 0
    assert aspect_ratio[0] > 0 and aspect_ratio[1] > 0
    del interpolation  # bilinear sampling core; parity tolerance covers others
    t = frames.shape[TEMPORAL_AXIS]
    height, width = frames.shape[HEIGHT_AXIS], frames.shape[WIDTH_AXIS]

    k1, k2 = jax.random.split(key)
    i, j, h, w = _sample_crop_params(
        k1, scale, aspect_ratio, height, width, log_uniform_ratio, num_tries
    )
    if not shift:
        return crop_and_resize(frames, i, j, h, w, target_height, target_width)

    i2, j2, h2, w2 = _sample_crop_params(
        k2, scale, aspect_ratio, height, width, log_uniform_ratio, num_tries
    )
    ts = jnp.linspace(0.0, 1.0, t)
    i_s = jnp.floor(i + ts * (i2 - i))
    j_s = jnp.floor(j + ts * (j2 - j))
    h_s = jnp.floor(h + ts * (h2 - h))
    w_s = jnp.floor(w + ts * (w2 - w))

    def per_frame(frame, ii, jj, hh, ww):
        return crop_and_resize(
            frame[None], ii, jj, hh, ww, target_height, target_width
        )[0]

    return jax.vmap(per_frame)(frames, i_s, j_s, h_s, w_s)
