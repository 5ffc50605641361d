"""Advanced augmentation ops + magnitude machinery (RandAugment/AugMix base).

Parity: pytorchvideo/transforms/augmentations.py — 14 video-level ops
(:24-233), magnitude-to-arg curves (:244-303), tables (:306-362),
AugmentTransform (:370-483). The reference delegates pixel math to
torchvision; here the ops are implemented directly (numpy, host-side: these
run per-sample in data workers, like the reference's CPU transforms).

Layout: (T, H, W, C) — reference uses (T, C, H, W). uint8 videos use exact
integer semantics (equalize/posterize LUTs); float videos are assumed [0, 1].
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

_AUGMENTATION_MAX_LEVEL = 10

_GRAY_WEIGHTS = np.array([0.2989, 0.587, 0.114], dtype=np.float32)


def _bound(video: np.ndarray) -> float:
    return 255.0 if video.dtype == np.uint8 else 1.0


def _blend(img1: np.ndarray, img2: np.ndarray, ratio: float) -> np.ndarray:
    """ratio*img1 + (1-ratio)*img2, clamped to dtype bounds (torchvision
    _blend semantics)."""
    bound = _bound(img1)
    out = ratio * img1.astype(np.float32) + (1.0 - ratio) * img2.astype(np.float32)
    return np.clip(out, 0, bound).astype(img1.dtype)


def _rgb_to_grayscale(video: np.ndarray) -> np.ndarray:
    gray = (video.astype(np.float32) @ _GRAY_WEIGHTS)[..., None]
    if video.dtype == np.uint8:
        gray = np.floor(gray)
    return np.broadcast_to(gray, video.shape).astype(video.dtype)


def _autocontrast(video: np.ndarray, **kwargs) -> np.ndarray:
    """Per-frame per-channel min/max remap."""
    bound = _bound(video)
    v = video.astype(np.float32)
    minimum = v.min(axis=(1, 2), keepdims=True)
    maximum = v.max(axis=(1, 2), keepdims=True)
    eq = maximum == minimum
    scale = bound / np.where(eq, 1.0, maximum - minimum)
    out = np.where(eq, v, np.clip((v - minimum) * scale, 0, bound))
    return out.astype(video.dtype)


def _equalize_uint8(video: np.ndarray) -> np.ndarray:
    """torchvision equalize: per-frame per-channel histogram LUT."""
    out = np.empty_like(video)
    T, H, W, C = video.shape
    for t in range(T):
        for c in range(C):
            chan = video[t, :, :, c]
            hist = np.bincount(chan.reshape(-1), minlength=256)
            nonzero = hist[hist != 0]
            step = (nonzero[:-1].sum()) // 255 if len(nonzero) > 0 else 0
            if step == 0:
                out[t, :, :, c] = chan
                continue
            lut = (np.cumsum(hist) + step // 2) // step
            lut = np.concatenate([[0], lut[:-1]])
            lut = np.clip(lut, 0, 255).astype(np.uint8)
            out[t, :, :, c] = lut[chan]
    return out


def _equalize(video: np.ndarray, **kwargs) -> np.ndarray:
    if video.dtype != np.uint8:
        u8 = (video * 255).astype(np.uint8)
        return (_equalize_uint8(u8) / 255).astype(video.dtype)
    return _equalize_uint8(video)


def _invert(video: np.ndarray, **kwargs) -> np.ndarray:
    bound = _bound(video)
    return (bound - video.astype(np.float32)).astype(video.dtype)


def _solarize(video: np.ndarray, factor: float, **kwargs) -> np.ndarray:
    threshold = int(factor * 255.0) if video.dtype == np.uint8 else factor
    inverted = _invert(video)
    return np.where(video >= threshold, inverted, video)


def _adjust_contrast(video: np.ndarray, factor: float, **kwargs) -> np.ndarray:
    gray = _rgb_to_grayscale(video).astype(np.float32)
    mean = gray.mean(axis=(1, 2, 3), keepdims=True)
    if video.dtype == np.uint8:
        mean = np.floor(mean)
    return _blend(video, np.broadcast_to(mean, video.shape), factor)


def _adjust_saturation(video: np.ndarray, factor: float, **kwargs) -> np.ndarray:
    return _blend(video, _rgb_to_grayscale(video), factor)


def _adjust_brightness(video: np.ndarray, factor: float, **kwargs) -> np.ndarray:
    return _blend(video, np.zeros_like(video), factor)


def _adjust_sharpness(video: np.ndarray, factor: float, **kwargs) -> np.ndarray:
    """Blend with a 3x3 smoothing (kernel [[1,1,1],[1,5,1],[1,1,1]]/13),
    borders kept from the original (torchvision semantics)."""
    v = video.astype(np.float32)
    k = np.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], np.float32) / 13.0
    padded = np.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    blurred = np.zeros_like(v)
    for dy in range(3):
        for dx in range(3):
            blurred += k[dy, dx] * padded[:, dy : dy + v.shape[1], dx : dx + v.shape[2]]
    if video.dtype == np.uint8:
        blurred = np.clip(np.round(blurred), 0, 255)
    blurred_full = v.copy()
    blurred_full[:, 1:-1, 1:-1] = blurred[:, 1:-1, 1:-1]
    return _blend(video, blurred_full.astype(video.dtype), factor)


def _posterize(video: np.ndarray, factor: float, **kwargs) -> np.ndarray:
    if factor >= 8:
        return video
    if video.dtype != np.uint8:
        u8 = (video * 255).astype(np.uint8)
        return (_posterize(u8, factor) / 255).astype(video.dtype)
    mask = np.uint8(255 - (2 ** (8 - int(factor)) - 1))
    return video & mask


def affine(
    video: np.ndarray,
    matrix,
    fill=(0.5, 0.5, 0.5),
    interpolation: str = "bilinear",
) -> np.ndarray:
    """Apply an affine transform given the 2x3 matrix mapping OUTPUT pixel
    coordinates to INPUT coordinates: x_in = a*x + b*y + c, y_in = d*x + e*y + f
    (the reference's private affine re-implementation,
    augmentations.py:485-661). Out-of-bounds pixels take ``fill`` (scaled by
    255 for uint8 inputs)."""
    a, b, c, d, e, f = matrix
    T, H, W, C = video.shape
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    # center-relative, like torchvision grid generation
    xs_c = xs - (W - 1) / 2.0
    ys_c = ys - (H - 1) / 2.0
    x_in = a * xs_c + b * ys_c + c + (W - 1) / 2.0
    y_in = d * xs_c + e * ys_c + f + (H - 1) / 2.0

    fill_arr = np.asarray(fill, np.float32)
    if video.dtype == np.uint8:
        fill_arr = fill_arr * 255.0

    v = video.astype(np.float32)
    if interpolation == "nearest":
        xi = np.round(x_in).astype(np.int64)
        yi = np.round(y_in).astype(np.int64)
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = np.clip(xi, 0, W - 1)
        yi_c = np.clip(yi, 0, H - 1)
        out = v[:, yi_c, xi_c, :]
        out = np.where(valid[None, :, :, None], out, fill_arr)
    else:
        x0 = np.floor(x_in).astype(np.int64)
        y0 = np.floor(y_in).astype(np.int64)
        wx = (x_in - x0)[None, :, :, None]
        wy = (y_in - y0)[None, :, :, None]
        out = np.zeros((T, H, W, C), np.float32)
        weight_sum = np.zeros((1, H, W, 1), np.float32)
        for (yy, xx, w) in (
            (y0, x0, (1 - wy) * (1 - wx)),
            (y0, x0 + 1, (1 - wy) * wx),
            (y0 + 1, x0, wy * (1 - wx)),
            (y0 + 1, x0 + 1, wy * wx),
        ):
            valid = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
            yc = np.clip(yy, 0, H - 1)
            xc = np.clip(xx, 0, W - 1)
            contrib = np.where(valid[None, :, :, None], v[:, yc, xc, :], fill_arr)
            out += w * contrib
    if video.dtype == np.uint8:
        out = np.clip(np.round(out), 0, 255)
    return out.astype(video.dtype)


def _rotate(video: np.ndarray, factor: float, **kwargs) -> np.ndarray:
    """Rotate counter-clockwise by ``factor`` degrees about the center."""
    theta = np.deg2rad(factor)
    cos, sin = np.cos(theta), np.sin(theta)
    # output->input = inverse rotation
    return affine(
        video, [cos, -sin, 0, sin, cos, 0], fill=kwargs.get("fill", (0.5,) * 3)
    )


def _shear_x(video: np.ndarray, factor: float, **kwargs) -> np.ndarray:
    offset = video.shape[1] * factor / 2
    return affine(
        video,
        [1, factor, offset, 0, 1, 0],
        fill=kwargs.get("fill", (0.5,) * 3),
    )


def _shear_y(video: np.ndarray, factor: float, **kwargs) -> np.ndarray:
    offset = video.shape[2] * factor / 2
    return affine(
        video,
        [1, 0, 0, factor, 1, offset],
        fill=kwargs.get("fill", (0.5,) * 3),
    )


def _translate_x(video: np.ndarray, factor: float, **kwargs) -> np.ndarray:
    offset = factor * video.shape[2]
    return affine(
        video, [1, 0, offset, 0, 1, 0], fill=kwargs.get("fill", (0.5,) * 3)
    )


def _translate_y(video: np.ndarray, factor: float, **kwargs) -> np.ndarray:
    offset = factor * video.shape[1]
    return affine(
        video, [1, 0, 0, 0, 1, offset], fill=kwargs.get("fill", (0.5,) * 3)
    )


# ---------------------------------------------------------------------------
# Magnitude machinery (reference augmentations.py:244-362)
# ---------------------------------------------------------------------------


def _increasing_magnitude_to_arg(level, params):
    magnitude = (level / _AUGMENTATION_MAX_LEVEL) * params[1]
    return (params[0] + magnitude,)


def _increasing_randomly_negate_to_arg(level, params, rng):
    magnitude = (level / _AUGMENTATION_MAX_LEVEL) * params[1]
    if rng.random() > 0.5:
        return (params[0] + magnitude,)
    return (params[0] - magnitude,)


def _decreasing_int_to_arg(level, params):
    magnitude = (level / _AUGMENTATION_MAX_LEVEL) * params[1]
    return (params[0] - int(magnitude),)


def _decreasing_to_arg(level, params):
    magnitude = (level / _AUGMENTATION_MAX_LEVEL) * params[1]
    return (params[0] - magnitude,)


_NAME_TO_TRANSFORM_FUNC = {
    "AdjustBrightness": _adjust_brightness,
    "AdjustContrast": _adjust_contrast,
    "AdjustSaturation": _adjust_saturation,
    "AdjustSharpness": _adjust_sharpness,
    "AutoContrast": _autocontrast,
    "Equalize": _equalize,
    "Invert": _invert,
    "Rotate": _rotate,
    "Posterize": _posterize,
    "Solarize": _solarize,
    "ShearX": _shear_x,
    "ShearY": _shear_y,
    "TranslateX": _translate_x,
    "TranslateY": _translate_y,
}

_LEVEL_TO_ARG = {
    "AdjustBrightness": "inc_neg",
    "AdjustContrast": "inc_neg",
    "AdjustSaturation": "inc_neg",
    "AdjustSharpness": "inc_neg",
    "AutoContrast": None,
    "Equalize": None,
    "Invert": None,
    "Rotate": "inc_neg",
    "Posterize": "dec_int",
    "Solarize": "dec",
    "ShearX": "inc_neg",
    "ShearY": "inc_neg",
    "TranslateX": "inc_neg",
    "TranslateY": "inc_neg",
}

_TRANSFORM_MAX_PARAMS = {
    "AdjustBrightness": (1, 0.9),
    "AdjustContrast": (1, 0.9),
    "AdjustSaturation": (1, 0.9),
    "AdjustSharpness": (1, 0.9),
    "AutoContrast": None,
    "Equalize": None,
    "Invert": None,
    "Rotate": (0, 30),
    "Posterize": (4, 4),
    "Solarize": (1, 1),
    "ShearX": (0, 0.3),
    "ShearY": (0, 0.3),
    "TranslateX": (0, 0.45),
    "TranslateY": (0, 0.45),
}

SAMPLING_DEFAULT_HPARAS = {"sampling_std": 0.5}
TRANSFORM_DEFAULT_HPARAS = {"fill": (0.5, 0.5, 0.5)}


class AugmentTransform:
    """One named augmentation with prob + magnitude sampling
    (reference augmentations.py:370-483)."""

    def __init__(
        self,
        transform_name: str,
        magnitude: int = 10,
        prob: float = 0.5,
        name_to_transform_func: Optional[Dict[str, Callable]] = None,
        level_to_arg: Optional[Dict[str, Any]] = None,
        transform_max_paras: Optional[Dict[str, Tuple]] = None,
        transform_hparas: Optional[Dict[str, Any]] = None,
        sampling_type: str = "gaussian",
        sampling_hparas: Optional[Dict[str, Any]] = None,
        seed: Optional[int] = None,
    ) -> None:
        assert sampling_type in ("gaussian", "uniform")
        name_to_transform_func = name_to_transform_func or _NAME_TO_TRANSFORM_FUNC
        level_to_arg = level_to_arg or _LEVEL_TO_ARG
        transform_max_paras = transform_max_paras or _TRANSFORM_MAX_PARAMS
        self.transform_hparas = transform_hparas or TRANSFORM_DEFAULT_HPARAS
        self.sampling_type = sampling_type
        self.sampling_hparas = sampling_hparas or SAMPLING_DEFAULT_HPARAS
        assert "fill" in self.transform_hparas
        if sampling_type == "gaussian":
            assert "sampling_std" in self.sampling_hparas
        if sampling_type == "uniform":
            assert "sampling_data_type" in self.sampling_hparas
            assert "sampling_min" in self.sampling_hparas
        assert transform_name in name_to_transform_func

        self.max_level = _AUGMENTATION_MAX_LEVEL
        self.transform_name = transform_name
        self.magnitude = magnitude
        self.transform_fn = name_to_transform_func[transform_name]
        self.level_fn = level_to_arg[transform_name]
        self.level_paras = transform_max_paras[transform_name]
        self.prob = prob
        self._rng = np.random.default_rng(seed)

    def _get_magnitude(self) -> float:
        if self.sampling_type == "gaussian":
            return max(
                0,
                min(
                    self.max_level,
                    self._rng.normal(
                        self.magnitude, self.sampling_hparas["sampling_std"]
                    ),
                ),
            )
        if self.sampling_hparas["sampling_data_type"] == "int":
            return int(
                self._rng.integers(
                    self.sampling_hparas["sampling_min"], self.magnitude + 1
                )
            )
        if self.sampling_hparas["sampling_data_type"] == "float":
            return (
                self._rng.random()
                * (self.magnitude - self.sampling_hparas["sampling_min"])
                + self.sampling_hparas["sampling_min"]
            )
        raise ValueError("sampling_data_type must be 'int' or 'float'")

    def _level_args(self, magnitude):
        if self.level_fn is None:
            return ()
        if self.level_fn == "inc_neg":
            return _increasing_randomly_negate_to_arg(
                magnitude, self.level_paras, self._rng
            )
        if self.level_fn == "inc":
            return _increasing_magnitude_to_arg(magnitude, self.level_paras)
        if self.level_fn == "dec_int":
            return _decreasing_int_to_arg(magnitude, self.level_paras)
        if self.level_fn == "dec":
            return _decreasing_to_arg(magnitude, self.level_paras)
        # custom callable
        return self.level_fn(magnitude, self.level_paras)

    def __call__(self, video: np.ndarray) -> np.ndarray:
        video = np.asarray(video)
        if self._rng.random() > self.prob:
            return video
        magnitude = self._get_magnitude()
        level_args = self._level_args(magnitude)
        return self.transform_fn(video, *level_args, **self.transform_hparas)
