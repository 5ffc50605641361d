"""Trainer-level batch/SSL transforms.

Parity: pytorchvideo_trainer/datamodule/transforms.py (SlowFastPackPathway
:99-139, RepeatandConverttoList :141, MixVideoBatchWrapper :165,
ColorJitterVideoSSl :195, GaussianBlur :263), rand_erase_transform.py
(RandomErasing cube mode :38-190), collators.py (multiple_samples_collate
:9). Host-side ops are numpy over (T, H, W, C); MixVideoBatchWrapper is
on-device (jax key).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from pytorchvideo_tpu.transforms.mix import MixVideo


class SlowFastPackPathway:
    """Clip -> [slow (subsampled by alpha), fast] list (THWC)."""

    def __init__(self, alpha: int) -> None:
        self.alpha = alpha

    def __call__(self, frames):
        frames = np.asarray(frames)
        t = frames.shape[0]
        idx = np.clip(
            np.linspace(0, t - 1, t // self.alpha), 0, t - 1
        ).astype(np.int64)
        return [frames[idx], frames]


class RepeatandConverttoList:
    """Repeat every value into a list (multi-view augmentation support)."""

    def __init__(self, repeat_num: int) -> None:
        self.repeat_num = repeat_num

    def __call__(self, sample_dict: Dict[str, Any]) -> Dict[str, List[Any]]:
        for k, v in sample_dict.items():
            sample_dict[k] = self.repeat_num * [v]
        return sample_dict


class MixVideoBatchWrapper:
    """MixVideo over a batch dict (on-device; takes the step's PRNG key)."""

    def __init__(
        self,
        mixup_alpha: float,
        cutmix_prob: float,
        cutmix_alpha: float,
        label_smoothing: float,
        num_classes: int = 400,
    ) -> None:
        self.mix_video_transform = MixVideo(
            mixup_alpha=mixup_alpha,
            cutmix_prob=cutmix_prob,
            cutmix_alpha=cutmix_alpha,
            label_smoothing=label_smoothing,
            num_classes=num_classes,
        )

    def __call__(self, key, batch: Dict[str, Any]) -> Dict[str, Any]:
        batch["video"], batch["label"] = self.mix_video_transform(
            key, batch["video"], batch["label"]
        )
        return batch


def _rgb_to_gray(frames: np.ndarray) -> np.ndarray:
    w = np.array([0.299, 0.587, 0.114], np.float32)
    gray = frames @ w
    return np.repeat(gray[..., None], 3, axis=-1)


def _gaussian_blur_frames(frames: np.ndarray, sigma: float) -> np.ndarray:
    """Separable gaussian over (H, W) per frame."""
    radius = max(int(round(3 * sigma)), 1)
    xs = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k /= k.sum()
    pad_h = [(0, 0), (radius, radius), (0, 0), (0, 0)]
    out = np.pad(frames, pad_h, mode="edge")
    out = sum(
        k[i] * out[:, i : i + frames.shape[1]] for i in range(len(k))
    )
    pad_w = [(0, 0), (0, 0), (radius, radius), (0, 0)]
    out = np.pad(out, pad_w, mode="edge")
    out = sum(
        k[i] * out[:, :, i : i + frames.shape[2]] for i in range(len(k))
    )
    return out.astype(frames.dtype)


class GaussianBlur:
    """Video-level gaussian blur with random sigma (reference :263-280)."""

    def __init__(self, sigma: List[float] = (0.1, 2.0), seed=None) -> None:
        self.sigma = sigma
        self._rng = np.random.default_rng(seed)

    def __call__(self, frames):
        sigma = self.sigma[0]
        if len(self.sigma) == 2:
            sigma = float(self._rng.uniform(self.sigma[0], self.sigma[1]))
        return _gaussian_blur_frames(np.asarray(frames, np.float32), sigma)


class ColorJitterVideoSSl:
    """Random color jitter + grayscale + gaussian blur for SSL
    (reference :195-260). Input (T, H, W, C) float in [0, 1]."""

    def __init__(
        self,
        bri_con_sat: List[float],
        hue: float,
        p_color_jitter: float,
        p_convert_gray: float,
        p_gaussian_blur: float = 0.5,
        gaussian_blur_sigma: List[float] = (0.1, 2.0),
        seed=None,
    ) -> None:
        self.bri_con_sat = bri_con_sat
        self.hue = hue
        self.p_color_jitter = p_color_jitter
        self.p_convert_gray = p_convert_gray
        self.p_gaussian_blur = p_gaussian_blur
        self.gaussian_blur_sigma = gaussian_blur_sigma
        self._rng = np.random.default_rng(seed)

    def _jitter(self, frames: np.ndarray) -> np.ndarray:
        rng = self._rng
        ops = []
        b, c, s = self.bri_con_sat

        def brightness(f):
            factor = rng.uniform(max(0, 1 - b), 1 + b)
            return np.clip(f * factor, 0, 1)

        def contrast(f):
            factor = rng.uniform(max(0, 1 - c), 1 + c)
            mean = _rgb_to_gray(f).mean()
            return np.clip((f - mean) * factor + mean, 0, 1)

        def saturation(f):
            factor = rng.uniform(max(0, 1 - s), 1 + s)
            gray = _rgb_to_gray(f)
            return np.clip(gray + (f - gray) * factor, 0, 1)

        def hue_shift(f):
            shift = rng.uniform(-self.hue, self.hue)
            # cheap hue rotation in YIQ space
            theta = 2 * np.pi * shift
            cos, sin = np.cos(theta), np.sin(theta)
            t_yiq = np.array(
                [
                    [0.299, 0.587, 0.114],
                    [0.5959, -0.2746, -0.3213],
                    [0.2115, -0.5227, 0.3112],
                ],
                np.float32,
            )
            t_rgb = np.linalg.inv(t_yiq)
            rot = np.array(
                [[1, 0, 0], [0, cos, -sin], [0, sin, cos]], np.float32
            )
            m = t_rgb @ rot @ t_yiq
            return np.clip(f @ m.T, 0, 1)

        ops = [brightness, contrast, saturation, hue_shift]
        rng.shuffle(ops)
        for op in ops:
            frames = op(frames)
        return frames

    def __call__(self, frames):
        frames = np.asarray(frames, np.float32)
        rng = self._rng
        if rng.random() < self.p_color_jitter:
            frames = self._jitter(frames)
        if rng.random() < self.p_convert_gray:
            frames = _rgb_to_gray(frames)
        if rng.random() < self.p_gaussian_blur:
            sigma = float(
                rng.uniform(self.gaussian_blur_sigma[0], self.gaussian_blur_sigma[1])
            )
            frames = _gaussian_blur_frames(frames, sigma)
        return frames


class RandomErasing:
    """Random erasing for normalized video, cube mode erases the same
    region across frames (reference rand_erase_transform.py:38-190).
    Input (T, H, W, C)."""

    def __init__(
        self,
        probability: float = 0.5,
        min_area: float = 0.02,
        max_area: float = 1 / 3,
        min_aspect: float = 0.3,
        max_aspect: Optional[float] = None,
        mode: str = "const",
        min_count: int = 1,
        max_count: Optional[int] = None,
        cube: bool = True,
        seed=None,
    ) -> None:
        self.probability = probability
        self.min_area = min_area
        self.max_area = max_area
        max_aspect = max_aspect or 1 / min_aspect
        self.log_aspect_ratio = (math.log(min_aspect), math.log(max_aspect))
        self.min_count = min_count
        self.max_count = max_count or min_count
        assert mode in ("const", "rand", "pixel")
        self.mode = mode
        self.cube = cube
        self._rng = np.random.default_rng(seed)

    def _fill(self, shape):
        if self.mode == "pixel":
            return self._rng.normal(size=shape).astype(np.float32)
        if self.mode == "rand":
            return np.broadcast_to(
                self._rng.normal(size=(1, 1, shape[-1])).astype(np.float32), shape
            )
        return np.zeros(shape, np.float32)

    def _boxes(self, height, width):
        if self._rng.random() > self.probability:
            return []
        count = (
            self.min_count
            if self.min_count == self.max_count
            else int(self._rng.integers(self.min_count, self.max_count + 1))
        )
        boxes = []
        area = height * width
        for _ in range(count):
            for _ in range(10):
                target_area = (
                    self._rng.uniform(self.min_area, self.max_area) * area / count
                )
                aspect = math.exp(self._rng.uniform(*self.log_aspect_ratio))
                h = int(round(math.sqrt(target_area * aspect)))
                w = int(round(math.sqrt(target_area / aspect)))
                if w < width and h < height:
                    top = int(self._rng.integers(0, height - h + 1))
                    left = int(self._rng.integers(0, width - w + 1))
                    boxes.append((top, left, h, w))
                    break
        return boxes

    def __call__(self, frames):
        frames = np.array(frames, np.float32, copy=True)
        t, height, width, c = frames.shape
        if self.cube:
            for top, left, h, w in self._boxes(height, width):
                fill = self._fill((h, w, c))
                frames[:, top : top + h, left : left + w] = fill
        else:
            for i in range(t):
                for top, left, h, w in self._boxes(height, width):
                    frames[i, top : top + h, left : left + w] = self._fill((h, w, c))
        return frames


def default_collate(samples: List[Any]):
    """Stack leaves across samples (numpy analogue of torch default_collate)."""
    first = samples[0]
    if isinstance(first, dict):
        return {k: default_collate([s[k] for s in samples]) for k in first}
    if isinstance(first, (list, tuple)):
        return type(first)(
            default_collate([s[i] for s in samples]) for i in range(len(first))
        )
    if isinstance(first, (int, float, np.integer, np.floating)):
        return np.asarray(samples)
    if isinstance(first, str):
        return list(samples)
    return np.stack([np.asarray(s) for s in samples])


def multiple_samples_collate(batch: List[Dict[str, List[Any]]]) -> Dict[str, Any]:
    """Flatten repeated-augmentation lists then collate
    (reference collators.py:9-28)."""
    batch_dict = {}
    for k in batch[0].keys():
        v_iter = []
        for sample_dict in batch:
            v_iter += sample_dict[k]
        batch_dict[k] = default_collate(v_iter)
    return batch_dict


_COLLATORS = {"multiple_samples_collate": multiple_samples_collate}


def build_collator_from_name(name: str) -> Callable:
    assert name in _COLLATORS, f"available: {list(_COLLATORS)}"
    return _COLLATORS[name]
