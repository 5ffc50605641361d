"""Dict- and tensor-level transform classes.

API parity target: /root/reference/pytorchvideo/transforms/transforms.py
(class list at transforms.py:10-430). These are host-side callables used in
the per-sample dataset path; each holds a ``numpy.random.Generator`` for
parameter sampling and delegates math to the pure-jnp functional ops, so the
same cores also power the fused on-device batch pipeline
(:mod:`pytorchvideo_tpu.transforms.transforms_factory`).

Native clip layout is (T, H, W, C); pass ``data_format="CTHW"`` to any tensor
transform to consume/produce the reference's (C, T, H, W) layout.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pytorchvideo_tpu.transforms import functional as F


class Compose:
    """Sequentially apply callables (stand-in for torchvision Compose)."""

    def __init__(self, transforms: List[Callable]):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class _Layout:
    """Mixin handling CTHW<->THWC adaptation for tensor transforms."""

    def __init__(self, data_format: str = "THWC"):
        assert data_format in ("THWC", "CTHW")
        self._cthw = data_format == "CTHW"

    def _to_native(self, x):
        return F.cthw_to_thwc(x) if self._cthw else x

    def _from_native(self, x):
        return F.thwc_to_cthw(x) if self._cthw else x


class ApplyTransformToKey:
    """Apply ``transform`` to ``sample[key]`` (reference transforms.py:10-31)."""

    def __init__(self, key: str, transform: Callable):
        self._key = key
        self._transform = transform

    def __call__(self, x: Dict[str, Any]) -> Dict[str, Any]:
        x[self._key] = self._transform(x[self._key])
        return x


class RemoveKey:
    """Remove ``key`` from the sample dict (reference transforms.py:34-51)."""

    def __init__(self, key: str):
        self._key = key

    def __call__(self, x: Dict[str, Any]) -> Dict[str, Any]:
        if self._key in x:
            del x[self._key]
        return x


class UniformTemporalSubsample(_Layout):
    """Reference transforms.py:54-76."""

    def __init__(self, num_samples: int, data_format: str = "THWC"):
        super().__init__(data_format)
        self._num_samples = num_samples

    def __call__(self, x):
        axis = -4 if not self._cthw else -3
        return F.uniform_temporal_subsample(x, self._num_samples, axis)


class UniformTemporalSubsampleRepeated(_Layout):
    """Reference transforms.py:79-97."""

    def __init__(self, frame_ratios: Tuple[int, ...], data_format: str = "THWC"):
        super().__init__(data_format)
        self._frame_ratios = tuple(frame_ratios)

    def __call__(self, x):
        axis = -4 if not self._cthw else -3
        return F.uniform_temporal_subsample_repeated(x, self._frame_ratios, axis)


class ShortSideScale(_Layout):
    """Reference transforms.py:100-120."""

    def __init__(
        self,
        size: int,
        interpolation: str = "bilinear",
        data_format: str = "THWC",
    ):
        super().__init__(data_format)
        self._size = size
        self._interpolation = interpolation

    def __call__(self, x):
        out = F.short_side_scale(self._to_native(x), self._size, self._interpolation)
        return self._from_native(out)


class RandomShortSideScale(_Layout):
    """Short-side scale to a random size in [min, max] (transforms.py:123-150)."""

    def __init__(
        self,
        min_size: int,
        max_size: int,
        interpolation: str = "bilinear",
        data_format: str = "THWC",
        seed: Optional[int] = None,
    ):
        super().__init__(data_format)
        self._min_size = min_size
        self._max_size = max_size
        self._interpolation = interpolation
        self._rng = np.random.default_rng(seed)

    def __call__(self, x):
        size = int(self._rng.integers(self._min_size, self._max_size + 1))
        out = F.short_side_scale(self._to_native(x), size, self._interpolation)
        return self._from_native(out)


class RandomCropVideo(_Layout):
    def __init__(self, size: int, data_format: str = "THWC", seed=None):
        super().__init__(data_format)
        self._size = size
        self._rng = np.random.default_rng(seed)

    def __call__(self, x):
        v = self._to_native(x)
        h, w = v.shape[-3], v.shape[-2]
        y = int(self._rng.integers(0, max(h - self._size, 0) + 1))
        xo = int(self._rng.integers(0, max(w - self._size, 0) + 1))
        return self._from_native(F.crop(v, y, xo, self._size))


class CenterCropVideo(_Layout):
    def __init__(self, size: int, data_format: str = "THWC"):
        super().__init__(data_format)
        self._size = size

    def __call__(self, x):
        return self._from_native(F.center_crop(self._to_native(x), self._size))


class RandomHorizontalFlipVideo(_Layout):
    def __init__(self, p: float = 0.5, data_format: str = "THWC", seed=None):
        super().__init__(data_format)
        self._p = p
        self._rng = np.random.default_rng(seed)

    def __call__(self, x):
        if self._rng.random() < self._p:
            v = self._to_native(x)
            return self._from_native(F.horizontal_flip(v))
        return x


class UniformCropVideo:
    """3-crop eval keyed by ``aug_index`` (reference transforms.py:153-174)."""

    def __init__(
        self,
        size: int,
        video_key: str = "video",
        aug_index_key: str = "aug_index",
        data_format: str = "THWC",
    ):
        self._size = size
        self._video_key = video_key
        self._aug_index_key = aug_index_key
        self._layout = _Layout(data_format)

    def __call__(self, x: Dict[str, Any]) -> Dict[str, Any]:
        v = self._layout._to_native(x[self._video_key])
        out = F.uniform_crop(v, self._size, x[self._aug_index_key])
        x[self._video_key] = self._layout._from_native(out)
        return x


class Normalize(_Layout):
    """Per-channel normalize (reference transforms.py:177-195)."""

    def __init__(self, mean, std, data_format: str = "THWC"):
        super().__init__(data_format)
        self._mean = mean
        self._std = std

    def __call__(self, x):
        v = self._to_native(x)
        return self._from_native(F.normalize(v, self._mean, self._std))


class ConvertUint8ToFloat:
    """uint8 [0,255] -> float32 [0,1] (reference transforms.py:218-233 via
    torchvision ConvertImageDtype, which rescales)."""

    def __call__(self, x):
        assert x.dtype == jnp.uint8 or x.dtype == np.uint8, "image must be uint8"
        if isinstance(x, np.ndarray):
            return x.astype(np.float32) / 255.0
        return jnp.asarray(x, jnp.float32) / 255.0


class ConvertFloatToUint8:
    """float [0,1] -> uint8 [0,255] (reference transforms.py:198-215)."""

    def __call__(self, x):
        assert x.dtype in (jnp.float32, np.float32, jnp.float16), (
            "image must be float"
        )
        if isinstance(x, np.ndarray):
            return np.round(x * 255.0).astype(np.uint8)
        return jnp.asarray(jnp.round(jnp.asarray(x) * 255.0), jnp.uint8)


class MoveChannelRear:
    """CTHW -> THWC (reference MoveChannelRear transforms.py:236-251 is the
    opposite direction because its native layout is channels-first; ours is
    the identity direction for import)."""

    def __call__(self, x):
        return F.cthw_to_thwc(x)


class MoveChannelFront:
    """THWC -> CTHW."""

    def __call__(self, x):
        return F.thwc_to_cthw(x)


class RandomResizedCrop(_Layout):
    """Random resized crop transform (reference transforms.py:272-313)."""

    def __init__(
        self,
        target_height: int,
        target_width: int,
        scale: Tuple[float, float],
        aspect_ratio: Tuple[float, float],
        shift: bool = False,
        log_uniform_ratio: bool = True,
        interpolation: str = "bilinear",
        num_tries: int = 10,
        data_format: str = "THWC",
        seed: Optional[int] = None,
    ):
        super().__init__(data_format)
        self._kw = dict(
            target_height=target_height,
            target_width=target_width,
            scale=scale,
            aspect_ratio=aspect_ratio,
            shift=shift,
            log_uniform_ratio=log_uniform_ratio,
            interpolation=interpolation,
            num_tries=num_tries,
        )
        self._rng = np.random.default_rng(seed)

    def __call__(self, x):
        key = jax.random.PRNGKey(int(self._rng.integers(0, 2**31 - 1)))
        out = F.random_resized_crop(self._to_native(x), key=key, **self._kw)
        return self._from_native(out)


class Permute:
    """Permute axes (reference transforms.py:316-338)."""

    def __init__(self, dims: Tuple[int, ...]):
        assert sorted(dims) == list(range(len(dims)))
        self._dims = tuple(dims)

    def __call__(self, x):
        if isinstance(x, np.ndarray):
            return np.transpose(x, self._dims)
        return jnp.transpose(x, self._dims)


class OpSampler:
    """Sample and apply N ops from a list with given weights
    (reference transforms.py:341-411)."""

    def __init__(
        self,
        transforms_list: List[Callable],
        transforms_prob: Optional[List[float]] = None,
        num_sample_op: int = 1,
        randomly_sample_depth: bool = False,
        replacement: bool = False,
        seed: Optional[int] = None,
    ):
        assert len(transforms_list) > 0
        if transforms_prob is not None:
            assert len(transforms_list) == len(transforms_prob)
            assert min(transforms_prob) > 0.0
        assert 0 < num_sample_op <= len(transforms_list)
        self._transforms = list(transforms_list)
        self._probs = None
        if transforms_prob is not None:
            p = np.asarray(transforms_prob, dtype=np.float64)
            self._probs = p / p.sum()
        self._num_sample_op = num_sample_op
        self._randomly_sample_depth = randomly_sample_depth
        self._replacement = replacement
        self._rng = np.random.default_rng(seed)

    def __call__(self, x):
        depth = (
            int(self._rng.integers(1, self._num_sample_op + 1))
            if self._randomly_sample_depth
            else self._num_sample_op
        )
        indices = self._rng.choice(
            len(self._transforms), size=depth, replace=self._replacement, p=self._probs
        )
        for i in indices:
            x = self._transforms[int(i)](x)
        return x


class Div255:
    """Divide by 255 (reference transforms.py:414-430)."""

    def __call__(self, x):
        if isinstance(x, np.ndarray):  # host path stays numpy
            return F.div_255(x.astype(np.float32, copy=False))
        return F.div_255(jnp.asarray(x, jnp.float32))
