"""AugMix for video (reference pytorchvideo/transforms/augmix.py:56-147).

Width augmentation chains mixed by Dirichlet weights, then blended with the
original by a Beta-sampled weight. Layout (T, H, W, C).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from pytorchvideo_tpu.transforms.augmentations import (
    _AUGMENTATION_MAX_LEVEL,
    AugmentTransform,
)
from pytorchvideo_tpu.transforms.transforms import OpSampler

_AUGMIX_LEVEL_TO_ARG = {
    "AutoContrast": None,
    "Equalize": None,
    "Rotate": "inc_neg",
    "Posterize": "dec_int",
    "Solarize": "dec",
    "ShearX": "inc_neg",
    "ShearY": "inc_neg",
    "TranslateX": "inc_neg",
    "TranslateY": "inc_neg",
    "AdjustSaturation": "inc",
    "AdjustContrast": "inc",
    "AdjustBrightness": "inc",
    "AdjustSharpness": "inc",
}

_TRANSFORM_AUGMIX_MAX_PARAMS = {
    "AutoContrast": None,
    "Equalize": None,
    "Rotate": (0, 30),
    "Posterize": (4, 4),
    "Solarize": (1, 1),
    "ShearX": (0, 0.3),
    "ShearY": (0, 0.3),
    "TranslateX": (0, 1.0 / 3.0),
    "TranslateY": (0, 1.0 / 3.0),
    "AdjustSaturation": (0.1, 1.8),
    "AdjustContrast": (0.1, 1.8),
    "AdjustBrightness": (0.1, 1.8),
    "AdjustSharpness": (0.1, 1.8),
}

SAMPLING_AUGMIX_DEFAULT_HPARAS = {"sampling_data_type": "float", "sampling_min": 0.1}


class AugMix:
    """AugMix (https://arxiv.org/pdf/1912.02781.pdf) for video clips."""

    def __init__(
        self,
        magnitude: int = 3,
        alpha: float = 1.0,
        width: int = 3,
        depth: int = -1,
        transform_hparas: Optional[Dict[str, Any]] = None,
        sampling_hparas: Optional[Dict[str, Any]] = None,
        seed: Optional[int] = None,
    ) -> None:
        assert isinstance(magnitude, int), "magnitude must be an int"
        assert 1 <= magnitude <= _AUGMENTATION_MAX_LEVEL
        assert alpha > 0.0 and width > 0
        self._alpha = alpha
        self._width = width
        self._rng = np.random.default_rng(seed)
        seeds = self._rng.integers(0, 2**31, 20)

        transforms_list = [
            AugmentTransform(
                transform_name=name,
                magnitude=magnitude,
                prob=1.0,
                level_to_arg=_AUGMIX_LEVEL_TO_ARG,
                transform_max_paras=_TRANSFORM_AUGMIX_MAX_PARAMS,
                transform_hparas=transform_hparas,
                sampling_type="uniform",
                sampling_hparas=sampling_hparas or SAMPLING_AUGMIX_DEFAULT_HPARAS,
                seed=int(seeds[i]),
            )
            for i, name in enumerate(_TRANSFORM_AUGMIX_MAX_PARAMS)
        ]
        if depth > 0:
            self.augmix_fn = OpSampler(
                transforms_list,
                num_sample_op=depth,
                replacement=True,
                seed=int(seeds[-1]),
            )
        else:
            self.augmix_fn = OpSampler(
                transforms_list,
                num_sample_op=3,
                randomly_sample_depth=True,
                replacement=True,
                seed=int(seeds[-1]),
            )

    def __call__(self, video):
        video = np.asarray(video)
        mixing_weights = self._rng.dirichlet([self._alpha] * self._width)
        m = self._rng.beta(self._alpha, self._alpha)
        mixed = np.zeros(video.shape, np.float32)
        for mw in mixing_weights:
            mixed += mw * np.asarray(self.augmix_fn(video), np.float32)
        out = m * video.astype(np.float32) + (1 - m) * mixed
        if video.dtype == np.uint8:
            return out.astype(np.uint8)
        return out.astype(video.dtype)
