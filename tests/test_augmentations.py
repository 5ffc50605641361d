"""Tests for augmentation ops, RandAugment, AugMix, and the factory.

Pixel-level checks use numpy references for the exactly-specified ops
(invert/solarize/posterize/translate/autocontrast/equalize); affine and
blend ops get invariant checks (the reference's own tests are invariance-
based too, tests/test_transforms.py).
"""

import numpy as np
import pytest

from pytorchvideo_tpu.transforms import augmentations as A
from pytorchvideo_tpu.transforms import AugMix, RandAugment, create_video_transform


def _video_u8(t=4, h=16, w=16, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (t, h, w, 3)).astype(np.uint8)


def test_invert():
    v = _video_u8()
    np.testing.assert_array_equal(A._invert(v), 255 - v)


def test_solarize():
    v = _video_u8()
    out = A._solarize(v, 0.5)
    np.testing.assert_array_equal(out, np.where(v >= 127, 255 - v, v))


def test_posterize():
    v = _video_u8()
    out = A._posterize(v, 4)
    np.testing.assert_array_equal(out, v & 0xF0)
    np.testing.assert_array_equal(A._posterize(v, 8), v)


def test_autocontrast_full_range():
    v = _video_u8().astype(np.float32) / 255.0
    out = A._autocontrast(v)
    assert out.min() == pytest.approx(0.0, abs=1e-6)
    assert out.max() == pytest.approx(1.0, abs=1e-6)


def test_equalize_flattens_histogram():
    v = (_video_u8(h=64, w=64) // 4 + 96).astype(np.uint8)  # compressed range
    out = A._equalize(v)
    assert out.std() > v.std()  # spread increases
    # constant image unchanged
    const = np.full((2, 8, 8, 3), 77, np.uint8)
    np.testing.assert_array_equal(A._equalize(const), const)


def test_translate_integer_matches_roll():
    v = _video_u8(h=8, w=8)
    out = A._translate_x(v, 0.25, fill=(0, 0, 0))  # shift input +2px -> content moves left? verify fill edge
    # translate by 2 px: out[x] = in[x+2]; columns 6,7 filled with 0
    np.testing.assert_array_equal(out[:, :, :6], v[:, :, 2:])
    assert (out[:, :, 6:] == 0).all()


def test_rotate_identity_and_180():
    v = _video_u8(h=9, w=9)
    out0 = A._rotate(v, 0.0, fill=(0, 0, 0))
    np.testing.assert_array_equal(out0, v)
    out180 = A._rotate(v, 180.0, fill=(0, 0, 0))
    np.testing.assert_allclose(
        out180.astype(int), v[:, ::-1, ::-1].astype(int), atol=1
    )


def test_brightness_contrast_saturation_sharpness():
    v = _video_u8()
    np.testing.assert_array_equal(A._adjust_brightness(v, 1.0), v)
    np.testing.assert_array_equal(A._adjust_contrast(v, 1.0), v)
    np.testing.assert_array_equal(A._adjust_saturation(v, 1.0), v)
    np.testing.assert_array_equal(A._adjust_sharpness(v, 1.0), v)
    assert (A._adjust_brightness(v, 0.0) == 0).all()
    gray = A._adjust_saturation(v, 0.0)
    np.testing.assert_array_equal(gray[..., 0], gray[..., 1])


def test_augment_transform_applies():
    t = A.AugmentTransform("Invert", prob=1.0, seed=0)
    v = _video_u8()
    np.testing.assert_array_equal(t(v), 255 - v)
    t0 = A.AugmentTransform("Invert", prob=0.0, seed=0)
    np.testing.assert_array_equal(t0(v), v)


def test_rand_augment_shapes_and_determinism():
    v = _video_u8(t=3, h=20, w=20)
    ra1 = RandAugment(seed=7)
    ra2 = RandAugment(seed=7)
    out1 = ra1(v)
    out2 = ra2(v)
    assert out1.shape == v.shape
    np.testing.assert_array_equal(out1, out2)


def test_augmix_output():
    v = _video_u8(t=2, h=16, w=16)
    am = AugMix(seed=3)
    out = am(v)
    assert out.shape == v.shape and out.dtype == np.uint8


def test_create_video_transform_val():
    t = create_video_transform(
        "val", num_samples=4, min_size=24, crop_size=16
    )
    v = _video_u8(t=8, h=32, w=40)
    out = np.asarray(t(v))
    assert out.shape == (4, 16, 16, 3)
    # normalized floats
    assert out.dtype == np.float32 and abs(out.mean()) < 3


def test_create_video_transform_train_randaug_dict():
    t = create_video_transform(
        "train",
        video_key="video",
        remove_key=["audio"],
        num_samples=4,
        min_size=24,
        crop_size=16,
        aug_type="randaug",
        aug_paras={"prob": 1.0},
    )
    sample = {"video": _video_u8(t=8, h=32, w=40), "audio": np.zeros(5), "label": 2}
    out = t(sample)
    assert np.asarray(out["video"]).shape == (4, 16, 16, 3)
    assert "audio" not in out and out["label"] == 2


def test_create_video_transform_train_rrc():
    t = create_video_transform(
        "train",
        num_samples=2,
        min_size=24,
        crop_size=16,
        random_resized_crop_paras={},
    )
    out = np.asarray(t(_video_u8(t=4, h=32, w=32)))
    assert out.shape == (2, 16, 16, 3)
