"""Numerical parity tests: our jnp functional transforms vs reference torch.

Reference: pytorchvideo/transforms/functional.py. Ours is channels-last
(T, H, W, C); conversion happens at the test boundary.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pytorchvideo_tpu.transforms import functional as F
from ref_loader import load_ref

RF = load_ref("pytorchvideo.transforms.functional")


def _rand_video_cthw(c=3, t=8, h=32, w=40, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 255, size=(c, t, h, w)).astype(np.float32)


def _to_thwc(x_cthw):
    return jnp.asarray(np.moveaxis(x_cthw, 0, -1))


@pytest.mark.parametrize("t,num", [(8, 4), (8, 8), (8, 3), (4, 10), (30, 13), (1, 5)])
def test_uniform_temporal_subsample_parity(t, num):
    x = _rand_video_cthw(t=t)
    ref_out = RF.uniform_temporal_subsample(torch.from_numpy(x), num, -3).numpy()
    our_out = F.uniform_temporal_subsample(_to_thwc(x), num)
    np.testing.assert_allclose(np.moveaxis(np.asarray(our_out), -1, 0), ref_out)


@pytest.mark.parametrize("h,w,size", [(32, 40, 24), (40, 32, 24), (32, 32, 48), (31, 45, 17)])
def test_short_side_scale_parity(h, w, size):
    x = _rand_video_cthw(h=h, w=w)
    ref_out = RF.short_side_scale(torch.from_numpy(x), size).numpy()
    our_out = F.short_side_scale(_to_thwc(x), size)
    assert np.moveaxis(np.asarray(our_out), -1, 0).shape == ref_out.shape
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(our_out), -1, 0), ref_out, rtol=1e-4, atol=1e-3
    )


@pytest.mark.parametrize("spatial_idx", [0, 1, 2])
@pytest.mark.parametrize("h,w", [(32, 48), (48, 32), (33, 47)])
def test_uniform_crop_parity(spatial_idx, h, w):
    x = _rand_video_cthw(h=h, w=w)
    size = 24
    ref_out = RF.uniform_crop(torch.from_numpy(x), size, spatial_idx).numpy()
    our_out = F.uniform_crop(_to_thwc(x), size, spatial_idx)
    np.testing.assert_allclose(np.moveaxis(np.asarray(our_out), -1, 0), ref_out)


@pytest.mark.parametrize("label_smooth", [0.0, 0.1])
def test_convert_to_one_hot_parity(label_smooth):
    targets = np.array([0, 3, 2, 1], dtype=np.int64)
    ref_out = RF.convert_to_one_hot(
        torch.from_numpy(targets), 4, label_smooth
    ).numpy()
    our_out = np.asarray(F.convert_to_one_hot(jnp.asarray(targets), 4, label_smooth))
    np.testing.assert_allclose(
        our_out, ref_out.reshape(our_out.shape), rtol=1e-6, atol=1e-6
    )


def test_div_255():
    x = _to_thwc(_rand_video_cthw())
    np.testing.assert_allclose(
        np.asarray(F.div_255(x)), np.asarray(x) / 255.0, rtol=1e-6
    )


def test_normalize():
    x = _to_thwc(_rand_video_cthw())
    mean, std = [0.45, 0.45, 0.45], [0.225, 0.225, 0.225]
    out = F.normalize(F.div_255(x), mean, std)
    manual = (np.asarray(x) / 255.0 - np.array(mean)) / np.array(std)
    np.testing.assert_allclose(np.asarray(out), manual, rtol=1e-5, atol=1e-6)


def test_crop_matches_slicing():
    x = _to_thwc(_rand_video_cthw())
    out = F.crop(x, 3, 5, 16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[:, 3:19, 5:21, :])


def test_crop_and_resize_matches_slice_then_resize():
    x = _to_thwc(_rand_video_cthw(h=40, w=40))
    # Integer box: crop_and_resize should equal slice + resize.
    out = F.crop_and_resize(x, 4.0, 6.0, 20.0, 24.0, 16, 16)
    sliced = x[:, 4:24, 6:30, :]
    resized = F.resize(sliced, (16, 16))
    np.testing.assert_allclose(np.asarray(out), np.asarray(resized), rtol=1e-4, atol=1e-3)


def test_random_resized_crop_shapes():
    x = _to_thwc(_rand_video_cthw(h=48, w=64))
    key = jax.random.PRNGKey(0)
    out = F.random_resized_crop(x, 24, 24, (0.08, 1.0), (0.75, 1.33), key)
    assert out.shape == (8, 24, 24, 3)
    out_shift = F.random_resized_crop(
        x, 24, 24, (0.08, 1.0), (0.75, 1.33), key, shift=True
    )
    assert out_shift.shape == (8, 24, 24, 3)


def test_random_crop_within_bounds():
    x = _to_thwc(_rand_video_cthw(h=40, w=40))
    out = F.random_crop(x, 24, jax.random.PRNGKey(1))
    assert out.shape == (8, 24, 24, 3)


def test_horizontal_flip():
    x = _to_thwc(_rand_video_cthw())
    np.testing.assert_array_equal(
        np.asarray(F.horizontal_flip(x)), np.asarray(x)[:, :, ::-1, :]
    )


def test_boxes_crop_and_clip():
    boxes = jnp.asarray([[10.0, 12.0, 30.0, 28.0], [0.0, 0.0, 100.0, 100.0]])
    out = F.crop_boxes(boxes, 5, 8)
    np.testing.assert_allclose(
        np.asarray(out), [[5.0, 4.0, 25.0, 20.0], [-5.0, -8.0, 95.0, 92.0]]
    )
    clipped = F.clip_boxes_to_image(out, 24, 24)
    assert clipped.max() <= 23.0 and clipped.min() >= 0.0


def test_uniform_crop_with_boxes_parity():
    x = _rand_video_cthw(h=40, w=56)
    boxes = np.array([[5.0, 6.0, 30.0, 35.0]], dtype=np.float32)
    ref_img, ref_boxes = RF.uniform_crop_with_boxes(
        torch.from_numpy(x), 24, 1, torch.from_numpy(boxes.copy())
    )
    our_img, our_boxes = F.uniform_crop_with_boxes(
        _to_thwc(x), 24, 1, jnp.asarray(boxes)
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(our_img), -1, 0), ref_img.numpy()
    )
    np.testing.assert_allclose(np.asarray(our_boxes), ref_boxes.numpy())


def test_short_side_scale_with_boxes_parity():
    x = _rand_video_cthw(h=40, w=56)
    boxes = np.array([[5.0, 6.0, 30.0, 35.0]], dtype=np.float32)
    ref_img, ref_boxes = RF.short_side_scale_with_boxes(
        torch.from_numpy(x), torch.from_numpy(boxes.copy()), 24
    )
    our_img, our_boxes = F.short_side_scale_with_boxes(
        _to_thwc(x), jnp.asarray(boxes), 24
    )
    assert np.moveaxis(np.asarray(our_img), -1, 0).shape == ref_img.numpy().shape
    np.testing.assert_allclose(np.asarray(our_boxes), ref_boxes.numpy(), rtol=1e-6)


def test_uniform_temporal_subsample_repeated():
    x = _to_thwc(_rand_video_cthw(t=32))
    outs = F.uniform_temporal_subsample_repeated(x, (4, 1))
    assert outs[0].shape[0] == 8 and outs[1].shape[0] == 32


def test_random_short_side_scale_with_boxes():
    """Size drawn in [min, max]; boxes scale with the short side
    (reference functional.py:233-264)."""
    import numpy as np

    from pytorchvideo_tpu.transforms.functional import (
        random_short_side_scale_with_boxes,
    )

    imgs = jnp.ones((4, 60, 80, 3))
    boxes = jnp.asarray([[10.0, 10.0, 40.0, 40.0]])
    out, b = random_short_side_scale_with_boxes(
        imgs, boxes, 30, 30, rng=np.random.default_rng(0)
    )
    assert out.shape[1] == 30
    np.testing.assert_allclose(np.asarray(b), [[5.0, 5.0, 20.0, 20.0]])
    for _ in range(5):
        out, _ = random_short_side_scale_with_boxes(
            imgs, boxes, 20, 40, rng=np.random.default_rng(1)
        )
        assert 20 <= out.shape[1] <= 40


class TestHostDevicePathParity:
    """numpy (host-pipeline) fast paths vs the jnp (on-device) paths.

    The host paths exist because random output shapes (RandomShortSideScale)
    force an XLA recompile per call on CPU — 460 -> 25 ms/clip for the
    factory train pipeline. They must stay numerically interchangeable.
    """

    def setup_method(self):
        self.x = (
            np.random.default_rng(0)
            .uniform(0, 1, (5, 36, 48, 3))
            .astype(np.float32)
        )

    def test_resize_parity(self):
        host = F.resize(self.x, (24, 32))
        dev = F.resize(jnp.asarray(self.x), (24, 32))
        assert isinstance(host, np.ndarray)
        np.testing.assert_allclose(host, np.asarray(dev), atol=2e-5)

    def test_short_side_scale_parity(self):
        host = F.short_side_scale(self.x, 24)
        dev = F.short_side_scale(jnp.asarray(self.x), 24)
        assert isinstance(host, np.ndarray)
        assert host.shape == dev.shape
        np.testing.assert_allclose(host, np.asarray(dev), atol=2e-5)

    def test_crop_flip_subsample_normalize_parity(self):
        for host, dev in [
            (F.crop(self.x, 3, 5, 20), F.crop(jnp.asarray(self.x), 3, 5, 20)),
            (F.center_crop(self.x, 24), F.center_crop(jnp.asarray(self.x), 24)),
            (F.horizontal_flip(self.x), F.horizontal_flip(jnp.asarray(self.x))),
            (
                F.uniform_temporal_subsample(self.x, 3),
                F.uniform_temporal_subsample(jnp.asarray(self.x), 3),
            ),
            (
                F.normalize(self.x, [0.45] * 3, [0.225] * 3),
                F.normalize(jnp.asarray(self.x), [0.45] * 3, [0.225] * 3),
            ),
        ]:
            assert isinstance(host, np.ndarray)
            np.testing.assert_allclose(host, np.asarray(dev), atol=1e-6)

    def test_factory_train_pipeline_stays_numpy(self):
        from pytorchvideo_tpu.transforms.transforms_factory import (
            create_video_transform,
        )

        t = create_video_transform(
            "train",
            num_samples=4,
            convert_to_float=False,
            min_size=30,
            max_size=40,
            crop_size=24,
        )
        out = t(self.x)
        assert isinstance(out, np.ndarray), type(out)
        assert out.shape == (4, 24, 24, 3)


@pytest.mark.slow
def test_geometry_transforms_randomized_parity_sweep():
    """100 random (H, W, size, crop) configs: short_side_scale,
    uniform_crop (3 positions), and uniform_temporal_subsample must match
    the reference numerically across arbitrary geometries, not just the
    hand-picked grid."""
    rng = np.random.default_rng(7)
    for trial in range(100):
        t = int(rng.integers(1, 12))
        h = int(rng.integers(16, 120))
        w = int(rng.integers(16, 120))
        x_cthw = _rand_video_cthw(3, t, h, w, seed=trial)
        xt = torch.from_numpy(x_cthw)
        xj = _to_thwc(x_cthw)

        size = int(rng.integers(12, 90))
        ref_scaled = RF.short_side_scale(xt, size)
        our_scaled = F.short_side_scale(xj, size)
        assert our_scaled.shape[1:3] == tuple(ref_scaled.shape[2:4]), (
            trial, h, w, size,
        )
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(our_scaled), -1, 0),
            ref_scaled.numpy(),
            atol=1e-2,  # torch vs jax bilinear accumulate order
            rtol=1e-4,
        )

        sh, sw = ref_scaled.shape[2], ref_scaled.shape[3]
        crop = int(rng.integers(8, min(sh, sw) + 1))
        for spatial_idx in range(3):
            ref_crop = RF.uniform_crop(ref_scaled, crop, spatial_idx)
            our_crop = F.uniform_crop(our_scaled, crop, spatial_idx)
            np.testing.assert_allclose(
                np.moveaxis(np.asarray(our_crop), -1, 0),
                ref_crop.numpy(),
                atol=1e-2,
                rtol=1e-4,
            )

        num = int(rng.integers(1, 2 * t + 1))
        ref_sub = RF.uniform_temporal_subsample(xt, num)
        our_sub = np.moveaxis(
            np.asarray(F.uniform_temporal_subsample(xj, num)), -1, 0
        )
        mismatch = np.nonzero(
            np.any(our_sub != ref_sub.numpy(), axis=(0, 2, 3))
        )[0]
        if mismatch.size:
            # torch.linspace truncation at exact-integer positions is
            # float-implementation-dependent; a one-frame difference is
            # permitted ONLY where the exact position is an integer tie
            exact = (
                np.arange(num, dtype=np.float64) * (t - 1) / max(num - 1, 1)
            )
            for i in mismatch:
                assert abs(exact[i] - round(exact[i])) < 1e-9, (
                    trial, t, num, i, exact[i],
                )
