"""Dict/tensor transform-class behavior tests (reference test_transforms.py
patterns: exact crops vs manual slicing, OpSampler sampling semantics,
batch mix label algebra)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchvideo_tpu.transforms import functional as F
from pytorchvideo_tpu.transforms.mix import CutMix, MixUp, MixVideo
from pytorchvideo_tpu.transforms.transforms import (
    ApplyTransformToKey,
    OpSampler,
    RemoveKey,
    UniformCropVideo,
)


def _clip(t=4, h=30, w=40):
    return (
        np.random.default_rng(0)
        .uniform(0, 1, (t, h, w, 3))
        .astype(np.float32)
    )


def test_uniform_crop_video_uses_aug_index():
    """aug_index 0/1/2 -> left/center/right crops of the wide clip,
    matching the functional uniform_crop exactly (reference
    transforms.py:153-174)."""
    v = _clip()
    for aug_index in range(3):
        sample = {"video": jnp.asarray(v), "aug_index": aug_index}
        out = UniformCropVideo(24)(dict(sample))["video"]
        expected = F.uniform_crop(jnp.asarray(v), 24, aug_index)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected))
    # the three crops are distinct
    crops = [
        np.asarray(
            UniformCropVideo(24)({"video": jnp.asarray(v), "aug_index": i})[
                "video"
            ]
        )
        for i in range(3)
    ]
    assert not np.allclose(crops[0], crops[1])
    assert not np.allclose(crops[1], crops[2])


def test_op_sampler_counts_and_weights():
    calls = {"a": 0, "b": 0, "c": 0}

    def op(name):
        def fn(x):
            calls[name] += 1
            return x

        return fn

    # uniform, no replacement, 2 ops per call -> 2 distinct ops each call
    s = OpSampler([op("a"), op("b"), op("c")], num_sample_op=2, seed=0)
    for _ in range(30):
        s(0)
    assert sum(calls.values()) == 60
    assert all(v > 0 for v in calls.values())

    # heavily weighted: 'a' dominates with replacement
    calls = {"a": 0, "b": 0, "c": 0}
    s = OpSampler(
        [op("a"), op("b"), op("c")],
        transforms_prob=[100.0, 1.0, 1.0],
        num_sample_op=1,
        seed=0,
    )
    for _ in range(50):
        s(0)
    assert calls["a"] > 40

    # randomly_sample_depth draws 1..num_sample_op ops
    calls = {"a": 0, "b": 0, "c": 0}
    s = OpSampler(
        [op("a"), op("b"), op("c")],
        num_sample_op=3,
        randomly_sample_depth=True,
        seed=1,
    )
    for _ in range(30):
        s(0)
    assert 30 <= sum(calls.values()) <= 90

    with pytest.raises(AssertionError):
        OpSampler([op("a")], transforms_prob=[0.0])


def test_apply_to_key_and_remove_key():
    sample = {"video": 1, "label": 2}
    out = ApplyTransformToKey("video", lambda v: v + 10)(dict(sample))
    assert out == {"video": 11, "label": 2}
    out = RemoveKey("label")(dict(sample))
    assert out == {"video": 1}


def test_mixup_label_algebra():
    """Mixed one-hot labels stay a convex combination: rows sum to 1 and
    use at most two classes (reference mix.py:35-96)."""
    mix = MixUp(alpha=1.0, num_classes=5)
    x = jnp.asarray(_clip(t=2)[None].repeat(4, 0))
    labels = jnp.asarray([0, 1, 2, 3])
    xm, lm = mix(jax.random.PRNGKey(0), x, labels)
    assert xm.shape == x.shape and lm.shape == (4, 5)
    np.testing.assert_allclose(np.asarray(lm.sum(-1)), 1.0, atol=1e-6)
    assert int((np.asarray(lm) > 1e-6).sum(axis=-1).max()) <= 2


def test_cutmix_lambda_matches_box_area():
    """CutMix label weight equals the actual kept-pixel fraction
    (reference mix.py:158 corrects lambda by the realized box)."""
    mix = CutMix(alpha=1.0, num_classes=3)
    x = jnp.ones((2, 2, 32, 32, 3))
    labels = jnp.asarray([0, 1])
    xm, lm = mix(jax.random.PRNGKey(3), x, labels)
    lm = np.asarray(lm)
    # row 0 mixes classes 0 (kept region) and 1 (pasted from flipped batch)
    np.testing.assert_allclose(lm.sum(-1), 1.0, atol=1e-6)
    # symmetric flip-mix: weight of own class equals the other's complement
    np.testing.assert_allclose(lm[0, 0], lm[1, 1], atol=1e-6)


@pytest.mark.slow
def test_mix_video_selects_either_branch():
    mv = MixVideo(cutmix_prob=0.5, num_classes=4)
    x = jnp.asarray(_clip(t=2)[None].repeat(2, 0))
    labels = jnp.asarray([0, 1])
    lams = set()
    for i in range(6):
        xm, lm = mv(jax.random.PRNGKey(i), x, labels)
        assert lm.shape == (2, 4)
        # batch sum is invariant under both mixes (convex combination /
        # pixel swap), so distinguish runs by the sampled label weight
        lams.add(round(float(np.asarray(lm)[0, 0]), 4))
    assert len(lams) > 1  # different keys -> different mixes


def test_mixup_audio_passthrough():
    mix = MixUp(alpha=1.0, num_classes=3)
    x = jnp.ones((2, 2, 8, 8, 3))
    audio = jnp.stack([jnp.zeros((4, 6, 1)), jnp.ones((4, 6, 1))])
    xm, am, lm = mix(jax.random.PRNGKey(0), x, jnp.asarray([0, 1]), audio)
    am = np.asarray(am)
    # audio rows mixed with the same lambda: row0 + row1 == 1 everywhere
    np.testing.assert_allclose(am[0] + am[1], 1.0, atol=1e-6)
