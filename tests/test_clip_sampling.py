"""Parity tests for clip samplers vs the reference implementation.

Reference behavior: pytorchvideo/data/clip_sampling.py (loaded directly for
side-by-side comparison).
"""

from fractions import Fraction

import numpy as np
import pytest

from pytorchvideo_tpu.data import clip_sampling as ours
from ref_loader import load_ref

ref = load_ref("pytorchvideo.data.clip_sampling")


def _drain_uniform(sampler, duration, max_clips=1000):
    """Run a sampler to exhaustion, returning the list of ClipInfos."""
    out = []
    last_end = None
    for _ in range(max_clips):
        info = sampler(last_end, duration, {})
        out.append(info)
        last_end = info.clip_end_sec
        if info.is_last_clip:
            break
    return out


@pytest.mark.parametrize("backpad", [False, True])
@pytest.mark.parametrize(
    "duration,clip_dur,stride",
    [
        (1.3, Fraction(32, 30), Fraction(16, 30)),
        (10.0, 2.0, None),
        (5.0, 2.0, 1.0),
        (2.0, 2.0, None),
        (17.5, 3.0, 2.5),
        (Fraction(39, 30), Fraction(32, 30), Fraction(16, 30)),
    ],
)
def test_uniform_clip_sampler_parity(duration, clip_dur, stride, backpad):
    ours_s = ours.UniformClipSampler(clip_dur, stride, backpad)
    ref_s = ref.UniformClipSampler(clip_dur, stride, backpad)
    ours_clips = _drain_uniform(ours_s, duration)
    ref_clips = _drain_uniform(ref_s, duration)
    assert len(ours_clips) == len(ref_clips)
    for a, b in zip(ours_clips, ref_clips):
        assert float(a.clip_start_sec) == pytest.approx(float(b.clip_start_sec))
        assert float(a.clip_end_sec) == pytest.approx(float(b.clip_end_sec))
        assert a.clip_index == b.clip_index
        assert a.aug_index == b.aug_index
        assert a.is_last_clip == b.is_last_clip


@pytest.mark.parametrize("clips_per_video,augs", [(1, 1), (5, 1), (3, 2), (10, 3)])
def test_constant_clips_per_video_parity(clips_per_video, augs):
    duration = 7.7
    ours_s = ours.ConstantClipsPerVideoSampler(2.0, clips_per_video, augs)
    ref_s = ref.ConstantClipsPerVideoSampler(2.0, clips_per_video, augs)
    last = None
    for _ in range(clips_per_video * augs + 2):
        a = ours_s(last, duration, {})
        b = ref_s(last, duration, {})
        assert float(a.clip_start_sec) == pytest.approx(float(b.clip_start_sec))
        assert a.clip_index == b.clip_index
        assert a.aug_index == b.aug_index
        assert a.is_last_clip == b.is_last_clip
        if a.is_last_clip:
            break


def test_random_clip_sampler_bounds():
    s = ours.RandomClipSampler(2.0, rng=np.random.default_rng(0))
    for _ in range(50):
        info = s(None, 10.0, {})
        assert 0 <= info.clip_start_sec <= 8.0
        assert float(info.clip_end_sec - info.clip_start_sec) == pytest.approx(2.0)
        assert info.is_last_clip


def test_random_clip_sampler_short_video():
    s = ours.RandomClipSampler(5.0, rng=np.random.default_rng(0))
    info = s(None, 2.0, {})
    assert float(info.clip_start_sec) == 0.0
    assert float(info.clip_end_sec) == 5.0


def test_random_multi_clip_sampler():
    s = ours.RandomMultiClipSampler(2.0, 4, rng=np.random.default_rng(0))
    info = s(None, 10.0, {})
    assert isinstance(info, ours.ClipInfoList)
    assert len(info.clip_start_sec) == 4


def test_truncate_from_start():
    s = ours.UniformClipSamplerTruncateFromStart(2.0, truncation_duration=4.0)
    clips = _drain_uniform(s, 10.0)
    assert len(clips) == 2
    assert float(clips[-1].clip_end_sec) == pytest.approx(4.0)


def test_make_clip_sampler_factory():
    assert isinstance(ours.make_clip_sampler("uniform", 2.0), ours.UniformClipSampler)
    assert isinstance(ours.make_clip_sampler("random", 2.0), ours.RandomClipSampler)
    assert isinstance(
        ours.make_clip_sampler("constant_clips_per_video", 2.0, 5),
        ours.ConstantClipsPerVideoSampler,
    )
    assert isinstance(
        ours.make_clip_sampler("random_multi", 2.0, 3), ours.RandomMultiClipSampler
    )
    with pytest.raises(NotImplementedError):
        ours.make_clip_sampler("bogus", 1.0)


def test_uniform_clip_sampler_randomized_property_sweep():
    """200 random (duration, clip_dur, stride, backpad, fps-rational)
    configs: our Fraction-exact boundary math must match the reference
    clip-for-clip. This is the load-bearing parity surface (SURVEY §7
    hard part 7: fraction-accurate clip arithmetic)."""
    rng = np.random.default_rng(0)
    checked = 0
    for trial in range(200):
        fps = int(rng.choice([24, 25, 30, 60]))
        # durations/strides as frame-count rationals (the real data case)
        # plus occasional ugly floats
        if rng.random() < 0.5:
            clip_dur = Fraction(int(rng.integers(8, 65)), fps)
            stride = (
                None
                if rng.random() < 0.3
                else Fraction(int(rng.integers(4, 49)), fps)
            )
            duration = Fraction(int(rng.integers(10, 400)), fps)
        else:
            clip_dur = float(rng.uniform(0.3, 3.0))
            stride = None if rng.random() < 0.3 else float(rng.uniform(0.2, 2.5))
            duration = float(rng.uniform(0.5, 15.0))
        if float(duration) < float(clip_dur):
            continue
        backpad = bool(rng.random() < 0.5)
        ours_s = ours.UniformClipSampler(clip_dur, stride, backpad)
        ref_s = ref.UniformClipSampler(clip_dur, stride, backpad)
        a_clips = _drain_uniform(ours_s, duration)
        b_clips = _drain_uniform(ref_s, duration)
        assert len(a_clips) == len(b_clips), (
            trial, fps, clip_dur, stride, duration, backpad,
            len(a_clips), len(b_clips),
        )
        for a, b in zip(a_clips, b_clips):
            assert float(a.clip_start_sec) == pytest.approx(
                float(b.clip_start_sec)
            ), (trial, clip_dur, stride, duration, backpad)
            assert float(a.clip_end_sec) == pytest.approx(
                float(b.clip_end_sec)
            )
            assert (a.clip_index, a.aug_index, a.is_last_clip) == (
                b.clip_index, b.aug_index, b.is_last_clip,
            )
        checked += 1
    assert checked > 150
