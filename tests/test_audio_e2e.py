"""Audio decode end-to-end: native backend audio, decode-from-memory,
remote-path openers, A/V export round-trip, dataset audio plumbing, and
real-file -> spectrogram -> audio-visual SlowFast forward.

Reference behaviors covered: PyAV audio decode + mono mix
(reference data/encoded_video_pyav.py:285-318), BytesIO/remote IO
(reference data/encoded_video.py:65-66), A/V fixture writer
(reference tests/utils.py:60-78).
"""

import numpy as np
import pytest

from fixtures import temp_encoded_video_with_audio
from pytorchvideo_tpu.data import EncodedVideo
from pytorchvideo_tpu.data.encoded_video_native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="libpvt_decode.so not built"
)


def test_native_audio_full_decode_exact():
    with temp_encoded_video_with_audio(num_frames=20, fps=10) as (
        path,
        frames,
        audio,
        rate,
    ):
        video = EncodedVideo.from_path(path, decoder="native", decode_audio=True)
        assert video.has_audio and video.audio_rate == rate
        clip = video.get_clip(0, video.duration)
        np.testing.assert_array_equal(clip["video"], frames)
        got = clip["audio"]
        assert got is not None and got.dtype == np.float32
        n = min(len(got), len(audio))
        assert n >= len(audio) - 1024  # full window, frame-granular tail
        # pcm_s16le quantization only
        assert np.abs(got[:n] - audio[:n]).max() < 2e-4
        video.close()


def test_native_audio_window_alignment():
    """A sub-window starts at the first audio-frame boundary >= start_sec
    and is sample-exact from there (frame-granular inclusion, the reference
    PyAV pts-window semantics)."""
    with temp_encoded_video_with_audio(num_frames=30, fps=10) as (
        path,
        _,
        audio,
        rate,
    ):
        video = EncodedVideo.from_path(path, decoder="native", decode_audio=True)
        clip = video.get_clip(0.5, 1.5)
        got = clip["audio"]
        assert got is not None
        # pcm frames are 1024 samples in this muxer
        start = ((int(0.5 * rate) + 1023) // 1024) * 1024
        assert abs(len(got) - rate) <= 2048  # ~1s of samples
        assert np.abs(got - audio[start : start + len(got)]).max() < 2e-4
        video.close()


def test_audio_none_for_video_only_file():
    from fixtures import temp_encoded_video

    with temp_encoded_video(num_frames=8, fps=4) as (path, _):
        video = EncodedVideo.from_path(path, decoder="native", decode_audio=True)
        assert not video.has_audio
        clip = video.get_clip(0, 1.0)
        assert clip["video"] is not None and clip["audio"] is None
        video.close()


@pytest.mark.parametrize("decoder", ["native", "opencv"])
def test_from_bytes_roundtrip(decoder):
    with temp_encoded_video_with_audio(num_frames=10, fps=5) as (
        path,
        frames,
        _,
        _rate,
    ):
        with open(path, "rb") as f:
            data = f.read()
        video = EncodedVideo.from_bytes(data, decoder=decoder)
        clip = video.get_clip(0, video.duration)
        np.testing.assert_array_equal(clip["video"], frames)
        video.close()


def test_remote_path_opener():
    """g_pathmgr role: a registered scheme opener feeds from_path for
    non-local URIs, decoding from memory (audio included)."""
    from pytorchvideo_tpu.data import io as pvt_io

    with temp_encoded_video_with_audio(num_frames=10, fps=5) as (
        path,
        frames,
        audio,
        rate,
    ):
        with open(path, "rb") as f:
            blob = f.read()
        pvt_io.register_path_opener("testmem", lambda p: blob)
        video = EncodedVideo.from_path(
            "testmem://bucket/clip.avi", decoder="native", decode_audio=True
        )
        clip = video.get_clip(0, video.duration)
        np.testing.assert_array_equal(clip["video"], frames)
        assert clip["audio"] is not None
        n = min(len(clip["audio"]), len(audio))
        assert np.abs(clip["audio"][:n] - audio[:n]).max() < 2e-4
        video.close()


def test_export_video_array_with_audio(tmp_path):
    from pytorchvideo_tpu.data.utils import export_video_array

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (12, 24, 32, 3), dtype=np.uint8)
    rate = 8000
    audio = (0.25 * np.sin(2 * np.pi * 200 * np.arange(rate * 2) / rate)).astype(
        np.float32
    )
    out = str(tmp_path / "export.avi")
    export_video_array(frames, out, rate=6.0, audio=audio, audio_rate=rate)
    video = EncodedVideo.from_path(out, decoder="native", decode_audio=True)
    clip = video.get_clip(0, video.duration)
    np.testing.assert_array_equal(clip["video"], frames.astype(np.float32))
    n = min(len(clip["audio"]), len(audio))
    assert np.abs(clip["audio"][:n] - audio[:n]).max() < 2e-4
    video.close()


def test_labeled_video_dataset_audio(tmp_path):
    """decode_audio=True threads mono samples into the sample dict
    (reference labeled_video_dataset.py:215-223)."""
    from pytorchvideo_tpu.data import labeled_video_dataset
    from pytorchvideo_tpu.data.clip_sampling import make_clip_sampler

    with temp_encoded_video_with_audio(num_frames=20, fps=10) as (
        path,
        _,
        _audio,
        rate,
    ):
        import shutil

        vid = tmp_path / "a.avi"
        shutil.copy(path, vid)
        csv = tmp_path / "data.csv"
        csv.write_text(f"{vid} 3\n")
        ds = labeled_video_dataset(
            str(csv),
            make_clip_sampler("uniform", 1.0),
            decode_audio=True,
            decoder="native",
        )
        sample = next(iter(ds))
        assert sample["label"] == 3
        assert sample["video"].shape[0] == 10
        assert "audio" in sample and len(sample["audio"]) >= rate - 2048


def test_ego4d_moments_audio_from_file(tmp_path):
    """Ego4dMomentsDataset with decode_audio=True over a real A/V file:
    the sample dict carries decoded signal + spectrogram
    (reference data/ego4d/ego4d_dataset.py audio path)."""
    import json
    import shutil

    from pytorchvideo_tpu.data.ego4d.ego4d_dataset import Ego4dMomentsDataset

    with temp_encoded_video_with_audio(num_frames=40, fps=10) as (
        path,
        _,
        _audio,
        _rate,
    ):
        vid_path = str(tmp_path / "clip.avi")
        shutil.copy(path, vid_path)
    duration = 4.0
    metadata = {
        "videos": [
            {
                "video_uid": "v1",
                "duration_sec": duration,
                "manifold_path": vid_path,
            }
        ]
    }
    annotations = {
        "videos": [
            {
                "video_uid": "v1",
                "split": "train",
                "clips": [
                    {
                        "clip_uid": "c1",
                        "video_start_sec": 0.0,
                        "video_end_sec": duration,
                        "annotations": [
                            {
                                "labels": [
                                    {
                                        "label": "cooking",
                                        "start_time": 0.0,
                                        "end_time": 2.0,
                                        "video_start_time": 0.0,
                                        "video_end_time": 2.0,
                                    }
                                ]
                            }
                        ],
                    }
                ],
            }
        ]
    }
    ann_path = tmp_path / "ann.json"
    meta_path = tmp_path / "meta.json"
    ann_path.write_text(json.dumps(annotations))
    meta_path.write_text(json.dumps(metadata))
    ds = Ego4dMomentsDataset(
        annotation_path=str(ann_path),
        metadata_path=str(meta_path),
        split="train",
        decode_audio=True,
        decoder="native",
        window_sec=2,
        label_id_map={"cooking": 0},
    )
    sample = next(iter(ds))
    assert sample["labels_onehot"] == [1]
    assert sample["video"] is not None
    assert isinstance(sample["audio"], dict)
    assert sample["audio"]["signal"].ndim == 1
    assert sample["spectrogram"].ndim == 2
    assert np.isfinite(sample["spectrogram"]).all()


@pytest.mark.slow
def test_av_slowfast_from_file_e2e():
    """Full path: A/V file -> native decode -> mel-spectrogram -> 3-pathway
    audio-visual SlowFast forward (the capability hole flagged in round 1:
    the AV model could only be fed precomputed spectrograms)."""
    import jax

    from pytorchvideo_tpu import models
    from pytorchvideo_tpu.data.ego4d.ego4d_dataset import signal_transform
    from pytorchvideo_tpu.transforms.functional import (
        uniform_temporal_subsample,
    )

    with temp_encoded_video_with_audio(
        num_frames=16, fps=8, height=64, width=64, audio_rate=16000
    ) as (path, _, _audio, rate):
        video = EncodedVideo.from_path(path, decoder="native", decode_audio=True)
        clip = video.get_clip(0, 2.0)
        video.close()
    frames, audio = clip["video"], clip["audio"]
    assert frames is not None and audio is not None

    # visual pathways: slow 2f / fast 8f at 32x32
    fast = uniform_temporal_subsample(frames, 8)[:, ::2, ::2] / 255.0
    slow = uniform_temporal_subsample(fast, 2)
    # audio pathway: mel spectrogram -> (1, T, 1, F, 1)
    spec = signal_transform("melspectrogram", sample_rate=rate)(audio)
    spec = np.asarray(spec, np.float32)  # (n_mels, frames)
    spec = uniform_temporal_subsample(spec.T, 32, temporal_axis=0)  # (32, n_mels)
    spec = uniform_temporal_subsample(spec, 16, temporal_axis=1)  # (32, 16) T x F
    xs = [
        np.asarray(slow)[None],
        np.asarray(fast)[None],
        spec[None, :, None, :, None],
    ]

    model = models.create_audio_visual_slowfast(
        model_num_class=5,
        head_pool_kernel_sizes=((2, 1, 1), (8, 1, 1), (4, 1, 2)),
    )
    variables = model.init(jax.random.PRNGKey(0), xs, False)
    out = model.apply(variables, xs, False)
    assert out.shape == (1, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_audio_only_decode_native():
    """decode_video=False skips the video stream and returns audio alone
    (reference encoded_video.py:52, encoded_video_decord.py:77-79)."""
    with temp_encoded_video_with_audio(num_frames=20, fps=10) as (
        path,
        _,
        audio,
        rate,
    ):
        video = EncodedVideo.from_path(
            path, decoder="native", decode_audio=True, decode_video=False
        )
        assert video.duration == 2.0
        clip = video.get_clip(0, video.duration)
        assert clip["video"] is None
        got = clip["audio"]
        assert got is not None and got.dtype == np.float32
        n = min(len(got), len(audio))
        assert n >= len(audio) - 1024
        assert np.abs(got[:n] - audio[:n]).max() < 2e-4
        video.close()
        # audio-only with decode_audio=False is a config error
        with pytest.raises(ValueError):
            EncodedVideo.from_path(
                path, decoder="native", decode_audio=False, decode_video=False
            )


def test_labeled_video_dataset_audio_only(tmp_path):
    """decode_video=False end-to-end through the dataset: samples carry
    audio, video stays None, the retry loop does not treat it as a failed
    decode (reference labeled_video_dataset.py:36,143)."""
    import shutil

    from pytorchvideo_tpu.data import labeled_video_dataset
    from pytorchvideo_tpu.data.clip_sampling import make_clip_sampler
    from pytorchvideo_tpu.data.loader import BatchLoader

    with temp_encoded_video_with_audio(num_frames=20, fps=10) as (
        path,
        _,
        _audio,
        rate,
    ):
        vid = tmp_path / "a.avi"
        shutil.copy(path, vid)
        csv = tmp_path / "data.csv"
        csv.write_text(f"{vid} 5\n")

        def build():
            return labeled_video_dataset(
                str(csv),
                make_clip_sampler("uniform", 1.0),
                decode_audio=True,
                decode_video=False,
                decoder="native",
            )

        samples = list(iter(build()))
        assert len(samples) == 2  # 2s file, 1s uniform clips
        for s in samples:
            assert s["video"] is None
            assert s["label"] == 5
            assert len(s["audio"]) >= rate - 2048

        # parallel plan/load path agrees
        loader = BatchLoader(
            build(), batch_size=1, num_workers=2, collate_fn=lambda b: b,
            drop_last=False,
        )
        batches = [s for b in loader for s in b]
        assert len(batches) == 2
        assert all(s["video"] is None and s["audio"] is not None for s in batches)


def test_ego4d_audio_only_pathway(tmp_path):
    """Ego4d moments with decode_video=False: spectrogram pathway without
    video decode (reference ego4d_dataset.py audio-only usage)."""
    import json
    import shutil

    from pytorchvideo_tpu.data.ego4d.ego4d_dataset import Ego4dMomentsDataset

    with temp_encoded_video_with_audio(num_frames=40, fps=10) as (
        path,
        _,
        _audio,
        _rate,
    ):
        vid_path = str(tmp_path / "clip.avi")
        shutil.copy(path, vid_path)
    duration = 4.0
    metadata = {
        "videos": [
            {"video_uid": "v1", "duration_sec": duration,
             "manifold_path": vid_path}
        ]
    }
    annotations = {
        "videos": [
            {
                "video_uid": "v1",
                "split": "train",
                "clips": [
                    {
                        "clip_uid": "c1",
                        "video_start_sec": 0.0,
                        "video_end_sec": duration,
                        "annotations": [
                            {
                                "labels": [
                                    {
                                        "label": "cooking",
                                        "start_time": 0.0,
                                        "end_time": 2.0,
                                        "video_start_time": 0.0,
                                        "video_end_time": 2.0,
                                    }
                                ]
                            }
                        ],
                    }
                ],
            }
        ]
    }
    ann_path = tmp_path / "ann.json"
    meta_path = tmp_path / "meta.json"
    ann_path.write_text(json.dumps(annotations))
    meta_path.write_text(json.dumps(metadata))
    ds = Ego4dMomentsDataset(
        annotation_path=str(ann_path),
        metadata_path=str(meta_path),
        split="train",
        decode_audio=True,
        decode_video=False,
        decoder="native",
        window_sec=2,
        label_id_map={"cooking": 0},
    )
    sample = next(iter(ds))
    assert sample["video"] is None
    assert sample["labels_onehot"] == [1]
    assert sample["audio"]["signal"].ndim == 1
    assert sample["spectrogram"].ndim == 2
    assert np.isfinite(sample["spectrogram"]).all()
