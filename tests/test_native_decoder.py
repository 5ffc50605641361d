"""Native C++ decoder: exact parity with the OpenCV backend + lossless source."""

import os
import numpy as np
import pytest

from fixtures import temp_encoded_video
from pytorchvideo_tpu.data import EncodedVideo
from pytorchvideo_tpu.data.encoded_video_native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="libpvt_decode.so not built"
)


def test_native_exact_decode():
    with temp_encoded_video(num_frames=10, fps=5) as (path, data):
        video = EncodedVideo.from_path(path, decoder="native")
        assert video.duration == pytest.approx(2.0)
        clip = video.get_clip(0, 2.0)
        np.testing.assert_array_equal(clip["video"], data)
        video.close()


def test_native_seek_decode():
    with temp_encoded_video(num_frames=30, fps=10) as (path, data):
        video = EncodedVideo.from_path(path, decoder="native")
        clip = video.get_clip(1.0, 2.0)
        np.testing.assert_array_equal(clip["video"], data[10:20])
        # backward seek
        clip0 = video.get_clip(0.0, 0.5)
        np.testing.assert_array_equal(clip0["video"], data[:5])
        video.close()


def test_native_out_of_range():
    with temp_encoded_video(num_frames=10, fps=5) as (path, _):
        video = EncodedVideo.from_path(path, decoder="native")
        assert video.get_clip(5.0, 6.0)["video"] is None
        video.close()


def test_native_matches_opencv():
    with temp_encoded_video(num_frames=16, fps=8, height=40, width=56) as (
        path,
        _,
    ):
        vn = EncodedVideo.from_path(path, decoder="native")
        vo = EncodedVideo.from_path(path, decoder="opencv")
        a = vn.get_clip(0.5, 1.5)["video"]
        b = vo.get_clip(0.5, 1.5)["video"]
        np.testing.assert_array_equal(a, b)
        vn.close()
        vo.close()


def test_native_pipeline_decode_and_scale(tmp_path):
    """C++ worker-pool pipeline: parallel clip decode + in-native rescale;
    results match the single-handle decoder (native/pipeline.cc)."""
    from pytorchvideo_tpu.data import native_pipeline

    if not native_pipeline.is_available():
        pytest.skip("libpvt_decode.so not built")

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import temp_encoded_video

    with temp_encoded_video(num_frames=12, fps=6, height=24, width=32) as (
        path,
        data,
    ):
        reqs = [(path, 0, 4), (path, 4, 8), (path, 8, 12), (path, 2, 6)]
        got = {}
        for idx, clip in native_pipeline.iter_decoded_clips(
            reqs, num_threads=3, capacity=2
        ):
            got[idx] = clip
        assert set(got) == {0, 1, 2, 3}
        for idx, (p, s, e) in enumerate(reqs):
            assert got[idx] is not None
            assert got[idx].shape == (e - s, 24, 32, 3)
            np.testing.assert_array_equal(got[idx], data[s:e])

        # rescale path: half resolution, bilinear
        with native_pipeline.NativeDecodePipeline(num_threads=2) as pipe:
            pipe.submit(7, path, 0, 3, out_h=12, out_w=16)
            rid, clip = pipe.wait()
            assert rid == 7 and clip.shape == (3, 12, 16, 3)
            # downscaled content stays close to a cv2 bilinear reference
            import cv2

            ref = np.stack(
                [
                    cv2.resize(f, (16, 12), interpolation=cv2.INTER_LINEAR)
                    for f in data[:3]
                ]
            )
            assert np.mean(np.abs(clip.astype(int) - ref.astype(int))) < 8.0

        # failure path: bogus file -> (id, None)
        bad = str(tmp_path / "nope.mp4")
        open(bad, "wb").write(b"not a video")
        with native_pipeline.NativeDecodePipeline(num_threads=1) as pipe:
            pipe.submit(9, bad, 0, 2)
            rid, clip = pipe.wait()
            assert rid == 9 and clip is None
