"""Native C++ decoder: exact parity with the OpenCV backend + lossless source."""

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
