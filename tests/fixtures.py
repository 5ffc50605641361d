"""Synthetic video fixtures (reference test philosophy, tests/utils.py:23-92):
deterministic frames written losslessly so decoded tensors compare exactly.
"""

import contextlib
import os
import tempfile

import numpy as np


def create_dummy_video_frames(num_frames: int, height: int, width: int) -> np.ndarray:
    """Deterministic moving-gradient frames, uint8 (T, H, W, C)."""
    y, x = np.mgrid[0:height, 0:width]
    data = []
    for i in range(num_frames):
        frame = ((x + y + i * 8) % 255).astype(np.uint8)
        data.append(np.stack([frame, 255 - frame, np.full_like(frame, i * 10 % 255)], -1))
    return np.stack(data)


@contextlib.contextmanager
def temp_encoded_video(num_frames: int, fps: int, height=32, width=32):
    """Lossless FFV1/AVI video (the reference uses libx264rgb crf=0,
    tests/utils.py:43-57) so decoded frames == source frames exactly."""
    import cv2

    data = create_dummy_video_frames(num_frames, height, width)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "video.avi")
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"FFV1"), fps, (width, height)
        )
        assert writer.isOpened()
        for frame in data:
            writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        writer.release()
        yield path, data.astype(np.float32)


@contextlib.contextmanager
def temp_encoded_video_with_audio(
    num_frames: int, fps: int, height=32, width=32, audio_rate=16000,
    audio_hz=440.0,
):
    """A/V container via the native muxer (reference
    tests/utils.py:60-78 writes these with PyAV): lossless FFV1 video +
    pcm_s16le mono sine-wave audio, so both modalities round-trip
    near-exactly. Yields (path, frames_f32, audio_f32, audio_rate)."""
    from pytorchvideo_tpu.data.encoded_video_native import mux_av

    data = create_dummy_video_frames(num_frames, height, width)
    dur = num_frames / fps
    t = np.arange(int(round(dur * audio_rate))) / audio_rate
    audio = (0.5 * np.sin(2 * np.pi * audio_hz * t)).astype(np.float32)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "video_av.avi")
        mux_av(path, data, fps, audio, audio_rate)
        yield path, data.astype(np.float32), audio, audio_rate


@contextlib.contextmanager
def temp_frame_video(frame_names, height=10, width=10):
    """PNG frame directory (reference tests/utils.py:81-92)."""
    import cv2

    data = create_dummy_video_frames(len(frame_names), height, width)
    with tempfile.TemporaryDirectory() as tmp:
        for i, name in enumerate(frame_names):
            cv2.imwrite(
                os.path.join(tmp, name),
                cv2.cvtColor(data[i], cv2.COLOR_RGB2BGR),
            )
        yield tmp, data.astype(np.float32)
