"""Ego4d moments dataset (video + optional audio spectrogram + IMU).

Parity: pytorchvideo/data/ego4d/ego4d_dataset.py (Ego4dImuData :38-147,
Ego4dMomentsDataset :149-625). Moments annotations json -> per-label clip
samples fed through LabeledVideoDataset with a fixed-window clip sampler;
IMU windows come from per-video csvs; audio becomes a (mel)spectrogram
(numpy STFT — the reference uses torchaudio).
"""

from __future__ import annotations

import csv
import json
import logging
import os
from bisect import bisect_left
from collections import defaultdict
from typing import Any, Callable, Dict, List, Optional, Set, Tuple, Type

import numpy as np

from pytorchvideo_tpu.data.clip_sampling import ClipSampler
from pytorchvideo_tpu.data.ego4d.utils import (
    Ego4dImuDataBase,
    MomentsClipSampler,
    get_label_id_map,
)
from pytorchvideo_tpu.data.labeled_video_dataset import LabeledVideoDataset
from pytorchvideo_tpu.data.samplers import SequentialSampler

log = logging.getLogger("Ego4dMomentsDataset")


class Ego4dImuData(Ego4dImuDataBase):
    """One IMU csv per video_uid: accl/gyro xyz + canonical timestamps."""

    def __init__(self, imu_path: str) -> None:
        super().__init__(imu_path)
        assert imu_path
        self.path_imu = imu_path
        self.IMU_by_video_uid: Dict[str, Any] = {}
        for f in os.listdir(self.path_imu):
            self.IMU_by_video_uid[f.split(".")[0]] = f.replace(".csv", "")
        self.imu_video_uid: Optional[str] = None
        self.imu_video_data = None

    def has_imu(self, video_uid: str) -> bool:
        return video_uid in self.IMU_by_video_uid

    def _load_imu(self, video_uid: str) -> Tuple[np.ndarray, np.ndarray, int]:
        file_path = os.path.join(self.path_imu, video_uid) + ".csv"
        data_IMU = defaultdict(list)
        with open(file_path, "r") as f:
            for row in csv.DictReader(f):
                for k, v in row.items():
                    data_IMU[k].append(float(v) if v != "" else 0.0)
        signal = np.array(
            [
                data_IMU["accl_x"],
                data_IMU["accl_y"],
                data_IMU["accl_z"],
                data_IMU["gyro_x"],
                data_IMU["gyro_y"],
                data_IMU["gyro_z"],
            ]
        ).transpose()
        signal = (signal - signal.mean(axis=0)) / signal.std(axis=0)
        timestamps = np.array(data_IMU["canonical_timestamp_ms"])
        sampling_rate = int(1000 / np.mean(np.diff(timestamps)))
        if sampling_rate < 0:
            # some devices report broken timestamps; rebuild at 198 Hz
            timestamps = timestamps[0] + (1000 / 198) * np.arange(len(timestamps))
            sampling_rate = int(1000 / np.mean(np.diff(timestamps)))
        return signal, timestamps, sampling_rate

    def get_imu(self, video_uid: str):
        return self._load_imu(video_uid)

    def get_imu_sample(
        self, video_uid: str, video_start: float, video_end: float
    ) -> Dict[str, Any]:
        if not self.imu_video_uid or video_uid != self.imu_video_uid:
            self.imu_video_uid = video_uid
            self.imu_video_data = self._load_imu(video_uid)
        signal, timestamps, sampling_rate = self.imu_video_data
        start_id = bisect_left(timestamps, video_start * 1000)
        end_id = bisect_left(timestamps, video_end * 1000)
        if end_id == len(timestamps):
            end_id -= 1
        return {
            "timestamp": timestamps[start_id:end_id],
            "signal": signal[start_id:end_id],
            "sampling_rate": sampling_rate,
        }


def _stft_mag(waveform: np.ndarray, n_fft: int, hop_length: int) -> np.ndarray:
    """|STFT| with a Hann window ((freq_bins, frames))."""
    window = np.hanning(n_fft)
    num_frames = 1 + max(0, (len(waveform) - n_fft) // hop_length)
    frames = np.stack(
        [
            waveform[i * hop_length : i * hop_length + n_fft] * window
            for i in range(num_frames)
        ]
    )
    return np.abs(np.fft.rfft(frames, axis=-1)).T


def _mel_filterbank(sample_rate: int, n_fft: int, n_mels: int) -> np.ndarray:
    """HTK mel filterbank ((n_mels, n_fft//2+1))."""

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mel_points = np.linspace(0, hz_to_mel(sample_rate / 2), n_mels + 2)
    hz_points = mel_to_hz(mel_points)
    bins = np.floor((n_fft + 1) * hz_points / sample_rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        l, c, r = bins[m - 1], bins[m], bins[m + 1]
        for k in range(l, c):
            if c > l:
                fb[m - 1, k] = (k - l) / (c - l)
        for k in range(c, r):
            if r > c:
                fb[m - 1, k] = (r - k) / (r - c)
    return fb


def signal_transform(
    type: str = "spectrogram", sample_rate: int = 48000
) -> Callable[[np.ndarray], np.ndarray]:
    """Audio -> spectrogram/melspectrogram/mfcc
    (reference ego4d_dataset.py:544-597, torchaudio-equivalent shapes)."""
    n_fft = 1024
    hop_length = 512
    n_mels = 256

    def spectrogram(w):
        return _stft_mag(np.asarray(w).reshape(-1), n_fft, hop_length) ** 2

    if type == "spectrogram":
        return spectrogram
    if type == "melspectrogram":
        fb = _mel_filterbank(sample_rate, n_fft, n_mels)
        return lambda w: fb @ spectrogram(w)
    if type == "mfcc":
        fb = _mel_filterbank(sample_rate, n_fft, n_mels)

        def mfcc(w):
            mel = np.log(fb @ spectrogram(w) + 1e-6)
            # DCT-II over mel axis
            n = mel.shape[0]
            basis = np.cos(
                np.pi / n * (np.arange(n)[:, None] + 0.5) * np.arange(n)[None, :]
            )
            return basis.T @ mel

        return mfcc
    raise ValueError(type)


class Ego4dMomentsDataset(LabeledVideoDataset):
    """Moments benchmark dataset: one sample per (clip, label span)."""

    VIDEO_FPS = 30
    AUDIO_FPS = 48000

    def __init__(
        self,
        annotation_path: str,
        metadata_path: str,
        split: Optional[str] = None,
        decode_audio: bool = False,
        decode_video: bool = True,
        imu: bool = False,
        clip_sampler: Optional[ClipSampler] = None,
        video_sampler: Type = SequentialSampler,
        transform: Optional[Callable[[Dict[str, Any]], Dict[str, Any]]] = None,
        decoder: str = "opencv",
        filtered_labels: Optional[List[str]] = None,
        window_sec: int = 10,
        audio_transform_type: str = "melspectrogram",
        imu_path: Optional[str] = None,
        label_id_map: Optional[Dict[str, int]] = None,
        label_id_map_path: Optional[str] = None,
        video_path_override: Optional[Callable[[str], str]] = None,
        eligible_video_uids: Optional[Set[str]] = None,
    ) -> None:
        assert annotation_path and metadata_path
        assert split in ("train", "val", "test"), f"bad split {split}"
        self.split = split
        self.training = split == "train"
        self.window_sec = window_sec
        self._transform_source = transform
        self.decode_audio_flag = decode_audio
        self.audio_transform_type = audio_transform_type
        assert (label_id_map is not None) ^ (label_id_map_path is not None)

        with open(metadata_path, "r") as f:
            metadata = json.load(f)
        self.video_metadata_map = {x["video_uid"]: x for x in metadata["videos"]}
        with open(annotation_path, "r") as f:
            moments_annotations = json.load(f)

        self.label_name_id_map = (
            label_id_map if label_id_map else get_label_id_map(label_id_map_path)
        )
        self.num_classes = len(self.label_name_id_map)

        self.imu_data: Optional[Ego4dImuDataBase] = None
        if imu:
            assert imu_path, "imu_path not provided"
            self.imu_data = Ego4dImuData(imu_path)

        samples = []
        for vid in moments_annotations["videos"]:
            video_uid = vid["video_uid"]
            if split and vid["split"] != split:
                continue
            if self.imu_data and not self.imu_data.has_imu(video_uid):
                continue
            if eligible_video_uids and video_uid not in eligible_video_uids:
                continue
            for clip in vid["clips"]:
                clip_uid = clip["clip_uid"]
                for vann in clip["annotations"]:
                    for lann in vann["labels"]:
                        label = lann["label"]
                        if lann["start_time"] == lann["end_time"]:
                            continue
                        if filtered_labels and label not in filtered_labels:
                            continue
                        meta = self.video_metadata_map[video_uid]
                        if meta.get("is_stereo"):
                            continue
                        video_path = (
                            video_path_override(video_uid)
                            if video_path_override
                            else meta.get("manifold_path")
                        )
                        if not video_path:
                            continue
                        if label not in self.label_name_id_map:
                            continue
                        samples.append(
                            {
                                "clip_uid": clip_uid,
                                "video_uid": video_uid,
                                "duration": meta["duration_sec"],
                                "clip_video_start_sec": clip["video_start_sec"],
                                "clip_video_end_sec": clip["video_end_sec"],
                                "labels": [label],
                                "label_video_start_sec": lann["video_start_time"],
                                "label_video_end_sec": lann["video_end_time"],
                                "video_path": video_path,
                                "labels_id": self.label_name_id_map[label],
                            }
                        )
        self.cnt_samples = len(samples)
        log.info("Loaded %d ego4d moment samples", self.cnt_samples)

        if not clip_sampler:
            clip_sampler = MomentsClipSampler(self.window_sec)
        super().__init__(
            [(x["video_path"], x) for x in samples],
            clip_sampler,
            video_sampler,
            transform=self._transform_mm,
            decode_audio=decode_audio,
            decode_video=decode_video,
            decoder=decoder,
        )

    def convert_one_hot(self, label_list: List[str]) -> List[int]:
        one_hot = [0] * self.num_classes
        for lab in label_list:
            one_hot[self.label_name_id_map[lab]] = 1
        return one_hot

    def check_IMU(self, input_dict: Dict[str, Any]) -> bool:
        sig = input_dict["imu"]["signal"]
        return (
            sig.ndim != 2 or sig.shape[0] < 200 or sig.shape[1] != 6
        )

    def _transform_mm(self, sample_dict: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        video_uid = sample_dict["video_uid"]
        assert sample_dict["video"] is not None or not self._decode_video
        start = sample_dict["clip_start"]
        end = sample_dict["clip_end"]
        assert start >= 0 and end >= start
        if self.imu_data:
            sample_dict["imu"] = self.imu_data.get_imu_sample(video_uid, start, end)
            if self.check_IMU(sample_dict):
                log.warning("Bad IMU sample: ignoring: %s", video_uid)
                return None
        if self.decode_audio_flag and sample_dict.get("audio") is not None:
            audio = np.asarray(sample_dict["audio"])
            sample_dict["audio"] = {
                "signal": audio,
                "spectrogram": signal_transform(
                    self.audio_transform_type, self.AUDIO_FPS
                )(audio),
                "sampling_rate": self.AUDIO_FPS,
            }
            sample_dict["spectrogram"] = sample_dict["audio"]["spectrogram"]
        sample_dict["labels_onehot"] = self.convert_one_hot(sample_dict["labels"])
        if self._transform_source:
            sample_dict = self._transform_source(sample_dict)
        return sample_dict
