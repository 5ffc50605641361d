"""Tests for manifest datasets: EpicKitchen (base/recognition/forecasting),
DoMSEV, Ego4d moments utilities."""

import json
import os

import numpy as np
import pytest

from fixtures import temp_frame_video
from pytorchvideo_tpu.data import (
    ActionData,
    DomsevFrameDataset,
    DomsevVideoDataset,
    EpicKitchenDataset,
    EpicKitchenForecasting,
    EpicKitchenRecognition,
)
from pytorchvideo_tpu.data.dataset_manifest_utils import (
    VideoClipInfo,
    VideoDatasetType,
    get_seconds_from_hms_time,
)
from pytorchvideo_tpu.data.ego4d import MomentsClipSampler, check_window_len, signal_transform


def _write_manifests(dirname, n_frames, fps=6.0, video_id="vid1"):
    """Write frame video dir + VideoInfo/VideoFrameInfo manifests."""
    frames_dir = dirname
    video_info_csv = os.path.join(dirname, "video_info.csv")
    with open(video_info_csv, "w") as f:
        f.write("video_id,resolution,duration,fps\n")
        f.write(f"{video_id},10x10,{n_frames / fps},{fps}\n")
    frame_manifest_csv = os.path.join(dirname, "frames.csv")
    with open(frame_manifest_csv, "w") as f:
        f.write(
            "video_id,location,frame_file_stem,frame_string_length,"
            "min_frame_number,max_frame_number,file_extension\n"
        )
        f.write(f"{video_id},{frames_dir},frame_,12,0,{n_frames - 1},png\n")
    return video_info_csv, frame_manifest_csv


def test_hms_time():
    assert get_seconds_from_hms_time("00:01:30") == 90.0
    assert get_seconds_from_hms_time("01:00:00.5") == 3600.5
    with pytest.raises(ValueError):
        get_seconds_from_hms_time("bogus")


def _actions_csv(dirname, video_id="vid1"):
    path = os.path.join(dirname, "actions.csv")
    cols = (
        "participant_id,video_id,narration,start_timestamp,stop_timestamp,"
        "start_frame,stop_frame,verb,verb_class,noun,noun_class,"
        "all_nouns,all_noun_classes\n"
    )
    with open(path, "w") as f:
        f.write(cols)
        f.write(
            f'P1,{video_id},open door,00:00:00,00:00:01,0,6,open,1,door,2,'
            f'"[\'door\']","[2]"\n'
        )
        f.write(
            f'P1,{video_id},close door,00:00:01,00:00:02,6,11,close,3,door,2,'
            f'"[\'door\']","[2]"\n'
        )
    return path


def test_epic_kitchen_dataset():
    names = [f"frame_{i:06d}.png" for i in range(12)]
    with temp_frame_video(names) as (dirname, data):
        video_info_csv, frame_csv = _write_manifests(dirname, 12)
        actions_csv = _actions_csv(dirname)

        def sampler(videos, actions):
            return [VideoClipInfo("vid1", 0.0, 1.0)]

        ds = EpicKitchenDataset(
            video_info_file_path=video_info_csv,
            actions_file_path=actions_csv,
            clip_sampler=sampler,
            video_data_manifest_file_path=frame_csv,
            dataset_type=VideoDatasetType.Frame,
            multithreaded_io=False,
        )
        assert len(ds) == 1
        clip = ds[0]
        assert clip["video"].shape[0] == 6  # 1 sec @ 6 fps
        assert len(clip["actions"]) == 2
        assert clip["actions"][0].start_time == 0.0
        assert clip["actions"][0].all_nouns == ["door"]


def test_epic_kitchen_recognition():
    names = [f"frame_{i:06d}.png" for i in range(12)]
    with temp_frame_video(names) as (dirname, data):
        video_info_csv, frame_csv = _write_manifests(dirname, 12)
        actions_csv = _actions_csv(dirname)
        ds = EpicKitchenRecognition(
            video_info_file_path=video_info_csv,
            actions_file_path=actions_csv,
            video_data_manifest_file_path=frame_csv,
            seconds_per_clip=1.0,
            frames_per_clip=3,
            multithreaded_io=False,
            rng=np.random.default_rng(0),
        )
        assert len(ds) >= 1
        clip = ds[0]
        assert clip["video"].shape[0] == 3
        # actions pruned to overlapping window
        for a in clip["actions"]:
            assert a.start_time <= clip["stop_time"]


def test_epic_kitchen_forecasting():
    names = [f"frame_{i:06d}.png" for i in range(12)]
    with temp_frame_video(names) as (dirname, data):
        video_info_csv, frame_csv = _write_manifests(dirname, 12)
        # action 0 at [1.0, 1.5] (full 1s input window fits before its end);
        # action 1 starts after action 0 stops -> forecastable
        actions_csv = os.path.join(dirname, "actions_fc.csv")
        with open(actions_csv, "w") as f:
            f.write(
                "participant_id,video_id,narration,start_timestamp,"
                "stop_timestamp,start_frame,stop_frame,verb,verb_class,noun,"
                "noun_class,all_nouns,all_noun_classes\n"
            )
            f.write(
                'P1,vid1,open door,00:00:01,00:00:01.5,6,9,open,1,door,2,'
                '"[\'door\']","[2]"\n'
            )
            f.write(
                'P1,vid1,close door,00:00:01.75,00:00:02,10,11,close,3,door,2,'
                '"[\'door\']","[2]"\n'
            )
        ds = EpicKitchenForecasting(
            video_info_file_path=video_info_csv,
            actions_file_path=actions_csv,
            video_data_manifest_file_path=frame_csv,
            seconds_per_clip=0.5,
            clip_time_stride=0.5,
            num_input_clips=2,
            frames_per_clip=3,
            num_forecast_actions=1,
            multithreaded_io=False,
        )
        assert len(ds) == 1  # window ending at action-0 stop, forecasting action 1
        clip = ds[0]
        assert clip["video"].shape[0] == 2  # num_input_clips
        assert clip["video"].shape[1] == 3  # frames per subclip
        assert len(clip["actions"]) == 1
        assert clip["actions"][0].verb == "close"


def _domsev_labels_csv(dirname, video_id="vid1"):
    path = os.path.join(dirname, "labels.csv")
    with open(path, "w") as f:
        f.write(
            "video_id,start_time,stop_time,start_frame,stop_frame,"
            "label_id,label_name\n"
        )
        f.write(f"{video_id},0.0,1.0,0,5,7,walking\n")
        f.write(f"{video_id},1.0,2.0,6,11,8,eating\n")
    return path


def test_domsev_datasets():
    names = [f"frame_{i:06d}.png" for i in range(12)]
    with temp_frame_video(names) as (dirname, data):
        video_info_csv, frame_csv = _write_manifests(dirname, 12)
        labels_csv = _domsev_labels_csv(dirname)

        frame_ds = DomsevFrameDataset(
            video_data_manifest_file_path=frame_csv,
            video_info_file_path=video_info_csv,
            labels_file_path=labels_csv,
            rng=np.random.default_rng(0),
        )
        assert len(frame_ds) == 12
        item = frame_ds[0]
        assert item["image"].shape == (10, 10, 3)
        assert item["label"] in (7, 8)

        def sampler(videos, labels):
            return [VideoClipInfo("vid1", 0.0, 2.0)]

        video_ds = DomsevVideoDataset(
            video_data_manifest_file_path=frame_csv,
            video_info_file_path=video_info_csv,
            labels_file_path=labels_csv,
            clip_sampler=sampler,
            frames_per_second=6,
        )
        clip = video_ds[0]
        assert clip["video"].shape[0] == 12
        assert 7 in clip["labels"] and 8 in clip["labels"]


def test_moments_clip_sampler_and_window():
    s, e = check_window_len(5.0, 6.0, 4.0, 100.0)
    assert e - s == pytest.approx(4.0)
    s, e = check_window_len(0.2, 0.4, 4.0, 100.0)
    assert s == 0.0 and e == pytest.approx(4.0)
    s, e = check_window_len(99.0, 99.5, 4.0, 100.0)
    assert e == pytest.approx(100.0, abs=0.3) and e - s == pytest.approx(4.0)

    sampler = MomentsClipSampler(window_sec=4.0)
    ann = {"label_video_start_sec": 10.0, "label_video_end_sec": 11.0}
    info = sampler(None, 100.0, ann)
    assert float(info.clip_end_sec - info.clip_start_sec) == pytest.approx(4.0)
    assert ann["clip_start"] == info.clip_start_sec


def test_signal_transforms():
    wave = np.sin(np.linspace(0, 1000, 48000)).astype(np.float32)
    spec = signal_transform("spectrogram", 48000)(wave)
    assert spec.shape[0] == 513
    mel = signal_transform("melspectrogram", 48000)(wave)
    assert mel.shape[0] == 256
    mfcc = signal_transform("mfcc", 48000)(wave)
    assert mfcc.shape[0] == 256


def test_epic_kitchen_manifest_builders_and_save(tmp_path):
    """Manifest builders walk flat/nested/encoded layouts; save round-trips
    through the headered-csv loader (reference epic_kitchen/utils.py:10-199,
    dataset_manifest_utils.py:269-314)."""
    import os

    from pytorchvideo_tpu.data.dataset_manifest_utils import (
        EncodedVideoInfo,
        VideoFrameInfo,
        save_encoded_video_manifest,
        save_video_frame_info,
    )
    from pytorchvideo_tpu.data.epic_kitchen import (
        build_encoded_manifest_from_nested_directory,
        build_frame_manifest_from_flat_directory,
        build_frame_manifest_from_nested_directory,
    )
    from pytorchvideo_tpu.data.utils import load_dataclass_dict_from_csv

    flat = tmp_path / "flat" / "vid1"
    nested = tmp_path / "nested" / "P01"
    enc = tmp_path / "enc" / "P01"
    for d in (flat, nested, enc):
        os.makedirs(d)
    for i in range(1, 4):
        (flat / f"frame_{i:010d}.jpg").touch()
        (nested / f"P01_01_{i:010d}.jpg").touch()
    (enc / "P01_01.MP4").touch()

    vf = build_frame_manifest_from_flat_directory(str(tmp_path / "flat"), True)
    assert vf["vid1"].min_frame_number == 1
    assert vf["vid1"].max_frame_number == 3
    assert vf["vid1"].frame_file_stem == "frame_"

    vn = build_frame_manifest_from_nested_directory(
        str(tmp_path / "nested"), False
    )
    assert vn["P01_01"].max_frame_number == 3
    assert vn["P01_01"].frame_file_stem == "P01_01_"

    ev = build_encoded_manifest_from_nested_directory(str(tmp_path / "enc"))
    assert ev["P01_01"].file_path.endswith("P01_01.MP4")

    p1 = save_video_frame_info(vn, str(tmp_path / "vf.csv"))
    p2 = save_encoded_video_manifest(ev, str(tmp_path / "ev.csv"))
    assert load_dataclass_dict_from_csv(p1, VideoFrameInfo, "video_id") == vn
    assert load_dataclass_dict_from_csv(p2, EncodedVideoInfo, "video_id") == ev
