"""Tests for HMDB51 / Charades / SSv2 / AVA / json datasets (synthetic)."""

import json
import os
import tempfile

import numpy as np
import pytest

from fixtures import temp_frame_video
from pytorchvideo_tpu.data import (
    Charades,
    Hmdb51LabeledVideoPaths,
    SSv2,
    SequentialSampler,
    TimeStampClipSampler,
    UntrimmedClipSampler,
    make_clip_sampler,
)
from pytorchvideo_tpu.data.ava import AvaLabeledVideoFramePaths
from pytorchvideo_tpu.data.clip_sampling import UniformClipSampler


def test_hmdb51_split_parsing(tmp_path):
    folds = tmp_path / "folds"
    folds.mkdir()
    (folds / "brush_hair_test_split1.txt").write_text(
        "v_a_f_cm_np1_le_goo_0.avi 1\nv_b_f_cm_np1_le_goo_1.avi 2\n"
    )
    (folds / "wave_test_split1.txt").write_text(
        "w_a_f_cm_np1_le_goo_0.avi 1\n"
    )
    train = Hmdb51LabeledVideoPaths.from_dir(str(folds), 1, "train")
    assert len(train) == 2
    path, info = train[0]
    assert path.startswith("brush_hair/")
    assert info["label"] == "brush_hair"
    assert len(info["meta_tags"]) == 5
    test = Hmdb51LabeledVideoPaths.from_dir(str(folds), 1, "test")
    assert len(test) == 1


def _write_frame_csv(path, video_frames):
    """video_frames: {video_name: [(frame_path, labels_str), ...]}"""
    with open(path, "w") as f:
        f.write("original_vido_id video_id frame_id path labels\n")
        for vid, (video_name, frames) in enumerate(video_frames.items()):
            for fid, (fpath, labels) in enumerate(frames):
                f.write(f"{video_name} {vid} {fid} {fpath} \"{labels}\"\n")


def test_charades_dataset():
    names = [f"{i:06d}.png" for i in range(8)]
    with temp_frame_video(names) as (dirname, data):
        csv_path = os.path.join(dirname, "charades.csv")
        frames = [(os.path.join(dirname, n), "0,5" if i < 4 else "7") for i, n in enumerate(names)]
        _write_frame_csv(csv_path, {"vid0": frames})
        ds = Charades(
            csv_path,
            make_clip_sampler("uniform", 8 / 30.0),
            video_sampler=SequentialSampler,
        )
        sample = next(iter(ds))
        assert sample["video"].shape[0] == 8
        assert sample["video_label"] == [0, 5, 7]
        assert sample["label"][0] == [0, 5]
        assert sample["label"][-1] == [7]


def test_ssv2_dataset():
    names = [f"{i:06d}.png" for i in range(10)]
    with temp_frame_video(names) as (dirname, data):
        csv_path = os.path.join(dirname, "frames.csv")
        frames = [(os.path.join(dirname, n), "") for n in names]
        _write_frame_csv(csv_path, {"vidA": frames})
        labels_json = os.path.join(dirname, "labels.json")
        with open(labels_json, "w") as f:
            json.dump({"Doing something": "17"}, f)
        videos_json = os.path.join(dirname, "videos.json")
        with open(videos_json, "w") as f:
            json.dump([{"id": "vidA", "template": "Doing [something]"}], f)
        ds = SSv2(
            labels_json,
            videos_json,
            csv_path,
            make_clip_sampler("constant_clips_per_video", 1.0, 1),
            video_sampler=SequentialSampler,
            frames_per_clip=4,
        )
        sample = next(iter(ds))
        assert sample["label"] == 17
        assert sample["video"].shape[0] == 4


def test_ava_label_parsing(tmp_path):
    frames_file = tmp_path / "frames.csv"
    lines = ["original_vido_id video_id frame_id path labels"]
    for i in range(5):
        lines.append(f"vidX 0 {i} vidX/frame_{i:04d}.jpg \"\"")
    frames_file.write_text("\n".join(lines) + "\n")

    labels_file = tmp_path / "labels.csv"
    labels_file.write_text(
        "vidX,902,0.1,0.1,0.5,0.5,12,0.9\n"
        "vidX,902,0.1,0.1,0.5,0.5,13,0.9\n"  # same box, second label
        "vidX,903,0.2,0.2,0.6,0.6,12,0.8\n"
        "vidX,100,0.2,0.2,0.6,0.6,12,0.8\n"  # out of valid range
    )
    paths = AvaLabeledVideoFramePaths.from_csv(
        str(frames_file), str(labels_file), str(tmp_path)
    )
    assert len(paths) == 2  # two valid keyframes
    dir0, info0 = paths[0]
    assert info0["labels"] == [[12, 13]]  # aggregated on same box
    assert info0["clip_index"] == 902 - 900

    # keyframe-centered sampling
    sampler = TimeStampClipSampler(UniformClipSampler(2.0))
    info = sampler(None, 100.0, {"clip_index": 10.0})
    assert float(info.clip_start_sec) == pytest.approx(9.0)
    assert float(info.clip_end_sec) == pytest.approx(11.0)


def test_ava_label_map(tmp_path):
    pbtxt = tmp_path / "map.pbtxt"
    pbtxt.write_text(
        'item {\n  name: "walk"\n  id: 1\n}\nitem {\n  name: "run"\n  id: 2\n}\n'
    )
    label_map, ids = AvaLabeledVideoFramePaths.read_label_map(str(pbtxt))
    assert label_map == {1: "walk", 2: "run"}
    assert ids == {1, 2}


def test_untrimmed_clip_sampler():
    inner = UniformClipSampler(1.0)
    s = UntrimmedClipSampler(inner)
    info = s(None, 100.0, {"clip_start_sec": 10.0, "clip_end_sec": 14.0})
    assert float(info.clip_start_sec) == pytest.approx(10.0)
    assert float(info.clip_end_sec) == pytest.approx(11.0)


def test_json_datasets(tmp_path):
    from pytorchvideo_tpu.data import clip_recognition_dataset, video_only_dataset

    ann = {
        "v1.mp4": {
            "benchmarks": {
                "forecasting_hands_objects": [
                    {
                        "critical_frame_selection_parent_start_sec": 1.0,
                        "critical_frame_selection_parent_end_sec": 3.0,
                        "taxonomy": {
                            "noun": "cup",
                            "verb": "lift",
                            "noun_unsure": False,
                            "verb_unsure": False,
                        },
                    },
                    {
                        "critical_frame_selection_parent_start_sec": 4.0,
                        "critical_frame_selection_parent_end_sec": 5.0,
                        "taxonomy": {
                            "noun": None,
                            "verb": "lift",
                            "noun_unsure": False,
                            "verb_unsure": False,
                        },
                    },
                ]
            }
        }
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    ds = clip_recognition_dataset(str(p), UniformClipSampler(1.0))
    assert ds.num_videos == 1  # the unsure/None entry is dropped
    ds2 = video_only_dataset(str(p), UniformClipSampler(1.0))
    assert ds2.num_videos == 1
