"""Kinetics dataset: alias of labeled_video_dataset
(reference pytorchvideo/data/kinetics.py:17)."""

from pytorchvideo_tpu.data.labeled_video_dataset import labeled_video_dataset

Kinetics = labeled_video_dataset
