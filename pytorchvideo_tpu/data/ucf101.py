"""UCF101 dataset: alias of labeled_video_dataset
(reference pytorchvideo/data/ucf101.py:17)."""

from pytorchvideo_tpu.data.labeled_video_dataset import labeled_video_dataset

Ucf101 = labeled_video_dataset
