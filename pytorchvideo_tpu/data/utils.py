"""Data utilities.

Parity: pytorchvideo/data/utils.py — thwc_to_cthw :26, secs_to_pts/pts_to_secs
:34-58, export_video_array :71, MultiProcessSampler :169,
optional_threaded_foreach :208, DataclassFieldCaster :241, csv helpers
:315-388. Our native clip layout is already THWC, so the converters exist for
interop with CTHW consumers.
"""

from __future__ import annotations

import csv
import itertools
import logging
import math
from concurrent.futures import ThreadPoolExecutor
from dataclasses import Field, field as dataclass_field, fields as dataclass_fields
from fractions import Fraction
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def thwc_to_cthw(data: np.ndarray) -> np.ndarray:
    """(T, H, W, C) -> (C, T, H, W)."""
    return np.transpose(data, (3, 0, 1, 2))


def cthw_to_thwc(data: np.ndarray) -> np.ndarray:
    """(C, T, H, W) -> (T, H, W, C)."""
    return np.transpose(data, (1, 2, 3, 0))


def secs_to_pts(
    time_in_seconds: float,
    time_base: float,
    start_pts: int,
    round_mode: str = "floor",
) -> int:
    """Seconds -> presentation timestamp (reference data/utils.py:34-50)."""
    if time_in_seconds == math.inf:
        return math.inf
    assert round_mode in ("floor", "ceil"), f"round_mode={round_mode} unsupported"
    if round_mode == "floor":
        return math.floor(time_in_seconds / time_base) + start_pts
    return math.ceil(time_in_seconds / time_base) + start_pts


def pts_to_secs(pts: int, time_base: float, start_pts: int) -> float:
    """PTS -> seconds (reference data/utils.py:53-58)."""
    if pts == math.inf:
        return math.inf
    return int(pts - start_pts) * time_base


def export_video_array(
    video: np.ndarray,
    output_path: str,
    rate: float,
    layout: str = "THWC",
    fourcc: str = "FFV1",
    audio: Optional[np.ndarray] = None,
    audio_rate: int = 0,
) -> None:
    """Write a uint8 video array to disk (the reference uses PyAV;
    FFV1-in-AVI gives the same lossless-fixture property as its libx264rgb
    crf=0 path, reference tests/utils.py:43-57). With ``audio`` (mono float32
    in [-1, 1] at ``audio_rate``), the native muxer writes an A/V container
    (FFV1 + pcm_s16le — reference tests/utils.py:60-78 role)."""
    assert layout in ("THWC", "CTHW")
    if layout == "CTHW":
        video = cthw_to_thwc(video)
    if audio is not None:
        from pytorchvideo_tpu.data.encoded_video_native import mux_av

        mux_av(output_path, video.astype(np.uint8), rate, audio, audio_rate)
        return
    import cv2

    t, h, w, c = video.shape
    writer = cv2.VideoWriter(
        str(output_path), cv2.VideoWriter_fourcc(*fourcc), rate, (w, h)
    )
    assert writer.isOpened(), f"could not open writer for {output_path}"
    for frame in video:
        writer.write(cv2.cvtColor(frame.astype(np.uint8), cv2.COLOR_RGB2BGR))
    writer.release()


def _torch_worker_info():
    try:
        import torch.utils.data as tud

        return tud.get_worker_info()
    except Exception:
        return None


class MultiProcessSampler:
    """Split a sampler's iteration range among dataloader workers.

    Mirrors reference data/utils.py:169-205: worker i owns the i-th
    contiguous chunk of the sampler's indices; workers beyond the number of
    chunks get nothing.
    """

    def __init__(self, sampler):
        self._sampler = sampler

    def __iter__(self):
        worker_info = _torch_worker_info()
        if worker_info is not None and worker_info.num_workers != 0:
            num_workers = int(worker_info.num_workers)
            worker_id = int(worker_info.id)
            splits = np.linspace(0, len(self._sampler), num_workers + 1).astype(
                np.int64
            )
            start, end = splits[worker_id], splits[worker_id + 1]
            if end <= start:
                logger.warning(
                    "More workers than videos: worker %d starved", worker_id
                )
                return iter(())
            return itertools.islice(iter(self._sampler), int(start), int(end))
        return iter(self._sampler)


def optional_threaded_foreach(
    target: Callable, args_iterable: Iterable[Tuple], multithreaded: bool
):
    """Run target over args, optionally in a thread pool
    (reference data/utils.py:208-238)."""
    if multithreaded:
        with ThreadPoolExecutor() as pool:
            futures = [pool.submit(target, *args) for args in args_iterable]
            for f in futures:
                f.result()
    else:
        for args in args_iterable:
            target(*args)


class DataclassFieldCaster:
    """Dataclass mixin that casts constructor args to annotated types
    (reference data/utils.py:241-312). Supports the
    ``complex_initialized_dataclass_field`` pattern."""

    COMPLEX_INITIALIZER = "DataclassFieldCaster__complex_initializer"

    def __post_init__(self) -> None:
        import typing

        hints = typing.get_type_hints(type(self))
        for f in dataclass_fields(self):
            value = getattr(self, f.name)
            ftype = hints.get(f.name, f.type)
            if (
                self.COMPLEX_INITIALIZER in f.metadata
                and f.metadata[self.COMPLEX_INITIALIZER] is not None
            ):
                setattr(self, f.name, f.metadata[self.COMPLEX_INITIALIZER](value))
            elif isinstance(ftype, type) and not isinstance(value, ftype):
                try:
                    setattr(self, f.name, ftype(value))
                except Exception:
                    pass


def complex_initialized_dataclass_field(initializer: Callable, **kwargs) -> Field:
    """Field whose value is produced by ``initializer(raw_value)``."""
    metadata = kwargs.pop("metadata", {})
    metadata[DataclassFieldCaster.COMPLEX_INITIALIZER] = initializer
    return dataclass_field(metadata=metadata, **kwargs)


def load_dataclass_dict_from_csv(
    input_csv_file_path: str,
    dataclass_class: type,
    dict_key_field: str,
    list_per_key: bool = False,
) -> Dict[Any, Any]:
    """CSV rows -> {key: dataclass or [dataclass]} (reference data/utils.py:315-360)."""
    out: Dict[Any, Any] = {}
    with open(input_csv_file_path) as f:
        reader = csv.reader(f, delimiter=",")
        columns = next(reader)
        assert len(columns) == len(dataclass_fields(dataclass_class))
        for line in reader:
            datum = dataclass_class(*line)
            key = getattr(datum, dict_key_field)
            if list_per_key:
                out.setdefault(key, []).append(datum)
            else:
                assert key not in out, f"duplicate key {key}"
                out[key] = datum
    return out


def save_dataclass_objs_to_headered_csv(dataclass_objs: List, file_name: str):
    """Reference data/utils.py:363-388."""
    assert dataclass_objs
    cls = type(dataclass_objs[0])
    field_names = [f.name for f in dataclass_fields(cls)]
    with open(file_name, "w") as f:
        writer = csv.writer(f, delimiter=",")
        writer.writerow(field_names)
        for obj in dataclass_objs:
            writer.writerow([getattr(obj, name) for name in field_names])


def get_logger(name: str):
    """INFO-level stdout logger (reference data/utils.py:390-400)."""
    import logging
    import sys

    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if not logger.hasHandlers():
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(
            logging.Formatter(
                "[%(asctime)s] %(levelname)s %(message)s \t[%(filename)s.%(funcName)s:%(lineno)d]",  # noqa
                datefmt="%y%m%d %H:%M:%S",
            )
        )
        logger.addHandler(sh)
    return logger
