"""Trainer config system (dataclass tier).

The reference trainer uses Hydra/OmegaConf structured configs
(pytorchvideo_trainer/train_app.py:229-253, conf/ yaml tree). Here configs
are plain dataclasses — constructible from nested dicts (yaml-loadable) and
serializable back, without a config-framework dependency.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

from pytorchvideo_tpu.train.lr_policy import LRSchedulerConfig
from pytorchvideo_tpu.train.optimizer import OptimizerConfig


@dataclass
class ModelConfig:
    name: str = "slow_r50"  # a pytorchvideo_tpu.models.hub factory name
    num_classes: int = 400
    kwargs: Dict[str, Any] = field(default_factory=dict)
    # clip geometry used for init/eval
    clip_length: int = 8
    crop_size: int = 224
    # SlowFast pathway packing (None = single-pathway model)
    slowfast_alpha: Optional[int] = None


@dataclass
class DataConfig:
    data_path: str = ""
    val_data_path: str = ""
    clip_duration: float = 2.0
    clips_per_video: int = 1
    batch_size: int = 8
    num_samples: Optional[int] = 8  # temporal subsample
    min_size: int = 256
    max_size: int = 320
    crop_size: int = 224
    aug_type: str = "default"
    val_3crop: bool = False  # model-zoo "x3 views": left/center/right crops
    video_mean: Tuple[float, float, float] = (0.45, 0.45, 0.45)
    video_std: Tuple[float, float, float] = (0.225, 0.225, 0.225)
    decoder: str = "opencv"


@dataclass
class MixConfig:
    enabled: bool = False
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    cutmix_prob: float = 0.5
    label_smoothing: float = 0.1


@dataclass
class TrainerConfig:
    max_epochs: int = 1
    clip_grad_norm: Optional[float] = None
    precise_bn_batches: int = 0
    checkpoint_dir: Optional[str] = None
    log_dir: Optional[str] = None  # MetricsLogger jsonl output
    log_every_n_steps: int = 10
    test_ensemble_method: str = "sum"
    # "float32" | "bfloat16": forward/backward compute dtype. bf16 keeps
    # f32 master params/optimizer/BN stats (+47-66% step throughput on v5e).
    compute_dtype: str = "float32"
    # None | "full" | a jax.checkpoint_policies name: activation remat.
    remat_policy: Optional[str] = None
    # >1: microbatch the step via lax.scan (gradient accumulation); the
    # per-step batch size must divide evenly.
    grad_accum_steps: int = 1


@dataclass
class VideoClassificationTrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimizerConfig = field(default_factory=OptimizerConfig)
    lr_scheduler: LRSchedulerConfig = field(default_factory=LRSchedulerConfig)
    mix: MixConfig = field(default_factory=MixConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)


def _from_dict(cls, data: Dict[str, Any]):
    import typing

    hints = typing.get_type_hints(cls)
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        value = data[f.name]
        ftype = hints.get(f.name, f.type)
        if dataclasses.is_dataclass(ftype) and isinstance(value, dict):
            value = _from_dict(ftype, value)
        kwargs[f.name] = value
    return cls(**kwargs)


def config_from_dict(data: Dict[str, Any]) -> VideoClassificationTrainConfig:
    """Build the full train config from a nested dict (e.g. parsed yaml)."""
    return _from_dict(VideoClassificationTrainConfig, data)


def config_to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def save_config(cfg, path: str) -> None:
    """Persist the resolved config for reproducibility (the reference
    writes train_app_conf.yaml, train_app.py:143-162)."""
    with open(path, "w") as f:
        json.dump(config_to_dict(cfg), f, indent=2, default=str)
