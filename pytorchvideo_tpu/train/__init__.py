from pytorchvideo_tpu.train.lr_policy import (  # noqa: F401
    LRSchedulerConfig,
    get_epoch_lr,
    get_lr_at_epoch,
)
from pytorchvideo_tpu.train.optimizer import (  # noqa: F401
    OptimizerConfig,
    construct_optimizer,
    lr_schedule_from_config,
)
from pytorchvideo_tpu.train.train_loop import (  # noqa: F401
    TrainState,
    create_train_state,
    ensemble_video_level,
    make_eval_step,
    make_train_step,
)
from pytorchvideo_tpu.train.app import VideoClassificationTrainApp  # noqa: F401
from pytorchvideo_tpu.train.config import (  # noqa: F401
    DataConfig,
    MixConfig,
    ModelConfig,
    TrainerConfig,
    VideoClassificationTrainConfig,
    config_from_dict,
    config_to_dict,
    save_config,
)
from pytorchvideo_tpu.train.datamodule import (  # noqa: F401
    VideoClassificationDataModule,
)
from pytorchvideo_tpu.train.precise_batchnorm import PreciseBn, update_bn_stats  # noqa: F401
from pytorchvideo_tpu.train.ssl import (  # noqa: F401
    KnnMemory,
    MoCoV2,
    batch_shuffle,
    batch_unshuffle,
    momentum_anneal_cosine,
)
from pytorchvideo_tpu.train.ssl_app import (  # noqa: F401
    SSLConfig,
    SSLTrainApp,
    TwoViewTransform,
    make_byol_train_step,
    make_moco_train_step,
    make_simclr_train_step,
)
from pytorchvideo_tpu.train.transforms import (  # noqa: F401
    ColorJitterVideoSSl,
    GaussianBlur,
    MixVideoBatchWrapper,
    RandomErasing,
    RepeatandConverttoList,
    SlowFastPackPathway,
    build_collator_from_name,
    multiple_samples_collate,
)
from pytorchvideo_tpu.train.presets import PRESETS, get_preset  # noqa: F401,E402
from pytorchvideo_tpu.train.logger import MetricsLogger  # noqa: F401,E402
