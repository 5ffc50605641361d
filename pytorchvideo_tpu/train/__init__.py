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
