from pytorchvideo_tpu.data.ego4d.ego4d_dataset import (  # noqa: F401
    Ego4dImuData,
    Ego4dMomentsDataset,
    signal_transform,
)
from pytorchvideo_tpu.data.ego4d.utils import (  # noqa: F401
    Ego4dImuDataBase,
    MomentsClipSampler,
    check_window_len,
    get_label_id_map,
)
