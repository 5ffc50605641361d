from pytorchvideo_tpu.data.clip_sampling import (  # noqa: F401
    ClipInfo,
    ClipInfoList,
    ClipSampler,
    ConstantClipsPerVideoSampler,
    RandomClipSampler,
    RandomMultiClipSampler,
    UniformClipSampler,
    UniformClipSamplerTruncateFromStart,
    make_clip_sampler,
)
from pytorchvideo_tpu.data.encoded_video import (  # noqa: F401
    EncodedVideo,
    EncodedVideoOpenCV,
)
from pytorchvideo_tpu.data.frame_video import FrameVideo  # noqa: F401
from pytorchvideo_tpu.data.kinetics import Kinetics  # noqa: F401
from pytorchvideo_tpu.data.labeled_video_dataset import (  # noqa: F401
    LabeledVideoDataset,
    labeled_video_dataset,
)
from pytorchvideo_tpu.data.labeled_video_paths import LabeledVideoPaths  # noqa: F401
from pytorchvideo_tpu.data.samplers import (  # noqa: F401
    DistributedSampler,
    RandomSampler,
    SequentialSampler,
)
from pytorchvideo_tpu.data.ava import (  # noqa: F401
    Ava,
    AvaLabeledVideoFramePaths,
    TimeStampClipSampler,
)
from pytorchvideo_tpu.data.charades import Charades  # noqa: F401
from pytorchvideo_tpu.data.domsev import (  # noqa: F401
    DomsevFrameDataset,
    DomsevVideoDataset,
    LabelData,
)
from pytorchvideo_tpu.data.ego4d import Ego4dImuData, Ego4dMomentsDataset  # noqa: F401
from pytorchvideo_tpu.data.epic_kitchen import ActionData, EpicKitchenDataset  # noqa: F401
from pytorchvideo_tpu.data.epic_kitchen_forecasting import (  # noqa: F401
    EpicKitchenForecasting,
)
from pytorchvideo_tpu.data.epic_kitchen_recognition import (  # noqa: F401
    EpicKitchenRecognition,
)
from pytorchvideo_tpu.data.hmdb51 import Hmdb51, Hmdb51LabeledVideoPaths  # noqa: F401
from pytorchvideo_tpu.data.json_dataset import (  # noqa: F401
    UntrimmedClipSampler,
    clip_recognition_dataset,
    video_only_dataset,
)
from pytorchvideo_tpu.data.ssv2 import SSv2  # noqa: F401
from pytorchvideo_tpu.data.ucf101 import Ucf101  # noqa: F401
from pytorchvideo_tpu.data.video import Video, VideoPathHandler  # noqa: F401
from pytorchvideo_tpu.data.loader import BatchLoader, device_prefetch  # noqa: F401
from pytorchvideo_tpu.data.samplers import (  # noqa: F401
    DistributedSampler,
    RandomSampler,
    SequentialSampler,
)
from pytorchvideo_tpu.data.clip_store import (  # noqa: F401
    ClipStore,
    prepare_clip_store,
)
