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
from pytorchvideo_tpu.data.ucf101 import Ucf101  # noqa: F401
from pytorchvideo_tpu.data.video import Video, VideoPathHandler  # noqa: F401
