from pytorchvideo_tpu.transforms.transforms import (  # noqa: F401
    ApplyTransformToKey,
    CenterCropVideo,
    Compose,
    ConvertFloatToUint8,
    ConvertUint8ToFloat,
    Div255,
    MoveChannelFront,
    MoveChannelRear,
    Normalize,
    OpSampler,
    Permute,
    RandomCropVideo,
    RandomHorizontalFlipVideo,
    RandomResizedCrop,
    RandomShortSideScale,
    RemoveKey,
    ShortSideScale,
    UniformCropVideo,
    UniformTemporalSubsample,
    UniformTemporalSubsampleRepeated,
)
from pytorchvideo_tpu.transforms.augmentations import AugmentTransform  # noqa: F401
from pytorchvideo_tpu.transforms.augmix import AugMix  # noqa: F401
from pytorchvideo_tpu.transforms.mix import CutMix, MixUp, MixVideo  # noqa: F401
from pytorchvideo_tpu.transforms.rand_augment import RandAugment  # noqa: F401
from pytorchvideo_tpu.transforms.transforms_factory import (  # noqa: F401
    create_video_transform,
)
