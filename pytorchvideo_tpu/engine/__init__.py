from pytorchvideo_tpu.engine.detection_hook import (  # noqa: F401
    ActionDetectionHook,
    Detectron2PeopleDetectionHook,
    ImageLoadHook,
    PeopleDetectionHook,
    PeopleKeypointDetectionHook,
    generate_predictor,
    people_detection_executor,
    people_keypoints_executor,
)
from pytorchvideo_tpu.engine.engine import NeuralEngine  # noqa: F401
from pytorchvideo_tpu.engine.hook import (  # noqa: F401
    FAIL_STRATEGY,
    HOOK_STATUS,
    DecodeHook,
    HookBase,
    X3DClsHook,
    full_decode,
)
