from pytorchvideo_tpu.ops.pooled_attention import (  # noqa: F401
    pooled_attention,
    pooled_attention_packed,
)
from pytorchvideo_tpu.ops.roi_align import RoIAlign, roi_align  # noqa: F401
from pytorchvideo_tpu.ops.token_pool import (  # noqa: F401
    avg_token_pool,
    depthwise_token_pool,
    max_token_pool,
)
