from pytorchvideo_tpu.accelerate.deploy import (  # noqa: F401
    cast_variables,
    convert_to_deployable_form,
    export_stablehlo,
)
from pytorchvideo_tpu.accelerate.conv_blocks import (  # noqa: F401
    AdaptiveAvgPool2d,
    AdaptiveAvgPool2dOutSize1,
    AdaptiveAvgPool3d,
    AdaptiveAvgPool3dOutSize1,
    HardSwish,
    Identity,
    ReLU,
    Swish,
    Conv3d3x1x1BnAct,
    Conv3d3x3x3DwBnAct,
    Conv3d5x1x1BnAct,
    Conv3dPwBnAct,
    Conv3dTemporalKernel1BnAct,
    FullyConnected,
    SqueezeExcitation,
    X3dBottleneckBlock,
    supported_act_functions,
)
from pytorchvideo_tpu.accelerate.efficient_blocks import (  # noqa: F401
    EfficientBlockBase,
    EfficientX3d,
    NoOpConvertBlock,
)
from pytorchvideo_tpu.accelerate.fuse import fold_conv_bn, fuse_bn_mvit  # noqa: F401
from pytorchvideo_tpu.accelerate.int8 import (  # noqa: F401
    int8_serving_fn,
    make_int8_interceptor,
    prepare_int8_weights,
)
from pytorchvideo_tpu.accelerate.quantize import (  # noqa: F401
    dequantize_variables,
    quantization_error,
    quantize_variables,
)
from pytorchvideo_tpu.accelerate.transmuter import (  # noqa: F401
    EFFICIENT_BLOCK_TRANSMUTER_REGISTRY,
    register_transmuter,
    transmute_model,
)
