from pytorchvideo_tpu.layers.attention import (  # noqa: F401
    Mlp,
    MultiScaleAttention,
    MultiScaleBlock,
    TokenPool,
    scaled_dot_product_attention,
)
from pytorchvideo_tpu.layers.convolutions import (  # noqa: F401
    Conv2plus1d,
    ConvReduce3D,
    create_conv_2plus1d,
)
from pytorchvideo_tpu.layers.fusion import (  # noqa: F401
    ConcatFusion,
    ReduceFusion,
    TemporalConcatFusion,
    make_fusion_layer,
)
from pytorchvideo_tpu.layers.mlp import make_multilayer_perceptron  # noqa: F401
from pytorchvideo_tpu.layers.nonlocal_net import NonLocal, create_nonlocal  # noqa: F401
from pytorchvideo_tpu.layers.norms import (  # noqa: F401
    BatchNorm,
    BatchNorm1d,
    BatchNorm2d,
    BatchNorm3d,
    Identity,
    LayerNorm,
    NaiveSyncBatchNorm1d,
    NaiveSyncBatchNorm2d,
    NaiveSyncBatchNorm3d,
)
from pytorchvideo_tpu.layers.positional_encoding import (  # noqa: F401
    PositionalEncoding,
    SpatioTemporalClsPositionalEncoding,
)
from pytorchvideo_tpu.layers.squeeze_excitation import (  # noqa: F401
    SqueezeAndExcitationLayer2D,
    SqueezeExcitation,
    create_audio_2d_squeeze_excitation_block,
)
from pytorchvideo_tpu.layers.stochastic import DropPath, Swish, swish  # noqa: F401
from pytorchvideo_tpu.layers.utils import round_repeats, round_width  # noqa: F401
