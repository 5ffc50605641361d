"""Named ResNet-family architectures (reference models/hub/resnet.py:41-159).

Factories return the (un-initialized) linen model; use
``hub.utils.load_pretrained_variables`` with a local .pyth checkpoint for
pretrained weights (zoo files: kinetics/SLOW_8x8_R50.pyth, C2D_8x8_R50.pyth,
I3D_8x8_R50.pyth).
"""

from pytorchvideo_tpu.layers.pooling import MaxPool3d
from pytorchvideo_tpu.models.resnet import create_resnet

checkpoint_names = {
    "slow_r50": "kinetics/SLOW_8x8_R50.pyth",
    "c2d_r50": "kinetics/C2D_8x8_R50.pyth",
    "i3d_r50": "kinetics/I3D_8x8_R50.pyth",
}


def slow_r50(**kwargs):
    """Slow R50 8x8 (K400 top-1 74.58, reference hub/resnet.py:41-71)."""
    kwargs.setdefault("stem_conv_kernel_size", (1, 7, 7))
    kwargs.setdefault("head_pool_kernel_size", (8, 7, 7))
    kwargs.setdefault("model_depth", 50)
    return create_resnet(**kwargs)


def c2d_r50(**kwargs):
    """C2D R50 8x8 (K400 top-1 71.46, reference hub/resnet.py:93-123)."""
    kwargs.setdefault("stem_conv_kernel_size", (1, 7, 7))
    kwargs.setdefault("stage1_pool", MaxPool3d)
    kwargs.setdefault(
        "stage_conv_a_kernel_size",
        ((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
    )
    return create_resnet(**kwargs)


def i3d_r50(**kwargs):
    """I3D R50 8x8 (K400 top-1 73.27, reference hub/resnet.py:126-159)."""
    kwargs.setdefault("stem_conv_kernel_size", (5, 7, 7))
    kwargs.setdefault("stage1_pool", MaxPool3d)
    kwargs.setdefault(
        "stage_conv_a_kernel_size",
        (
            (3, 1, 1),
            [(3, 1, 1), (1, 1, 1)],
            [(3, 1, 1), (1, 1, 1)],
            [(1, 1, 1), (3, 1, 1)],
        ),
    )
    return create_resnet(**kwargs)


def slow_r50_detection(**kwargs):
    """Slow R50 4x16 AVA detection (mAP 19.5; reference hub/resnet.py:73-90).
    Checkpoint: ava/SLOW_4x16_R50_DETECTION.pyth."""
    from pytorchvideo_tpu.models.detection import create_resnet_with_roi_head

    return create_resnet_with_roi_head(**kwargs)
