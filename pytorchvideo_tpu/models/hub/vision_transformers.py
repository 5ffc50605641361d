"""Named MViT architectures (reference models/hub/vision_transformers.py:13-160)."""

from pytorchvideo_tpu.models.vision_transformers import (
    create_multiscale_vision_transformers,
)

checkpoint_names = {
    "mvit_base_16x4": "kinetics/MVIT_B_16x4.pyth",
    "mvit_base_32x3": "kinetics/MVIT_B_32x3_f294077834.pyth",
    "mvit_base_16": "imagenet/MVIT_B_16_f292487636.pyth",
}

mvit_video_base_config = {
    "spatial_size": 224,
    "temporal_size": 16,
    "embed_dim_mul": [[1, 2.0], [3, 2.0], [14, 2.0]],
    "atten_head_mul": [[1, 2.0], [3, 2.0], [14, 2.0]],
    "pool_q_stride_size": [[1, 1, 2, 2], [3, 1, 2, 2], [14, 1, 2, 2]],
    "pool_kv_stride_adaptive": [1, 8, 8],
    "pool_kvq_kernel": [3, 3, 3],
}

mvit_video_base_32x3_config = dict(mvit_video_base_config, temporal_size=32)

mvit_image_base_16_config = {
    "spatial_size": 224,
    "temporal_size": 1,
    "depth": 16,
    "conv_patch_embed_kernel": [7, 7],
    "conv_patch_embed_stride": [4, 4],
    "conv_patch_embed_padding": [3, 3],
    "use_2d_patch": True,
    "embed_dim_mul": [[1, 2.0], [3, 2.0], [14, 2.0]],
    "atten_head_mul": [[1, 2.0], [3, 2.0], [14, 2.0]],
    "pool_q_stride_size": [[1, 1, 2, 2], [3, 1, 2, 2], [14, 1, 2, 2]],
    "pool_kv_stride_adaptive": [1, 4, 4],
    "pool_kvq_kernel": [1, 3, 3],
}


def mvit_base_16x4(**kwargs):
    """MViT-B 16x4 (K400 top-1 78.85)."""
    cfg = dict(mvit_video_base_config)
    cfg.update(kwargs)
    return create_multiscale_vision_transformers(**cfg)


def mvit_base_32x3(**kwargs):
    """MViT-B 32x3 (K400 top-1 80.30)."""
    cfg = dict(mvit_video_base_32x3_config)
    cfg.update(kwargs)
    return create_multiscale_vision_transformers(**cfg)


def mvit_base_16(**kwargs):
    """MViT-B 16 (ImageNet, 2D patches)."""
    cfg = dict(mvit_image_base_16_config)
    cfg.update(kwargs)
    return create_multiscale_vision_transformers(**cfg)
