"""Full-model weight-synced parity: our builders vs reference torch models.

For each family: build the reference model with random init, import its
state_dict through the generic importer (pytorchvideo_tpu/zoo/import_torch.py),
run both on the same input, compare logits. This is the checkpoint-parity
mechanism the zoo uses for real .pyth files.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pytorchvideo_tpu import models
from pytorchvideo_tpu.zoo.import_torch import (
    MVIT_RENAME_RULES,
    X3D_RENAME_RULES,
    import_torch_checkpoint,
)
from ref_loader import load_ref

TOL = dict(rtol=5e-3, atol=5e-4)


def _run_pair(ref_model, our_model, x_bcthw, rename_rules=None, pathways=False):
    ref_model.eval()
    torch.manual_seed(0)
    with torch.no_grad():
        if pathways:
            ref_out = ref_model([torch.from_numpy(x) for x in x_bcthw]).numpy()
            our_in = [
                jnp.asarray(np.moveaxis(x, 1, -1)) for x in x_bcthw
            ]
        else:
            ref_out = ref_model(torch.from_numpy(x_bcthw)).numpy()
            our_in = jnp.asarray(np.moveaxis(x_bcthw, 1, -1))

    target = our_model.init(jax.random.PRNGKey(0), our_in, False)
    variables, report = import_torch_checkpoint(
        ref_model.state_dict(), target, rename_rules=rename_rules, strict=True
    )
    our_out = our_model.apply(variables, our_in, False)
    np.testing.assert_allclose(np.asarray(our_out), ref_out, **TOL)
    return report


def _rand_bcthw(b, c, t, h, w, seed=0):
    return np.random.default_rng(seed).normal(size=(b, c, t, h, w)).astype(
        np.float32
    )


@pytest.mark.slow
def test_slow_r50_parity():
    ref_resnet = load_ref("pytorchvideo.models.resnet")
    kwargs = dict(
        model_depth=50,
        model_num_class=40,
        stem_conv_kernel_size=(1, 7, 7),
        head_pool_kernel_size=(4, 2, 2),
        dropout_rate=0.0,
    )
    ref_model = ref_resnet.create_resnet(**kwargs)
    our_model = models.create_resnet(**kwargs)
    x = _rand_bcthw(1, 3, 4, 64, 64)
    _run_pair(ref_model, our_model, x)


@pytest.mark.slow
def test_x3d_xs_parity():
    ref_x3d = load_ref("pytorchvideo.models.x3d")
    kwargs = dict(
        input_clip_length=4,
        input_crop_size=96,
        model_num_class=40,
        dropout_rate=0.0,
    )
    ref_model = ref_x3d.create_x3d(**kwargs)
    our_model = models.create_x3d(**kwargs)
    x = _rand_bcthw(1, 3, 4, 96, 96)
    _run_pair(ref_model, our_model, x, rename_rules=X3D_RENAME_RULES)


@pytest.mark.slow
def test_slowfast_r50_parity():
    ref_slowfast = load_ref("pytorchvideo.models.slowfast")
    kwargs = dict(
        model_depth=50,
        model_num_class=40,
        dropout_rate=0.0,
        head_pool_kernel_sizes=((4, 2, 2), (16, 2, 2)),
    )
    ref_model = ref_slowfast.create_slowfast(**kwargs)
    our_model = models.create_slowfast(**kwargs)
    xs = [_rand_bcthw(1, 3, 4, 64, 64), _rand_bcthw(1, 3, 16, 64, 64, seed=1)]
    _run_pair(ref_model, our_model, xs, pathways=True)


@pytest.mark.slow
def test_csn_parity():
    ref_csn = load_ref("pytorchvideo.models.csn")
    kwargs = dict(model_num_class=23, head_pool_kernel_size=(1, 2, 2), dropout_rate=0.0)
    ref_model = ref_csn.create_csn(**kwargs)
    our_model = models.create_csn(**kwargs)
    x = _rand_bcthw(1, 3, 4, 64, 64)
    _run_pair(ref_model, our_model, x)


@pytest.mark.slow
def test_r2plus1d_parity():
    ref_mod = load_ref("pytorchvideo.models.r2plus1d")
    kwargs = dict(
        model_num_class=19,
        head_pool_kernel_size=(1, 2, 2),
        dropout_rate=0.0,
        stage_temporal_stride=(1, 1, 2, 2),
    )
    ref_model = ref_mod.create_r2plus1d(**kwargs)
    our_model = models.create_r2plus1d(**kwargs)
    x = _rand_bcthw(1, 3, 4, 64, 64)
    _run_pair(ref_model, our_model, x)


@pytest.mark.slow
def test_mvit_tiny_parity():
    ref_vit = load_ref("pytorchvideo.models.vision_transformers")
    kwargs = dict(
        spatial_size=32,
        temporal_size=4,
        depth=3,
        num_heads=2,
        patch_embed_dim=24,
        embed_dim_mul=[[1, 2.0]],
        atten_head_mul=[[1, 2.0]],
        pool_q_stride_size=[[1, 1, 2, 2]],
        pool_kv_stride_adaptive=[1, 4, 4],
        pool_kvq_kernel=(3, 3, 3),
        head_num_classes=11,
        head_dropout_rate=0.0,
    )
    ref_model = ref_vit.create_multiscale_vision_transformers(**kwargs)
    our_model = models.create_multiscale_vision_transformers(**kwargs)
    x = _rand_bcthw(2, 3, 4, 32, 32)
    _run_pair(ref_model, our_model, x, rename_rules=MVIT_RENAME_RULES)


@pytest.mark.slow
def test_acoustic_resnet_parity():
    ref_resnet = load_ref("pytorchvideo.models.resnet")
    kwargs = dict(model_num_class=8, dropout_rate=0.0, head_pool_kernel_size=(4, 1, 1))
    ref_model = ref_resnet.create_acoustic_resnet(**kwargs)
    our_model = models.create_acoustic_resnet(**kwargs)
    x = _rand_bcthw(1, 1, 64, 1, 24)
    _run_pair(ref_model, our_model, x)
