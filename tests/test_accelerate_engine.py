"""Tests: BN folding equivalence, quantization, transmuter, NeuralEngine.

Mirrors the reference accelerator test strategy (original-form vs
converted-form numerical equivalence, SURVEY §4).
"""

import os
import tempfile
from collections import OrderedDict

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchvideo_tpu import models
from pytorchvideo_tpu.accelerate import (
    EfficientX3d,
    convert_to_deployable_form,
    dequantize_variables,
    fold_conv_bn,
    fuse_bn_mvit,
    quantization_error,
    quantize_variables,
    transmute_model,
)


def _tiny_x3d():
    model = models.create_x3d(
        input_clip_length=2,
        input_crop_size=32,
        model_num_class=5,
        stem_dim_in=8,
        dropout_rate=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 2, 32, 32, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(3), x, False)
    return model, variables, x


@pytest.mark.slow
def test_fold_conv_bn_equivalence():
    model, variables, x = _tiny_x3d()
    # perturb batch stats so the fold actually does something
    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda a: a + 0.1 * np.random.default_rng(0).uniform(size=a.shape).astype(a.dtype),
        variables["batch_stats"],
    )
    ref_out = model.apply(variables, x, False)
    folded = fold_conv_bn(variables)
    fold_out = model.apply(folded, x, False)
    np.testing.assert_allclose(
        np.asarray(fold_out), np.asarray(ref_out), rtol=1e-4, atol=1e-4
    )
    # scales actually moved into kernels: all folded BN scales are 1
    scales = [
        np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(folded["params"])[0]
        if any(getattr(p, "key", None) == "scale" for p in path)
    ]
    assert all(np.allclose(s, 1.0) for s in scales)


@pytest.mark.parametrize("cls_embed_on", [False, True])
def test_fuse_bn_mvit_equivalence(cls_embed_on):
    # Reference protocol tests only cls_embed_on=False (tests/test_fuse_bn.py:26),
    # where the pool-norm fold is exact; with a cls token our fuse skips the
    # pool norms and must stay exact too.
    model = models.create_multiscale_vision_transformers(
        spatial_size=32,
        temporal_size=2,
        depth=2,
        num_heads=2,
        patch_embed_dim=16,
        norm="batchnorm",
        head_num_classes=4,
        head_dropout_rate=0.0,
        cls_embed_on=cls_embed_on,
        pool_q_stride_size=[[0, 1, 2, 2]],
        pool_kv_stride_size=[[0, 1, 2, 2], [1, 1, 2, 2]],
        pool_kvq_kernel=(3, 3, 3),
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 2, 32, 32, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, False)
    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda a: a + 0.05 * np.random.default_rng(1).uniform(size=a.shape).astype(a.dtype),
        variables["batch_stats"],
    )
    ref_out = model.apply(variables, x, False)
    fused = fuse_bn_mvit(variables)
    fused_out = model.apply(fused, x, False)
    np.testing.assert_allclose(
        np.asarray(fused_out), np.asarray(ref_out), rtol=2e-4, atol=2e-4
    )


def test_convert_to_deployable_form_runs():
    model, variables, x = _tiny_x3d()
    compiled, deploy_vars = convert_to_deployable_form(
        model, variables, x, dtype=jnp.bfloat16
    )
    f32_out = model.apply(variables, x, False)
    bf16_out = compiled(deploy_vars, jnp.asarray(x, jnp.bfloat16))
    assert bf16_out.shape == f32_out.shape
    np.testing.assert_allclose(
        np.asarray(bf16_out, np.float32), np.asarray(f32_out), atol=0.15, rtol=0.2
    )


def test_convert_to_deployable_form_weight_modes():
    """bake_weights=True guards against foreign variables (the executable
    embeds the weights as constants); bake_weights=False is
    weight-swappable and matches the baked output."""
    model, variables, x = _tiny_x3d()
    xb = jnp.asarray(x, jnp.bfloat16)
    baked, baked_vars = convert_to_deployable_form(
        model, variables, x, dtype=jnp.bfloat16
    )
    swappable, swap_vars = convert_to_deployable_form(
        model, variables, x, dtype=jnp.bfloat16, bake_weights=False
    )
    np.testing.assert_allclose(
        np.asarray(baked(baked_vars, xb), np.float32),
        np.asarray(swappable(swap_vars, xb), np.float32),
        atol=1e-2,
    )
    with pytest.raises(ValueError, match="baked weights"):
        baked(swap_vars, xb)


def test_deploy_baked_guard_accepts_none_and_rewrapped_trees():
    """ADVICE r4: the guard must not reject legitimate re-wrappings —
    None is the conventional 'use baked' argument, and a tree whose
    leaves are the identical array objects (dict re-wrap, identity
    tree_map) passes; a value-copied tree still raises, because the
    executable would silently keep serving the baked constants."""
    model, variables, x = _tiny_x3d()
    xb = jnp.asarray(x, jnp.bfloat16)
    baked, baked_vars = convert_to_deployable_form(
        model, variables, x, dtype=jnp.bfloat16
    )
    ref = np.asarray(baked(baked_vars, xb), np.float32)
    np.testing.assert_array_equal(
        np.asarray(baked(None, xb), np.float32), ref
    )
    rewrapped = {k: baked_vars[k] for k in baked_vars}  # new dict, same leaves
    np.testing.assert_array_equal(
        np.asarray(baked(rewrapped, xb), np.float32), ref
    )
    identity_mapped = jax.tree_util.tree_map(lambda a: a, baked_vars)
    np.testing.assert_array_equal(
        np.asarray(baked(identity_mapped, xb), np.float32), ref
    )
    copied = jax.tree_util.tree_map(lambda a: a + 0, baked_vars)
    with pytest.raises(ValueError, match="baked"):
        baked(copied, xb)


def test_quantize_roundtrip():
    model, variables, x = _tiny_x3d()
    err = quantization_error(variables)
    assert err < 0.02  # int8 per-channel: < 1/127 + slack
    qv = quantize_variables(variables)
    dq = dequantize_variables(qv, jnp.float32)
    out_q = model.apply(
        {"params": dq["params"], "batch_stats": variables["batch_stats"]}, x, False
    )
    out = model.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out), atol=0.2)


def test_transmuter():
    model, variables, x = _tiny_x3d()
    ref_out = model.apply(variables, x, False)
    model2, variables2 = transmute_model(model, variables, target_device="tpu")
    out2 = model2.apply(variables2, jnp.asarray(x, jnp.bfloat16), False)
    np.testing.assert_allclose(
        np.asarray(out2, np.float32), np.asarray(ref_out), atol=0.15, rtol=0.2
    )
    with pytest.raises(AssertionError):
        transmute_model(model, variables, target_device="mobile_cpu")


def test_efficient_x3d():
    eff = EfficientX3d(expansion="XS", num_classes=7, stem_dim_in=8)
    x = jnp.zeros((1, 4, 160, 160, 3))
    eff.init(jax.random.PRNGKey(0), x)
    out_train_form = eff(x)
    eff.convert(x)
    out_deploy = eff(x)
    assert out_deploy.shape == out_train_form.shape == (1, 7)


def test_neural_engine_topology_and_fail_strategy():
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import temp_encoded_video

    from pytorchvideo_tpu.engine import DecodeHook, HookBase, NeuralEngine

    with temp_encoded_video(num_frames=6, fps=3) as (path, data):
        decode = DecodeHook()

        class MeanHook(HookBase):
            def __init__(self):
                super().__init__(inputs=["video"], outputs=["mean"])

            def _run(self, status):
                return {"mean": float(np.mean(status["video"]))}

        engine = NeuralEngine([MeanHook(), decode])  # order-independent
        status = engine(path)
        assert "video" in status and "mean" in status
        assert status["mean"] == pytest.approx(float(data.mean()))

    class FailingHook(HookBase):
        def __init__(self, strategy):
            super().__init__(
                inputs=["path"], outputs=["thing"], fail_strategy=strategy
            )

        def _run(self, status):
            raise RuntimeError("boom")

    out = FailingHook("ZERO_FILL").run(OrderedDict(path="p"))
    assert np.all(out["thing"] == 0)
    out = FailingHook("RETURN_NONE").run(OrderedDict(path="p"))
    assert out["thing"] is None
    with pytest.raises(RuntimeError):
        FailingHook("RAISE_ERROR").run(OrderedDict(path="p"))


@pytest.mark.slow
def test_detection_hooks_pipeline():
    from pytorchvideo_tpu.engine import (
        ActionDetectionHook,
        NeuralEngine,
        PeopleDetectionHook,
    )

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    video = rng.integers(0, 255, (4, 48, 64, 3)).astype(np.float32)

    people = PeopleDetectionHook()
    action = ActionDetectionHook(
        model_name="slow_r50_detection",
        num_frames=4,
        side_size=56,
        crop_size=56,
        stage_depths=(1, 1, 1, 1),
    )
    # people hook consumes loaded_image; feed it directly (no image file)
    engine = NeuralEngine([people, action])
    status = OrderedDict(loaded_image=frame, video=video)
    out = engine.run(status)
    assert out["bbox_coordinates"].shape == (1, 4)
    assert out["action_scores"].shape[0] == 1  # one box -> one score row


def test_efficient_conv_blocks_convert_equivalence():
    from pytorchvideo_tpu.accelerate import (
        AdaptiveAvgPool3dOutSize1,
        Conv3d3x3x3DwBnAct,
        Conv3dPwBnAct,
        FullyConnected,
        SqueezeExcitation,
        X3dBottleneckBlock,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 6, 6, 8)), jnp.float32)

    for block in [
        Conv3dPwBnAct(8, 12, activation="swish"),
        Conv3d3x3x3DwBnAct(8, activation="hswish"),
        SqueezeExcitation(8, reduction_ratio=2.0),
        X3dBottleneckBlock(8, 16, 8),
    ]:
        block.init(jax.random.PRNGKey(0), x)
        # make BN stats non-trivial so folding is actually exercised
        if "batch_stats" in block.variables:
            for _ in range(2):
                _, mut = block.model.apply(
                    block.variables, x, True, mutable=["batch_stats"]
                )
                block.variables = {**block.variables, **mut}
        ref = block(x)  # train-form eval
        block.convert(x, dtype=None)  # fold BN, keep f32 for comparison
        out = block(x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
        )

    pool = AdaptiveAvgPool3dOutSize1()
    pool.init(jax.random.PRNGKey(0), x)
    assert pool(x).shape == (2, 1, 1, 1, 8)

    fc = FullyConnected(8, 3)
    fc.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))
    assert fc(jnp.zeros((2, 8))).shape == (2, 3)


def test_accelerate_pool_and_act_blocks():
    """AdaptiveAvgPool{2d,3d}(+OutSize1) and act EfficientBlocks: forward
    shapes/numerics + deploy-form convert (reference pool.py:14-115,
    activation_functions.py:31-95)."""
    from pytorchvideo_tpu.accelerate import (
        AdaptiveAvgPool2d,
        AdaptiveAvgPool2dOutSize1,
        AdaptiveAvgPool3d,
        HardSwish,
        Identity,
        ReLU,
        Swish,
    )

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 4, 8, 8, 5)), jnp.float32
    )
    blk = AdaptiveAvgPool3d((2, 4, 4))
    blk.init(jax.random.PRNGKey(0), x)
    assert blk(x).shape == (2, 2, 4, 4, 5)
    np.testing.assert_allclose(
        np.asarray(blk(x))[0, 0, 0, 0],
        np.asarray(x)[0, :2, :2, :2].mean(axis=(0, 1, 2)),
        rtol=1e-5,
        atol=1e-6,
    )
    blk = AdaptiveAvgPool2dOutSize1()
    blk.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(blk(x)),
        np.asarray(x).mean(axis=(2, 3), keepdims=True),
        rtol=1e-5,
        atol=1e-6,
    )
    blk = AdaptiveAvgPool2d(4)
    blk.init(jax.random.PRNGKey(0), x)
    assert blk(x).shape == (2, 4, 4, 4, 5)

    xs = np.asarray(x)
    refs = {
        HardSwish: xs * np.clip(xs + 3, 0, 6) / 6,
        ReLU: np.maximum(xs, 0),
        Swish: xs / (1 + np.exp(-xs)),
        Identity: xs,
    }
    for cls, expect in refs.items():
        blk = cls()
        blk.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            np.asarray(blk(x)), expect, rtol=1e-5, atol=1e-5
        )
        blk.convert()  # deploy form (bf16) still runs
        assert blk(x).shape == x.shape


def test_detection_executors_and_hooks_with_stub_predictor():
    """people/keypoint executors filter the person class (torchvision COCO
    label 1) and threshold via the predictor; hooks wire them into the
    engine status dict (reference detection_hook.py:45-117)."""
    from pytorchvideo_tpu.engine import (
        people_detection_executor,
        people_keypoints_executor,
    )

    def pred(img):
        return {
            "boxes": np.asarray([[1.0, 2.0, 3.0, 4.0], [5.0, 6.0, 7.0, 8.0]]),
            "labels": np.asarray([1, 17]),
            "scores": np.asarray([0.9, 0.8]),
            "keypoints": np.arange(2 * 17 * 3, dtype=np.float32).reshape(
                2, 17, 3
            ),
        }

    boxes = people_detection_executor(None, pred)
    np.testing.assert_allclose(boxes, [[1.0, 2.0, 3.0, 4.0]])
    kps = people_keypoints_executor(None, pred)
    assert kps.shape == (1, 17, 3)


@pytest.mark.slow
def test_hub_model_builder():
    """default_config fills unset kwargs; kwargs forbidden with pretrained
    (reference models/hub/utils.py:12-49)."""
    from pytorchvideo_tpu.models import create_x3d
    from pytorchvideo_tpu.models.hub import hub_model_builder

    model = hub_model_builder(
        create_x3d,
        default_config=dict(
            input_clip_length=2, input_crop_size=32, model_num_class=7
        ),
    )
    x = jnp.zeros((1, 2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    assert model.apply(variables, x, False).shape == (1, 7)

    with pytest.raises(AssertionError):
        hub_model_builder(create_x3d, pretrained=True, model_num_class=7)


def test_export_stablehlo_roundtrip():
    """StableHLO serialization (the TPU serving artifact — the reference's
    TorchScript/mobile-deploy analogue) deserializes and reproduces the
    forward exactly."""
    from jax import export as jax_export

    from pytorchvideo_tpu.accelerate.deploy import export_stablehlo

    model, variables, x = _tiny_x3d()
    blob = export_stablehlo(model, variables, x)
    assert isinstance(blob, bytes) and len(blob) > 0
    restored = jax_export.deserialize(blob)
    out = restored.call(variables, x)
    ref = model.apply(variables, x, False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-6, rtol=1e-6
    )


def test_int8_serving_numerics_mvit():
    """Dynamic int8 dense serving (the QNNPACK-int8 analogue on the MXU):
    per-channel int8 weights + per-token int8 activations keep MViT logits
    within quantization tolerance and preserve predictions."""
    from pytorchvideo_tpu import models
    from pytorchvideo_tpu.accelerate import int8_serving_fn

    model = models.create_multiscale_vision_transformers(
        spatial_size=32,
        temporal_size=4,
        depth=2,
        num_heads=2,
        patch_embed_dim=64,
        head_num_classes=10,
        dropout_rate_block=0.0,
        droppath_rate_block=0.0,
        head_dropout_rate=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 4, 32, 32, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, False)
    ref = model.apply(variables, x, False)
    out = jax.jit(int8_serving_fn(model, min_weight_size=1024))(variables, x)
    rel = float(
        jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9)
    )
    assert rel < 0.05, rel
    assert (jnp.argmax(out, -1) == jnp.argmax(ref, -1)).all()


def test_int8_interceptor_threshold_gates_small_denses():
    """Denses below min_weight_size stay un-quantized (exact output)."""
    import flax.linen as nn

    from pytorchvideo_tpu.accelerate import make_int8_interceptor

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(8, name="d")(x)

    m = M()
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(v, x)
    with nn.intercept_methods(make_int8_interceptor(min_weight_size=10_000)):
        gated = m.apply(v, x)
    np.testing.assert_array_equal(np.asarray(gated), np.asarray(ref))
    with nn.intercept_methods(make_int8_interceptor(min_weight_size=1)):
        quant = m.apply(v, x)
    assert not np.allclose(np.asarray(quant), np.asarray(ref), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(quant), np.asarray(ref), atol=0.05
    )


def test_int8_prepared_weights_match_dynamic():
    """Host-side pre-quantized kernels (compile-time int8 constants) must
    reproduce the per-call weight-quantization path exactly."""
    from pytorchvideo_tpu import models
    from pytorchvideo_tpu.accelerate import int8_serving_fn, prepare_int8_weights

    model = models.create_multiscale_vision_transformers(
        spatial_size=32,
        temporal_size=2,
        depth=1,
        num_heads=2,
        patch_embed_dim=64,
        head_num_classes=6,
        dropout_rate_block=0.0,
        droppath_rate_block=0.0,
        head_dropout_rate=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 2, 32, 32, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, False)
    prepared = prepare_int8_weights(variables, min_weight_size=1024)
    assert prepared, "no kernels collected"
    dyn = int8_serving_fn(model, min_weight_size=1024)(variables, x)
    pre = int8_serving_fn(model, min_weight_size=1024, variables=variables)(
        variables, x
    )
    np.testing.assert_allclose(np.asarray(pre), np.asarray(dyn), atol=1e-6)
