"""Trainer layer tests: transforms, precise-BN, SSL utils, and the full
train app on a synthetic dataset (the reference's trainer test pattern:
tiny synthetic videos through the real loops,
pytorchvideo_trainer/tests/test_task_video_classification.py)."""

import os
import tempfile

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from fixtures import temp_encoded_video
from pytorchvideo_tpu import train as T


def test_slowfast_pack_pathway():
    frames = np.random.rand(32, 8, 8, 3).astype(np.float32)
    slow, fast = T.SlowFastPackPathway(alpha=4)(frames)
    assert slow.shape[0] == 8 and fast.shape[0] == 32


def test_repeat_and_collate():
    sample = {"video": np.zeros((2, 4, 4, 3)), "label": 3}
    out = T.RepeatandConverttoList(2)(dict(sample))
    assert len(out["video"]) == 2
    batch = T.multiple_samples_collate([out, out])
    assert batch["video"].shape == (4, 2, 4, 4, 3)
    assert list(batch["label"]) == [3, 3, 3, 3]


def test_color_jitter_ssl_and_blur():
    frames = np.random.rand(3, 16, 16, 3).astype(np.float32)
    t = T.ColorJitterVideoSSl(
        bri_con_sat=[0.6, 0.6, 0.6],
        hue=0.15,
        p_color_jitter=1.0,
        p_convert_gray=0.0,
        p_gaussian_blur=1.0,
        seed=0,
    )
    out = t(frames)
    assert out.shape == frames.shape
    assert not np.allclose(out, frames)
    gray = T.ColorJitterVideoSSl([0, 0, 0], 0, 0.0, 1.0, 0.0, seed=0)(frames)
    np.testing.assert_allclose(gray[..., 0], gray[..., 1])
    blurred = T.GaussianBlur(sigma=[2.0], seed=0)(frames)
    assert blurred.std() < frames.std()


def test_random_erasing_cube():
    frames = np.ones((4, 20, 20, 3), np.float32)
    t = T.RandomErasing(probability=1.0, mode="const", cube=True, seed=1)
    out = t(frames)
    erased = out == 0
    assert erased.any()
    # cube: same erased region on all frames
    np.testing.assert_array_equal(erased[0], erased[1])


def test_momentum_anneal_cosine():
    assert T.momentum_anneal_cosine(0.99, 0, 100) == pytest.approx(0.99)
    assert T.momentum_anneal_cosine(0.99, 100, 100) == pytest.approx(1.0)


def test_knn_memory():
    mem = T.KnnMemory(length=50, dim=8, knn_k=5, temperature=0.07, num_classes=3)
    state = mem.init(jax.random.PRNGKey(0))
    feats = jnp.eye(8)[:3]
    labels = jnp.asarray([0, 1, 2])
    state = mem.update(state, feats, labels, indices=jnp.asarray([0, 1, 2]))
    scores = mem.knn_predict(state, feats)
    assert scores.shape == (3, 3)
    assert list(np.argmax(np.asarray(scores), -1)) == [0, 1, 2]


def test_moco_v2():
    class Enc(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return nn.Dense(16)(x)

    moco = T.MoCoV2(Enc(), queue_size=64, dim=16, mmt=0.5)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 10)), jnp.float32)
    state = moco.init(jax.random.PRNGKey(0), x)
    loss, keys = moco.loss(state, x, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    state2 = moco.dequeue_and_enqueue(state, keys)
    assert int(state2["queue_ptr"]) == 4
    state3 = moco.momentum_update(state2)
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(state3["momentum"])[0]),
        np.asarray(jax.tree_util.tree_leaves(state2["momentum"])[0]),
    ) or np.allclose(
        np.asarray(jax.tree_util.tree_leaves(state2["online"])[0]),
        np.asarray(jax.tree_util.tree_leaves(state2["momentum"])[0]),
    )


def test_precise_bn_stats_are_batch_means():
    class BNNet(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            from pytorchvideo_tpu.layers.norms import BatchNorm

            return BatchNorm()(x, train=train)

    model = BNNet()
    x1 = jnp.full((4, 3), 2.0)
    x2 = jnp.full((4, 3), 4.0)
    variables = model.init(jax.random.PRNGKey(0), x1, False)
    out = T.update_bn_stats(model, variables, [x1, x2], 2, input_key=None)
    bn_stats = jax.tree_util.tree_leaves(out["batch_stats"])
    # mean leaf should equal the batch-mean average (2+4)/2 = 3
    means = [s for s in bn_stats if np.allclose(np.asarray(s).shape, (3,))]
    assert any(np.allclose(np.asarray(s), 3.0, rtol=1e-5) for s in means)


def _make_csv_dataset(tmpdir, n_videos=2):
    paths = []
    ctx = temp_encoded_video(num_frames=12, fps=6, height=48, width=48)
    path, _ = ctx.__enter__()
    csv_path = os.path.join(tmpdir, "data.csv")
    with open(csv_path, "w") as f:
        for i in range(n_videos):
            f.write(f"{path} {i % 2}\n")
    return csv_path, ctx


@pytest.mark.slow
def test_train_app_end_to_end(tmp_path):
    csv_path, ctx = _make_csv_dataset(str(tmp_path))
    try:
        cfg = T.VideoClassificationTrainConfig()
        cfg.model = T.ModelConfig(
            name="x3d_xs",
            num_classes=2,
            kwargs=dict(
                stem_dim_in=8,
                input_clip_length=4,
                input_crop_size=32,
                depth_factor=0.1,  # 1 block/stage: keep e2e compile fast
            ),
            clip_length=4,
            crop_size=32,
        )
        cfg.data = T.DataConfig(
            data_path=csv_path,
            clip_duration=1.0,
            batch_size=2,
            num_samples=4,
            min_size=36,
            max_size=44,
            crop_size=32,
        )
        cfg.optim.lr = 0.01
        cfg.lr_scheduler.lr = 0.01
        cfg.lr_scheduler.max_iters = 2
        cfg.trainer.max_epochs = 1
        cfg.trainer.precise_bn_batches = 1
        cfg.trainer.compute_dtype = "bfloat16"  # exercise mixed precision
        cfg.trainer.grad_accum_steps = 2  # exercise microbatch accumulation
        cfg.trainer.checkpoint_dir = str(tmp_path / "ckpt")
        os.makedirs(cfg.trainer.checkpoint_dir, exist_ok=True)

        app = T.VideoClassificationTrainApp(cfg, steps_per_epoch=2)
        history = app.train()
        assert len(history) >= 1 and np.isfinite(history[0])
        metrics = app.test()
        assert "video_top1" in metrics

        # checkpoint roundtrip
        params_before = jax.tree_util.tree_leaves(app.state.params)[0]
        app.load_checkpoint(os.path.join(cfg.trainer.checkpoint_dir, "ckpt_0"))
        params_after = jax.tree_util.tree_leaves(app.state.params)[0]
        assert params_before.shape == params_after.shape
    finally:
        ctx.__exit__(None, None, None)


def test_config_roundtrip(tmp_path):
    cfg = T.VideoClassificationTrainConfig()
    d = T.config_to_dict(cfg)
    cfg2 = T.config_from_dict(d)
    assert cfg2.model.name == cfg.model.name
    T.save_config(cfg, str(tmp_path / "c.json"))
    assert (tmp_path / "c.json").exists()


def test_presets():
    from pytorchvideo_tpu.train.presets import PRESETS, get_preset

    for name in [
        "classification_slow_8x8_r50",
        "classification_slowfast_8x8_r50",
        "classification_x3d_xs",
        "classification_mvit_16x4",
    ]:
        cfg = get_preset(name)
        assert cfg.lr_scheduler.lr == cfg.optim.lr
    cfg = get_preset("classification_x3d_xs", **{"optim.lr": 0.1})
    assert cfg.optim.lr == 0.1
    assert get_preset("classification_mvit_16x4").mix.enabled
    with pytest.raises(AttributeError):
        get_preset("classification_x3d_xs", **{"optim.nope": 1})
    with pytest.raises(KeyError):
        get_preset("nope")
    ssl = get_preset("moco_v2_train_app_conf")
    assert ssl["k"] == 65536 and ssl["batch_shuffle"]
    assert len(PRESETS) == 7


def test_metrics_logger(tmp_path):
    mlog = T.MetricsLogger(str(tmp_path))
    mlog.log({"loss": 1.5}, step=0, epoch=0)
    mlog.log({"loss": jnp.asarray(0.5)}, step=1)
    mlog.close()
    import json

    lines = [
        json.loads(ln)
        for ln in open(tmp_path / "metrics.jsonl").read().splitlines()
    ]
    assert lines[0]["loss"] == 1.5 and lines[0]["epoch"] == 0
    assert lines[1]["loss"] == 0.5 and "epoch" not in lines[1]
    # no log_dir: stdout-only, no crash
    T.MetricsLogger(None).log({"a": 1}, step=0)


def test_load_ssl_backbone_surgery(tmp_path):
    """SSL->classification surgery: backbone leaves graft by path+shape,
    the classifier head keeps its fresh init (reference
    create_classification_model_from_ssl_checkpoint, ssl_helper.py:67)."""
    csv_path, ctx = _make_csv_dataset(str(tmp_path))
    try:
        kwargs = dict(
            stem_dim_in=8,
            input_clip_length=4,
            input_crop_size=32,
            depth_factor=0.1,
        )
        cfg = T.VideoClassificationTrainConfig()
        cfg.model = T.ModelConfig(
            name="x3d_xs", num_classes=5, kwargs=kwargs,
            clip_length=4, crop_size=32,
        )
        cfg.data = T.DataConfig(
            data_path=csv_path, clip_duration=1.0, batch_size=2,
            num_samples=4, crop_size=32,
        )
        app = T.VideoClassificationTrainApp(cfg, steps_per_epoch=1)
        app.setup()
        head_before = jax.tree_util.tree_leaves(
            app.state.params["blocks_5"]["proj"]
        )

        # "pretrained" backbone: same arch, different head width (the SSL
        # feature head), weights distinct from the app's init
        from pytorchvideo_tpu.models import hub

        backbone = hub.x3d_xs(model_num_class=16, **kwargs)
        bvars = backbone.init(
            jax.random.PRNGKey(99), jnp.zeros((1, 4, 32, 32, 3)), False
        )
        n = app.load_ssl_backbone(bvars)
        assert n > 0, "nothing grafted"

        # every shape-matched leaf now equals the pretrained value
        stem_ours = jax.tree_util.tree_leaves(app.state.params["blocks_0"])
        stem_theirs = jax.tree_util.tree_leaves(bvars["params"]["blocks_0"])
        for a, b in zip(stem_ours, stem_theirs):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # the classification head kept its fresh init (shape mismatch)
        head_after = jax.tree_util.tree_leaves(
            app.state.params["blocks_5"]["proj"]
        )
        for a, b in zip(head_before, head_after):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        proj_ours = app.state.params["blocks_5"]["proj"]
        assert any(
            l.shape[-1] == 5
            for l in jax.tree_util.tree_leaves(proj_ours)
            if hasattr(l, "shape") and l.ndim >= 1
        )
    finally:
        ctx.__exit__(None, None, None)


def test_load_ssl_backbone_excludes_head_even_when_shapes_match(tmp_path):
    """feature_dim == num_classes: the classifier projection must NOT be
    overwritten by the SSL feature head (explicit exclusion, not just
    shape mismatch)."""
    csv_path, ctx = _make_csv_dataset(str(tmp_path))
    try:
        kwargs = dict(
            stem_dim_in=8,
            input_clip_length=4,
            input_crop_size=32,
            depth_factor=0.1,
        )
        cfg = T.VideoClassificationTrainConfig()
        cfg.model = T.ModelConfig(
            name="x3d_xs", num_classes=5, kwargs=kwargs,
            clip_length=4, crop_size=32,
        )
        cfg.data = T.DataConfig(
            data_path=csv_path, clip_duration=1.0, batch_size=2,
            num_samples=4, crop_size=32,
        )
        app = T.VideoClassificationTrainApp(cfg, steps_per_epoch=1)
        app.setup()
        head_before = jax.tree_util.tree_leaves(
            app.state.params["blocks_5"]["proj"]
        )

        from pytorchvideo_tpu.models import hub

        backbone = hub.x3d_xs(model_num_class=5, **kwargs)  # SAME width
        bvars = backbone.init(
            jax.random.PRNGKey(123), jnp.zeros((1, 4, 32, 32, 3)), False
        )
        n = app.load_ssl_backbone(bvars)
        assert n > 0
        head_after = jax.tree_util.tree_leaves(
            app.state.params["blocks_5"]["proj"]
        )
        for a, b in zip(head_before, head_after):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    finally:
        ctx.__exit__(None, None, None)
