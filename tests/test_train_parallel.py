"""Train step + parallel (mesh/sharding) tests on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchvideo_tpu import models
from pytorchvideo_tpu.parallel import (
    MEGATRON_ATTENTION_RULES,
    infer_param_shardings,
    make_mesh,
    shard_batch,
)
from pytorchvideo_tpu.train import (
    LRSchedulerConfig,
    OptimizerConfig,
    construct_optimizer,
    create_train_state,
    get_lr_at_epoch,
    lr_schedule_from_config,
    make_eval_step,
    make_train_step,
)


def _tiny_model():
    return models.create_x3d(
        input_clip_length=2,
        input_crop_size=32,
        model_num_class=5,
        stem_dim_in=8,
        depth_factor=0.1,  # 1 block per stage: keeps train-step compiles fast
        dropout_rate=0.0,
    )


@pytest.mark.slow
def test_train_step_reduces_loss():
    model = _tiny_model()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 2, 32, 32, 3)), jnp.float32
    )
    labels = jnp.asarray([0, 1, 2, 3])
    variables = model.init(jax.random.PRNGKey(0), x, False)
    tx = construct_optimizer(
        variables["params"], OptimizerConfig(method="sgd", lr=0.05)
    )
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, tx))
    batch = {"video": x, "label": labels}
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8

    eval_step = jax.jit(make_eval_step(model))
    logits = eval_step(state, batch)
    assert logits.shape == (4, 5)


@pytest.mark.slow
def test_train_step_mixed_precision_bf16():
    """bf16 compute, f32 masters: loss decreases, params/stats stay f32."""
    model = _tiny_model()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 2, 32, 32, 3)), jnp.float32
    )
    labels = jnp.asarray([0, 1, 2, 3])
    variables = model.init(jax.random.PRNGKey(0), x, False)
    tx = construct_optimizer(
        variables["params"], OptimizerConfig(method="sgd", lr=0.05)
    )
    state = create_train_state(variables, tx)
    step = jax.jit(
        make_train_step(model, tx, compute_dtype=jnp.bfloat16)
    )
    batch = {"video": x, "label": labels}
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(losses)), losses
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state.batch_stats):
        assert leaf.dtype == jnp.float32


def test_local_group_sync_bn():
    """BN with axis_index_groups syncs stats within sub-groups only — the
    reference's NaiveSyncBatchNorm local groups (layers/batch_norm.py,
    GroupGather) / num_sync_devices (video_classification.py:408-435)."""
    import flax.linen as nn

    from pytorchvideo_tpu.layers.norms import BatchNorm

    n_dev = 8
    groups = [[0, 1, 2, 3], [4, 5, 6, 7]]
    bn = BatchNorm(
        momentum=0.9, axis_name="data", axis_index_groups=groups
    )
    # device i sees constant value i -> group means 1.5 and 5.5
    x = jnp.arange(n_dev, dtype=jnp.float32)[:, None, None] * jnp.ones(
        (n_dev, 4, 3)
    )
    variables = bn.init(jax.random.PRNGKey(0), x[0], True)

    def fwd(v, x):
        out, mutated = bn.apply(v, x, True, mutable=["batch_stats"])
        return mutated["batch_stats"]

    stats = jax.pmap(fwd, axis_name="data", in_axes=(None, 0))(variables, x)
    means = np.asarray(jax.tree_util.tree_leaves(stats)[0])  # ra_mean
    # linen: ra_mean = 0.9*0 + 0.1*group_mean
    got = means[:, 0]
    expected = np.array([0.15] * 4 + [0.55] * 4)
    np.testing.assert_allclose(got, expected, atol=1e-6)


@pytest.mark.slow
def test_train_step_remat_matches_no_remat():
    """Activation remat recomputes the same forward: identical updates."""
    model = _tiny_model()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 2, 32, 32, 3)), jnp.float32
    )
    labels = jnp.asarray([0, 1, 2, 3])
    variables = model.init(jax.random.PRNGKey(0), x, False)
    tx = construct_optimizer(
        variables["params"], OptimizerConfig(method="sgd", lr=0.05)
    )
    batch = {"video": x, "label": labels}

    results = []
    for policy in (None, "full", "dots_with_no_batch_dims_saveable"):
        state = create_train_state(variables, tx)
        step = jax.jit(make_train_step(model, tx, remat_policy=policy))
        state, metrics = step(state, batch, jax.random.PRNGKey(3))
        results.append(
            (float(metrics["loss"]), jax.tree_util.tree_leaves(state.params)[0])
        )
    base_loss, base_leaf = results[0]
    for loss, leaf in results[1:]:
        np.testing.assert_allclose(loss, base_loss, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(base_leaf), atol=1e-6
        )


@pytest.mark.slow
def test_train_step_data_parallel_mesh():
    assert len(jax.devices()) == 8
    mesh = make_mesh((-1,), ("data",))
    model = _tiny_model()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 2, 32, 32, 3)), jnp.float32
    )
    labels = jnp.asarray(np.arange(8) % 5)
    variables = model.init(jax.random.PRNGKey(0), x, False)
    tx = construct_optimizer(variables["params"], OptimizerConfig(lr=0.05))
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)
    batch = shard_batch({"video": x, "label": labels}, mesh)
    jit_step = jax.jit(step)
    state2, metrics = jit_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    # Sharded result must equal single-device result (SyncBN-for-free check:
    # global batch stats identical regardless of device layout).
    state_single = jax.device_put(
        create_train_state(variables, tx), jax.devices()[0]
    )
    batch_single = {"video": x, "label": labels}
    state3, metrics_single = jax.jit(step)(
        state_single, batch_single, jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_single["loss"]), rtol=1e-4
    )
    flat2 = jax.tree_util.tree_leaves(state2.batch_stats)
    flat3 = jax.tree_util.tree_leaves(state3.batch_stats)
    for a, b in zip(flat2, flat3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_tensor_parallel_shardings():
    mesh = make_mesh((4, 2), ("data", "model"))
    model = models.create_multiscale_vision_transformers(
        spatial_size=32,
        temporal_size=2,
        depth=2,
        num_heads=2,
        patch_embed_dim=32,
        head_num_classes=4,
    )
    x = jnp.zeros((2, 2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    shardings = infer_param_shardings(
        variables["params"], mesh, MEGATRON_ATTENTION_RULES
    )
    qspec = shardings["blocks_0"]["attn"]["q"]["kernel"].spec
    assert tuple(qspec) == (None, "model")
    projspec = shardings["blocks_0"]["attn"]["proj"]["kernel"].spec
    assert tuple(projspec) == ("model", None)
    # forward under sharded params runs and matches replicated forward
    sharded_params = jax.device_put(variables["params"], shardings)
    out_sharded = jax.jit(lambda p, x: model.apply({"params": p}, x, False))(
        sharded_params, x
    )
    out_repl = model.apply(variables, x, False)
    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_repl), rtol=1e-4, atol=1e-5
    )


def test_lr_policy_matches_reference_semantics():
    cfg = LRSchedulerConfig(
        lr_policy="cosine",
        lr=0.1,
        max_iters=100,
        warmup_iters=10,
        warmup_start_lr=0.01,
        cosine_end_lr=0.0,
        cosine_after_warmup=False,
    )
    # warmup: linear from warmup_start_lr to cosine(10)
    assert get_lr_at_epoch(cfg, 0.0) == pytest.approx(0.01)
    import math

    expected_10 = 0.0 + 0.1 * (math.cos(math.pi * 10 / 100) + 1) / 2
    assert get_lr_at_epoch(cfg, 10.0) == pytest.approx(expected_10)
    assert get_lr_at_epoch(cfg, 100.0) == pytest.approx(0.0, abs=1e-9)

    # jnp schedule agrees with the closed form
    sched = lr_schedule_from_config(cfg, steps_per_epoch=10)
    for step in [0, 5, 50, 500, 999]:
        np.testing.assert_allclose(
            float(sched(jnp.asarray(step))),
            get_lr_at_epoch(cfg, step / 10),
            rtol=1e-5,
            atol=1e-8,
        )


def test_steps_with_relative_lrs():
    cfg = LRSchedulerConfig(
        lr_policy="steps_with_relative_lrs",
        lr=0.1,
        max_iters=100,
        warmup_iters=0,
        steps=[0, 40, 80],
        lrs=[1.0, 0.1, 0.01],
    )
    assert get_lr_at_epoch(cfg, 10.0) == pytest.approx(0.1)
    assert get_lr_at_epoch(cfg, 50.0) == pytest.approx(0.01)
    assert get_lr_at_epoch(cfg, 90.0) == pytest.approx(0.001)
    sched = lr_schedule_from_config(cfg, steps_per_epoch=1)
    for e in [10, 50, 90]:
        np.testing.assert_allclose(
            float(sched(jnp.asarray(e))), get_lr_at_epoch(cfg, float(e)), rtol=1e-5
        )


@pytest.mark.slow
def test_lars_optimizer_runs():
    model = _tiny_model()
    x = jnp.zeros((2, 2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    tx = construct_optimizer(
        variables["params"],
        OptimizerConfig(
            method="sgd", lr=0.1, lars_on=True, zero_weight_decay_1d_param=True
        ),
    )
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, tx))
    state, metrics = step(
        state, {"video": x, "label": jnp.asarray([0, 1])}, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_graft_entry_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_grad_accum_matches_full_batch():
    """grad_accum_steps=N on a BN-free model reproduces the full-batch
    update exactly: mean-of-microbatch grads == full-batch grad, one
    optimizer update."""
    model = models.create_multiscale_vision_transformers(
        spatial_size=16,
        temporal_size=2,
        depth=1,
        num_heads=2,
        patch_embed_dim=16,
        head_num_classes=5,
        dropout_rate_block=0.0,
        droppath_rate_block=0.0,
        head_dropout_rate=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, 2, 16, 16, 3)), jnp.float32
    )
    labels = jnp.asarray([0, 1, 2, 3])
    variables = model.init(jax.random.PRNGKey(0), x, False)
    tx = construct_optimizer(
        variables["params"], OptimizerConfig(method="sgd", lr=0.05)
    )
    batch = {"video": x, "label": labels}
    key = jax.random.PRNGKey(7)

    state1 = create_train_state(variables, tx)
    step1 = jax.jit(make_train_step(model, tx))
    state1, m1 = step1(state1, batch, key)

    state2 = create_train_state(variables, tx)
    step2 = jax.jit(make_train_step(model, tx, grad_accum_steps=2))
    state2, m2 = step2(state2, batch, key)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), atol=1e-6
    )
    np.testing.assert_allclose(
        float(m1["accuracy"]), float(m2["accuracy"]), atol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5
        )


def test_grad_accum_threads_bn_stats():
    """With BN, each microbatch sequentially updates running stats."""
    model = _tiny_model()
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(4, 2, 32, 32, 3)), jnp.float32
    )
    labels = jnp.asarray([0, 1, 2, 3])
    variables = model.init(jax.random.PRNGKey(0), x, False)
    tx = construct_optimizer(
        variables["params"], OptimizerConfig(method="sgd", lr=0.05)
    )
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, tx, grad_accum_steps=2))
    new_state, metrics = step(state, {"video": x, "label": labels}, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    before = jax.tree_util.tree_leaves(state.batch_stats)
    after = jax.tree_util.tree_leaves(new_state.batch_stats)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )
    assert changed, "batch_stats did not update through the scan"


@pytest.mark.slow
def test_fsdp_shardings_match_replicated():
    """FSDP (ZeRO-3 via GSPMD): large params sharded over the data axis;
    the train step compiles, runs, and matches the replicated result.
    Beyond reference parity (SURVEY 2.10) — useful when HBM is tight."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh((-1,), ("data",))
    model = _tiny_model()
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(8, 2, 32, 32, 3)), jnp.float32
    )
    labels = jnp.asarray(np.arange(8) % 5)
    variables = model.init(jax.random.PRNGKey(0), x, False)
    tx = construct_optimizer(variables["params"], OptimizerConfig(lr=0.05))
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx)

    shardings = infer_param_shardings(
        variables["params"], mesh, fsdp_axis="data", fsdp_min_size=256
    )
    specs = {
        tuple(s.spec)
        for s in jax.tree_util.tree_leaves(shardings)
        if any(a is not None for a in s.spec)
    }
    assert specs, "no parameter got FSDP-sharded"

    from pytorchvideo_tpu.parallel import optimizer_state_shardings
    from pytorchvideo_tpu.train import TrainState

    repl = NamedSharding(mesh, P())
    opt_shardings = optimizer_state_shardings(
        state.opt_state, shardings, mesh
    )
    # the SGD momentum subtree inherited the FSDP param shardings
    assert any(
        any(a is not None for a in s.spec)
        for s in jax.tree_util.tree_leaves(opt_shardings)
    ), "optimizer state not sharded"
    state_shardings = TrainState(
        step=repl,
        params=shardings,
        batch_stats=jax.tree_util.tree_map(
            lambda _: repl, state.batch_stats
        ),
        opt_state=opt_shardings,
    )
    state_f = jax.device_put(state, state_shardings)
    batch = shard_batch({"video": x, "label": labels}, mesh)
    state_f2, metrics_f = jax.jit(step)(state_f, batch, jax.random.PRNGKey(0))

    state_r = jax.device_put(state, jax.devices()[0])
    state_r2, metrics_r = jax.jit(step)(
        state_r, {"video": x, "label": labels}, jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(
        float(metrics_f["loss"]), float(metrics_r["loss"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state_f2.params),
        jax.tree_util.tree_leaves(state_r2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )
