"""Tests: trainer losses + metrics + distributed helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchvideo_tpu.parallel.distributed import (
    get_local_size,
    get_world_size,
    local_sync_groups,
)
from pytorchvideo_tpu.train.losses import (
    contrastive_loss,
    ntxent_loss,
    similarity_loss,
)
from pytorchvideo_tpu.train.metrics import (
    mean_average_precision,
    top1_top5,
    topk_accuracy,
)


def test_ntxent_prefers_aligned_pairs():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    aligned = ntxent_loss(z, z + 0.01)
    shuffled = ntxent_loss(z, jnp.flip(z, 0))
    assert float(aligned) < float(shuffled)


def test_similarity_loss_bounds():
    z = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)), jnp.float32)
    assert float(similarity_loss(z, z)) == pytest.approx(-1.0, abs=1e-5)
    assert float(similarity_loss(z, -z)) == pytest.approx(1.0, abs=1e-5)


def test_contrastive_loss_positive_first():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    pos = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    negs = jnp.asarray(rng.normal(size=(4, 5, 8)), jnp.float32)
    bank = jnp.concatenate([pos[:, None], negs], axis=1)
    loss_good = contrastive_loss(q, bank, temperature=0.07)
    bank_bad = jnp.concatenate([negs[:, :1], negs], axis=1)
    loss_bad = contrastive_loss(q, bank_bad, temperature=0.07)
    assert float(loss_good) < float(loss_bad)


def test_topk_accuracy():
    logits = jnp.asarray(
        [[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.2, 0.3, 0.5]]
    )
    labels = jnp.asarray([1, 0, 0])
    assert float(topk_accuracy(logits, labels, 1)) == pytest.approx(2 / 3)
    assert float(topk_accuracy(logits, labels, 2)) == pytest.approx(2 / 3)
    assert float(topk_accuracy(logits, labels, 3)) == pytest.approx(1.0)
    out = top1_top5(jnp.tile(logits, (1, 2)), labels)
    assert 0 <= out["top1"] <= out["top5"] <= 1


def test_mean_average_precision():
    scores = np.array([[0.9, 0.1], [0.8, 0.7], [0.2, 0.6], [0.1, 0.4]])
    targets = np.array([[1, 0], [1, 1], [0, 1], [0, 0]])
    m = mean_average_precision(scores, targets)
    assert m == pytest.approx(1.0)  # perfect rankings per class
    targets_bad = np.array([[0, 1], [0, 0], [1, 0], [1, 1]])
    assert mean_average_precision(scores, targets_bad) < 1.0


def test_distributed_helpers():
    assert get_world_size() == 8  # virtual cpu mesh
    assert get_local_size() == 8
    groups = local_sync_groups(4)
    assert groups == [[0, 1, 2, 3], [4, 5, 6, 7]]
    with pytest.raises(AssertionError):
        local_sync_groups(3)
