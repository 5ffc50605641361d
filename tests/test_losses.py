"""Parity tests for SoftTargetCrossEntropyLoss vs reference."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from pytorchvideo_tpu.losses import soft_target_cross_entropy
from ref_loader import load_ref

ref_mod = load_ref("pytorchvideo.losses.soft_target_cross_entropy")


@pytest.mark.parametrize("reduction", ["mean", "none"])
@pytest.mark.parametrize("normalize_targets", [True, False])
def test_soft_target_parity(reduction, normalize_targets):
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(6, 10)).astype(np.float32)
    target = rng.uniform(size=(6, 10)).astype(np.float32)
    ref_loss_fn = ref_mod.SoftTargetCrossEntropyLoss(
        reduction=reduction, normalize_targets=normalize_targets
    )
    ref_out = ref_loss_fn(
        torch.from_numpy(logits), torch.from_numpy(target)
    ).numpy()
    our_out = soft_target_cross_entropy(
        jnp.asarray(logits),
        jnp.asarray(target),
        reduction=reduction,
        normalize_targets=normalize_targets,
    )
    np.testing.assert_allclose(np.asarray(our_out), ref_out, rtol=1e-4, atol=1e-4)


def test_index_targets():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(4, 5)).astype(np.float32)
    target = np.array([0, 2, 4, 1])
    our_out = soft_target_cross_entropy(jnp.asarray(logits), jnp.asarray(target))
    # equals standard cross entropy
    ref_out = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(target)
    ).numpy()
    np.testing.assert_allclose(np.asarray(our_out), ref_out, rtol=1e-4)


def test_ignore_index_masks_samples():
    logits = jnp.zeros((3, 4))
    target = jnp.asarray(
        [[0.0, 1.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    )
    # ignore_index=0 -> second sample dropped
    out = soft_target_cross_entropy(logits, target, ignore_index=0, reduction="none")
    assert float(out[1]) == 0.0
    assert float(out[0]) > 0.0
