"""Model complexity analysis (reference model_zoo.md params/GFLOPs tables)."""

import pytest
import numpy as np

import jax.numpy as jnp

from pytorchvideo_tpu.models import hub
from pytorchvideo_tpu.utils.flops import (
    count_params,
    flops_of,
    model_complexity,
)


@pytest.mark.slow
def test_x3d_s_params_match_reference_table():
    # reference docs/source/model_zoo.md:23 -> 3.79M params
    m = hub.x3d_s(model_num_class=400)
    c = model_complexity(m, (13, 160, 160, 3))
    assert abs(c["params_m"] - 3.79) < 0.01, c
    assert c["gflops"] > 1.0


def test_flops_of_simple_matmul():
    a = jnp.zeros((128, 256))
    b = jnp.zeros((256, 64))
    f = flops_of(lambda a, b: a @ b, a, b)
    # XLA counts 2 flops per multiply-add
    assert abs(f - 2 * 128 * 256 * 64) / (2 * 128 * 256 * 64) < 0.05, f


def test_count_params_plain_tree():
    tree = {"params": {"w": np.zeros((3, 4)), "b": np.zeros((4,))}}
    assert count_params(tree) == 16
