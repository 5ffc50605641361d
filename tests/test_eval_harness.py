"""Model-zoo eval harness smoke test (examples/eval_kinetics.py)."""

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"),
)


@pytest.mark.slow
def test_eval_kinetics_synthetic_smoke():
    import eval_kinetics

    result = eval_kinetics.main(
        [
            "--model",
            "x3d_xs",
            "--synthetic",
            "--num-classes",
            "4",
            "--clips-per-video",
            "2",
            "--batch-size",
            "4",
        ]
    )
    assert result["model"] == "x3d_xs"
    assert result["num_videos"] == 4
    assert result["views"] == "2x3"
    assert 0.0 <= result["top1"] <= 100.0
    assert result["top5"] >= result["top1"]


def test_eval_configs_cover_model_zoo():
    """Every kinetics hub factory named in MODEL_ZOO.md has an eval config."""
    import eval_kinetics
    from pytorchvideo_tpu.models import hub

    for name in eval_kinetics.EVAL_CONFIGS:
        assert hasattr(hub, name), name
