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


def test_eval_golden_fixture():
    """Golden-fixture regression lock for the whole eval protocol.

    Synthetic videos are constructed so that the FIRST clip of every video
    is misclassified on its own while sum-ensembling over both clips
    recovers the true class (and max-ensembling provably picks the wrong
    class) — so this pins, end to end: decode, ShortSideScale/crop,
    UniformTemporalSubsample, constant_clips_per_video clip extraction,
    video_index bookkeeping, and `ensemble_video_level` semantics
    (reference module/video_classification.py:275-311). Any regression in
    any of those flips the pinned top-1 values.

    Construction: class k's videos are two constant-brightness halves
    (b1 ~55 gray-levels on the WRONG side of class k's brightness center,
    b2 15 levels on the right side); the model scores
    -(mean_brightness - center_k)^2. Per clip: clip 1 lands 5 levels from
    the neighboring center (strongly wrong), clip 2 lands 15 levels from
    the true one (weakly right). Sum: -(55^2+15^2) beats -(5^2+75^2) ->
    100% top-1. Max: -25 (wrong) beats -225 (true) -> 0% top-1.
    """
    import tempfile

    import cv2
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    import eval_kinetics

    centers_b = np.array([40.0, 100.0, 160.0, 220.0])
    b1 = np.where(np.arange(4) == 0, centers_b + 55, centers_b - 55)
    b2 = np.where(np.arange(4) == 0, centers_b - 15, centers_b + 15)

    class BrightnessModel(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            c = self.param(
                "centers",
                lambda k: jnp.asarray(
                    (centers_b / 255.0 - 0.45) / 0.225, jnp.float32
                ),
            )
            m = jnp.mean(x, axis=tuple(range(1, x.ndim)))
            return -jnp.square(m[:, None] - c[None, :])

    model = BrightnessModel()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 64, 64, 3)), False
    )

    with tempfile.TemporaryDirectory() as td:
        csv = os.path.join(td, "val.csv")
        with open(csv, "w") as f:
            for k in range(4):
                p = os.path.join(td, f"v{k}.avi")
                wr = cv2.VideoWriter(
                    p, cv2.VideoWriter_fourcc(*"FFV1"), 4, (64, 64)
                )
                for b in [b1[k]] * 4 + [b2[k]] * 4:
                    wr.write(np.full((64, 64, 3), int(b), np.uint8))
                wr.release()
                f.write(f"{p} {k}\n")

        results = {
            method: eval_kinetics.evaluate(
                model,
                variables,
                csv,
                num_frames=4,
                sampling_rate=1,
                side_size=64,
                crop_size=64,
                clips_per_video=2,
                spatial_crops=1,
                alpha=None,
                batch_size=4,
                fps=4.0,
                ensemble_method=method,
            )
            for method in ("sum", "max")
        }

    assert results["sum"]["num_videos"] == 4
    assert results["sum"]["views"] == "2x1"
    assert results["sum"]["top1"] == 100.0
    assert results["max"]["top1"] == 0.0


def test_eval_configs_cover_model_zoo():
    """Every kinetics hub factory named in MODEL_ZOO.md has an eval config."""
    import eval_kinetics
    from pytorchvideo_tpu.models import hub

    for name in eval_kinetics.EVAL_CONFIGS:
        assert hasattr(hub, name), name
