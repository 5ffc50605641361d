"""Golden lock of the full checkpoint chain: torch .pyth -> importer ->
(deploy BN-fold) -> model-zoo eval protocol.

tests/test_models_parity.py locks per-model logit parity of the importer;
tests/test_eval_harness.py locks the eval protocol with a fake model. This
test locks the *composition* — the one previously-untested link: a real
reference torch state_dict (reference models/hub/resnet.py:30-38 .pyth
format) saved to disk, loaded by ``examples/eval_kinetics.py`` through
``zoo/import_torch.py`` with the family's rename rules, optionally folded
into deploy form (accelerate/fuse.py), then evaluated with the published
10-clip x 3-crop protocol on a golden synthetic val set.

The expected answer is computed by running the *reference torch model
itself* through the identical evaluate() pipeline (a duck-typed shim whose
``apply`` calls the torch module), so every per-video prediction — not just
the two scalar rates — must match across:
  torch forward  ==  imported jax forward  ==  imported + BN-folded forward.
"""

import os
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
    ),
)

from tests.ref_loader import load_ref


class _TorchShim:
    """Duck-typed stand-in for (model, variables): ``apply`` runs the
    reference torch module on the same (B,T,H,W,C) batches evaluate()
    feeds the jax model."""

    def __init__(self, torch_model):
        self._m = torch_model

    def apply(self, variables, x, train):
        import torch

        xt = torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy())
        with torch.no_grad():
            return self._m(xt).numpy()


def test_import_deploy_eval_chain_x3d_tiny():
    """Fast-tier lock: tiny x3d geometry (depth_factor 0.34 -> 6 res
    blocks, 96 crop) so the whole chain runs in well under a minute; the
    full hub-geometry strict import is covered by
    tests/test_models_parity.py."""
    import torch

    import eval_kinetics

    ref_x3d = load_ref("pytorchvideo.models.x3d")
    torch.manual_seed(0)
    model_kwargs = dict(
        input_clip_length=4,
        input_crop_size=96,
        depth_factor=0.34,
        dropout_rate=0.0,
    )
    ref_model = ref_x3d.create_x3d(model_num_class=4, **model_kwargs).eval()

    with tempfile.TemporaryDirectory() as td:
        pyth = os.path.join(td, "X3D_XS_synthetic.pyth")
        torch.save({"model_state": ref_model.state_dict()}, pyth)
        csv = eval_kinetics.make_synthetic_dataset(
            td, num_videos=3, num_classes=4, seconds=1.6, fps=10
        )

        import json

        common = [
            "--model",
            "x3d_xs",
            "--data",
            csv,
            "--num-classes",
            "4",
            "--clips-per-video",
            "2",
            "--spatial-crops",
            "1",
            "--batch-size",
            "6",
            "--side-size",
            "110",
            "--crop-size",
            "96",
            "--model-kwargs",
            json.dumps(model_kwargs),
        ]
        ours = eval_kinetics.main(common + ["--checkpoint", pyth])
        deployed = eval_kinetics.main(common + ["--checkpoint", pyth, "--deploy"])

        # reference torch model through the identical protocol
        expected = eval_kinetics.evaluate(
            _TorchShim(ref_model),
            None,
            csv,
            num_frames=4,
            sampling_rate=12,
            side_size=110,
            crop_size=96,
            clips_per_video=2,
            spatial_crops=1,
            alpha=None,
            batch_size=6,
            jit_forward=False,
        )

    assert expected["num_videos"] == 3
    assert ours["predictions"] == expected["predictions"], (
        f"imported-checkpoint eval diverged from the reference torch model: "
        f"{ours['predictions']} vs {expected['predictions']}"
    )
    assert (ours["top1"], ours["top5"]) == (expected["top1"], expected["top5"])
    # deploy fold is exact: identical predictions and rates
    assert deployed["predictions"] == ours["predictions"]
    assert (deployed["top1"], deployed["top5"]) == (ours["top1"], ours["top5"])
