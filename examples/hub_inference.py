"""Hub inference walkthrough: classify a video with a model-zoo factory.

Parity: tutorials/torchhub_inference_tutorial.ipynb (torch.hub.load ->
transform -> top-5 Kinetics classes). Here the same flow is: hub factory
-> (optional) reference-checkpoint import -> UniformClipSampler clip ->
val transform -> jitted forward -> top-5.

Usage:
  python examples/hub_inference.py --video clip.mp4 \
      [--model x3d_s] [--checkpoint X3D_S.pyth] [--labels kinetics.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# (num_frames, side, crop, frames_per_second sampling window)
MODEL_GEOM = {
    "x3d_xs": (4, 182, 160, 12),
    "x3d_s": (13, 182, 160, 6),
    "x3d_m": (16, 256, 224, 5),
    "slow_r50": (8, 256, 224, 8),
    "i3d_r50": (8, 256, 224, 8),
    "c2d_r50": (8, 256, 224, 8),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", required=True)
    p.add_argument("--model", default="x3d_s", choices=sorted(MODEL_GEOM))
    p.add_argument("--checkpoint", default="", help=".pyth reference ckpt")
    p.add_argument("--labels", default="", help="json list of class names")
    p.add_argument("--classes", type=int, default=400)
    args = p.parse_args()

    from pytorchvideo_tpu.data.encoded_video import EncodedVideo
    from pytorchvideo_tpu.models import hub
    from pytorchvideo_tpu.transforms import (
        CenterCropVideo,
        Compose,
        Div255,
        Normalize,
        ShortSideScale,
        UniformTemporalSubsample,
    )

    num_frames, side, crop, rate = MODEL_GEOM[args.model]
    model = getattr(hub, args.model)(model_num_class=args.classes)
    example = jnp.zeros((1, num_frames, crop, crop, 3))
    if args.checkpoint:
        from pytorchvideo_tpu.zoo.import_torch import X3D_RENAME_RULES

        rules = X3D_RENAME_RULES if args.model.startswith("x3d") else None
        variables, report = hub.load_pretrained_variables(
            model, example, args.checkpoint, rename_rules=rules
        )
    else:
        variables = model.init(jax.random.PRNGKey(0), example, False)
        print("note: random weights (pass --checkpoint for real predictions)")

    transform = Compose(
        [
            UniformTemporalSubsample(num_frames),
            Div255(),
            Normalize([0.45] * 3, [0.225] * 3),
            ShortSideScale(side),
            CenterCropVideo(crop),
        ]
    )

    video = EncodedVideo.from_path(args.video, decode_audio=False)
    clip_dur = num_frames * rate / 30.0
    clip = video.get_clip(0, min(clip_dur, video.duration))["video"]
    x = jnp.asarray(np.asarray(transform(clip)))[None]

    logits = jax.jit(lambda v, x: model.apply(v, x, False))(variables, x)
    probs = jax.nn.softmax(logits[0])
    top5 = np.argsort(np.asarray(probs))[::-1][:5]

    names = None
    if args.labels:
        names = json.load(open(args.labels))
    for rank, idx in enumerate(top5, 1):
        label = names[idx] if names else f"class_{idx}"
        print(f"{rank}. {label}  p={float(probs[idx]):.4f}")


if __name__ == "__main__":
    main()
