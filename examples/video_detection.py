"""Video action-detection inference example.

Parity: tutorials/video_detection_inference_tutorial.ipynb +
tutorials/video_detection_example (detectron2 person boxes -> hub
slowfast_r50_detection -> VideoVisualizer). Ours runs the NeuralEngine
detection pipeline: decode -> person boxes (injectable predictor; defaults
to a full-frame box when no detector is supplied) -> RoI-head action model
-> annotated frames written as an .avi.

Usage:
  python examples/video_detection.py --video clip.avi --out annotated.avi \
      [--boxes boxes.csv]    # optional: one `x0,y0,x1,y1` line per person
"""

import argparse
import os
import sys
from collections import OrderedDict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", required=True)
    p.add_argument("--out", default="annotated.avi")
    p.add_argument("--boxes", default="", help="csv of x0,y0,x1,y1 person boxes")
    p.add_argument("--model", default="slow_r50_detection")
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--thres", type=float, default=0.5)
    args = p.parse_args()

    from examples.visualization import VideoVisualizer
    from pytorchvideo_tpu.data.encoded_video import EncodedVideo
    from pytorchvideo_tpu.data.utils import export_video_array
    from pytorchvideo_tpu.engine import (
        ActionDetectionHook,
        NeuralEngine,
        PeopleDetectionHook,
    )

    video = EncodedVideo.from_path(args.video)
    clip = np.asarray(video.get_clip(0, video.duration)["video"])

    predictor = None
    if args.boxes:
        fixed = np.loadtxt(args.boxes, delimiter=",").reshape(-1, 4)
        predictor = lambda img: fixed  # noqa: E731

    engine = NeuralEngine(
        [
            PeopleDetectionHook(predictor=predictor),
            ActionDetectionHook(model_name=args.model, num_frames=args.frames),
        ]
    )
    status = OrderedDict(
        loaded_image=clip[len(clip) // 2].astype(np.uint8), video=clip
    )
    out = engine.run(status)
    boxes = np.asarray(out["bbox_coordinates"])
    scores = np.asarray(out["action_scores"], np.float32).reshape(len(boxes), -1)
    print(f"{len(boxes)} boxes; top action score {scores.max():.3f}")

    vis = VideoVisualizer(num_classes=scores.shape[1], thres=args.thres)
    annotated = vis.draw_clip(clip.astype(np.uint8), boxes, scores)
    export_video_array(annotated, args.out, rate=8)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
