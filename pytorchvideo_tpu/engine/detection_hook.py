"""Detection hooks for the NeuralEngine pipeline.

Parity: pytorchvideo/neural_engine/detection_hook.py (ImageLoadHook :89,
Detectron2PeopleDetectionHook :120, PeopleKeypointDetectionHook :48). The
reference instantiates detectron2 predictors; detectron2 is CUDA-bound, so
here the person detector is an injectable callable (`predictor`) — any
`image -> (N, 4) xyxy boxes` function (e.g. an imported Faster-RCNN served
elsewhere, or ground-truth boxes). The action-detection hook then runs our
TPU RoI-head SlowFast/Slow models (models/detection.py) over those boxes,
covering the reference's people-detection -> action flow end to end.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Optional

import numpy as np

from pytorchvideo_tpu.engine.hook import HookBase


def image_load_executor(image_path: str) -> np.ndarray:
    """Load one image file to an HWC uint8 RGB array
    (reference detection_hook.py:84-86 uses cv2.imread BGR; we return RGB)."""
    import cv2

    arr = cv2.imread(image_path)
    if arr is None:
        raise IOError(f"failed to read image: {image_path}")
    return cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)


class ImageLoadHook(HookBase):
    """image_path -> loaded_image (reference detection_hook.py:89-99)."""

    def __init__(self, executor: Callable = image_load_executor):
        super().__init__(
            executor=executor, inputs=["image_path"], outputs=["loaded_image"]
        )

    def _run(self, status: OrderedDict) -> dict:
        return {"loaded_image": self.executor(status["image_path"])}


#: reference detection_hook.py:20-24 — default keypoint model config.
#: backend "torchvision" replaces detectron2 (CUDA-bound); the COCO person
#: class index stays 0 there vs 1 in torchvision, handled in the executors.
model_config = {
    "backend": "torchvision",
    "model": "keypointrcnn_resnet50_fpn",
    "threshold": 0.7,
}

#: reference detection_hook.py:113-117.
det_models = {
    "faster_rcnn_R_50_C4": "fasterrcnn_resnet50_fpn",
    "faster_rcnn_R_50_FPN": "fasterrcnn_resnet50_fpn",
    "fasterrcnn_resnet50_fpn": "fasterrcnn_resnet50_fpn",
}


def generate_predictor(model_config: dict, *args):
    """Build a person/keypoint predictor from a model config
    (reference detection_hook.py:27-42, detectron2 DefaultPredictor).

    Here the backend is torchvision's detection zoo (CPU torch). Returns a
    callable ``image (HWC uint8 RGB) -> {"boxes", "scores", "labels",
    ["keypoints"]}`` with score thresholding applied.
    """
    if model_config["backend"] != "torchvision":
        raise ValueError(
            f"Unsupported backend {model_config['backend']!r}; inject a "
            "custom predictor callable instead."
        )
    import torch
    import torchvision

    builder = getattr(torchvision.models.detection, model_config["model"])
    weights = model_config.get("weights", "DEFAULT")
    try:
        net = builder(weights=weights)
    except Exception:
        # zero-egress environments cannot download pretrained weights
        net = builder(weights=None)
    net.eval()
    threshold = float(model_config.get("threshold", 0.7))

    def predictor(image: np.ndarray) -> dict:
        with torch.no_grad():
            t = torch.as_tensor(
                np.ascontiguousarray(image), dtype=torch.float32
            ).permute(2, 0, 1) / 255.0
            out = net([t])[0]
        keep = out["scores"] >= threshold
        result = {
            k: v[keep].cpu().numpy()
            for k, v in out.items()
            if hasattr(v, "cpu")
        }
        return result

    return predictor


def people_detection_executor(loaded_image, predictor) -> np.ndarray:
    """Run the predictor, keep person boxes only ((N, 4) xyxy float32;
    reference detection_hook.py:102-110 filters pred_classes == 0 —
    torchvision's COCO person label is 1)."""
    out = predictor(loaded_image)
    person = out["labels"] == 1
    return np.asarray(out["boxes"][person], np.float32).reshape(-1, 4)


def people_keypoints_executor(loaded_image, predictor) -> np.ndarray:
    """Run the predictor, keep person keypoints ((N, K, 3) (x, y, score);
    reference detection_hook.py:45-46, :75-81)."""
    out = predictor(loaded_image)
    person = out["labels"] == 1
    return np.asarray(out["keypoints"][person], np.float32)


class Detectron2PeopleDetectionHook(HookBase):
    """loaded_image -> bbox_coordinates via a configured detection model
    (reference detection_hook.py:120-151; the name is kept for API parity —
    the backend here is torchvision, see ``generate_predictor``)."""

    def __init__(
        self,
        model_config: dict = None,
        executor: Callable = people_detection_executor,
        fail_strategy: str = "RAISE_ERROR",
        priority: int = 1,
    ):
        super().__init__(
            inputs=["loaded_image"],
            outputs=["bbox_coordinates"],
            fail_strategy=fail_strategy,
            priority=priority,
        )
        self.model_config = model_config or {
            "backend": "torchvision",
            "model": "fasterrcnn_resnet50_fpn",
            "threshold": 0.7,
        }
        self.executor = executor
        self.predictor = generate_predictor(self.model_config)

    def _run(self, status: OrderedDict) -> dict:
        boxes = self.executor(status["loaded_image"], self.predictor)
        return {"bbox_coordinates": boxes}


class PeopleKeypointDetectionHook(HookBase):
    """(loaded_image, bbox_coordinates) -> keypoint_coordinates
    (reference detection_hook.py:48-81)."""

    def __init__(
        self,
        model_config: dict = model_config,
        executor: Callable = people_keypoints_executor,
        fail_strategy: str = "RAISE_ERROR",
        priority: int = 1,
    ):
        super().__init__(
            inputs=["loaded_image", "bbox_coordinates"],
            outputs=["keypoint_coordinates"],
            fail_strategy=fail_strategy,
            priority=priority,
        )
        self.model_config = model_config
        self.executor = executor
        self.predictor = generate_predictor(model_config)

    def _run(self, status: OrderedDict) -> dict:
        keypoints = self.executor(status["loaded_image"], self.predictor)
        return {"keypoint_coordinates": keypoints}


def full_frame_person_boxes(loaded_image: np.ndarray) -> np.ndarray:
    """Fallback predictor: one box covering the full frame — lets the
    pipeline run without an external person detector."""
    h, w = loaded_image.shape[:2]
    return np.asarray([[0.0, 0.0, float(w), float(h)]], np.float32)


class PeopleDetectionHook(HookBase):
    """loaded_image -> bbox_coordinates (xyxy, people only).

    Reference Detectron2PeopleDetectionHook (detection_hook.py:120-151)
    builds a detectron2 Faster-RCNN and filters pred_classes == 0; here the
    predictor is injected (default: full-frame box)."""

    def __init__(
        self,
        predictor: Optional[Callable] = None,
        threshold: float = 0.7,
        fail_strategy: str = "RAISE_ERROR",
        priority: int = 1,
    ):
        super().__init__(
            inputs=["loaded_image"],
            outputs=["bbox_coordinates"],
            fail_strategy=fail_strategy,
            priority=priority,
        )
        self.predictor = predictor or full_frame_person_boxes
        self.threshold = threshold

    def _run(self, status: OrderedDict) -> dict:
        boxes = np.asarray(self.predictor(status["loaded_image"]), np.float32)
        return {"bbox_coordinates": boxes.reshape(-1, 4)}


class ActionDetectionHook(HookBase):
    """(video, bbox_coordinates) -> action_scores via a TPU RoI-head model.

    The TPU analogue of the reference's detection demo path
    (tutorials/video_detection_example uses hub slowfast_r50_detection +
    detectron2 boxes): clip -> preprocess -> RoI head logits per box."""

    def __init__(
        self,
        variables=None,
        model_name: str = "slow_r50_detection",
        num_frames: int = 4,
        side_size: int = 256,
        crop_size: int = 256,
        fail_strategy: str = "RAISE_ERROR",
        priority: int = 1,
        **model_kwargs,
    ):
        super().__init__(
            inputs=["video", "bbox_coordinates"],
            outputs=["action_scores"],
            fail_strategy=fail_strategy,
            priority=priority,
        )
        import jax
        import jax.numpy as jnp

        from pytorchvideo_tpu.models import hub
        from pytorchvideo_tpu.transforms import (
            Compose,
            Div255,
            Normalize,
            ShortSideScale,
            UniformTemporalSubsample,
        )

        self.crop_size = crop_size
        self.transform = Compose(
            [
                UniformTemporalSubsample(num_frames),
                Div255(),
                Normalize([0.45] * 3, [0.225] * 3),
                ShortSideScale(side_size),
            ]
        )
        self.model = getattr(hub, model_name)(**model_kwargs)
        if variables is None:
            example = jnp.zeros((1, num_frames, crop_size, crop_size, 3))
            ex_boxes = jnp.zeros((1, 5))
            variables = self.model.init(
                jax.random.PRNGKey(0), example, ex_boxes, False
            )
        self.variables = variables
        self._forward = jax.jit(
            lambda v, x, b: self.model.apply(v, x, b, False)
        )

    def _run(self, status: OrderedDict) -> dict:
        import jax.numpy as jnp

        video = jnp.asarray(status["video"], jnp.float32)
        t, h, w = video.shape[0], video.shape[1], video.shape[2]
        video = self.transform(video)
        # scale boxes from original frame to the transformed frame
        sh, sw = video.shape[1], video.shape[2]
        boxes = np.asarray(status["bbox_coordinates"], np.float32).reshape(-1, 4)
        boxes = boxes * np.asarray(
            [sw / w, sh / h, sw / w, sh / h], np.float32
        )
        # center-crop to crop_size (boxes shifted accordingly, then clipped)
        y0 = max((sh - self.crop_size) // 2, 0)
        x0 = max((sw - self.crop_size) // 2, 0)
        video = video[:, y0 : y0 + self.crop_size, x0 : x0 + self.crop_size]
        boxes = boxes - np.asarray([x0, y0, x0, y0], np.float32)
        boxes = np.clip(boxes, 0, self.crop_size)
        rois = np.concatenate(
            [np.zeros((len(boxes), 1), np.float32), boxes], axis=1
        )
        scores = self._forward(
            self.variables, video[None], jnp.asarray(rois)
        )
        return {"action_scores": scores}
