"""Inference hooks: named-input/output units with failure strategies.

Parity: pytorchvideo/neural_engine/hook.py (HookBase :97-144, FAIL_STRATEGY
:17, DecodeHook :155, X3DClsHook :184).
"""

from __future__ import annotations

import logging
from collections import OrderedDict
from typing import Callable, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

FAIL_STRATEGY = ("RANDOM_FILL", "ZERO_FILL", "RETURN_NONE", "RAISE_ERROR")
HOOK_STATUS = ("PENDING", "SCHEDULED", "EXECUTING", "EXECUTED", "FAILED", "EARLY_EXIT")


class HookBase:
    """A pipeline unit declaring its inputs/outputs and failure handling."""

    def __init__(
        self,
        executor: Optional[Callable] = None,
        inputs: Optional[List[str]] = None,
        outputs: Optional[List[str]] = None,
        fail_strategy: str = "RAISE_ERROR",
        priority: int = 1,
    ):
        assert fail_strategy in FAIL_STRATEGY
        self.executor = executor
        self.inputs = inputs or []
        self.outputs = outputs or []
        self.fail_strategy = fail_strategy
        self.priority = priority
        self.status = "PENDING"

    def run(self, status: OrderedDict) -> dict:
        self.status = "EXECUTING"
        try:
            out = self._run(status)
            self.status = "EXECUTED"
            return out or {}
        except Exception as e:
            self.status = "FAILED"
            if self.fail_strategy == "RAISE_ERROR":
                raise
            logger.warning("hook %s failed (%s): %s", type(self).__name__,
                           self.fail_strategy, e)
            if self.fail_strategy == "RETURN_NONE":
                return {k: None for k in self.outputs}
            fill = (
                (lambda: np.random.rand(1))
                if self.fail_strategy == "RANDOM_FILL"
                else (lambda: np.zeros(1))
            )
            return {k: fill() for k in self.outputs}

    def _run(self, status: OrderedDict) -> dict:
        if self.executor is None:
            return {}
        return self.executor(status)

    def get_inputs(self):
        return self.inputs

    def get_outputs(self):
        return self.outputs


def full_decode(status: OrderedDict, **args):
    """Decode the whole video at status['path']
    (reference hook.py:146-152)."""
    from pytorchvideo_tpu.data.encoded_video import EncodedVideo

    decoder = args.get("decoder", "opencv")
    decode_audio = args.get("decode_audio", False)
    video = EncodedVideo.from_path(
        status["path"], decode_audio=decode_audio, decoder=decoder
    )
    return video.get_clip(0, video.duration)


class DecodeHook(HookBase):
    """path -> video(/audio) (reference hook.py:155-181)."""

    def __init__(
        self,
        executor: Callable = full_decode,
        decode_audio: bool = False,
        decoder: str = "opencv",
        fail_strategy: str = "RAISE_ERROR",
        priority: int = 1,
    ):
        super().__init__(
            executor=executor,
            inputs=["path"],
            outputs=["video", "audio"] if decode_audio else ["video"],
            fail_strategy=fail_strategy,
            priority=priority,
        )
        self.decode_audio = decode_audio
        self.decoder = decoder

    def _run(self, status: OrderedDict) -> dict:
        clip = self.executor(
            status, decode_audio=self.decode_audio, decoder=self.decoder
        )
        out = {"video": clip["video"]}
        if self.decode_audio:
            out["audio"] = clip.get("audio")
        return out


class X3DClsHook(HookBase):
    """video -> action_class logits with an X3D-S classifier
    (reference hook.py:184-232; ours builds the jitted model in-process
    instead of torch.hub, taking optional pretrained variables)."""

    def __init__(
        self,
        variables=None,
        fail_strategy: str = "RAISE_ERROR",
        priority: int = 1,
        num_frames: int = 13,
        side_size: int = 182,
        crop_size: int = 160,
    ):
        super().__init__(
            inputs=["video"],
            outputs=["action_class"],
            fail_strategy=fail_strategy,
            priority=priority,
        )
        import jax
        import jax.numpy as jnp

        from pytorchvideo_tpu.models import hub
        from pytorchvideo_tpu.transforms import (
            CenterCropVideo,
            Compose,
            Div255,
            Normalize,
            ShortSideScale,
            UniformTemporalSubsample,
        )

        self.transform = Compose(
            [
                UniformTemporalSubsample(num_frames),
                Div255(),
                Normalize([0.45] * 3, [0.225] * 3),
                ShortSideScale(side_size),
                CenterCropVideo(crop_size),
            ]
        )
        self.model = hub.x3d_s(model_num_class=400)
        if variables is None:
            import jax

            example = jnp.zeros((1, num_frames, crop_size, crop_size, 3))
            variables = self.model.init(jax.random.PRNGKey(0), example, False)
        self.variables = variables
        self._forward = jax.jit(lambda v, x: self.model.apply(v, x, False))

    def _run(self, status: OrderedDict) -> dict:
        import jax.numpy as jnp

        video = self.transform(jnp.asarray(status["video"]))
        logits = self._forward(self.variables, video[None])
        return {"action_class": logits}
