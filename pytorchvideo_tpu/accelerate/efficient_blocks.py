"""Efficient-block protocol: train form vs deploy form.

Parity: pytorchvideo/accelerator/efficient_blocks/efficient_block_base.py:8-35
(EfficientBlockBase with forward()+convert()) and no_op_convert_block.py:43.
In the functional JAX world a "block" is (module, variables); ``convert``
produces the deploy form by transforming variables (BN fold, dtype cast) and
optionally AOT-compiling.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Callable, Optional, Tuple

import jax.numpy as jnp

from pytorchvideo_tpu.accelerate.deploy import convert_to_deployable_form


class EfficientBlockBase(ABC):
    """A module + variables pair with a train->deploy conversion."""

    @abstractmethod
    def convert(self, example_input, **kwargs):
        """Produce the deployable form (fused/cast/compiled)."""

    @abstractmethod
    def __call__(self, x, train: bool = False):
        ...


class NoOpConvertBlock(EfficientBlockBase):
    """Wrapper for blocks needing no conversion (reference
    no_op_convert_block.py:43)."""

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables

    def convert(self, example_input=None, **kwargs):
        return self

    def __call__(self, x, train: bool = False):
        return self.model.apply(self.variables, x, train)


class EfficientX3d(EfficientBlockBase):
    """X3D assembled for deployment (reference
    models/accelerator/mobile_cpu/efficient_x3d.py:20-206 — ours targets
    TPU: same create_x3d architecture, convert() = BN fold + bf16 + AOT).
    """

    _EXPANSION_CONFIG = {
        "XS": dict(input_clip_length=4, input_crop_size=160),
        "S": dict(input_clip_length=13, input_crop_size=160),
        "M": dict(input_clip_length=16, input_crop_size=224),
        "L": dict(input_clip_length=16, input_crop_size=312, depth_factor=5.0),
    }

    def __init__(self, expansion: str = "XS", num_classes: int = 400, **kwargs):
        from pytorchvideo_tpu.models.x3d import create_x3d

        assert expansion in self._EXPANSION_CONFIG
        cfg = dict(self._EXPANSION_CONFIG[expansion])
        cfg.update(kwargs)
        self.expansion = expansion
        self.config = cfg
        self.model = create_x3d(model_num_class=num_classes, **cfg)
        self.variables = None
        self._compiled = None
        self._deploy_vars = None

    def init(self, key, example_input):
        self.variables = self.model.init(key, example_input, False)
        return self.variables

    def load_variables(self, variables):
        self.variables = variables

    def convert(self, example_input, dtype=jnp.bfloat16, fold_bn: bool = True):
        assert self.variables is not None, "init or load variables first"
        self._deploy_dtype = dtype
        self._compiled, self._deploy_vars = convert_to_deployable_form(
            self.model, self.variables, example_input, fold_bn=fold_bn, dtype=dtype
        )
        return self

    def __call__(self, x, train: bool = False):
        if self._compiled is not None and not train:
            if self._deploy_dtype is not None:
                x = jnp.asarray(x, self._deploy_dtype)
            return self._compiled(self._deploy_vars, x)
        assert self.variables is not None
        return self.model.apply(self.variables, x, train)
