"""VideoClassificationTrainApp: end-to-end train/val/test driver.

Parity: pytorchvideo_trainer/train_app.py:27-209 +
module/video_classification.py (manual per-step LR :161-180, grad clip
:219-222, batch MixVideo :210, multi-clip test ensembling :275-311).
TPU-native: one jitted SPMD step over a data mesh (params replicated),
orbax checkpointing, precise-BN callback.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pytorchvideo_tpu.parallel import make_mesh, shard_batch
from pytorchvideo_tpu.train.config import VideoClassificationTrainConfig, save_config
from pytorchvideo_tpu.train.datamodule import VideoClassificationDataModule
from pytorchvideo_tpu.train.optimizer import (
    construct_optimizer,
    lr_schedule_from_config,
)
from pytorchvideo_tpu.train.precise_batchnorm import update_bn_stats
from pytorchvideo_tpu.train.train_loop import (
    create_train_state,
    ensemble_video_level,
    make_eval_step,
    make_train_step,
)
from pytorchvideo_tpu.train.transforms import MixVideoBatchWrapper

logger = logging.getLogger(__name__)


class VideoClassificationTrainApp:
    """Assembles model/data/optimizer from config and runs the loops."""

    def __init__(
        self,
        config: VideoClassificationTrainConfig,
        model=None,
        datamodule: Optional[VideoClassificationDataModule] = None,
        steps_per_epoch: int = 100,
    ):
        self.cfg = config
        self.steps_per_epoch = steps_per_epoch
        self.model = model if model is not None else self._build_model()
        self.datamodule = datamodule or VideoClassificationDataModule(
            config.data, config.model
        )
        self.mesh = make_mesh((-1,), ("data",))
        self.state = None
        self._train_step = None
        self._eval_step = None

    def _build_model(self):
        from pytorchvideo_tpu.models import hub

        factory = getattr(hub, self.cfg.model.name)
        kwargs = dict(self.cfg.model.kwargs)
        if self.cfg.model.name.startswith("x3d"):
            # X3D head pools are sized for the input geometry
            kwargs.setdefault("input_clip_length", self.cfg.model.clip_length)
            kwargs.setdefault("input_crop_size", self.cfg.model.crop_size)
        return factory(model_num_class=self.cfg.model.num_classes, **kwargs)

    def _example_input(self):
        m = self.cfg.model
        shape = (1, m.clip_length, m.crop_size, m.crop_size, 3)
        if m.slowfast_alpha:
            return [
                jnp.zeros(
                    (1, m.clip_length // m.slowfast_alpha, m.crop_size, m.crop_size, 3)
                ),
                jnp.zeros(shape),
            ]
        return jnp.zeros(shape)

    def setup(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        variables = self.model.init(rng, self._example_input(), False)
        schedule = lr_schedule_from_config(
            self.cfg.lr_scheduler, self.steps_per_epoch
        )
        self.tx = construct_optimizer(variables["params"], self.cfg.optim, schedule)
        self._lr_schedule = schedule
        self.state = create_train_state(variables, self.tx)

        batch_transform = None
        if self.cfg.mix.enabled:
            mix = MixVideoBatchWrapper(
                mixup_alpha=self.cfg.mix.mixup_alpha,
                cutmix_prob=self.cfg.mix.cutmix_prob,
                cutmix_alpha=self.cfg.mix.cutmix_alpha,
                label_smoothing=self.cfg.mix.label_smoothing,
                num_classes=self.cfg.model.num_classes,
            )

            def batch_transform(key, video, labels):  # noqa: F811
                mixed = mix.mix_video_transform(key, video, labels)
                return mixed

        compute_dtype = (
            None
            if self.cfg.trainer.compute_dtype in (None, "", "float32")
            else jnp.dtype(self.cfg.trainer.compute_dtype)
        )
        self._train_step = jax.jit(
            make_train_step(
                self.model,
                self.tx,
                batch_transform=batch_transform,
                clip_grad_norm=self.cfg.trainer.clip_grad_norm,
                compute_dtype=compute_dtype,
                remat_policy=self.cfg.trainer.remat_policy,
                grad_accum_steps=self.cfg.trainer.grad_accum_steps,
            )
        )
        self._eval_step = jax.jit(make_eval_step(self.model))
        return self.state

    def _device_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        on_device = jax.tree_util.tree_map(
            jnp.asarray,
            {"video": batch["video"], "label": np.asarray(batch["label"])},
        )
        batch_size = on_device["label"].shape[0]
        if batch_size % self.mesh.shape["data"] == 0:
            return shard_batch(on_device, self.mesh)
        # batch not divisible across the data axis: replicate (correct, just
        # not data-parallel) — only hit with tiny debug batches
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), on_device
        )

    def train(self, rng=None):
        if self.state is None:
            self.setup(rng)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        from pytorchvideo_tpu.train.logger import MetricsLogger

        mlog = MetricsLogger(self.cfg.trainer.log_dir)
        history = []
        global_step = 0
        for epoch in range(self.cfg.trainer.max_epochs):
            t0 = time.time()
            for step, batch in enumerate(
                self.datamodule.train_dataloader(self.steps_per_epoch)
            ):
                self.state, metrics = self._train_step(
                    self.state, self._device_batch(batch), rng
                )
                if step % self.cfg.trainer.log_every_n_steps == 0:
                    loss = float(metrics["loss"])
                    history.append(loss)
                    # per-step LR + exact epoch, the reference's
                    # LearningRateMonitor/manual_update_lr logging
                    # (module/video_classification.py:173-174)
                    extra = {
                        "exact_epoch": epoch + step / self.steps_per_epoch
                    }
                    if self._lr_schedule is not None:
                        # index by the optimizer's own step count (state.step
                        # post-update) so repeated train() calls on one app
                        # report the continued schedule, not a restart
                        sched_step = max(int(self.state.step) - 1, 0)
                        extra["lr"] = float(self._lr_schedule(sched_step))
                    mlog.log(
                        {**metrics, **extra},
                        step=global_step,
                        epoch=epoch,
                    )
                global_step += 1
            if self.cfg.trainer.precise_bn_batches > 0:
                variables = {
                    "params": self.state.params,
                    "batch_stats": self.state.batch_stats,
                }
                variables = update_bn_stats(
                    self.model,
                    variables,
                    (
                        self._device_batch(b)["video"]
                        for b in self.datamodule.train_dataloader(
                            self.cfg.trainer.precise_bn_batches
                        )
                    ),
                    self.cfg.trainer.precise_bn_batches,
                )
                self.state = self.state.replace(
                    batch_stats=variables["batch_stats"]
                )
            logger.info("epoch %d done in %.1fs", epoch, time.time() - t0)
            if self.cfg.trainer.checkpoint_dir:
                self.save_checkpoint(epoch)
        mlog.close()
        return history

    def test(self, num_videos: Optional[int] = None) -> Dict[str, float]:
        """Multi-clip test with video-level ensembling
        (reference module/video_classification.py:275-311)."""
        assert self.state is not None, "call setup()/train() first"
        logits_list, video_idx_list, labels = [], [], {}
        for batch in self.datamodule.val_dataloader(None):
            db = self._device_batch(batch)
            logits = self._eval_step(self.state, db)
            logits_list.append(np.asarray(logits))
            vidx = np.asarray(batch["video_index"])
            video_idx_list.append(vidx)
            for i, v in enumerate(vidx):
                labels[int(v)] = int(np.asarray(batch["label"])[i])
        if not logits_list:
            return {}
        n_videos = num_videos or (max(labels) + 1)
        ensembled = ensemble_video_level(
            [jnp.asarray(x) for x in logits_list],
            [jnp.asarray(i) for i in video_idx_list],
            n_videos,
            method=self.cfg.trainer.test_ensemble_method,
        )
        ensembled = np.asarray(ensembled)
        seen = sorted(labels)
        preds = ensembled[seen].argmax(-1)
        gts = np.asarray([labels[v] for v in seen])
        return {"video_top1": float((preds == gts).mean())}

    def predict(self, max_batches: Optional[int] = None):
        """Per-clip prediction pass (reference train_app.py:184-209 predict
        mode): yields dicts of logits + clip metadata from the val set."""
        assert self.state is not None, "call setup()/train() first"
        out = []
        for n, batch in enumerate(self.datamodule.val_dataloader(None)):
            if max_batches is not None and n >= max_batches:
                break
            db = self._device_batch(batch)
            logits = self._eval_step(self.state, db)
            out.append(
                {
                    "logits": np.asarray(logits),
                    "video_index": np.asarray(batch["video_index"]),
                    "clip_index": np.asarray(batch.get("clip_index", [])),
                    "label": np.asarray(batch["label"]),
                }
            )
        return out

    def save_checkpoint(self, step: int):
        import orbax.checkpoint as ocp

        path = os.path.abspath(
            os.path.join(self.cfg.trainer.checkpoint_dir, f"ckpt_{step}")
        )
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            path,
            {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "step": self.state.step,
            },
            force=True,
        )
        ckptr.wait_until_finished()
        save_config(self.cfg, os.path.join(self.cfg.trainer.checkpoint_dir, "config.json"))

    def load_checkpoint(self, path: str):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        target = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "step": self.state.step,
        }
        restored = ckptr.restore(os.path.abspath(path), target)
        self.state = self.state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            step=restored["step"],
        )
        return self.state

    def load_ssl_backbone(self, backbone_variables) -> int:
        """SSL -> classification surgery (the reference's
        create_classification_model_from_ssl_checkpoint,
        module/ssl_helper.py:67): graft every pretrained backbone leaf
        whose path+shape matches onto this app's variables, keeping the
        freshly-initialized classifier head. The head's final projection
        is excluded explicitly (not just by shape mismatch), so an SSL
        feature_dim that happens to equal num_classes cannot overwrite
        the classifier. Call after setup(); feed
        ``SSLTrainApp.backbone_variables()``. Returns the number of
        grafted leaves.
        """
        import re

        assert self.state is not None, "call setup() first"
        grafted = [0]

        def head_key(params):
            keys = list(params.keys())
            if "head" in keys:
                return "head"
            ids = [
                int(k.split("_")[1])
                for k in keys
                if re.fullmatch(r"blocks_\d+", k)
            ]
            return f"blocks_{max(ids)}" if ids else None

        hk = head_key(self.state.params)
        backbone_params = dict(backbone_variables["params"])
        if (
            hk
            and isinstance(backbone_params.get(hk), dict)
            and "proj" in backbone_params[hk]
        ):
            sub = dict(backbone_params[hk])
            sub.pop("proj")
            backbone_params[hk] = sub

        def graft(ours, theirs):
            if isinstance(ours, dict):
                return {
                    k: (
                        graft(v, theirs[k])
                        if isinstance(theirs, dict) and k in theirs
                        else v
                    )
                    for k, v in ours.items()
                }
            if (
                hasattr(theirs, "shape")
                and getattr(ours, "shape", None) == theirs.shape
            ):
                grafted[0] += 1
                return jnp.asarray(theirs, ours.dtype)
            return ours

        new_params = graft(self.state.params, backbone_params)
        new_stats = graft(
            self.state.batch_stats,
            backbone_variables.get("batch_stats", {}),
        )
        self.state = self.state.replace(
            params=new_params, batch_stats=new_stats
        )
        return grafted[0]
