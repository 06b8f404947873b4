"""Trainer: config-driven fit/validate/test loop.

The TPU-native equivalent of run.py's Lightning assembly (run.py:70-118) plus
the monkey-patched step hooks (LightningFunc/step.py):

- fit: epochs over the train loader with device-side augmentation, gradient
  accumulation (stacked microbatches -> lax.scan inside the jitted step),
  per-step loss scalars, per-epoch means, parameter histograms, LR scheduling
  on val_loss, top-k checkpointing, early stopping, warm-start restore.
- test: forward + batched NMS -> greedy TP matching -> ap_per_class mAP,
  TB Test/* scalars + side-by-side GT/pred image panels + stdout table
  (step.py:102-158).

Differences from the reference (documented): augmentation runs on device; the
train loop is steady-state jit (no per-epoch recompiles); both metric branches
(mAP and the YOLO per-grid statistics) are computed for every model family.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from objectdetectionpl_tpu.config import Config
from objectdetectionpl_tpu.data import build_datamodule
from objectdetectionpl_tpu.data.augment import augment_batch
from objectdetectionpl_tpu.models import build_model
from objectdetectionpl_tpu.ops import boxes as box_ops
from objectdetectionpl_tpu.ops import losses as loss_lib
from objectdetectionpl_tpu.ops import metrics as metric_lib
from objectdetectionpl_tpu.parallel import make_mesh
from objectdetectionpl_tpu.train import checkpoint as ckpt_lib
from objectdetectionpl_tpu.train import optim, state as state_lib, step as step_lib
from objectdetectionpl_tpu.utils.logging import MetricWriter, log_param_histograms
from objectdetectionpl_tpu.utils import summary as summary_lib
from objectdetectionpl_tpu.utils import viz


class Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.dm = build_datamodule(cfg)
        self.classes = self.dm.get_class()
        self.num_classes = len(self.classes)
        self.img_size = cfg.effective_img_size

        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.model = build_model(cfg.model_name, self.num_classes,
                                 dtype=dtype, yolov5_type=cfg.type,
                                 remat=cfg.remat, ssd_bn=cfg.ssd_bn)
        self.loss_fn = loss_lib.make_loss(
            cfg.model_name, self.num_classes, self.img_size,
            coord_criterion=cfg.coord_criterion,
            cls_criterion=cfg.cls_criterion,
            v3_double_stride=cfg.v3_double_stride)
        self.tx = optim.build_optimizer(cfg)
        self.scheduler = optim.build_scheduler(cfg)
        self.mesh = make_mesh(shape=cfg.mesh_shape)

        rng = jax.random.PRNGKey(cfg.seed)
        self.state = state_lib.create_train_state(
            self.model, self.tx, rng, self.img_size,
            batch_size=max(cfg.batch_size, 1), ema_decay=cfg.ema_decay)
        if cfg.torch_ckpt:
            # pretrained torch weights at construction (model/SSD.py:46)
            from objectdetectionpl_tpu.utils import torch_weights
            sd = torch_weights.read_torch_state_dict(cfg.torch_ckpt)
            params, batch_stats, n, desc = torch_weights.load_torch_checkpoint(
                cfg.model_name, self.state.params, self.state.batch_stats, sd)
            self.state = self.state.replace(params=params,
                                            batch_stats=batch_stats)
            print(f"[trainer] loaded {n} tensors from {cfg.torch_ckpt} "
                  f"({desc})")
        self.multichip = self.mesh.devices.size > 1
        if self.multichip:
            # replicate state; batches are placed sharded over 'data'
            from objectdetectionpl_tpu.parallel import replicated_sharding
            rep = replicated_sharding(self.mesh)
            self.state = jax.tree.map(
                lambda x: jax.device_put(x, rep), self.state)
        self.aug_rng = jax.random.PRNGKey(cfg.seed + 1)

        self.train_step = step_lib.make_train_step(
            self.model, self.loss_fn, self.tx, cfg.accumulate_grad_batches,
            ema_decay=cfg.ema_decay)
        self.eval_step = step_lib.make_eval_step(self.model, self.loss_fn)
        self.postprocess = step_lib.make_postprocess(
            cfg.model_name, self.num_classes, self.img_size,
            conf_thres=cfg.conf_thres, nms_thres=cfg.nms_thres,
            top_k=cfg.nms_top_k)
        self.predict_step = step_lib.make_predict_step(
            self.model, self.postprocess)

        # log_dir/<dataset>/<model> (run.py:85-86)
        self.run_dir = os.path.join(cfg.log_dir, cfg.data_module,
                                    cfg.model_name)
        self.writer = MetricWriter(self.run_dir)
        self.ckpt = ckpt_lib.CheckpointManager(
            os.path.join(self.run_dir, "checkpoints"), cfg.save_top_k)
        self.early_stop = ckpt_lib.EarlyStopping(cfg.early_stop_patience)
        self.global_step = 0

        try:
            summary_lib.save_summary(self.model, self.img_size, self.run_dir)
        except Exception:
            pass

    # ------------------------------------------------------------------ fit --

    def maybe_restore(self):
        """Warm-start from the best checkpoint if present (run.py:83 +
        lightningUtils.py:26-37 — unlike the reference, the restore actually
        takes effect)."""
        try:
            restored = self.ckpt.restore(self.state)
        except Exception as e:  # e.g. stale checkpoint with a different tree
            print(f"[trainer] checkpoint restore skipped: {type(e).__name__}")
            return
        if restored is not None:
            self.state = restored
            print(f"[trainer] restored best checkpoint "
                  f"(step {self.ckpt.best_step()})")

    def _device_batch(self, batch, augment: bool):
        images = jnp.asarray(batch.images)
        if images.dtype == jnp.uint8:
            # packed-cache batches ship uint8 (4x less host->device traffic);
            # normalize on device
            images = images.astype(jnp.float32) / 255.0
        boxes = jnp.asarray(batch.boxes)
        labels = jnp.asarray(batch.labels)
        mask = jnp.asarray(batch.mask)
        if self.multichip:
            # host_local_batch assembles the global array from per-process
            # shards under multi-host; single-process it is a sharded put.
            from objectdetectionpl_tpu.parallel import host_local_batch
            images, boxes, labels, mask = (
                host_local_batch(self.mesh, v)
                for v in (images, boxes, labels, mask))
        if augment:
            if self.cfg.mosaic > 0:
                from objectdetectionpl_tpu.data.augment import mosaic_batch
                self.aug_rng, sub = jax.random.split(self.aug_rng)
                images, boxes, labels, mask = mosaic_batch(
                    sub, images, boxes, labels, mask, p=self.cfg.mosaic)
            self.aug_rng, sub = jax.random.split(self.aug_rng)
            images, boxes, mask = augment_batch(sub, images, boxes, mask)
        return images, labels, boxes, mask

    def fit(self):
        cfg = self.cfg
        self.maybe_restore()
        val_metric: Optional[float] = None

        for epoch in range(cfg.max_epochs):
            if epoch == 0:
                # model-graph logging at epoch 1 (step.py:36-37): the TB
                # analogue for a jax model is its layer table + XLA costs
                try:
                    self.writer.text("model/graph", summary_lib.model_summary(
                        self.model, self.img_size))
                except Exception:
                    pass
            lr = self.scheduler.step(val_metric)
            optim.set_learning_rate(self.state.opt_state, lr)
            self.writer.scalar("lr-Adam" if cfg.optimizer == "Adam"
                               else f"lr-{cfg.optimizer}", lr, epoch)

            epoch_metrics: List[Dict[str, float]] = []
            micro: List = []
            t0 = time.time()
            n_imgs = 0
            profiling = (cfg.profile_steps > 0 and epoch == 0)
            if profiling:
                jax.profiler.start_trace(os.path.join(self.run_dir, "profile"))
            first_batch = True
            # double-buffered input: host decode/preproc + device-put run in
            # a background thread, overlapping device compute
            batches = (self._device_batch(b, augment=True)
                       for b in self.dm.train_dataloader())
            if cfg.prefetch_batches > 0:
                from objectdetectionpl_tpu.data.pipeline import prefetch
                batches = prefetch(batches, cfg.prefetch_batches)
            for device_batch in batches:
                micro.append(device_batch)
                if cfg.view_mark and first_batch:
                    self._view_mark(micro[0], epoch)
                    first_batch = False
                if len(micro) < cfg.accumulate_grad_batches:
                    continue
                stacked = [jnp.stack([m[i] for m in micro])
                           for i in range(4)]
                micro = []
                self.state, metrics = self.train_step(self.state, *stacked)
                n_imgs += stacked[0].shape[0] * stacked[0].shape[1]
                metrics, profiling = self._log_train_step(metrics, cfg,
                                                          profiling)
                epoch_metrics.append(metrics)
                self.global_step += 1

            if micro:
                # Flush the leftover partial accumulation window with
                # zero-weight padding slots (the reference's Lightning loop
                # silently dropped up to accum-1 tail microbatches per epoch).
                n_real = len(micro)
                n_imgs += sum(m[0].shape[0] for m in micro)
                while len(micro) < cfg.accumulate_grad_batches:
                    micro.append(micro[-1])
                stacked = [jnp.stack([m[i] for m in micro])
                           for i in range(4)]
                weights = jnp.asarray(
                    [1.0] * n_real
                    + [0.0] * (cfg.accumulate_grad_batches - n_real),
                    jnp.float32)
                micro = []
                self.state, metrics = self.train_step(self.state, *stacked,
                                                      weights)
                metrics, profiling = self._log_train_step(metrics, cfg,
                                                          profiling)
                epoch_metrics.append(metrics)
                self.global_step += 1
            if epoch_metrics:
                epoch_metrics = [{k: float(v) for k, v in m.items()}
                                 for m in epoch_metrics]
                means = {k: float(np.mean([m[k] for m in epoch_metrics]))
                         for k in epoch_metrics[0]}
                self.writer.scalars("Epoch", {f"{k}/Train": v
                                              for k, v in means.items()}, epoch)
                dt = time.time() - t0
                self.writer.scalar("throughput/images_per_sec",
                                   n_imgs / max(dt, 1e-9), epoch)
            if cfg.histogram_every and epoch % cfg.histogram_every == 0:
                log_param_histograms(self.writer, self.state.params, epoch,
                                     max_tensors=50)
            # device memory telemetry (GPUStatsMonitor analogue, run.py:107)
            from objectdetectionpl_tpu.utils.profiler import device_memory_stats
            for dev, stats in device_memory_stats().items():
                for k, v in stats.items():
                    if v is not None:
                        self.writer.scalar(f"device/{dev}/{k}", v, epoch)

            if profiling:      # epoch shorter than profile_steps
                jax.profiler.stop_trace()

            val_loss = self.validate(epoch)
            val_metric = val_loss
            if val_loss is not None:
                self.ckpt.save(epoch, self.state, val_loss)
                if self.early_stop.update(val_loss):
                    print(f"[trainer] early stopping at epoch {epoch}")
                    break
            self.writer.flush()
        # drain in-flight async checkpoint saves: callers (and the test
        # phase) must not race the serializer, and a save still pending at
        # interpreter shutdown crashes orbax's executor
        self.ckpt.wait()
        return self.state

    def _log_train_step(self, metrics, cfg, profiling: bool):
        """Per-step metric logging + profiler stop + NaN guard.

        Pulling metrics to host synchronizes with the device every step; at
        log_every_steps > 1 intermediate steps stay async (metrics kept as
        device arrays, reduced at epoch end)."""
        if profiling and self.global_step + 1 >= cfg.profile_steps:
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            profiling = False
        if self.global_step % max(cfg.log_every_steps, 1) == 0:
            metrics = {k: float(v) for k, v in metrics.items()}
            if cfg.nan_check and not np.isfinite(metrics["loss"]):
                raise FloatingPointError(
                    f"non-finite loss at step {self.global_step}: "
                    f"{metrics} — enable jax_debug_nans or lower lr")
            for k, v in metrics.items():
                self.writer.scalar(f"Loss/{k}/Train", v, self.global_step)
        return metrics, profiling

    def _view_mark(self, device_batch, epoch: int, max_images: int = 4):
        """Log augmented training images with GT boxes drawn — the
        reference's view_mark debugging hook (dataset/Pascal.py:155-173,
        configs/config.yaml:8), post-augmentation."""
        images, labels, boxes, mask = device_batch
        gt_xyxy = np.asarray(box_ops.xywh_to_xyxy(boxes)) * self.img_size
        for i in range(min(images.shape[0], max_images)):
            panel = viz.draw_boxes(np.asarray(images[i]), gt_xyxy[i],
                                   np.asarray(labels[i]), self.classes,
                                   valid=np.asarray(mask[i]))
            self.writer.image(f"view_mark/{i}", panel, epoch)

    def validate(self, epoch: int) -> Optional[float]:
        # keep per-batch metrics as device arrays (dispatch stays async) and
        # pull everything to host once at the end — each per-batch float()
        # would pay the ~30 ms tunnel round trip documented in BASELINE.md
        losses: List[Dict] = []
        for batch in self.dm.val_dataloader():
            args = self._device_batch(batch, augment=False)
            losses.append(self.eval_step(self.state, *args))
        if not losses:
            return None
        losses = jax.device_get(losses)
        means = {k: float(np.mean([m[k] for m in losses])) for k in losses[0]}
        self.writer.scalar("val_loss", means["loss"], epoch)
        self.writer.scalars("Epoch", {f"{k}/Val": v for k, v in means.items()},
                            epoch)
        return means["loss"]

    # ----------------------------------------------------------------- test --

    def _yolo_stat_fn(self):
        """Jitted per-grid statistics for the YOLO families
        (test_epoch_end branch 2 parity, step.py:131-149)."""
        from objectdetectionpl_tpu.ops import anchors as anchor_lib
        from objectdetectionpl_tpu.ops import yolo_stats
        cfg = self.cfg
        if cfg.model_name == "YOLOv2":
            per_scale = [anchor_lib.YOLOV2_ANCHORS]
        elif cfg.model_name == "YOLOv3":
            per_scale = [anchor_lib.YOLOV3_ANCHORS[i] / s
                         for i, s in enumerate(anchor_lib.YOLOV3_STRIDES)]
        elif cfg.model_name == "YOLOv4":
            per_scale = [anchor_lib.YOLOV4_ANCHORS[list(m)] / s
                         for m, s in zip(anchor_lib.YOLOV4_ANCH_MASKS,
                                         anchor_lib.YOLOV4_STRIDES)]
        else:
            return None

        @jax.jit
        def stat_fn(state, images, labels, boxes, mask):
            # eval_params (EMA when enabled) — must match predict_step so both
            # test-metric branches report on the same weights
            out = self.model.apply(
                {"params": state.eval_params,
                 "batch_stats": state.batch_stats},
                images, train=False)
            return yolo_stats.yolo_statistics(out, labels, boxes, mask,
                                              per_scale, self.num_classes)
        return stat_fn

    def test(self) -> Dict[str, float]:
        """mAP evaluation with NMS (test_step/test_epoch_end parity)."""
        stats = []
        target_classes: List[int] = []
        panels = 0
        yolo_stat_fn = self._yolo_stat_fn()
        yolo_stats_acc: List[Dict] = []
        for bi, batch in enumerate(self.dm.test_dataloader()):
            images, labels, boxes, mask = self._device_batch(batch, False)
            res = self.predict_step(self.state, images)
            ys = (None if yolo_stat_fn is None
                  else yolo_stat_fn(self.state, images, labels, boxes, mask))
            # one host fetch per batch for everything the numpy mAP path
            # needs (each separate np.asarray would pay its own ~30 ms
            # tunnel round trip)
            res, ys, gt_xyxy, labels, mask = jax.device_get(
                (res, ys, box_ops.xywh_to_xyxy(boxes) * self.img_size,
                 labels, mask))
            if ys is not None:
                yolo_stats_acc.append(ys)
            # The reference ranks detections by column 4 of the NMS rows in
            # ap_per_class (accuracy.py:117-119): obj_conf for the YOLO
            # families (model/YOLOV5.py:214), class score for SSD/RetinaNet
            # (model/SSD.py:305 — col 4 there is a zero filler; the class
            # score is the faithful non-degenerate choice, DIVERGENCES.md).
            conf = (res.scores if self.cfg.model_name in ("SSD", "RetinaNet")
                    else res.obj)
            s = metric_lib.batch_statistics(
                res.boxes, conf, res.labels, res.valid,
                gt_xyxy, labels, mask)
            stats.append(s)
            target_classes.extend(labels[mask].tolist())

            if panels < 4:          # first images panel (step.py:152-158)
                img = np.asarray(images[0])
                gt_img = viz.draw_boxes(img, gt_xyxy[0], np.asarray(labels[0]),
                                        self.classes,
                                        valid=np.asarray(mask[0]))
                pr_img = viz.draw_boxes(img, np.asarray(res.boxes[0]),
                                        np.asarray(res.labels[0]),
                                        self.classes,
                                        valid=np.asarray(res.valid[0]))
                self.writer.image(f"result/{panels}",
                                  viz.side_by_side(gt_img, pr_img), panels)
                panels += 1

        results = metric_lib.evaluate_map(stats, np.asarray(target_classes))
        for k in ("precision", "recall", "mAP", "f1"):
            self.writer.scalar(f"Test/{k}", results[k], 0)

        # YOLO per-grid-scale means (step.py:131-149)
        if yolo_stats_acc:
            for g in yolo_stats_acc[0]:
                for key in yolo_stats_acc[0][g]:
                    mean_v = float(np.mean([s[g][key] for s in yolo_stats_acc]))
                    self.writer.scalar(f"Test/{g}/{key}", mean_v, 0)
                    results[f"{g}/{key}"] = mean_v

        # stdout mAP table (step.py:126-130)
        print("---- mAP per class ----")
        for cid, ap in sorted(results["per_class_AP"].items()):
            name = (self.classes[cid] if 0 <= cid < len(self.classes)
                    else str(cid))
            print(f"  {name}: {ap:.4f}")
        print(f"mAP: {results['mAP']:.4f}")
        self.writer.flush()
        return results
