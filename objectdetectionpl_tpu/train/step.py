"""Jitted train/eval/predict steps with gradient accumulation and sharding.

TPU-native equivalent of the reference's monkey-patched Lightning hooks
(``LightningFunc/step.py:14-100``):

- ``train_step``: value_and_grad over the model+loss, gradient accumulation as
  a ``lax.scan`` over microbatches (the reference delegates
  ``accumulate_grad_batches: 8`` to Lightning, configs/config.yaml:52),
  optimizer update, BatchNorm statistics threading.
- ``eval_step``: loss under running statistics (validation_step parity).
- ``predict_step``: forward + batched NMS (test_step parity).

All steps are pure functions jitted once; the batch enters sharded over the
mesh 'data' axis and XLA inserts the gradient all-reduce.
Batch layout for train: every array is [accum_steps, micro_batch, ...].
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from objectdetectionpl_tpu.train.state import TrainState


def make_train_step(model, loss_fn: Callable, tx,
                    accum_steps: int = 1, ema_decay: float = 0.0) -> Callable:
    """Returns jitted ``(state, images, labels, boxes, mask) -> (state, metrics)``.

    images: [A, mB, S, S, 3]; labels/boxes/mask: [A, mB, ...] with A == accum_steps.
    """

    def loss_through_model(params, batch_stats, images, labels, boxes, mask):
        out, upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=True, mutable=["batch_stats"])
        # Models without normalization statistics (SSD's VGG16 has no BN)
        # return an empty/absent collection whose container type can differ
        # from the carried one ({} vs FrozenDict()); normalize to the carry.
        metrics = loss_fn(out, labels, boxes, mask)
        new_bs = upd.get("batch_stats", batch_stats)
        if not jax.tree_util.tree_leaves(new_bs):
            new_bs = batch_stats
        return metrics["loss"], (metrics, new_bs)

    grad_fn = jax.value_and_grad(loss_through_model, has_aux=True)

    def _apply_update(state, grads, batch_stats, metrics):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(jnp.add, state.params, updates)
        ema = state.ema_params
        if ema is not None and ema_decay > 0:
            ema = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                ema, params)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=batch_stats,
                                  opt_state=opt_state, ema_params=ema)
        return new_state, metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, images, labels, boxes, mask,
                   weights=None):
        # weights [A]: per-microbatch contribution (0 = padding slot used to
        # flush a leftover partial accumulation window at epoch end; the
        # reference/Lightning silently dropped those tail microbatches).
        if accum_steps == 1 and weights is None:
            # Single-microbatch fast path: no scan, no zero-grads
            # accumulator tree, no [1, B, ...] per-iteration slicing —
            # the scan formulation copied the full image batch (315 MB at
            # B=128/640px) and serialized an extra grads-tree add.
            (_, (metrics, new_bs)), grads = grad_fn(
                state.params, state.batch_stats,
                images[0], labels[0], boxes[0], mask[0])
            return _apply_update(state, grads, new_bs, metrics)

        if weights is None:
            w = jnp.ones((images.shape[0],), jnp.float32)
        else:
            w = weights.astype(jnp.float32)

        def body(carry, micro):
            grads_acc, bstats = carry
            im, lb, bx, mk, wi = micro
            (_, (metrics, new_bs)), grads = grad_fn(
                state.params, bstats, im, lb, bx, mk)
            grads_acc = jax.tree.map(lambda a, g: a + g * wi, grads_acc, grads)
            # zero-weight micros must not pollute BN running statistics
            # (skip for stats-free models — new_bs aliases bstats there)
            if jax.tree_util.tree_leaves(bstats):
                bstats = jax.tree.map(lambda nb, ob: jnp.where(wi > 0, nb, ob),
                                      new_bs, bstats)
            return (grads_acc, bstats), metrics

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        (grads, batch_stats), metrics = jax.lax.scan(
            body, (zero_grads, state.batch_stats),
            (images, labels, boxes, mask, w))
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        grads = jax.tree.map(lambda g: g / wsum, grads)
        metrics = jax.tree.map(
            lambda m: jnp.sum(m * w) / wsum, metrics)
        return _apply_update(state, grads, batch_stats, metrics)

    return train_step


def make_eval_step(model, loss_fn: Callable) -> Callable:
    """Returns jitted ``(state, images, labels, boxes, mask) -> metrics``
    (validation_step parity, LightningFunc/step.py:43-48)."""

    @jax.jit
    def eval_step(state: TrainState, images, labels, boxes, mask):
        out = model.apply(
            {"params": state.eval_params, "batch_stats": state.batch_stats},
            images, train=False)
        return loss_fn(out, labels, boxes, mask)

    return eval_step


def make_predict_step(model, postprocess: Callable) -> Callable:
    """Returns jitted ``(state, images) -> NMSResult`` — forward in inference
    mode + decode + batched NMS (test_step parity, step.py:64-100)."""

    @jax.jit
    def predict_step(state: TrainState, images):
        out = model.apply(
            {"params": state.eval_params, "batch_stats": state.batch_stats},
            images, train=False)
        return postprocess(out)

    return predict_step


def make_postprocess(model_name: str, num_classes: int, img_size: int,
                     conf_thres: float = 0.5, nms_thres: float = 0.4,
                     top_k: int = 300, exact_topk: bool = True) -> Callable:
    """Model-family-specific decode + NMS, emitting pixel-space boxes.

    SSD/RetinaNet: anchor decode + greedy NMS (model/SSD.py:249-310).
    YOLO: family decode + weighted-merge NMS (model/YOLOV5.py:157-218).

    ``exact_topk=True`` (default) uses exact ``lax.top_k`` candidate
    selection so eval/mAP results cannot diverge from the CPU parity tests;
    benchmarks pass ``exact_topk=None`` to get the faster TPU
    ``approx_max_k`` path (recall ~0.95 on the score tail).
    """
    from objectdetectionpl_tpu.ops import anchors as anchor_lib
    from objectdetectionpl_tpu.ops import boxes as box_ops
    from objectdetectionpl_tpu.ops import nms

    # Anchor families: the reference hard-codes class_thresh=0.45
    # (model/SSD.py:249); a configured conf_thres below that lowers the
    # eval threshold too (a model that has not yet saturated its confidences
    # would otherwise emit zero detections and mAP 0 no matter how well it
    # localizes — the synthetic learning runs evaluate at 0.05).
    anchor_class_thresh = min(0.45, conf_thres)

    if model_name == "SSD":
        dboxes = anchor_lib.ssd_dboxes()

        def post(outputs):
            loc, cls = outputs
            # drop the explicit background channel for scoring
            return nms.anchor_nms(loc, cls[..., 1:], dboxes,
                                  nms_thresh=0.5,
                                  class_thresh=anchor_class_thresh,
                                  scale=float(img_size),
                                  exact_topk=exact_topk)
        return post

    if model_name == "RetinaNet":
        anchors = anchor_lib.retina_anchors(img_size)

        def post(outputs):
            loc, cls = outputs
            return nms.anchor_nms(loc, cls, anchors,
                                  decode=box_ops.retina_decode,
                                  nms_thresh=0.5,
                                  class_thresh=anchor_class_thresh,
                                  scale=1.0, exact_topk=exact_topk)
        return post

    if model_name == "YOLOv5":
        def post(outputs):
            preds = nms.decode_yolov5_predictions(
                outputs, anchor_lib.YOLOV5_ANCHORS, anchor_lib.YOLOV5_STRIDES,
                num_classes)
            return nms.yolo_nms(preds, conf_thres, nms_thres, top_k,
                                exact_topk=exact_topk)
        return post

    table = {
        # YOLOv2 anchors are output-grid units; the network stride is 32
        # regardless of input size (model/YOLOV2.py: 5 maxpools).
        "YOLOv2": ([anchor_lib.YOLOV2_ANCHORS * 32], (32,)),
        "YOLOv3": (anchor_lib.YOLOV3_ANCHORS, anchor_lib.YOLOV3_STRIDES),
        "YOLOv4": ([anchor_lib.YOLOV4_ANCHORS[list(m)]
                    for m in anchor_lib.YOLOV4_ANCH_MASKS],
                   anchor_lib.YOLOV4_STRIDES),
    }
    anchors_px, strides = table[model_name]

    def post(outputs):
        if not isinstance(outputs, (list, tuple)):
            outputs = [outputs]
        preds = nms.decode_yolo_predictions(outputs, anchors_px, strides,
                                            num_classes, img_size)
        return nms.yolo_nms(preds, conf_thres, nms_thres, top_k,
                            exact_topk=exact_topk)
    return post
