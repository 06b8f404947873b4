"""Batched, fixed-shape NMS — the TPU re-design of the reference's per-image
Python ``while`` loops.

Two families, matching the reference's two NMS variants:

- ``anchor_nms``: greedy class-agnostic suppression used by SSD/RetinaNet
  (reference ``model/SSD.py:249-310`` / ``model/RetinaNet.py:117-178``):
  decode vs anchor boxes, sigmoid-max class score, score threshold, top-k,
  +1-pixel IoU greedy suppression (keep if overlap <= nms_thresh).

- ``yolo_nms``: weighted-merge suppression used by YOLOv2-v5 (reference
  ``model/YOLOV5.py:157-218`` and twins): candidates sorted by
  obj_conf * max_cls_conf, boxes with IoU > thresh AND the same label are
  *merged* (conf-weighted average) into the kept box, then removed.

Both return fixed-size [B, K, 7] tensors (x1, y1, x2, y2, obj_conf, score,
label) plus a validity mask, instead of ragged per-image lists.

The reference hard-codes ``conf_thres = -0.0151`` inside the YOLO NMS so every
raw-logit candidate passes (model/YOLOV3.py:280 etc.). That quirk is
rationalized here into a configurable ``conf_thres`` applied to decoded
confidences (default 0.5, the reference's dead function argument).

The O(K^2) IoU matrix + greedy scan formulation maps onto the VPU: one
fori_loop over K kept slots, all suppression math vectorized over K.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from objectdetectionpl_tpu.ops import boxes as box_ops

NEG_INF = -1e9


class NMSResult(NamedTuple):
    boxes: jax.Array   # [B, K, 4] xyxy
    obj: jax.Array     # [B, K] objectness (0 for anchor models)
    scores: jax.Array  # [B, K]
    labels: jax.Array  # [B, K] int32
    valid: jax.Array   # [B, K] bool


def _greedy_nms_single(boxes, scores, labels, k: int, nms_thresh: float,
                       iou_fn, class_aware: bool, merge: bool,
                       obj_conf=None):
    """Greedy NMS over K pre-sorted candidates for one image.

    boxes [K, 4] xyxy sorted by descending score; scores [K] (<= NEG_INF for
    invalid); labels [K].  Returns (boxes, keep_mask) where ``merge``
    additionally replaces kept boxes by conf-weighted merges.

    TPU formulation: the K x K IoU/label-match matrix is computed once, then
    the inherently-serial greedy scan is a fori_loop of pure vector mask ops
    (row selection via one-hot reductions — no dynamic gathers), so each
    iteration is a handful of VPU ops over K lanes.
    """
    K = boxes.shape[0]
    ids = jnp.arange(K)
    iou_mat = iou_fn(boxes[:, None, :], boxes[None, :, :])    # [K, K]
    over_mat = iou_mat > nms_thresh
    if class_aware:
        over_mat = over_mat & (labels[:, None] == labels[None, :])
    valid = scores > NEG_INF
    w_all = jnp.where(valid, obj_conf, 0.0) if merge else None

    # One while_loop iteration per *kept* box: `remaining` tracks candidates
    # not yet claimed as a head or suppressed; the next head is the first
    # remaining index (candidates are score-sorted).  Greedy order and
    # results are identical to the naive K-iteration scan, but invalid /
    # suppressed candidates cost zero iterations.
    def cond(state):
        return jnp.any(state[0])

    def body(state):
        remaining, alive, keep, out = state
        head = jnp.argmax(remaining)              # first remaining index
        sel = ids == head
        row = over_mat[head]
        if merge:
            grp = (row & alive) | sel
            w = jnp.where(grp, w_all, 0.0)[:, None]
            merged = jnp.sum(w * boxes, axis=0) / jnp.maximum(
                jnp.sum(w), 1e-16)
            out = jnp.where(sel[:, None], merged[None, :], out)
        suppress = row & (ids > head) & alive
        alive = alive & ~suppress
        keep = keep | sel
        remaining = remaining & ~suppress & ~sel
        return remaining, alive, keep, out

    init = (valid, jnp.ones((K,), bool), jnp.zeros((K,), bool), boxes)
    _, _, keep, out = jax.lax.while_loop(cond, body, init)
    return out, keep


def _use_pallas(flag):
    if flag is not None:
        return flag
    return jax.default_backend() == "tpu"


def anchor_nms(loc_preds, cls_preds, anchors_xywh, top_k: int = 100,
               nms_thresh: float = 0.5, class_thresh: float = 0.45,
               decode=box_ops.ssd_decode, use_variance: bool = False,
               scale: float = 1.0, use_pallas=None) -> NMSResult:
    """SSD/RetinaNet batched NMS.

    loc_preds [B, D, 4] offsets; cls_preds [B, D, C] logits; anchors_xywh [D, 4].
    ``use_variance=False`` matches the reference's inference decode, which skips
    the variance scaling its own training encode applies (model/SSD.py:255-257).
    ``scale`` multiplies output boxes (e.g. img_size to emit pixels).
    Reference: model/SSD.py:249-310.
    """
    anchors_xywh = jnp.asarray(anchors_xywh)
    top_k = min(top_k, int(anchors_xywh.shape[0]))

    def per_image(loc_p, cls_p):
        if decode is box_ops.ssd_decode:
            xywh = box_ops.ssd_decode(loc_p, anchors_xywh, use_variance)
        else:
            xywh = decode(loc_p, anchors_xywh)
        boxes = box_ops.xywh_to_xyxy(xywh) * scale
        probs = jax.nn.sigmoid(cls_p)
        score = jnp.max(probs, axis=-1)
        label = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        score = jnp.where(score > class_thresh, score, NEG_INF)

        top_scores, idx = jax.lax.top_k(score, top_k)
        return boxes[idx], top_scores, label[idx]

    top_boxes, top_scores, top_labels = jax.vmap(per_image)(
        loc_preds, cls_preds)
    if _use_pallas(use_pallas):
        from objectdetectionpl_tpu.ops.pallas.nms_kernel import \
            pallas_greedy_nms
        kept_boxes, keep = pallas_greedy_nms(
            top_boxes, top_scores, top_labels,
            jnp.zeros_like(top_scores), nms_thresh=nms_thresh,
            class_aware=False, merge=False, plus1=1.0)
    else:
        kept_boxes, keep = jax.vmap(
            lambda b, s, l: _greedy_nms_single(
                b, s, l, top_k, nms_thresh,
                lambda x, y: box_ops.iou_plus1(x, y), class_aware=False,
                merge=False))(top_boxes, top_scores, top_labels)
    v = keep & (top_scores > NEG_INF)
    return NMSResult(kept_boxes, jnp.zeros_like(top_scores),
                     jnp.where(v, top_scores, 0.0), top_labels, v)


def decode_yolo_predictions(outputs, anchors_px, strides, num_classes: int,
                            img_size: int):
    """Decode raw multi-scale YOLO maps to [B, N, 5+C] pixel-space predictions.

    outputs: list of [B, A*(5+C), g, g] raw maps (v2/v3/v4 layout) — decoded
    with sigmoid xy/conf/cls + grid offsets + exp-wh anchors, scaled by stride
    (the proper decode the reference only applies inside
    ``get_yolo_statistics``, accuracy.py:405-466; its NMS feeds raw logits).
    """
    parts = []
    for x, anc_px, stride in zip(outputs, anchors_px, strides):
        B, _, g, _ = x.shape
        A = len(anc_px)
        pred = x.reshape(B, A, 5 + num_classes, g, g)
        pred = jnp.transpose(pred, (0, 1, 3, 4, 2))
        grid = jnp.stack(jnp.meshgrid(jnp.arange(g, dtype=x.dtype),
                                      jnp.arange(g, dtype=x.dtype),
                                      indexing="xy"), axis=-1)
        anc = jnp.asarray(anc_px, x.dtype).reshape(1, A, 1, 1, 2) / stride
        xy = (jax.nn.sigmoid(pred[..., :2]) + grid[None, None]) * stride
        wh = jnp.exp(pred[..., 2:4]) * anc * stride
        conf = jax.nn.sigmoid(pred[..., 4:5])
        cls = jax.nn.sigmoid(pred[..., 5:])
        dec = jnp.concatenate([xy, wh, conf, cls], axis=-1)
        parts.append(dec.reshape(B, -1, 5 + num_classes))
    return jnp.concatenate(parts, axis=1)


def decode_yolov5_predictions(outputs, anchors_px, strides, num_classes: int):
    """Decode YOLOv5 reshaped maps [B, 3, g, g, 5+C] with the v5 box transform.

    v5 decode: xy = (sigmoid*2-0.5 + grid) * stride; wh = (sigmoid*2)^2 * anchor.
    (The reference head leaves maps raw in train mode and its NMS consumes raw
    logits; this is the standard v5 inference decode its commented-out
    Yolo_Layers path implements, LightningFunc/utils/YoloV5Utils.py:213-255.)
    """
    parts = []
    for x, anc_px, stride in zip(outputs, anchors_px, strides):
        B, A, g, _, _ = x.shape
        grid = jnp.stack(jnp.meshgrid(jnp.arange(g, dtype=x.dtype),
                                      jnp.arange(g, dtype=x.dtype),
                                      indexing="xy"), axis=-1)
        anc = jnp.asarray(anc_px, x.dtype).reshape(1, A, 1, 1, 2)
        sig = jax.nn.sigmoid(x)
        xy = (sig[..., :2] * 2.0 - 0.5 + grid[None, None]) * stride
        wh = (sig[..., 2:4] * 2.0) ** 2 * anc
        dec = jnp.concatenate([xy, wh, sig[..., 4:]], axis=-1)
        parts.append(dec.reshape(B, -1, 5 + num_classes))
    return jnp.concatenate(parts, axis=1)


def yolo_nms(predictions, conf_thres: float = 0.5, nms_thres: float = 0.4,
             top_k: int = 300, use_pallas=None) -> NMSResult:
    """Batched YOLO weighted-merge NMS over decoded predictions [B, N, 5+C].

    Candidates are ranked by obj_conf * max_cls_conf, suppressed boxes with
    IoU > nms_thres and matching label are conf-weighted-merged into the kept
    box. Reference: model/YOLOV5.py:157-218 (same in v2/v3/v4 files).
    On TPU the suppression scan runs as a Pallas kernel (ops/pallas/nms_kernel).
    """
    top_k = min(top_k, int(predictions.shape[1]))

    def per_image(pred):
        boxes = box_ops.xywh_to_xyxy(pred[:, :4])
        obj = pred[:, 4]
        cls_conf = jnp.max(pred[:, 5:], axis=-1)
        label = jnp.argmax(pred[:, 5:], axis=-1).astype(jnp.int32)
        score = obj * cls_conf
        score = jnp.where(obj >= conf_thres, score, NEG_INF)
        top_scores, idx = jax.lax.top_k(score, top_k)
        return boxes[idx], top_scores, label[idx], obj[idx], cls_conf[idx]

    tb, ts, tl, to, tc = jax.vmap(per_image)(predictions)
    obj_w = jnp.where(ts > NEG_INF, to, 0.0)
    if _use_pallas(use_pallas):
        from objectdetectionpl_tpu.ops.pallas.nms_kernel import \
            pallas_greedy_nms
        kept_boxes, keep = pallas_greedy_nms(
            tb, ts, tl, obj_w, nms_thresh=nms_thres, class_aware=True,
            merge=True, plus1=1.0)
    else:
        kept_boxes, keep = jax.vmap(
            lambda b, s, l, o: _greedy_nms_single(
                b, s, l, top_k, nms_thres,
                lambda x, y: box_ops.iou_plus1(x, y), class_aware=True,
                merge=True, obj_conf=o))(tb, ts, tl, obj_w)
    v = keep & (ts > NEG_INF)
    return NMSResult(kept_boxes, jnp.where(v, to, 0.0),
                     jnp.where(v, tc, 0.0), tl, v)
