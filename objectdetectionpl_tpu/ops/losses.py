"""Detection losses, jit-first re-designs of ``LightningFunc/losses.py``.

Every loss is a pure function ``(outputs, targets) -> dict[str, scalar]`` over
padded targets (labels [B, M], boxes [B, M, 4] normalized xywh, mask [B, M]) and
returns the same metric keys the reference logs to TensorBoard.

Reference semantics reproduced exactly (file:line cites inline); deliberate,
documented divergences:

- empty-positive batches divide by max(count, 1) instead of producing NaN;
- YOLOv3 anchors are scaled input-pixels -> grid units **once** (the reference
  divides by stride twice: model/YOLOV3.py:54 then losses.py:665);
- SSD classes use an explicit background channel (see ``ssd_match``).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from objectdetectionpl_tpu.ops import assignment, boxes as box_ops

# --- elementwise criteria --------------------------------------------------------


# Probability floor for the -100 log clamp.  Torch's clamp binds below
# e^-100 ~ 3.8e-44, but that is a float32 *denormal* and XLA flushes
# denormals to zero (the guard would never fire); use the smallest normal
# float32 instead — probabilities below it are flushed/denormal anyway.
_BCE_FLOOR_P = 1.2e-38


def _safe_log_clamped(p):
    """log(p) clamped at -100 (torch BCELoss semantics) with a safe gradient.

    A plain ``clip(log(p), -100)`` yields 0 * inf = NaN gradients once a
    sigmoid saturates to exactly 0/1 (which float32 does at |logit| ~ 17);
    the double-where keeps the untaken log branch off the autodiff path.
    Value AND gradient match torch (grad 0 in the clamped region).
    """
    unsafe = p < _BCE_FLOOR_P
    safe_p = jnp.where(unsafe, 1.0, p)
    return jnp.where(unsafe, -100.0, jnp.log(safe_p))


def bce_prob(p, t):
    """torch.nn.BCELoss semantics on probabilities (log clamped at -100)."""
    return -(t * _safe_log_clamped(p) + (1.0 - t) * _safe_log_clamped(1.0 - p))


def bce_logits(x, t):
    """torch.nn.BCEWithLogitsLoss (elementwise, numerically stable)."""
    return jnp.clip(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))


def mse(x, t):
    return (x - t) ** 2


def smooth_l1(x, t):
    d = jnp.abs(x - t)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


COORD_CRITERIA = {"mse_loss": mse, "smooth_l1_loss": smooth_l1}


def focal_bce_logits(x, t, gamma: float = 1.5, alpha: float = 0.25):
    """TF-style focal modulation around BCEWithLogits (losses.py:37-64)."""
    loss = bce_logits(x, t)
    p = jax.nn.sigmoid(x)
    p_t = t * p + (1 - t) * (1 - p)
    alpha_f = t * alpha + (1 - t) * (1 - alpha)
    return loss * alpha_f * (1.0 - p_t) ** gamma


def softmax_focal(logits, y, num_classes: int, alpha: float = 0.25,
                  gamma: float = 2.0):
    """The reference ``focal_loss`` module (losses.py:317-349), elementwise.

    logits [N, C]; y [N] in {0 (background), 1..C}.  Background rows get a
    zero one-hot target (one-hot over C+1 then drop column 0).
    Returns [N, C] elementwise loss (caller reduces).
    """
    t = jax.nn.one_hot(y, num_classes + 1)[..., 1:]
    p = jax.nn.softmax(logits, axis=-1)
    p = jnp.clip(p, 1e-7, 1.0 - 1e-7)
    return alpha * (-t * jnp.log(p)) * (1.0 - p) ** gamma


def sigmoid_focal(logits, y, num_classes: int, alpha: float = 0.25,
                  gamma: float = 2.0):
    """Standard RetinaNet focal loss (Lin et al. 2017): per-class sigmoid
    BCE with focal modulation.  logits [N, C]; y [N] in {0 (background),
    1..C}; background rows get all-zero targets that actively push every
    class logit DOWN.

    The reference's ``focal_loss`` instead computes ``-t * log(softmax)``
    (losses.py:317-349), so its zero-target background rows contribute zero
    loss AND zero gradient — no negative pressure exists anywhere, and
    training collapses to saturated 'everything is confidently class 0'
    (measured: round-4 synthetic RetinaNet run, BASELINE.md; DIVERGENCES.md
    #26).  That faithful variant lives in ``softmax_focal``.
    Returns [N, C] elementwise (caller reduces).
    """
    t = jax.nn.one_hot(y, num_classes + 1)[..., 1:]
    p = jax.nn.sigmoid(logits)
    # saturation-safe BCE-with-logits
    bce = (jnp.maximum(logits, 0.0) - logits * t
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    pt = p * t + (1.0 - p) * (1.0 - t)
    w = alpha * t + (1.0 - alpha) * (1.0 - t)
    return w * (1.0 - pt) ** gamma * bce


def _masked_mean(x, m):
    """Mean of x over mask m; 0 if the mask is empty (reference would NaN)."""
    m = m.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def smooth_bce_targets(eps: float = 0.0):
    """Label-smoothing positive/negative targets (losses.py:66-68)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


# --- YOLO v2/v3/v4 region loss ----------------------------------------------------


def decode_yolo_map(x, num_anchors: int, num_classes: int):
    """Raw head map [B, A*(5+C), g, g] -> (xy_sig, wh_raw, conf, cls, pred_boxes).

    Mirrors the reshape/permute + sigmoid/exp decode of RegionLoss
    (losses.py:840-863); pred_boxes are grid-unit xywh *given* grid offsets and
    anchors applied by the caller.
    """
    B, _, g, _ = x.shape
    pred = x.reshape(B, num_anchors, 5 + num_classes, g, g)
    pred = jnp.transpose(pred, (0, 1, 3, 4, 2))            # [B, A, g, g, 5+C]
    xy = jax.nn.sigmoid(pred[..., 0:2])
    wh = pred[..., 2:4]
    conf = jax.nn.sigmoid(pred[..., 4])
    cls = jax.nn.sigmoid(pred[..., 5:])
    return xy, wh, conf, cls


def region_loss(x, labels, boxes, mask, anchors_grid, num_classes: int,
                coord_criterion=mse, cls_criterion=bce_prob,
                conf_criterion=bce_prob, ignore_thres: float = 0.5,
                obj_scale: float = 1.0, noobj_scale: float = 100.0):
    """Single-scale YOLO region loss (RegionLoss v2/v3/v4 core).

    x: raw head map [B, A*(5+C), g, g]; anchors_grid: [A, 2] grid units.
    Reference: LightningFunc/losses.py:797-905 (RegionLoss_v2; v3/v4 identical
    core at losses.py:636-736 / 475-575).
    """
    A = anchors_grid.shape[0]
    B, _, g, _ = x.shape
    xy, wh, conf, cls = decode_yolo_map(x, A, num_classes)

    grid = jnp.stack(jnp.meshgrid(jnp.arange(g, dtype=x.dtype),
                                  jnp.arange(g, dtype=x.dtype), indexing="xy"),
                     axis=-1)                                      # [g, g, 2]
    anc = anchors_grid.reshape(1, A, 1, 1, 2).astype(x.dtype)
    # exp capped at e^20 grid units: keeps early-training box decodes (used
    # only for assignment metrics, under stop_gradient) finite; loss terms
    # use the raw wh so values match the reference.
    pred_boxes = jnp.concatenate(
        [xy + grid[None, None], jnp.exp(jnp.minimum(wh, 20.0)) * anc],
        axis=-1)                                                   # [B,A,g,g,4]

    tgt = assignment.build_targets_yolo(
        jax.lax.stop_gradient(pred_boxes), jax.lax.stop_gradient(cls),
        labels, boxes, mask, anchors_grid, ignore_thres)
    obj = tgt.obj_mask
    noobj = tgt.noobj_mask.astype(x.dtype)

    loss_x = _masked_mean(coord_criterion(xy[..., 0], tgt.tx), obj)
    loss_y = _masked_mean(coord_criterion(xy[..., 1], tgt.ty), obj)
    loss_w = _masked_mean(coord_criterion(wh[..., 0], tgt.tw), obj)
    loss_h = _masked_mean(coord_criterion(wh[..., 1], tgt.th), obj)
    loss_conf_obj = _masked_mean(conf_criterion(conf, obj), obj)
    loss_conf_noobj = _masked_mean(conf_criterion(conf, obj), noobj)
    loss_conf = obj_scale * loss_conf_obj + noobj_scale * loss_conf_noobj
    loss_cls = _masked_mean(cls_criterion(cls, tgt.tcls),
                            jnp.broadcast_to(obj[..., None], cls.shape))
    total = loss_x + loss_y + loss_w + loss_h + loss_conf + loss_cls

    # "Size" TB metric: sqrt-wh regression at matched cells.  The reference
    # compares pred wh against misaligned target columns (losses.py:889-894,
    # targets[..., 3:5] is (y, w)); we log the sane analogue: masked sqrt-wh
    # error at assigned cells.
    pw = jnp.sqrt(jnp.abs(pred_boxes[..., 2:4]) + 1e-32)
    tw_grid = jnp.sqrt(jnp.abs(jnp.exp(jnp.stack([tgt.tw, tgt.th], -1)) *
                               anc) + 1e-32)
    wh_loss = _masked_mean(coord_criterion(pw, tw_grid).mean(-1), obj)

    return {"loss": total, "Localization": loss_x + loss_y, "Size": wh_loss,
            "Conf": loss_conf, "Classification": loss_cls,
            "Conf_obj": loss_conf_obj, "Conf_noobj": loss_conf_noobj}


def multiscale_region_loss(outputs: Sequence[jax.Array], labels, boxes, mask,
                           anchors_grid_per_scale: Sequence[jnp.ndarray],
                           num_classes: int, **kw):
    """Multi-scale wrapper: per-scale region loss, metrics averaged over scales.

    Reference: losses.py:738-795 (v3) / 577-634 (v4) — sums per-scale values
    then divides by the number of scales, including the total loss.
    """
    n = len(outputs)
    acc = None
    for out, anc in zip(outputs, anchors_grid_per_scale):
        m = region_loss(out, labels, boxes, mask, anc, num_classes, **kw)
        acc = m if acc is None else {k: acc[k] + m[k] for k in m}
    return {k: v / n for k, v in acc.items()}


# --- YOLOv5 loss -------------------------------------------------------------------


def yolov5_loss(outputs: Sequence[jax.Array], labels, boxes, mask,
                anchors_px=None, strides=(8, 16, 32), num_classes: int = 80,
                fl_gamma: float = 1.5, label_smoothing: float = 0.0,
                box_gain: float = 0.05, obj_gain: float = 1.0,
                cls_gain: float = 0.58, anchor_t: float = 4.0):
    """YOLOv5 loss over 3 reshaped head maps [B, 3, g, g, 5+C].

    GIoU box loss with (sigmoid*2-0.5, (sigmoid*2)^2*anchor) decode, objectness
    BCE with GIoU-ratio targets, focal-wrapped BCE class loss; gains
    lbox 0.05 / lobj 1.0 / lcls 0.58, 'mean' reduction.
    Reference: LightningFunc/losses.py:70-156 (MultiScaleRegionLoss_v5).
    """
    from objectdetectionpl_tpu.ops import anchors as anchor_lib

    if anchors_px is None:
        anchors_px = anchor_lib.YOLOV5_ANCHORS
    cp, cn = smooth_bce_targets(label_smoothing)
    crit = (functools.partial(focal_bce_logits, gamma=fl_gamma)
            if fl_gamma > 0 else bce_logits)

    lcls = jnp.float32(0.0)
    lbox = jnp.float32(0.0)
    lobj = jnp.float32(0.0)
    for i, pi in enumerate(outputs):
        g = pi.shape[2]
        anc_grid = jnp.asarray(anchors_px[i], jnp.float32) / float(strides[i])
        t = assignment.build_targets_v5(labels, boxes, mask, anc_grid, g,
                                        anchor_t)
        valid = t.valid.astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(valid), 1.0)

        # Plain 4-D index gather.  (A sorted-segment-sum custom VJP for the
        # duplicate-index scatter-add backward was measured SLOWER on the
        # v5e — 128.6 vs 114.4 ms/train-step at B=64 — XLA's native
        # scatter-add handles this size fine; don't re-attempt.)
        ps = pi[t.b, t.a, t.gj, t.gi]                       # [K, 5+C]
        pxy = jax.nn.sigmoid(ps[:, :2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(ps[:, 2:4]) * 2.0) ** 2 * t.anch
        pbox = jnp.concatenate([pxy, pwh], axis=1)
        giou = box_ops.iou_v5(pbox, t.tbox, xyxy=False, giou=True)  # [K]
        lbox += jnp.sum((1.0 - giou) * valid) / cnt

        # Objectness targets: GIoU ratio at assigned cells (losses.py:122-123).
        # Duplicate-cell writes keep the max (torch keeps an arbitrary last
        # write; max is the deterministic rationalization).
        tobj = jnp.zeros(pi.shape[:4], pi.dtype)
        giou_t = jnp.clip(jax.lax.stop_gradient(giou), 0.0).astype(pi.dtype)
        b = jnp.where(t.valid, t.b, pi.shape[0])  # OOB image idx -> dropped
        tobj = tobj.at[b, t.a, t.gj, t.gi].max(giou_t, mode="drop")
        lobj += jnp.mean(crit(pi[..., 4], tobj))

        if num_classes > 1:
            tcl = jnp.full((ps.shape[0], num_classes), cn, pi.dtype)
            tcl = tcl.at[jnp.arange(ps.shape[0]),
                         jnp.clip(t.tcls, 0, num_classes - 1)].set(cp)
            cls_elem = crit(ps[:, 5:], tcl)                 # [K, C]
            lcls += jnp.sum(cls_elem * valid[:, None]) / (cnt * num_classes)

    lbox *= box_gain
    lobj *= obj_gain
    lcls *= cls_gain
    loss = lbox + lobj + lcls
    return {"loss": loss, "Localization": lbox, "Classification": lcls,
            "Conf_obj": lobj}


# --- SSD loss ----------------------------------------------------------------------


def ssd_loss(outputs, labels, boxes, mask, default_xywh, num_classes: int,
             coord_criterion=smooth_l1, cls_mode: str = "ce",
             match_thresh: float = 0.5, neg_ratio: int = 3):
    """SSD multibox loss with hard-negative mining (3:1).

    outputs: (loc [B, D, 4], cls [B, D, 1+C]) — class channel 0 is background.
    cls_mode: 'ce' (CrossEntropyLoss) or 'focal' (the reference focal_loss).
    Reference: LightningFunc/losses.py:159-315.  Per-image annotations are
    sliced correctly (the reference indexes the first len rows of the global
    target tensor for every image, losses.py:299-300 — a bug we do not keep).
    """
    loc_preds, cls_preds = outputs
    default_xywh = jnp.asarray(default_xywh)

    def per_image(loc_p, cls_p, lab, box, msk):
        m = assignment.ssd_match(default_xywh, lab, box, msk, match_thresh)
        n_matched = jnp.sum(m.matched)
        has_ann = jnp.any(msk)
        n = jnp.maximum(jnp.where(has_ann, n_matched, 1), 1).astype(jnp.float32)

        reg_elem = coord_criterion(loc_p, m.true_offsets).sum(-1)   # [D]
        reg = jnp.sum(reg_elem * m.matched) / n
        reg = jnp.where(has_ann, reg, 0.0)

        if cls_mode == "focal":
            # Reference focal semantics: softmax over *foreground* channels
            # only (the reference focal_loss has no background channel in its
            # logits, losses.py:340-346); our head's channel 0 (background) is
            # unused in focal mode.  Divergence from the reference SSD+focal
            # combination itself: the reference feeds the [D, C] elementwise
            # focal matrix into a hard-negative path written for [D] vectors
            # (losses.py:267-272 sorts a 2-D tensor and fancy-indexes rows —
            # shape-broken); we reduce per-box with sum(-1) first, which is the
            # intended mining semantics.
            cls_elem = softmax_focal(cls_p[:, 1:], m.true_classes,
                                     num_classes).sum(-1)
        else:  # cross-entropy over 1+C channels
            logp = jax.nn.log_softmax(cls_p, axis=-1)
            cls_elem = -jnp.take_along_axis(
                logp, m.true_classes[:, None], axis=-1)[:, 0]       # [D]

        pos_sum = jnp.sum(cls_elem * m.matched)
        # Hard-negative mining: top (neg_ratio * N) negative losses
        # (losses.py:266-272), fixed-shape via full sort + rank mask.
        neg_losses = jnp.where(m.matched, -jnp.inf, cls_elem)
        neg_sorted = jnp.sort(neg_losses)[::-1]
        rank = jnp.arange(neg_sorted.shape[0])
        k = neg_ratio * jnp.where(has_ann, n_matched, 0)
        neg_sum = jnp.sum(jnp.where(rank < k, neg_sorted, 0.0))
        cls_loss = (pos_sum + neg_sum) / n
        return cls_loss, reg

    cls_l, loc_l = jax.vmap(per_image)(loc_preds, cls_preds, labels, boxes, mask)
    cls_loss = jnp.mean(cls_l)
    loc_loss = jnp.mean(loc_l)
    return {"loss": cls_loss + loc_loss, "Localization": loc_loss,
            "Classification": cls_loss}


# --- RetinaNet loss ----------------------------------------------------------------


def retinanet_loss(outputs, labels, boxes, mask, anchors_xywh,
                   num_classes: int, img_size: float,
                   coord_criterion=smooth_l1, focal: str = "softmax"):
    """RetinaNet focal loss + SmoothL1, normalized by num positives.

    outputs: (loc [B, A, 4], cls [B, A, C]).
    ``focal="softmax"`` is the reference-faithful variant (no gradient on
    background rows — degenerate for real training, see ``sigmoid_focal``);
    the production factory (``make_loss``) defaults to ``"sigmoid"``.
    Reference: LightningFunc/losses.py:351-473.
    """
    loc_preds, cls_preds = outputs
    anchors_xywh = jnp.asarray(anchors_xywh)

    match = jax.vmap(
        lambda l, b, m: assignment.retina_match(anchors_xywh, l, b, m, img_size)
    )(labels, boxes, mask)

    pos = match.cls_targets > 0                                  # [B, A]
    num_pos = jnp.maximum(jnp.sum(pos).astype(jnp.float32), 1.0)

    loc_elem = coord_criterion(loc_preds, match.loc_targets).sum(-1)
    loc_loss = jnp.sum(loc_elem * pos)

    not_ignored = match.cls_targets > -1
    focal_fn = sigmoid_focal if focal == "sigmoid" else softmax_focal
    cls_elem = focal_fn(
        cls_preds.reshape(-1, num_classes),
        jnp.clip(match.cls_targets, 0).reshape(-1), num_classes).sum(-1)
    cls_loss = jnp.sum(cls_elem * not_ignored.reshape(-1))

    loss = (loc_loss + cls_loss) / num_pos
    return {"loss": loss, "Localization": loc_loss / num_pos,
            "Classification": cls_loss / num_pos}


# --- factory (configure_loss parity) ------------------------------------------------


def make_loss(model_name: str, num_classes: int, img_size: int,
              coord_criterion: str = "smooth_l1_loss",
              cls_criterion: str = "bce_loss", anchors=None,
              v3_double_stride: bool = False, **kw):
    """String-config loss factory, parity with configure_loss (losses.py:9-35).

    Returns a pure fn ``(outputs, labels, boxes, mask) -> metrics dict``.

    ``v3_double_stride=True`` reproduces the reference's YOLOv3 anchor bug
    exactly: anchors are divided by the stride twice (once at model init,
    model/YOLOV3.py:54, then again inside compute_grid_offsets,
    losses.py:665), shrinking them by 8-32x.  Default False (single
    division — the documented rationalization).
    """
    from objectdetectionpl_tpu.ops import anchors as anchor_lib

    coord = COORD_CRITERIA[coord_criterion]
    if model_name == "YOLOv5":
        anc = anchor_lib.YOLOV5_ANCHORS if anchors is None else anchors
        return functools.partial(yolov5_loss, anchors_px=anc,
                                 strides=anchor_lib.YOLOV5_STRIDES,
                                 num_classes=num_classes, **kw)
    if model_name == "YOLOv4":
        anc = anchor_lib.YOLOV4_ANCHORS if anchors is None else anchors
        per_scale = [jnp.asarray(anc[list(m)]) / s for m, s in
                     zip(anchor_lib.YOLOV4_ANCH_MASKS, anchor_lib.YOLOV4_STRIDES)]
        # v4 head emits strides (8, 16, 32) in output order (model/YOLOV4.py:126-134)
        return functools.partial(multiscale_region_loss,
                                 anchors_grid_per_scale=per_scale,
                                 num_classes=num_classes,
                                 coord_criterion=coord, **kw)
    if model_name == "YOLOv3":
        anc = anchor_lib.YOLOV3_ANCHORS if anchors is None else anchors
        div = [s * s if v3_double_stride else s
               for s in anchor_lib.YOLOV3_STRIDES]
        per_scale = [jnp.asarray(anc[i]) / d for i, d in enumerate(div)]
        return functools.partial(multiscale_region_loss,
                                 anchors_grid_per_scale=per_scale,
                                 num_classes=num_classes,
                                 coord_criterion=coord, **kw)
    if model_name == "YOLOv2":
        anc = anchor_lib.YOLOV2_ANCHORS if anchors is None else anchors
        return functools.partial(region_loss, anchors_grid=jnp.asarray(anc),
                                 num_classes=num_classes,
                                 coord_criterion=coord, **kw)
    if model_name == "SSD":
        dboxes = anchor_lib.ssd_dboxes() if anchors is None else anchors
        mode = "focal" if cls_criterion == "focal_loss" else "ce"
        return functools.partial(ssd_loss, default_xywh=dboxes,
                                 num_classes=num_classes, cls_mode=mode,
                                 coord_criterion=coord, **kw)
    if model_name == "RetinaNet":
        anc = anchor_lib.retina_anchors(img_size) if anchors is None else anchors
        kw.setdefault("focal", "sigmoid")   # see sigmoid_focal docstring
        return functools.partial(retinanet_loss, anchors_xywh=anc,
                                 num_classes=num_classes, img_size=img_size,
                                 coord_criterion=coord, **kw)
    raise ValueError(f"unknown model {model_name!r}")
