"""Target assignment, fully vectorized for TPU (no Python loops over targets).

The reference assigns targets with scatter writes driven by Python loops and a
ragged ``[N, 6]`` target tensor (``LightningFunc/accuracy.py:305-380`` for the
YOLOv2/3/4 ``build_targets``; ``accuracy.py:472-521`` for ``build_targets_v5``;
``LightningFunc/losses.py:199-218`` for SSD bidirectional matching;
``losses.py:423-443`` for RetinaNet max-IoU matching).  TPU needs static shapes,
so this module works on padded per-image targets:

    labels: int32 [B, M]      class ids (0-based)
    boxes:  float [B, M, 4]   (cx, cy, w, h) normalized to [0, 1]
    mask:   bool  [B, M]      True for real targets, False for padding

Scatter semantics: torch index_put with duplicate indices keeps the *last*
write on CPU (and is nondeterministic on CUDA).  We reproduce deterministic
last-write-wins by masking all but the last duplicate before scattering.
Invalid (padded) entries scatter with an out-of-bounds sentinel index and
``mode='drop'`` (negative sentinels would wrap, not drop).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from objectdetectionpl_tpu.ops import boxes as box_ops


def _last_write_wins(lin_idx, valid):
    """Mask off all but the last valid occurrence of each linear index.

    lin_idx: int32 [N] flattened scatter indices, valid: bool [N].
    Returns bool [N].  O(N log N): stable-sort by index, keep each sorted
    run's final element (invalid entries get unique sentinel keys so they
    never join a run).  Replaces an O(N^2) comparison matrix that
    materialized 6400x6400 bools per scale at B=64, M=100.
    """
    n = lin_idx.shape[0]
    pos = jnp.arange(n, dtype=jnp.int64 if lin_idx.dtype == jnp.int64
                     else jnp.int32)
    big = jnp.iinfo(pos.dtype).max - n
    key = jnp.where(valid, lin_idx, big + pos)       # invalid -> unique keys
    order = jnp.argsort(key, stable=True)            # equal keys keep position order
    sorted_key = key[order]
    last_of_run = jnp.concatenate(
        [sorted_key[:-1] != sorted_key[1:], jnp.ones((1,), bool)])
    win = jnp.zeros((n,), bool).at[order].set(last_of_run)
    return valid & win


class YoloTargets(NamedTuple):
    """Dense per-cell targets for the YOLOv2/3/4 region losses.

    Mirrors the tuple returned by the reference ``build_targets``
    (LightningFunc/accuracy.py:379-380); ``tconf == obj_mask``.
    """

    iou_scores: jax.Array   # [B, A, g, g]
    class_mask: jax.Array   # [B, A, g, g]
    obj_mask: jax.Array     # [B, A, g, g] bool
    noobj_mask: jax.Array   # [B, A, g, g] bool
    tx: jax.Array           # [B, A, g, g]
    ty: jax.Array
    tw: jax.Array
    th: jax.Array
    tcls: jax.Array         # [B, A, g, g, C]


def build_targets_yolo(pred_boxes, pred_cls, labels, boxes, mask, anchors,
                       ignore_thres: float = 0.5) -> YoloTargets:
    """Vectorized YOLOv2/3/4 target assignment.

    Args:
      pred_boxes: [B, A, g, g, 4] decoded predictions in grid units.
      pred_cls:   [B, A, g, g, C] class probabilities.
      labels/boxes/mask: padded targets (boxes normalized xywh).
      anchors: [A, 2] in grid units.
      ignore_thres: wh-IoU threshold above which noobj is cleared.

    Reference: LightningFunc/accuracy.py:305-380.
    """
    B, A, g = pred_boxes.shape[0], pred_boxes.shape[1], pred_boxes.shape[2]
    C = pred_cls.shape[-1]
    M = labels.shape[1]

    tb = boxes * g                                   # grid units [B, M, 4]
    gxy, gwh = tb[..., :2], tb[..., 2:4]
    # Best anchor per target by wh-IoU. [B, M, A]
    ious = box_ops.wh_iou(gwh[:, :, None, :], anchors[None, None, :, :])
    best_n = jnp.argmax(ious, axis=-1)               # [B, M]

    gi = jnp.clip(gxy[..., 0].astype(jnp.int32), 0, g - 1)
    gj = jnp.clip(gxy[..., 1].astype(jnp.int32), 0, g - 1)
    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, M))

    flat_mask = mask.reshape(-1)
    n_cells = B * A * g * g
    # OOB sentinel (== n_cells) + mode='drop' discards padded targets; note a
    # negative sentinel would WRAP under jax scatter semantics, not drop.
    lin_cell = (((b_idx * A + best_n) * g + gj) * g + gi).reshape(-1)
    lin_cell = jnp.where(flat_mask, lin_cell, n_cells)

    # obj: every valid target writes 1 (duplicates agree, no dedup needed).
    obj = jnp.zeros((n_cells,), jnp.float32).at[lin_cell].set(
        1.0, mode="drop").reshape(B, A, g, g)

    # noobj cleared at the best-anchor cell and at every anchor whose wh-IoU
    # with the target exceeds ignore_thres (accuracy.py:345-358).
    a_idx = jnp.broadcast_to(jnp.arange(A)[None, None, :], (B, M, A))
    lin_ign = (((b_idx[..., None] * A + a_idx) * g + gj[..., None]) * g
               + gi[..., None]).reshape(-1)
    ign_upd = (mask[..., None] & (ious > ignore_thres)).reshape(-1)
    lin_ign = jnp.where(ign_upd, lin_ign, n_cells)
    cleared = jnp.zeros((n_cells,), jnp.float32).at[lin_ign].set(
        1.0, mode="drop").reshape(B, A, g, g)
    noobj = (obj == 0) & (cleared == 0)

    # Last-write-wins scatters for per-cell regression/metric targets.
    win = _last_write_wins(lin_cell, flat_mask)
    lin_win = jnp.where(win, lin_cell, n_cells)

    def scatter(vals):
        return jnp.zeros((n_cells,), jnp.float32).at[lin_win].set(
            vals.reshape(-1), mode="drop").reshape(B, A, g, g)

    gx, gy = gxy[..., 0], gxy[..., 1]
    gw, gh = gwh[..., 0], gwh[..., 1]
    anc = anchors[best_n]                            # [B, M, 2]
    tx = scatter(gx - jnp.floor(gx))
    ty = scatter(gy - jnp.floor(gy))
    tw = scatter(jnp.log(gw / anc[..., 0] + 1e-16))
    th = scatter(jnp.log(gh / anc[..., 1] + 1e-16))

    # tcls: one-hot writes; a cell hit by two labels keeps both (the reference
    # writes 1 per (cell, label) pair without zeroing, accuracy.py:374).
    lbl = jnp.clip(labels, 0, C - 1).reshape(-1)
    lin_cls = jnp.where(flat_mask, lin_cell * C + lbl, n_cells * C)
    tcls = jnp.zeros((n_cells * C,), jnp.float32).at[lin_cls].set(
        1.0, mode="drop").reshape(B, A, g, g, C)

    # Metrics at assigned cells (accuracy.py:376-377).
    pb = pred_boxes[b_idx, best_n, gj, gi]           # [B, M, 4]
    pc = pred_cls[b_idx, best_n, gj, gi]             # [B, M, C]
    correct = (jnp.argmax(pc, axis=-1) == labels).astype(jnp.float32)
    iou_t = box_ops.iou_plus1(pb, tb, xyxy=False)
    class_mask = scatter(correct)
    iou_scores = scatter(iou_t)

    return YoloTargets(iou_scores, class_mask, obj, noobj, tx, ty, tw, th, tcls)


class V5Targets(NamedTuple):
    """Fixed-size YOLOv5 assignment for one detection layer.

    K = M * A * 3 candidate slots (center + one x-neighbor + one y-neighbor).
    The reference enumerates 5 rect4 offsets (accuracy.py:501-506) but the
    x-lo/x-hi and y-lo/y-hi conditions are mutually exclusive (frac < 0.5 vs
    > 0.5), so at most 3 can be active per box — we allocate exactly those,
    which shrinks the loss's gather/scatter-add volume 40% at identical
    semantics.  Mirrors (tcls, tbox, indices, anch) of the reference
    ``build_targets_v5`` (LightningFunc/accuracy.py:472-521) with an explicit
    validity mask.
    """

    b: jax.Array      # [B*K] image index
    a: jax.Array      # [B*K] anchor index
    gj: jax.Array     # [B*K] grid row
    gi: jax.Array     # [B*K] grid col
    tbox: jax.Array   # [B*K, 4] (dx, dy, w, h) in grid units
    anch: jax.Array   # [B*K, 2] anchor wh in grid units
    tcls: jax.Array   # [B*K] class id
    valid: jax.Array  # [B*K] bool


def build_targets_v5(labels, boxes, mask, anchors_layer, grid_size: int,
                     anchor_t: float = 4.0) -> V5Targets:
    """Vectorized YOLOv5 'rect4' assignment for one layer.

    anchors_layer: [A, 2] in *grid* units for this layer.
    Reference: LightningFunc/accuracy.py:472-521 (style='rect4', g=0.5).
    """
    B, M = labels.shape
    A = anchors_layer.shape[0]
    gsz = float(grid_size)

    t = boxes * gsz                                  # [B, M, 4] grid units
    gxy, gwh = t[..., :2], t[..., 2:4]

    # wh-ratio filter: max(r, 1/r).max(-1) < anchor_t  -> [B, M, A]
    r = gwh[:, :, None, :] / anchors_layer[None, None, :, :]
    ratio_ok = jnp.max(jnp.maximum(r, 1.0 / r), axis=-1) < anchor_t
    base = mask[:, :, None] & ratio_ok               # [B, M, A]

    # rect4 neighbor conditions (accuracy.py:501-506), folded to 3 variants:
    # frac < 0.5 selects the lo neighbor, frac > 0.5 the hi one — never both.
    frac = gxy % 1.0
    lo = frac < 0.5                                  # [B, M, 2] (x, y)
    # signed offset (in units of the reference's subtracted off * g=0.5):
    # lo -> +1 (cell to the left/top), hi -> -1 (right/bottom).
    sgn = jnp.where(lo, 1.0, -1.0)                   # [B, M, 2]
    in_rng = jnp.where(lo, gxy > 1.0, gxy < gsz - 1.0)  # [B, M, 2]
    ones = jnp.ones_like(in_rng[..., 0])
    variant_ok = jnp.stack([ones, in_rng[..., 0], in_rng[..., 1]],
                           axis=-1)                  # [B, M, 3]

    zero = jnp.zeros_like(sgn[..., 0])
    offs = jnp.stack([jnp.stack([zero, zero], -1),            # center
                      jnp.stack([sgn[..., 0], zero], -1),     # x neighbor
                      jnp.stack([zero, sgn[..., 1]], -1)],    # y neighbor
                     axis=2) * 0.5                   # [B, M, 3, 2]

    valid = (base[:, :, :, None] & variant_ok[:, :, None, :])  # [B, M, A, 3]
    gij = jnp.floor(gxy[:, :, None, :] - offs)       # [B, M, 3, 2]
    gi = jnp.broadcast_to(gij[..., 0].astype(jnp.int32)[:, :, None, :],
                          (B, M, A, 3))
    gj = jnp.broadcast_to(gij[..., 1].astype(jnp.int32)[:, :, None, :],
                          (B, M, A, 3))

    dxy = gxy[:, :, None, :] - gij                   # [B, M, 3, 2]
    tbox = jnp.concatenate(
        [jnp.broadcast_to(dxy[:, :, None], (B, M, A, 3, 2)),
         jnp.broadcast_to(gwh[:, :, None, None, :], (B, M, A, 3, 2))], axis=-1)

    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None, None, None], (B, M, A, 3))
    a_idx = jnp.broadcast_to(jnp.arange(A)[None, None, :, None], (B, M, A, 3))
    anch = jnp.broadcast_to(anchors_layer[None, None, :, None, :], (B, M, A, 3, 2))
    cls = jnp.broadcast_to(labels[:, :, None, None], (B, M, A, 3))

    flat = lambda x: x.reshape(B * M * A * 3, *x.shape[4:])
    v = flat(valid)
    # Clamp indices so gathers stay in-bounds; validity masks the result.
    gi_f = jnp.clip(flat(gi), 0, grid_size - 1)
    gj_f = jnp.clip(flat(gj), 0, grid_size - 1)
    return V5Targets(flat(b_idx), flat(a_idx), gj_f, gi_f, flat(tbox),
                     flat(anch), flat(cls), v)


class SSDMatch(NamedTuple):
    """Per-image SSD matching result over D default boxes."""

    matched: jax.Array        # [D] bool — positives
    best_ann: jax.Array       # [D] int32 — index of matched annotation
    true_offsets: jax.Array   # [D, 4] encoded regression targets
    true_classes: jax.Array   # [D] int32 — 0 = background, 1..C = classes


def ssd_match(default_xywh, labels, boxes, mask, match_thresh: float = 0.5):
    """Bidirectional SSD matching for one image (vmap over batch).

    default_xywh: [D, 4] center-form normalized default boxes.
    labels/boxes/mask: [M]/[M, 4]/[M] padded annotations (normalized xywh).

    Matches reference semantics (LightningFunc/losses.py:199-253): max-IoU per
    default box, threshold 0.5, plus a forced match of every annotation to its
    best default box; forced assignment keeps the highest annotation index on
    collisions (== torch-CPU last-write-wins since indices ascend).

    Divergence from reference (documented): classes are encoded 1..C with 0 as
    an explicit background channel.  The reference reuses class 0 as background
    (losses.py:252-253), silently conflating the first dataset class with
    background; we add the +1 shift the same way its RetinaNet loss does
    (losses.py:437).
    """
    D = default_xywh.shape[0]
    M = labels.shape[0]

    d_pts = box_ops.center_to_points_clipped(default_xywh)
    a_pts = box_ops.center_to_points_clipped(boxes)
    ious = box_ops.pairwise_iou_corner(a_pts, d_pts)            # [M, D]
    ious = jnp.where(mask[:, None], ious, -1.0)

    best_ann = jnp.argmax(ious, axis=0)                         # [D]
    ious_max = jnp.max(ious, axis=0)
    matched = ious_max >= match_thresh

    # Forced matches: each annotation claims its best default box.
    ann_best_dbox = jnp.argmax(ious, axis=1)                    # [M]
    ann_ids = jnp.arange(M)
    forced_tgt = jnp.where(mask, ann_best_dbox, D)  # D is OOB -> dropped
    matched = matched | jnp.zeros((D,), bool).at[forced_tgt].set(
        True, mode="drop")
    best_ann = best_ann.at[forced_tgt].max(ann_ids, mode="drop")

    matched_boxes = boxes[best_ann]                             # [D, 4]
    # floor wh before the log-encode: a dbox matched to a padded (zero-size)
    # annotation would produce -inf offsets, and inf * 0-mask = NaN in the
    # loss even though the row is masked out.
    matched_boxes = matched_boxes.at[..., 2:4].set(
        jnp.maximum(matched_boxes[..., 2:4], 1e-9))
    true_offsets = box_ops.ssd_encode(matched_boxes, default_xywh)
    true_classes = jnp.where(matched, 1 + labels[best_ann], 0)
    return SSDMatch(matched, best_ann, true_offsets, true_classes)


class RetinaMatch(NamedTuple):
    loc_targets: jax.Array   # [A, 4]
    cls_targets: jax.Array   # [A] int32: -1 ignore, 0 bg, 1..C classes


def retina_match(anchors_xywh, labels, boxes, mask, img_size: float):
    """RetinaNet max-IoU matching for one image (vmap over batch).

    anchors_xywh: [A, 4] center-form pixel anchors.
    boxes normalized xywh -> scaled by img_size (losses.py:425).
    Ignore band (0.4, 0.5) -> -1; below 0.4 -> 0 (background).
    Reference: LightningFunc/losses.py:423-443.
    """
    boxes_px = boxes * img_size
    a_xyxy = box_ops.xywh_to_xyxy(anchors_xywh)
    b_xyxy = box_ops.xywh_to_xyxy(boxes_px)
    ious = box_ops.pairwise_iou_plus1(a_xyxy, b_xyxy)           # [A, M]
    ious = jnp.where(mask[None, :], ious, -1.0)
    max_ious = jnp.max(ious, axis=1)
    max_ids = jnp.argmax(ious, axis=1)

    matched = boxes_px[max_ids]
    # wh floor: see ssd_match — padded zero-size boxes must not emit -inf.
    matched = matched.at[..., 2:4].set(
        jnp.maximum(matched[..., 2:4], 1e-6))
    loc_targets = box_ops.retina_encode(matched, anchors_xywh)
    cls_targets = 1 + labels[max_ids]
    cls_targets = jnp.where(max_ious < 0.5, 0, cls_targets)
    cls_targets = jnp.where((max_ious > 0.4) & (max_ious < 0.5), -1, cls_targets)
    # Image with zero annotations: everything background.
    cls_targets = jnp.where(jnp.any(mask), cls_targets, 0)
    return RetinaMatch(loc_targets, cls_targets)
