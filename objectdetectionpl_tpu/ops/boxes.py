"""Box geometry ops: IoU variants, format conversions, box codecs.

These encode the *exact* numeric conventions of the reference so that losses,
assignment and mAP match within tolerance:

- ``iou_corner``       reference ``LightningFunc/accuracy.py:6-37``   (no +1, used by SSD matching)
- ``iou_plus1``        reference ``LightningFunc/accuracy.py:39-69``  (+1-pixel convention, eps 1e-16)
- ``iou_v5``           reference ``LightningFunc/accuracy.py:71-114`` (GIoU/DIoU/CIoU variants)
- ``wh_iou``           reference ``LightningFunc/accuracy.py:297-303`` (anchor wh matching)
- ``pairwise_iou_plus1`` reference ``LightningFunc/losses.py:375-403`` (RetinaNet matching)
- ``xywh_to_xyxy``     reference ``LightningFunc/accuracy.py:289-295``

Everything is written elementwise-broadcastable so it vectorizes over arbitrary
leading dims under vmap/jit (the reference versions loop or expand by hand).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-16


def xywh_to_xyxy(box):
    """(cx, cy, w, h) -> (x1, y1, x2, y2) on the last axis."""
    cx, cy, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_xywh(box):
    """(x1, y1, x2, y2) -> (cx, cy, w, h) on the last axis."""
    x1, y1, x2, y2 = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xyxy_to_xywh_plus1(box):
    """RetinaNet's ``change_box_order('xyxy2xywh')``: wh = max - min + 1.

    Reference: LightningFunc/losses.py:360-373.
    """
    x1, y1, x2, y2 = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1 + 1, y2 - y1 + 1], axis=-1)


def iou_corner(box1, box2):
    """Elementwise corner-form IoU, no +1 pixel, no eps (SSD matching flavor).

    Broadcasts over leading dims; last dim is (x1, y1, x2, y2).
    Reference: LightningFunc/accuracy.py:6-37 (``iou``).
    """
    lt = jnp.maximum(box1[..., :2], box2[..., :2])
    rb = jnp.minimum(box1[..., 2:4], box2[..., 2:4])
    wh = jnp.clip(rb - lt, min=0.0)
    inter = wh[..., 0] * wh[..., 1]
    wh1 = jnp.clip(box1[..., 2:4] - box1[..., :2], min=0.0)
    wh2 = jnp.clip(box2[..., 2:4] - box2[..., :2], min=0.0)
    area1 = wh1[..., 0] * wh1[..., 1]
    area2 = wh2[..., 0] * wh2[..., 1]
    return inter / (area1 + area2 - inter)


def iou_plus1(box1, box2, xyxy: bool = True):
    """Elementwise IoU with the +1-pixel convention and 1e-16 union eps.

    Broadcasts over leading dims. ``xyxy=False`` means center-form input.
    Reference: LightningFunc/accuracy.py:39-69 (``bbox_iou``).
    """
    if not xyxy:
        box1 = xywh_to_xyxy(box1)
        box2 = xywh_to_xyxy(box2)
    x1 = jnp.maximum(box1[..., 0], box2[..., 0])
    y1 = jnp.maximum(box1[..., 1], box2[..., 1])
    x2 = jnp.minimum(box1[..., 2], box2[..., 2])
    y2 = jnp.minimum(box1[..., 3], box2[..., 3])
    inter = jnp.clip(x2 - x1 + 1, min=0) * jnp.clip(y2 - y1 + 1, min=0)
    area1 = (box1[..., 2] - box1[..., 0] + 1) * (box1[..., 3] - box1[..., 1] + 1)
    area2 = (box2[..., 2] - box2[..., 0] + 1) * (box2[..., 3] - box2[..., 1] + 1)
    return inter / (area1 + area2 - inter + EPS)


def iou_v5(box1, box2, xyxy: bool = True, giou: bool = False, diou: bool = False,
           ciou: bool = False):
    """Elementwise IoU with GIoU/DIoU/CIoU variants (no +1 convention).

    Reference: LightningFunc/accuracy.py:71-114 (``bbox_iou_v5``).
    """
    if not xyxy:
        box1 = xywh_to_xyxy(box1)
        box2 = xywh_to_xyxy(box2)
    b1_x1, b1_y1, b1_x2, b1_y2 = (box1[..., i] for i in range(4))
    b2_x1, b2_y1, b2_x2, b2_y2 = (box2[..., i] for i in range(4))

    inter = (jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), min=0)
             * jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), min=0))
    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1
    union = (w1 * h1 + EPS) + w2 * h2 - inter
    iou = inter / union
    if not (giou or diou or ciou):
        return iou

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    if giou:
        c_area = cw * ch + EPS
        return iou - (c_area - union) / c_area
    c2 = cw ** 2 + ch ** 2 + EPS
    rho2 = (((b2_x1 + b2_x2) - (b1_x1 + b1_x2)) ** 2 / 4
            + ((b2_y1 + b2_y2) - (b1_y1 + b1_y2)) ** 2 / 4)
    if diou:
        return iou - rho2 / c2
    # CIoU: aspect-ratio penalty with detached alpha.
    import jax

    v = (4 / jnp.pi ** 2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = jax.lax.stop_gradient(v / (1 - iou + v))
    return iou - (rho2 / c2 + v * alpha)


def wh_iou(wh1, wh2):
    """IoU of width-height pairs assuming shared top-left corner.

    ``wh1 [..., 2]`` broadcast against ``wh2 [..., 2]``.
    Reference: LightningFunc/accuracy.py:297-303 (``bbox_wh_iou``).
    """
    inter = jnp.minimum(wh1[..., 0], wh2[..., 0]) * jnp.minimum(wh1[..., 1], wh2[..., 1])
    union = (wh1[..., 0] * wh1[..., 1] + EPS) + wh2[..., 0] * wh2[..., 1] - inter
    return inter / union


def pairwise_iou_plus1(box1, box2):
    """Pairwise [N, M] IoU with the +1 convention (RetinaNet anchor matching).

    Both inputs xyxy. Reference: LightningFunc/losses.py:375-403 (``box_iou``).
    """
    lt = jnp.maximum(box1[:, None, :2], box2[None, :, :2])
    rb = jnp.minimum(box1[:, None, 2:4], box2[None, :, 2:4])
    wh = jnp.clip(rb - lt + 1, min=0)
    inter = wh[..., 0] * wh[..., 1]
    area1 = (box1[:, 2] - box1[:, 0] + 1) * (box1[:, 3] - box1[:, 1] + 1)
    area2 = (box2[:, 2] - box2[:, 0] + 1) * (box2[:, 3] - box2[:, 1] + 1)
    return inter / (area1[:, None] + area2[None, :] - inter)


def pairwise_iou_corner(box1, box2):
    """Pairwise [N, M] corner-form IoU without +1 (SSD matching).

    Vectorized form of the reference's expand+``iou`` pattern
    (LightningFunc/losses.py:187-218).
    """
    return iou_corner(box1[:, None, :], box2[None, :, :])


# --- SSD / RetinaNet box codecs ------------------------------------------------

SSD_VARIANCE_XY = 0.1
SSD_VARIANCE_WH = 0.2


def ssd_encode(matched_xywh, default_xywh, use_variance: bool = True):
    """Encode matched gt boxes (center-form) against default boxes.

    Reference: LightningFunc/losses.py:220-236 (``compute_offsets``).
    """
    off_cxy = matched_xywh[..., :2] - default_xywh[..., :2]
    if use_variance:
        off_cxy = off_cxy / (default_xywh[..., 2:4] * SSD_VARIANCE_XY)
    else:
        off_cxy = off_cxy / default_xywh[..., 2:4]
    off_wh = jnp.log(matched_xywh[..., 2:4] / default_xywh[..., 2:4])
    if use_variance:
        off_wh = off_wh / SSD_VARIANCE_WH
    return jnp.concatenate([off_cxy, off_wh], axis=-1)


def ssd_decode(offsets, default_xywh, use_variance: bool = True):
    """Invert ``ssd_encode`` -> center-form boxes.

    Matches the decode inside the reference NMS (model/SSD.py:255-262).
    """
    var_xy = SSD_VARIANCE_XY if use_variance else 1.0
    var_wh = SSD_VARIANCE_WH if use_variance else 1.0
    cxy = offsets[..., :2] * var_xy * default_xywh[..., 2:4] + default_xywh[..., :2]
    wh = jnp.exp(offsets[..., 2:4] * var_wh) * default_xywh[..., 2:4]
    return jnp.concatenate([cxy, wh], axis=-1)


def retina_encode(matched_xywh, anchor_xywh):
    """RetinaNet offsets: xy / anchor_wh, log(wh / anchor_wh).

    Reference: LightningFunc/losses.py:434-436.
    """
    loc_xy = (matched_xywh[..., :2] - anchor_xywh[..., :2]) / anchor_xywh[..., 2:4]
    loc_wh = jnp.log(matched_xywh[..., 2:4] / anchor_xywh[..., 2:4])
    return jnp.concatenate([loc_xy, loc_wh], axis=-1)


def retina_decode(offsets, anchor_xywh):
    """Invert ``retina_encode`` -> center-form boxes (model/RetinaNet.py:128-133)."""
    cxy = offsets[..., :2] * anchor_xywh[..., 2:4] + anchor_xywh[..., :2]
    wh = jnp.exp(offsets[..., 2:4]) * anchor_xywh[..., 2:4]
    return jnp.concatenate([cxy, wh], axis=-1)


def center_to_points_clipped(xywh):
    """Center-form -> corner-form with [0, 1] clipping (SSD matching flavor).

    Reference: LightningFunc/losses.py:172-185 (``center_to_points``).
    """
    lp = jnp.clip(xywh[..., :2] - xywh[..., 2:4] / 2.0, min=0.0)
    rp = jnp.clip(xywh[..., :2] + xywh[..., 2:4] / 2.0, max=1.0)
    return jnp.concatenate([lp, rp], axis=-1)
