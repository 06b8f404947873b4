"""Anchor / default-box / grid-prior generators for all six detector families.

Host-side, numpy-based (anchors are compile-time constants baked into the jitted
step). Encodes the exact layouts of:

- SSD default boxes:      reference ``LightningFunc/utils/SSDUtils.py:5-27``
- RetinaNet anchor boxes: reference ``LightningFunc/utils/RetinaUtils.py:6-80``
- YOLO anchor tables:     reference ``model/YOLOV2.py:18-19``, ``model/YOLOV3.py:36-56``,
                          ``model/YOLOV4.py:137-138``, ``model/YOLOV5.py:106``
- YOLO grid offsets:      reference ``LightningFunc/losses.py:494-505`` (compute_grid_offsets)
"""

from __future__ import annotations

import itertools
import math

import numpy as np

# --- YOLO anchor tables (input-pixel units unless noted) -------------------------

# YOLOv2: output-grid-relative anchors (13x13 grid units). model/YOLOV2.py:18-19.
YOLOV2_ANCHORS = np.array(
    [[1.3221, 1.73145], [3.19275, 4.00944], [5.05587, 8.09892],
     [9.47112, 4.84053], [11.2364, 10.0071]], dtype=np.float32)

# YOLOv3: 3 scales x 3 anchors, input-pixel units. model/YOLOV3.py:36-45.
YOLOV3_ANCHORS = np.array(
    [[[116, 90], [156, 198], [373, 326]],   # stride 32
     [[30, 61], [62, 45], [59, 119]],       # stride 16
     [[10, 13], [16, 30], [33, 23]]],       # stride 8
    dtype=np.float32)
YOLOV3_STRIDES = (32, 16, 8)

# YOLOv4: flat 9-anchor table + per-scale masks. model/YOLOV4.py:137-138.
YOLOV4_ANCHORS = np.array(
    [[12, 16], [19, 36], [40, 28], [36, 75], [76, 55],
     [72, 146], [142, 110], [192, 243], [459, 401]], dtype=np.float32)
YOLOV4_ANCH_MASKS = ((0, 1, 2), (3, 4, 5), (6, 7, 8))
YOLOV4_STRIDES = (8, 16, 32)

# YOLOv5: 3 scales x 3 anchors, input-pixel units; strides 8/16/32. model/YOLOV5.py:106
# and LightningFunc/losses.py:73.
YOLOV5_ANCHORS = np.array(
    [[[10, 13], [16, 30], [33, 23]],        # stride 8
     [[30, 61], [62, 45], [59, 119]],       # stride 16
     [[116, 90], [156, 198], [373, 326]]],  # stride 32
    dtype=np.float32)
YOLOV5_STRIDES = (8, 16, 32)


def yolo_grid(grid_size: int):
    """Per-cell (x, y) integer offsets, shape [g, g, 2] with x varying fastest.

    Matches grid_x/grid_y in the reference (LightningFunc/losses.py:501-502).
    """
    g = grid_size
    xs = np.tile(np.arange(g, dtype=np.float32)[None, :], (g, 1))
    ys = np.tile(np.arange(g, dtype=np.float32)[:, None], (1, g))
    return np.stack([xs, ys], axis=-1)


def scale_anchors(anchors_px: np.ndarray, stride: float) -> np.ndarray:
    """Input-pixel anchors -> grid units (LightningFunc/losses.py:503)."""
    return np.asarray(anchors_px, dtype=np.float32) / float(stride)


# --- SSD default boxes -----------------------------------------------------------

def ssd_dboxes(smin: float = 0.07, smax: float = 0.9,
               ars=(1, 2, 0.5, 3, 1 / 3.0),
               fks=(38, 19, 10, 5, 3, 1),
               num_boxes=(3, 5, 5, 5, 3, 3)) -> np.ndarray:
    """SSD-300 default boxes, center-form normalized, clipped to max 1.0.

    Total 8732 boxes. Per cell: 1 geometric-mean box + num_boxes[k] aspect boxes.
    Reference: LightningFunc/utils/SSDUtils.py:5-27 (``get_dboxes``).
    """
    m = len(fks)
    sks = [round(smin + ((smax - smin) / (m - 1)) * (k - 1), 2) for k in range(1, m + 1)]
    boxes = []
    for k, feat_k in enumerate(fks):
        for i, j in itertools.product(range(feat_k), range(feat_k)):
            cx = (i + 0.5) / feat_k
            cy = (j + 0.5) / feat_k
            w = h = math.sqrt(sks[k] * sks[min(k + 1, m - 1)])
            boxes.append([cx, cy, w, h])
            sk = sks[k]
            for ar in ars[: num_boxes[k]]:
                boxes.append([cx, cy, sk * math.sqrt(ar), sk / math.sqrt(ar)])
    return np.minimum(np.asarray(boxes, dtype=np.float32), 1.0)


# --- RetinaNet anchors -----------------------------------------------------------

def retina_anchor_wh(anchor_areas=(32 * 32.0, 64 * 64.0, 128 * 128.0,
                                   256 * 256.0, 512 * 512.0),
                     aspect_ratios=(0.5, 1.0, 2.0),
                     scale_ratios=(1.0, 2 ** (1 / 3.0), 2 ** (2 / 3.0))) -> np.ndarray:
    """[num_fms, 9, 2] anchor widths/heights (RetinaUtils.py:62-80)."""
    wh = []
    for s in anchor_areas:
        for ar in aspect_ratios:
            h = math.sqrt(s / ar)
            w = ar * h
            for sr in scale_ratios:
                wh.append([w * sr, h * sr])
    return np.asarray(wh, dtype=np.float32).reshape(len(anchor_areas), -1, 2)


def retina_anchors(input_size: int) -> np.ndarray:
    """All anchors over p3..p7 as center-form (x, y, w, h) in input pixels.

    Per-level layout is row-major over (y, x, anchor) with cell centers at
    (i + 0.5) * grid_stride. Reference: LightningFunc/utils/RetinaUtils.py:6-31.
    """
    wh_table = retina_anchor_wh()
    num_fms = wh_table.shape[0]
    out = []
    for i in range(num_fms):
        fm = math.ceil(input_size / 2 ** (i + 3))
        grid = input_size / fm
        xs = np.tile(np.arange(fm, dtype=np.float32)[None, :], (fm, 1))
        ys = np.tile(np.arange(fm, dtype=np.float32)[:, None], (1, fm))
        xy = (np.stack([xs, ys], axis=-1) + 0.5) * grid            # [fm, fm, 2]
        xy = np.broadcast_to(xy[:, :, None, :], (fm, fm, 9, 2))
        wh = np.broadcast_to(wh_table[i][None, None], (fm, fm, 9, 2))
        out.append(np.concatenate([xy, wh], axis=-1).reshape(-1, 4))
    return np.concatenate(out, axis=0)
