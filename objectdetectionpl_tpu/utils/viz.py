"""Box drawing for TB image panels (mark_target/mark_pred parity,
LightningFunc/accuracy.py:156-205) using PIL instead of cv2."""

from __future__ import annotations

from typing import Sequence

import numpy as np

from objectdetectionpl_tpu.data.palette import COLORS


def draw_boxes(image01: np.ndarray, boxes_xyxy: np.ndarray,
               labels: np.ndarray, classes: Sequence[str],
               valid=None) -> np.ndarray:
    """image01: float [S,S,3] in [0,1]; boxes in pixel xyxy. Returns uint8."""
    from PIL import Image, ImageDraw
    img = Image.fromarray((np.clip(image01, 0, 1) * 255).astype(np.uint8))
    drw = ImageDraw.Draw(img)
    for i, box in enumerate(boxes_xyxy):
        if valid is not None and not valid[i]:
            continue
        cls = int(labels[i])
        color = tuple(COLORS[cls % len(COLORS)])
        x1, y1, x2, y2 = [float(v) for v in box]
        drw.rectangle([x1, y1, x2, y2], outline=color, width=2)
        name = classes[cls] if 0 <= cls < len(classes) else str(cls)
        drw.text((x1 + 2, y1 + 2), name, fill=color)
    return np.asarray(img)


def side_by_side(gt_img: np.ndarray, pred_img: np.ndarray) -> np.ndarray:
    """GT | prediction panel (test_step visualization, step.py:152-158)."""
    h = max(gt_img.shape[0], pred_img.shape[0])
    pad = lambda im: np.pad(im, ((0, h - im.shape[0]), (0, 0), (0, 0)))
    return np.concatenate([pad(gt_img), pad(pred_img)], axis=1)
