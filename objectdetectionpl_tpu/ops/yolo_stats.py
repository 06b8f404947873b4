"""Per-grid-scale YOLO test statistics (get_yolo_statistics parity).

The reference's test branch for YOLOv2/3/4 computes per-scale cls_acc,
recall50/75, precision, conf_obj, conf_noobj from decoded maps + build_targets
(LightningFunc/accuracy.py:382-470, consumed in step.py:93-100,131-149).
This is the vectorized, jittable equivalent over padded targets.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from objectdetectionpl_tpu.ops import assignment


def yolo_scale_statistics(x, labels, boxes, mask, anchors_grid,
                          num_classes: int,
                          ignore_thres: float = 0.5) -> Dict[str, jax.Array]:
    """Statistics for one raw map [B, A*(5+C), g, g].

    Returns the reference's 6 metrics (accuracy.py:447-457).
    """
    A = anchors_grid.shape[0]
    B, _, g, _ = x.shape
    pred = x.reshape(B, A, 5 + num_classes, g, g)
    pred = jnp.transpose(pred, (0, 1, 3, 4, 2))
    xy = jax.nn.sigmoid(pred[..., 0:2])
    wh = pred[..., 2:4]
    conf = jax.nn.sigmoid(pred[..., 4])
    cls = jax.nn.sigmoid(pred[..., 5:])

    grid = jnp.stack(jnp.meshgrid(jnp.arange(g, dtype=x.dtype),
                                  jnp.arange(g, dtype=x.dtype),
                                  indexing="xy"), axis=-1)
    anc = anchors_grid.reshape(1, A, 1, 1, 2).astype(x.dtype)
    pred_boxes = jnp.concatenate([xy + grid[None, None],
                                  jnp.exp(wh) * anc], axis=-1)

    t = assignment.build_targets_yolo(pred_boxes, cls, labels, boxes, mask,
                                      anchors_grid, ignore_thres)
    obj = t.obj_mask.astype(jnp.float32)
    noobj = t.noobj_mask.astype(jnp.float32)
    eps = 1e-16

    conf50 = (conf > 0.5).astype(jnp.float32)
    iou50 = (t.iou_scores > 0.5).astype(jnp.float32)
    iou75 = (t.iou_scores > 0.75).astype(jnp.float32)
    detected = conf50 * t.class_mask * obj

    return {
        "cls_acc": 100.0 * jnp.sum(t.class_mask * obj) / jnp.maximum(
            jnp.sum(obj), 1.0),
        "recall50": jnp.sum(iou50 * detected) / (jnp.sum(obj) + eps),
        "recall75": jnp.sum(iou75 * detected) / (jnp.sum(obj) + eps),
        "precision": jnp.sum(iou50 * detected) / (jnp.sum(conf50) + eps),
        "conf_obj": jnp.sum(conf * obj) / jnp.maximum(jnp.sum(obj), 1.0),
        "conf_noobj": jnp.sum(conf * noobj) / jnp.maximum(jnp.sum(noobj), 1.0),
    }


def yolo_statistics(outputs, labels, boxes, mask,
                    anchors_grid_per_scale: Sequence[jnp.ndarray],
                    num_classes: int) -> Dict[int, Dict[str, jax.Array]]:
    """Multi-scale wrapper keyed by grid size (accuracy.py:382-470)."""
    if not isinstance(outputs, (list, tuple)):
        outputs = [outputs]
    out = {}
    for x, anc in zip(outputs, anchors_grid_per_scale):
        g = x.shape[2]
        out[g] = yolo_scale_statistics(x, labels, boxes, mask,
                                       jnp.asarray(anc), num_classes)
    return out
