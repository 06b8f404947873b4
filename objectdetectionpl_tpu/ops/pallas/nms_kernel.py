"""Pallas greedy-NMS kernel: the whole suppression scan in VMEM.

Replaces the reference's per-image Python ``while`` loop over detections
(model/YOLOV5.py:204-214 and twins) — the one part of the detection pipeline
that is inherently serial.  Strategy:

- candidates arrive pre-sorted (top-k by score) with fixed K,
- the greedy scan is a while_loop (one iteration per kept box) whose carried
  state is all 2-D float32 ([1, K] masks, [4, K] box rows) — Mosaic cannot
  legalize 1-D/boolean loop carries, so mask logic uses {0,1} floats; every
  iteration fetches the head candidate's coordinates by masked one-hot
  reductions and recomputes its IoU row as a length-K VPU vector (O(K),
  no K x K matrix is ever materialized),
- the weighted-merge variant accumulates conf-weighted box averages
  (reference merge semantics) in the same pass.

Grid: one program per image (grid=(B,)); working set is O(K) f32,
comfortably inside the ~16 MB VMEM.  K should be a multiple of 128 for lane
alignment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; interpret mode covers CPU test runs.
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

NEG_INF = -1e9


def _nms_body(boxes, scores, labels, obj, nms_thresh: float,
              class_aware: bool, merge: bool, plus1: float):
    """Kernel math on 2-D operands.

    boxes [K, 4], scores/labels/obj [1, K].
    Returns (out_boxes [K, 4], keep [1, K] float32 in {0, 1}).

    Per-iteration cost is O(K): the head candidate's (x1, y1, x2, y2, label,
    area) values are fetched by one-hot masked reductions (Mosaic rejects
    width-1 dynamic lane slices) and its suppression row recomputed as a
    length-K vector — no K x K IoU matrix is ever materialized.  (The
    previous formulation precomputed the K x K matrix and extracted rows by
    masked K x K reductions: O(K^2) *per kept box*, ~97 ms for B=384, K=300
    dense candidates; this version is O(K) per kept box.)
    """
    K = boxes.shape[0]
    bT = boxes.T                                    # [4, K]
    x1, y1 = bT[0:1], bT[1:2]                       # [1, K]
    x2, y2 = bT[2:3], bT[3:4]
    lab = labels.astype(jnp.float32)                # [1, K]
    area = (x2 - x1 + plus1) * (y2 - y1 + plus1)    # [1, K]

    ids_row = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)   # [1, K]
    valid = (scores > NEG_INF).astype(jnp.float32)             # [1, K]
    w_all = obj * valid

    # One while_loop iteration per *kept* box (mirrors ops.nms): `remaining`
    # tracks valid candidates not yet claimed or suppressed; the next head is
    # the smallest remaining index (candidates are score-sorted).
    def cond(state):
        return jnp.max(state[0]) > 0.5

    def body(state):
        remaining, alive, keep, out = state       # [1,K] x3, [4,K]
        head = jnp.min(jnp.where(remaining > 0.5, ids_row, K))
        sel = (ids_row == head).astype(jnp.float32)
        pick = lambda v: (v * sel).sum()           # head's scalar value
        ix1 = jnp.maximum(pick(x1), x1)
        iy1 = jnp.maximum(pick(y1), y1)
        ix2 = jnp.minimum(pick(x2), x2)
        iy2 = jnp.minimum(pick(y2), y2)
        inter = (jnp.maximum(ix2 - ix1 + plus1, 0.0)
                 * jnp.maximum(iy2 - iy1 + plus1, 0.0))        # [1, K]
        iou = inter / (pick(area) + area - inter + 1e-16)
        row = (iou > nms_thresh).astype(jnp.float32)
        if class_aware:
            row = row * (pick(lab) == lab).astype(jnp.float32)
        if merge:
            grp = jnp.maximum(row * alive, sel)   # group incl. self
            w = grp * w_all                       # [1, K]
            merged = (out * w).sum(axis=1, keepdims=True) / jnp.maximum(
                w.sum(), 1e-16)                   # [4, 1]
            out = out * (1.0 - sel) + merged * sel
        later = (ids_row > head).astype(jnp.float32)
        suppress = row * later * alive
        alive = alive * (1.0 - suppress)
        keep = jnp.maximum(keep, sel)
        remaining = remaining * (1.0 - suppress) * (1.0 - sel)
        return remaining, alive, keep, out

    alive0 = jnp.ones((1, K), jnp.float32)
    keep0 = jnp.zeros((1, K), jnp.float32)
    _, _, keep, outT = jax.lax.while_loop(
        cond, body, (valid, alive0, keep0, bT))
    return outT.T, keep


def _nms_kernel(boxes_ref, scores_ref, labels_ref, obj_ref,
                out_boxes_ref, keep_ref, *, nms_thresh, class_aware,
                merge, plus1):
    # per-image refs: boxes (1, K, 4); vectors (1, 1, K)
    out, keep = _nms_body(boxes_ref[0], scores_ref[0], labels_ref[0],
                          obj_ref[0], nms_thresh, class_aware, merge,
                          plus1)
    out_boxes_ref[0] = out
    keep_ref[0] = keep


@functools.partial(jax.jit, static_argnames=("nms_thresh", "class_aware",
                                             "merge", "plus1", "interpret"))
def pallas_greedy_nms(boxes, scores, labels, obj, nms_thresh: float = 0.4,
                      class_aware: bool = True, merge: bool = True,
                      plus1: float = 1.0, interpret: bool = False):
    """Batched greedy NMS: boxes [B, K, 4], scores/labels/obj [B, K].

    Returns (out_boxes [B, K, 4], keep [B, K] bool). Sorted-candidate
    semantics identical to ops.nms._greedy_nms_single.
    """
    B, K, _ = boxes.shape
    # NMS math runs in float32 regardless of model compute dtype.
    boxes = boxes.astype(jnp.float32)
    scores = scores.astype(jnp.float32)
    obj = obj.astype(jnp.float32)
    kern = functools.partial(_nms_kernel, nms_thresh=nms_thresh,
                             class_aware=class_aware, merge=merge,
                             plus1=plus1)
    vmem = (dict(memory_space=pltpu.VMEM)
            if (_HAS_PLTPU and not interpret) else {})
    # Vectors ride as [B, 1, K] so each per-program block's trailing two dims
    # equal the array dims (Mosaic tiling requirement).
    vec = lambda v: v.reshape(B, 1, K)
    vec_spec = pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0), **vmem)
    box_spec = pl.BlockSpec((1, K, 4), lambda b: (b, 0, 0), **vmem)
    out_boxes, keep = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[box_spec, vec_spec, vec_spec, vec_spec],
        out_specs=[box_spec, vec_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, K, 4), boxes.dtype),
            jax.ShapeDtypeStruct((B, 1, K), jnp.float32),
        ],
        interpret=interpret,
    )(boxes, vec(scores), vec(labels.astype(jnp.int32)), vec(obj))
    return out_boxes, keep.reshape(B, K) > 0.5
