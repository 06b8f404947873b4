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

The default implementation is ``blocked_greedy_nms``: the greedy scan as
dense tiled matrix ops (MXU matvecs across tiles + unrolled vector sweeps
within tiles), with zero data-dependent loop iterations — see its docstring.
A Pallas while-loop kernel and a vmapped-while-loop XLA path are kept as
alternates (``use_pallas=True`` / ``False``); all three are parity-tested
against each other.
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


def blocked_greedy_nms(boxes, scores, labels, obj, nms_thresh: float = 0.4,
                       class_aware: bool = True, merge: bool = True,
                       plus1: float = 1.0, tile: int = 64,
                       drop_lone_survivor: bool = False):
    """Batched greedy NMS as dense matrix ops — no serial per-box loop.

    Same sorted-candidate semantics as ``_greedy_nms_single`` (and the Pallas
    kernel), reformulated for the TPU's compilation model: a serial
    while-loop pays ~1 us of scalar-core latency *per kept box per image*
    (~100 ms at B=384, K=300 dense), so the scan is replaced by

    1. one [K, K] thresholded-IoU/label/triangle mask per image (VPU),
    2. a ``lax.scan`` over K/T tiles of T score-sorted candidates: boxes
       already kept in earlier tiles suppress the tile via one batched
       matvec (MXU), then the within-tile dependency chain is resolved by a
       T-step *unrolled* triangular sweep of [B, T] vector ops,
    3. for the weighted-merge variant, each suppressed box is attributed to
       its first kept suppressor (greedy semantics: that is exactly the head
       that removed it), and all conf-weighted merges happen in one one-hot
       [K, K] x [K, 4] matmul.

    Total work is O(K^2) vector/matrix ops — a few ms where the loop
    formulation took ~100 ms.  Keep set and merged boxes are bit-identical
    to the loop modulo float summation order.
    """
    B, K, _ = boxes.shape
    f32 = jnp.float32
    boxes32 = boxes.astype(f32)
    scores = scores.astype(f32)
    obj = obj.astype(f32)
    T = min(tile, K)
    n_tiles = -(-K // T)
    Kp = n_tiles * T
    if Kp != K:
        pad = Kp - K
        boxes32 = jnp.pad(boxes32, ((0, 0), (0, pad), (0, 0)))
        scores = jnp.pad(scores, ((0, 0), (0, pad)),
                         constant_values=NEG_INF)
        labels = jnp.pad(labels, ((0, 0), (0, pad)))
        obj = jnp.pad(obj, ((0, 0), (0, pad)))
    valid = scores > NEG_INF                                   # [B, Kp]

    x1, y1 = boxes32[..., 0], boxes32[..., 1]
    x2, y2 = boxes32[..., 2], boxes32[..., 3]
    area = (x2 - x1 + plus1) * (y2 - y1 + plus1)
    inter_w = (jnp.minimum(x2[:, :, None], x2[:, None, :])
               - jnp.maximum(x1[:, :, None], x1[:, None, :]) + plus1)
    inter_h = (jnp.minimum(y2[:, :, None], y2[:, None, :])
               - jnp.maximum(y1[:, :, None], y1[:, None, :]) + plus1)
    inter = jnp.maximum(inter_w, 0.0) * jnp.maximum(inter_h, 0.0)
    iou = inter / (area[:, :, None] + area[:, None, :] - inter + 1e-16)
    over = iou > nms_thresh                                    # [B, Kp, Kp]
    if class_aware:
        over &= labels[:, :, None] == labels[:, None, :]
    ids = jnp.arange(Kp)
    over &= ids[:, None] < ids[None, :]        # i suppresses only later j
    over &= valid[:, :, None] & valid[:, None, :]
    over_f = over.astype(f32)
    valid_f = valid.astype(f32)

    def tile_step(kept, c):
        # [B, Kp, T]: candidate columns of tile c against all rows.
        oc = jax.lax.dynamic_slice_in_dim(over_f, c * T, T, axis=2)
        sup = jnp.minimum(jnp.einsum("bk,bkt->bt", kept, oc), 1.0)
        occ = jax.lax.dynamic_slice_in_dim(oc, c * T, T, axis=1)   # [B,T,T]
        vc = jax.lax.dynamic_slice_in_dim(valid_f, c * T, T, axis=1)
        cols = []
        for t in range(T):      # unrolled: straight-line vector code
            kt = vc[:, t] * (1.0 - sup[:, t])
            cols.append(kt)
            sup = jnp.maximum(sup, kt[:, None] * occ[:, t, :])
        kept = jax.lax.dynamic_update_slice_in_dim(
            kept, jnp.stack(cols, axis=1), c * T, axis=1)
        return kept, None

    kept_f, _ = jax.lax.scan(tile_step, jnp.zeros((B, Kp), f32),
                             jnp.arange(n_tiles))
    keep = kept_f > 0.5

    if drop_lone_survivor:
        # Reference quirk (model/SSD.py:276-278): the greedy loop breaks when
        # exactly one unprocessed candidate remains, silently dropping it.
        # That candidate is our last kept index k when every valid j > k was
        # already suppressed by an earlier head (< k): emulate by un-keeping
        # k unless some valid j > k has its first kept suppressor >= k.
        cand = jnp.where(keep[:, :, None] & over, ids[:, None], Kp)
        assign = jnp.min(cand, axis=1)                         # [B, Kp]
        last_kept = (Kp - 1) - jnp.argmax(keep[:, ::-1], axis=1)
        j_after = ids[None, :] > last_kept[:, None]
        exists_late = jnp.any(
            j_after & valid & (assign >= last_kept[:, None]), axis=1)
        drop = keep.any(axis=1) & ~exists_late
        keep = keep & ~(drop[:, None] & (ids[None, :] == last_kept[:, None]))

    if merge:
        # Greedy attribution: each suppressed box belongs to its *first* kept
        # suppressor (the head whose turn removed it from `alive`).
        cand = jnp.where(keep[:, :, None] & over, ids[:, None], Kp)
        assign = jnp.min(cand, axis=1)                         # [B, Kp]
        grp = (assign[:, None, :] == ids[:, None]).astype(f32)  # G[i, j]
        w = obj * valid_f
        gw = grp * w[:, None, :]
        # HIGHEST: default MXU matmul precision rounds the ~1e3-magnitude
        # pixel coords to bf16 (~0.3% error on merged boxes).
        num = (jnp.einsum("bij,bjd->bid", gw, boxes32,
                          precision=jax.lax.Precision.HIGHEST)
               + w[:, :, None] * boxes32)                      # + self term
        den = gw.sum(axis=2) + w
        merged = num / jnp.maximum(den, 1e-16)[..., None]
        out = jnp.where(keep[:, :, None], merged, boxes32)
    else:
        out = boxes32
    if Kp != K:
        out, keep = out[:, :K], keep[:, :K]
    return out, keep


def _nms_impl(flag):
    """Resolve the ``use_pallas`` knob: None -> blocked matrix NMS (default
    everywhere), True -> Pallas kernel (TPU), False -> vmapped while-loop."""
    if flag is None:
        return "blocked"
    return "pallas" if flag else "loop"


def _select_top_k(score, k: int, exact):
    """(values, indices) of the k best scores.

    ``exact=None`` picks the TPU-optimized two-phase ``approx_max_k`` on TPU
    (exact elsewhere): thresholded detection rarely has >k live candidates,
    and when it does the tail beyond the ~0.95-recall cut is score-noise, so
    the approximation does not change NMS results in practice (parity tests
    run exact on CPU).  ``lax.top_k`` on [B, 25k] was ~25% of the whole
    YOLOv5s inference batch; ``approx_max_k`` cuts the selection cost ~25%.
    """
    if exact is None:
        exact = jax.default_backend() != "tpu"
    if exact:
        return jax.lax.top_k(score, k)
    return jax.lax.approx_max_k(score, k)


def anchor_nms(loc_preds, cls_preds, anchors_xywh, top_k: int = 100,
               nms_thresh: float = 0.5, class_thresh: float = 0.45,
               decode=box_ops.ssd_decode, use_variance: bool = False,
               scale: float = 1.0, use_pallas=None,
               exact_topk=None, drop_lone_survivor: bool = False) -> NMSResult:
    """SSD/RetinaNet batched NMS.

    loc_preds [B, D, 4] offsets; cls_preds [B, D, C] logits; anchors_xywh [D, 4].
    ``use_variance=False`` matches the reference's inference decode, which skips
    the variance scaling its own training encode applies (model/SSD.py:255-257).
    ``scale`` multiplies output boxes (e.g. img_size to emit pixels).
    ``drop_lone_survivor=True`` reproduces the reference's exact greedy loop,
    which breaks when one unprocessed candidate remains and drops it
    (model/SSD.py:276-278); the default keeps it (DIVERGENCES.md).
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

        top_scores, idx = _select_top_k(score, top_k, exact_topk)
        return boxes[idx], top_scores, label[idx]

    top_boxes, top_scores, top_labels = jax.vmap(per_image)(
        loc_preds, cls_preds)
    impl = _nms_impl(use_pallas)
    if impl == "blocked":
        kept_boxes, keep = blocked_greedy_nms(
            top_boxes, top_scores, top_labels,
            jnp.zeros_like(top_scores), nms_thresh=nms_thresh,
            class_aware=False, merge=False, plus1=1.0,
            drop_lone_survivor=drop_lone_survivor)
    elif impl == "pallas":
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


def decode_select_yolov5(outputs, anchors_px, strides, num_classes: int,
                         top_k: int = 300, conf_thres: float = 0.5,
                         exact_topk=None):
    """Fused score -> top-k -> gather -> decode: the serving-tail form of
    :func:`decode_yolov5_predictions`.

    The dense decode sigmoids and materializes all ~25k rows per image and
    NMS re-reads them to rank and select ~300 — three full HBM passes plus
    96M sigmoids per 256-batch.  This computes the ranking score directly on
    the raw head maps (monotonicity: ``max(sigmoid(z)) == sigmoid(max(z))``,
    so obj/cls scores need two sigmoids per row, not 15), selects ``top_k``
    globally, gathers only those raw rows, and decodes them exactly
    (grid/anchor recovered from the flat index).  Bit-parity with the dense
    chain: selection uses the same score and threshold as
    :func:`yolo_nms`'s ranking, under-full batches gather rows that fail the
    obj threshold downstream, and the decode math is identical
    (tests/test_nms.py::test_decode_select_matches_dense_chain).

    Returns decoded candidates [B, top_k, 5+C] — feed to :func:`yolo_nms`.
    """
    B = outputs[0].shape[0]
    scores = []
    for x in outputs:
        obj = jax.nn.sigmoid(x[..., 4])
        cls = jax.nn.sigmoid(jnp.max(x[..., 5:], axis=-1))
        s = jnp.where(obj >= conf_thres, obj * cls, NEG_INF)
        scores.append(s.reshape(B, -1))
    score = jnp.concatenate(scores, axis=1)
    _, idx = _select_top_k(score, top_k, exact_topk)        # [B, K] flat

    out = jnp.zeros((B, top_k, 5 + num_classes), outputs[0].dtype)
    offset = 0
    for x, anc_px, stride in zip(outputs, anchors_px, strides):
        _, A, g, _, ch = x.shape
        n = A * g * g
        local = idx - offset
        in_scale = (local >= 0) & (local < n)
        li = jnp.clip(local, 0, n - 1)
        rows = jnp.take_along_axis(x.reshape(B, n, ch), li[..., None], axis=1)
        a = li // (g * g)
        rem = li % (g * g)
        gxy = jnp.stack([rem % g, rem // g], axis=-1).astype(rows.dtype)
        anc = jnp.asarray(anc_px, rows.dtype)[a]            # [B, K, 2]
        sig = jax.nn.sigmoid(rows)
        xy = (sig[..., :2] * 2.0 - 0.5 + gxy) * stride
        wh = (sig[..., 2:4] * 2.0) ** 2 * anc
        dec = jnp.concatenate([xy, wh, sig[..., 4:]], axis=-1)
        out = jnp.where(in_scale[..., None], dec, out)
        offset += n
    return out


def yolo_nms(predictions, conf_thres: float = 0.5, nms_thres: float = 0.4,
             top_k: int = 300, use_pallas=None, exact_topk=None) -> NMSResult:
    """Batched YOLO weighted-merge NMS over decoded predictions [B, N, 5+C].

    Candidates are ranked by obj_conf * max_cls_conf, suppressed boxes with
    IoU > nms_thres and matching label are conf-weighted-merged into the kept
    box. Reference: model/YOLOV5.py:157-218 (same in v2/v3/v4 files).
    The suppression scan runs as blocked matrix NMS (``blocked_greedy_nms``).
    """
    top_k = min(top_k, int(predictions.shape[1]))

    def per_image(pred):
        boxes = box_ops.xywh_to_xyxy(pred[:, :4])
        obj = pred[:, 4]
        cls_conf = jnp.max(pred[:, 5:], axis=-1)
        label = jnp.argmax(pred[:, 5:], axis=-1).astype(jnp.int32)
        score = obj * cls_conf
        score = jnp.where(obj >= conf_thres, score, NEG_INF)
        top_scores, idx = _select_top_k(score, top_k, exact_topk)
        return boxes[idx], top_scores, label[idx], obj[idx], cls_conf[idx]

    tb, ts, tl, to, tc = jax.vmap(per_image)(predictions)
    obj_w = jnp.where(ts > NEG_INF, to, 0.0)
    impl = _nms_impl(use_pallas)
    if impl == "blocked":
        kept_boxes, keep = blocked_greedy_nms(
            tb, ts, tl, obj_w, nms_thresh=nms_thres, class_aware=True,
            merge=True, plus1=1.0)
    elif impl == "pallas":
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
