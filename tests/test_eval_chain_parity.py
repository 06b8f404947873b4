"""Composed eval-chain golden parity: decode -> NMS -> statistics -> mAP
run against the reference's OWN functions as one system (VERDICT r3 item 1).

Forward parity under transplanted weights is proven elementwise in
``test_model_transplant.py``; these tests therefore feed ONE set of forward
activations (the reference model's, random weights, identical images) into
both eval chains, which composes to full-system parity without reintroducing
float-threshold flakes at the (already-proven) forward boundary.

Two levels per family:

- *Verbatim-system* tests run the reference chain exactly as wired
  (``model/SSD.py:249-310`` / ``model/YOLOV5.py:157-218`` ->
  ``LightningFunc/accuracy.py:116-154`` ``get_batch_statistics`` ->
  ``accuracy.py:207-287`` ``ap_per_class``) and mirror its measured quirks on
  our side through test glue + the ``drop_lone_survivor`` flag.  The quirks
  (each documented in DIVERGENCES.md):
    * YOLOv5 NMS re-views the [B,3,g,g,no] head maps as [B,3,no,g,g]
      (YOLOV5.py:178-184), scrambling channels, and consumes raw logits
      (conf_thres=-0.0151) with no decode.
    * SSD NMS indexes the UNFILTERED boxes/labels arrays with positions into
      the score-filtered array (SSD.py:264 ``bboxes = boxes[ids]`` vs
      SSD.py:303 ``boxes[keep]``), emitting chimera detections; its kept rows
      carry a zero in the confidence column (SSD.py:304).
    * The greedy loop drops the last unprocessed candidate
      (SSD.py:276-278).
    * ``test_step`` feeds xywh target rows to an IoU that reads xyxy
      (step.py:75 + accuracy.py:133-147) at pixel scale against normalized
      SSD predictions — so the composed reference system structurally
      produces mAP ~ 0.  The verbatim tests assert OUR mirrored chain
      reproduces the same statistics arrays bit-for-bit anyway.

- *Meaningful-mAP* tests plant well-conditioned candidates (clusters around
  ground truth + separated false positives, every anchor above threshold so
  the SSD index chimera is a no-op) and drive the reference's NMS ->
  statistics -> AP against our ops end to end, asserting identical
  (tp, conf, class) arrays and identical, NONZERO mAP — the composed
  correctness the ±0.5-mAP target actually hinges on.
"""

import importlib
import types

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import make_padded_targets

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture(scope="module")
def ref_eval(ref_models, reference_path):
    """The reference's eval-chain functions (accuracy.py), post model import
    so all CUDA/lightning stubs from ``ref_models`` are in place."""
    acc = importlib.import_module("LightningFunc.accuracy")
    ssd_utils = importlib.import_module("LightningFunc.utils.SSDUtils")
    return types.SimpleNamespace(
        get_batch_statistics=acc.get_batch_statistics,
        ap_per_class=acc.ap_per_class,
        get_dboxes=ssd_utils.get_dboxes)


# ref_models lives in test_model_transplant; reuse it as a local fixture
from tests.test_model_transplant import ref_models  # noqa: E402,F401


def _ref_v5_scramble(m: np.ndarray) -> np.ndarray:
    """Replicate YOLOV5.py:175-184: re-view the contiguous [B,3,g,g,no] map
    as [B,3,no,g,g], permute back to [B,3,g,g,no], flatten to [B,3*g*g,no]."""
    B, A, g, _, no = m.shape
    flat = m.reshape(B, A, g * g * no)
    return flat.reshape(B, A, no, g, g).transpose(0, 1, 3, 4, 2).reshape(
        B, A * g * g, no)


def _v5_unscramble_plant(p: np.ndarray) -> np.ndarray:
    """Inverse of ``_ref_v5_scramble`` at map level: returns the [B,3,g,g,no]
    tensor X such that the reference NMS's view/permute yields rows ``p``."""
    B, A, g, _, no = p.shape
    return p.transpose(0, 1, 4, 2, 3).reshape(B, A, g, g, no)


def _stats_arrays(ref_eval, dets, y_rows, iou_threshold=0.5):
    """Run the reference get_batch_statistics -> concatenated numpy arrays."""
    import torch
    sm = ref_eval.get_batch_statistics(
        dets, torch.tensor(y_rows), iou_threshold=iou_threshold)
    if not sm:
        return np.zeros(0), np.zeros(0), np.zeros(0)
    tp, conf, cls = [np.concatenate(x, 0) for x in list(zip(*sm))]
    return tp, conf, cls


def _our_stats(res, gt_boxes, gt_labels, gt_mask, conf_source="obj"):
    from objectdetectionpl_tpu.ops import metrics
    conf = res.obj if conf_source == "obj" else res.scores
    return metrics.batch_statistics(
        np.asarray(res.boxes), np.asarray(conf), np.asarray(res.labels),
        np.asarray(res.valid), gt_boxes, gt_labels, gt_mask)


def test_yolov5_verbatim_system_parity(ref_models, ref_eval):
    """Reference YOLOv5 forward -> raw-logit scrambled NMS -> statistics ->
    AP, versus our yolo_nms fed the identically-scrambled maps + our
    statistics/AP.  Detection counts, labels, confidences and the final mAP
    must agree (merged boxes are compared only loosely: the reference's
    signed merge denominators are numerically unstable by design)."""
    import torch
    from objectdetectionpl_tpu.ops import metrics, nms

    C, S, B = 3, 128, 2
    torch.manual_seed(1101)
    ref = ref_models.YOLOv5(classes=[str(i) for i in range(C)],
                            args=types.SimpleNamespace(
                                model_name="YOLOv5", cls_criterion="ce_loss",
                                coord_criterion="smooth_l1_loss",
                                data_module="TEST", type="Yolov5s"))
    ref.eval()
    x = np.random.RandomState(11).rand(B, 3, S, S).astype(np.float32)
    with torch.no_grad():
        maps = ref(torch.tensor(x))        # list of [B,3,g,g,5+C], raw

    # --- reference chain, verbatim -------------------------------------
    dets = ref.non_max_suppression([m.clone() for m in maps])
    labels_np, boxes_np, mask_np = make_padded_targets(
        np.random.RandomState(12), B, 6, C)
    rows = []
    for b in range(B):
        for m in range(6):
            if mask_np[b, m]:
                rows.append([b, labels_np[b, m], *boxes_np[b, m]])
    y_rows = np.asarray(rows, np.float32)
    y_scaled = y_rows.copy()
    y_scaled[:, 2:] *= S                  # step.py:75 (applied once)
    dets = [d for d in dets if d is not None]
    ref_tp, ref_conf, ref_cls = _stats_arrays(ref_eval, dets, y_scaled)
    _, _, ref_ap, _, _ = ref_eval.ap_per_class(
        ref_tp, ref_conf, ref_cls, y_scaled[:, 1].tolist())

    # --- our chain on the same maps, quirks mirrored -------------------
    scrambled = np.concatenate(
        [_ref_v5_scramble(m.numpy()) for m in maps], axis=1)
    res = nms.yolo_nms(jnp.asarray(scrambled), conf_thres=-0.0151,
                       nms_thres=0.4, top_k=scrambled.shape[1])
    # mirrored targets: the reference reads the xywh rows as xyxy
    gt_asxyxy = np.zeros((B, 6, 4), np.float32)
    gt_asxyxy[mask_np] = (boxes_np * S)[mask_np]
    our_tp, our_conf, our_cls = _our_stats(res, gt_asxyxy, labels_np, mask_np)
    our = metrics.evaluate_map([(our_tp, our_conf, our_cls)],
                               y_scaled[:, 1])

    # counts / confidences / labels per image
    valid = np.asarray(res.valid)
    assert [int(v.sum()) for v in valid] == [len(d) for d in dets]
    assert ref_conf.shape == our_conf.shape
    np.testing.assert_allclose(our_conf, ref_conf, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(our_cls.astype(int), ref_cls.astype(int))
    np.testing.assert_array_equal(our_tp, ref_tp)
    assert our["mAP"] == pytest.approx(float(ref_ap.mean()), abs=1e-9)


def test_ssd_verbatim_system_parity(ref_models, ref_eval):
    """Reference SSD forward -> its NMS (index chimera, lone-survivor drop,
    zero conf column) -> statistics -> AP, versus our anchor_nms +
    test-glue mirroring of the chimera + our statistics/AP."""
    import torch
    from objectdetectionpl_tpu.ops import boxes as box_ops
    from objectdetectionpl_tpu.ops import metrics, nms

    C_ref, S, B = 4, 300, 2
    torch.manual_seed(2101)
    ref = ref_models.SSD(classes=[str(i) for i in range(C_ref)],
                         args=types.SimpleNamespace(
                             model_name="SSD", cls_criterion="ce_loss",
                             coord_criterion="smooth_l1_loss",
                             data_module="TEST", type="Yolov5s"))
    ref.eval()
    x = np.random.RandomState(21).rand(B, 3, S, S).astype(np.float32)
    with torch.no_grad():
        loc_t, cls_t = ref(torch.tensor(x))

    dets = ref.non_max_suppression((loc_t, cls_t))
    labels_np, boxes_np, mask_np = make_padded_targets(
        np.random.RandomState(22), B, 6, C_ref - 1)
    labels_np = labels_np + 1            # classes 1..C-1, 0 stays background
    rows = []
    for b in range(B):
        for m in range(6):
            if mask_np[b, m]:
                rows.append([b, labels_np[b, m], *boxes_np[b, m]])
    y_scaled = np.asarray(rows, np.float32)
    y_scaled[:, 2:] *= S
    dets = [d for d in dets if d is not None and len(d)]
    ref_tp, ref_conf, ref_cls = _stats_arrays(ref_eval, dets, y_scaled)
    _, _, ref_ap, _, _ = ref_eval.ap_per_class(
        ref_tp, ref_conf, ref_cls, y_scaled[:, 1].tolist())

    # --- our chain: anchor_nms with the lone-survivor quirk, then the
    # boxes[keep]/labels[keep] index chimera mirrored in glue --------------
    loc, cls = loc_t.numpy(), cls_t.numpy()
    dboxes = np.asarray(ref_eval.get_dboxes().numpy(), np.float32)
    res = nms.anchor_nms(jnp.asarray(loc), jnp.asarray(cls),
                         jnp.asarray(dboxes), top_k=100, nms_thresh=0.5,
                         class_thresh=0.45, scale=1.0,
                         drop_lone_survivor=True)
    probs = 1.0 / (1.0 + np.exp(-cls))
    score_all = probs.max(-1)
    label_all = probs.argmax(-1)
    xywh = np.asarray(box_ops.ssd_decode(jnp.asarray(loc),
                                         jnp.asarray(dboxes), False))
    boxes_all = np.asarray(box_ops.xywh_to_xyxy(jnp.asarray(xywh)))

    chim_boxes = np.zeros((B, 100, 4), np.float32)
    chim_labels = np.zeros((B, 100), np.int32)
    chim_scores = np.zeros((B, 100), np.float32)
    chim_valid = np.zeros((B, 100), bool)
    for b in range(B):
        ids_f = np.nonzero(score_all[b] > 0.45)[0]
        kept = np.asarray(res.valid[b])
        slot = 0
        for s_i, sc in zip(np.nonzero(kept)[0],
                           np.asarray(res.scores[b])[kept]):
            # nearest-score match: jax and numpy sigmoid differ by ulps
            a = int(np.argmin(np.abs(score_all[b] - sc)))   # kept anchor
            assert abs(score_all[b][a] - sc) < 1e-6
            p = int(np.searchsorted(ids_f, a))              # filtered pos
            assert ids_f[p] == a
            # SSD.py:303-307: boxes/labels indexed by filtered position,
            # scores consistently; conf column is a literal zero
            chim_boxes[b, slot] = boxes_all[b, p]
            chim_labels[b, slot] = label_all[b, p]
            chim_scores[b, slot] = 0.0
            chim_valid[b, slot] = True
            slot += 1

    # reference detections: compare the chimera rows elementwise
    for b, d in enumerate(dets):
        d = d.numpy()
        n = int(chim_valid[b].sum())
        assert n == len(d)
        np.testing.assert_allclose(chim_boxes[b, :n], d[:, :4],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(chim_labels[b, :n],
                                      d[:, 6].astype(int))

    gt_asxyxy = np.zeros((B, 6, 4), np.float32)
    gt_asxyxy[mask_np] = (boxes_np * S)[mask_np]
    our_tp, our_conf, our_cls = metrics.batch_statistics(
        chim_boxes, chim_scores, chim_labels, chim_valid,
        gt_asxyxy, labels_np, mask_np)
    our = metrics.evaluate_map([(our_tp, our_conf, our_cls)], y_scaled[:, 1])

    assert our_conf.shape == ref_conf.shape
    np.testing.assert_array_equal(our_cls.astype(int), ref_cls.astype(int))
    np.testing.assert_array_equal(our_tp, ref_tp)
    assert our["mAP"] == pytest.approx(float(ref_ap.mean()), abs=1e-9)


def _plant_yolo_candidates(rng, B, N, C, S, labels, boxes, mask):
    """Well-conditioned decoded candidates [B, N, 5+C]: 2 clustered hits per
    GT box (pixel xywh, IoU >> nms_thres within the cluster) + 2-candidate
    far false-positive clusters; padding fails the conf threshold."""
    p = np.zeros((B, N, 5 + C), np.float32)
    p[:, :, 4] = -0.5                       # padding: below any threshold
    for b in range(B):
        slot = 0
        for m in range(boxes.shape[1]):
            if not mask[b, m]:
                continue
            cx, cy, w, h = boxes[b, m] * S
            c = labels[b, m]
            for j, (d, conf) in enumerate([(0.0, 0.9 - 0.02 * m),
                                           (1.5, 0.55 - 0.02 * m)]):
                p[b, slot, :4] = [cx + d, cy + d, w, h]
                p[b, slot, 4] = conf
                p[b, slot, 5 + c] = 0.95
                p[b, slot, 5:][np.arange(C) != c] = 0.1
                slot += 1
        # far false positives: their own 2-candidate cluster per image
        for k in range(2):
            fx = 0.9 * S - 12 * k
            p[b, slot:slot + 2, :4] = [fx, 0.9 * S, 10, 10]
            p[b, slot, 4] = 0.45
            p[b, slot + 1, 4] = 0.35
            p[b, slot:slot + 2, 5 + (k % C)] = 0.8
            slot += 2
    return p


def test_yolo_composed_chain_meaningful_map(ref_models, ref_eval):
    """Planted pixel-space candidates through the reference's full NMS ->
    statistics -> AP versus ours: identical (tp, conf, class) arrays and an
    identical, meaningful (>0.3) mAP."""
    import torch
    from objectdetectionpl_tpu.ops import metrics, nms

    C, S, B = 3, 128, 3
    g = S // 8
    A_slots = 3 * g * g                     # single-scale plant
    rng = np.random.RandomState(33)
    labels, boxes, mask = make_padded_targets(rng, B, 5, C)
    plant = _plant_yolo_candidates(rng, B, A_slots, C, S, labels, boxes, mask)

    # reference side: inverse-scramble so its view bug yields `plant`
    maps = _v5_unscramble_plant(plant.reshape(B, 3, g, g, 5 + C))
    dets = ref_models.YOLOv5.non_max_suppression(
        None, [torch.tensor(maps)])
    gt_xyxy = np.zeros((B, 5, 4), np.float32)
    px = boxes * S
    gt_xyxy[..., 0] = px[..., 0] - px[..., 2] / 2
    gt_xyxy[..., 1] = px[..., 1] - px[..., 3] / 2
    gt_xyxy[..., 2] = px[..., 0] + px[..., 2] / 2
    gt_xyxy[..., 3] = px[..., 1] + px[..., 3] / 2
    rows = []
    for b in range(B):
        for m in range(5):
            if mask[b, m]:
                rows.append([b, labels[b, m], *gt_xyxy[b, m]])
    y_rows = np.asarray(rows, np.float32)
    dets = [d for d in dets if d is not None]
    ref_tp, ref_conf, ref_cls = _stats_arrays(ref_eval, dets, y_rows)
    ref_p, ref_r, ref_ap, ref_f1, _ = ref_eval.ap_per_class(
        ref_tp, ref_conf, ref_cls, y_rows[:, 1].tolist())

    # our side: same candidates through yolo_nms -> statistics -> mAP
    res = nms.yolo_nms(jnp.asarray(plant), conf_thres=-0.0151, nms_thres=0.4,
                       top_k=A_slots)
    our_tp, our_conf, our_cls = _our_stats(res, gt_xyxy, labels, mask)
    our = metrics.evaluate_map([(our_tp, our_conf, our_cls)], y_rows[:, 1])

    np.testing.assert_allclose(our_conf, ref_conf, rtol=1e-6)
    np.testing.assert_array_equal(our_cls.astype(int), ref_cls.astype(int))
    np.testing.assert_array_equal(our_tp, ref_tp)
    assert float(ref_ap.mean()) > 0.3       # the comparison is meaningful
    assert our["mAP"] == pytest.approx(float(ref_ap.mean()), abs=1e-9)
    assert our["precision"] == pytest.approx(float(ref_p.mean()), abs=1e-9)
    assert our["recall"] == pytest.approx(float(ref_r.mean()), abs=1e-9)


def test_ssd_composed_chain_meaningful_map(ref_models, ref_eval):
    """Planted SSD head outputs (inverse-encoded vs the reference's own
    dboxes so decode is exercised) through the reference NMS -> statistics ->
    AP versus our anchor_nms chain: identical arrays, identical nonzero mAP.
    Every anchor passes the class threshold so the reference's filtered-
    position index chimera is a no-op and its NMS is coherent."""
    import torch
    from objectdetectionpl_tpu.ops import metrics, nms

    C_ref, S, B = 4, 300, 2
    dboxes = np.asarray(ref_eval.get_dboxes().numpy(), np.float32)
    D = dboxes.shape[0]
    rng = np.random.RandomState(44)
    labels, boxes, mask = make_padded_targets(rng, B, 4, C_ref - 1)
    labels = labels + 1                    # classes 1..3; 0 = background

    loc = np.zeros((B, D, 4), np.float32)
    cls = np.zeros((B, D, C_ref), np.float32)
    cls[:, :, 0] = -0.15 + 0.1 * rng.rand(B, D)   # all anchors pass 0.45
    cls[:, :, 1:] = -2.0
    for b in range(B):
        # two planted candidates per GT on nearby dboxes
        for m in range(4):
            if not mask[b, m]:
                continue
            gt = boxes[b, m]
            d_idx = np.argsort(np.abs(dboxes[:, 0] - gt[0])
                               + np.abs(dboxes[:, 1] - gt[1]))[:2]
            for j, d in enumerate(d_idx):
                loc[b, d, :2] = (gt[:2] - dboxes[d, :2]) / dboxes[d, 2:]
                loc[b, d, 2:] = np.log(np.maximum(gt[2:], 1e-3)
                                       / dboxes[d, 2:])
                cls[b, d, :] = -4.0
                cls[b, d, labels[b, m]] = 2.5 - 0.5 * j - 0.05 * m

    loc_t, cls_t = torch.tensor(loc), torch.tensor(cls)
    stub = types.SimpleNamespace(iou_boxes=torch.tensor(dboxes))
    dets = ref_models.SSD.non_max_suppression(stub, (loc_t, cls_t))
    dets = [d for d in dets if d is not None and len(d)]

    gt_xyxy = np.zeros((B, 4, 4), np.float32)
    px = boxes * S
    gt_xyxy[..., 0] = px[..., 0] - px[..., 2] / 2
    gt_xyxy[..., 1] = px[..., 1] - px[..., 3] / 2
    gt_xyxy[..., 2] = px[..., 0] + px[..., 2] / 2
    gt_xyxy[..., 3] = px[..., 1] + px[..., 3] / 2
    rows = []
    for b in range(B):
        for m in range(4):
            if mask[b, m]:
                rows.append([b, labels[b, m], *gt_xyxy[b, m]])
    y_rows = np.asarray(rows, np.float32)

    # sane-user glue, applied identically on both sides: pixel-scale the NMS
    # outputs before matching (the reference's own test_step instead feeds
    # normalized predictions against pixel targets -> structural mAP 0,
    # asserted by the verbatim test above / DIVERGENCES.md)
    ref_rows = []
    for d in dets:
        d = d.numpy().copy()
        d[:, :4] *= S
        ref_rows.append(torch.tensor(d))
    # reference conf column is zero (SSD.py:304); rank by class score
    # instead on BOTH sides so the AP sort is meaningful
    sm = ref_eval.get_batch_statistics(ref_rows, torch.tensor(y_rows),
                                       iou_threshold=0.5)
    ref_tp, _, ref_cls = [np.concatenate(x, 0) for x in list(zip(*sm))]
    ref_conf = np.concatenate([d.numpy()[:, 5] for d in dets])
    ref_p, ref_r, ref_ap, _, _ = ref_eval.ap_per_class(
        ref_tp, ref_conf, ref_cls, y_rows[:, 1].tolist())

    res = nms.anchor_nms(jnp.asarray(loc), jnp.asarray(cls),
                         jnp.asarray(dboxes), top_k=100, nms_thresh=0.5,
                         class_thresh=0.45, scale=1.0,
                         drop_lone_survivor=True)
    our_boxes = np.asarray(res.boxes) * S
    our_tp, our_conf, our_cls = metrics.batch_statistics(
        our_boxes, np.asarray(res.scores), np.asarray(res.labels),
        np.asarray(res.valid), gt_xyxy, labels, mask)
    our = metrics.evaluate_map([(our_tp, our_conf, our_cls)], y_rows[:, 1])

    np.testing.assert_allclose(our_conf, ref_conf, rtol=1e-6)
    np.testing.assert_array_equal(our_cls.astype(int), ref_cls.astype(int))
    np.testing.assert_array_equal(our_tp, ref_tp)
    assert float(ref_ap.mean()) > 0.3
    assert our["mAP"] == pytest.approx(float(ref_ap.mean()), abs=1e-9)
    assert our["precision"] == pytest.approx(float(ref_p.mean()), abs=1e-9)
    assert our["recall"] == pytest.approx(float(ref_r.mean()), abs=1e-9)
