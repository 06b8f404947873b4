"""mAP pipeline parity against the reference's numpy implementations."""

import sys

import numpy as np
import pytest

from objectdetectionpl_tpu.ops import metrics


@pytest.fixture(scope="module")
def ref_accuracy(reference_path):
    sys.path.insert(0, reference_path)
    import importlib
    return importlib.import_module("LightningFunc.accuracy")


def test_compute_ap_parity(rng, ref_accuracy):
    for _ in range(5):
        n = rng.randint(3, 30)
        recall = np.sort(rng.rand(n))
        precision = rng.rand(n)
        ref = ref_accuracy.compute_ap(recall.copy(), precision.copy())
        got = metrics.compute_ap(recall, precision)
        np.testing.assert_allclose(got, ref, rtol=1e-9)


def test_ap_per_class_parity(rng, ref_accuracy):
    n = 200
    tp = (rng.rand(n) > 0.5).astype(np.float64)
    conf = rng.rand(n)
    pred_cls = rng.randint(0, 6, n).astype(np.float64)
    target_cls = rng.randint(0, 6, 80).astype(np.float64)
    rp, rr, rap, rf1, rcls = ref_accuracy.ap_per_class(
        tp.copy(), conf.copy(), pred_cls.copy(), target_cls.copy())
    gp, gr, gap, gf1, gcls = metrics.ap_per_class(tp, conf, pred_cls,
                                                  target_cls)
    np.testing.assert_allclose(gap, rap, rtol=1e-9)
    np.testing.assert_allclose(gp, rp, rtol=1e-9)
    np.testing.assert_allclose(gr, rr, rtol=1e-9)
    np.testing.assert_allclose(gf1, rf1, rtol=1e-9)
    np.testing.assert_array_equal(gcls, rcls)


def test_batch_statistics_parity(rng, ref_accuracy):
    import torch
    B, K, M = 3, 12, 5
    # fixed-shape inputs for ours
    pred_boxes = rng.uniform(0, 400, (B, K, 4)).astype(np.float32)
    pred_boxes[..., 2:] += pred_boxes[..., :2]
    pred_scores = np.sort(rng.rand(B, K).astype(np.float32))[:, ::-1].copy()
    pred_labels = rng.randint(0, 4, (B, K))
    pred_valid = rng.rand(B, K) > 0.3
    gt_boxes = rng.uniform(0, 400, (B, M, 4)).astype(np.float32)
    gt_boxes[..., 2:] += gt_boxes[..., :2]
    gt_labels = rng.randint(0, 4, (B, M))
    gt_valid = rng.rand(B, M) > 0.2

    # reference format: outputs list of [N,7] tensors; targets [N,6] rows
    # (b, cls, x1, y1, x2, y2) — get_batch_statistics reads targets[:, 1:]
    # as (label, box...) and uses raw columns 1: as corner boxes.
    outputs = []
    for b in range(B):
        v = pred_valid[b]
        if v.any():
            # reference layout: cols 0-3 box, col 4 score, col -1 label
            rows = np.concatenate([
                pred_boxes[b][v], pred_scores[b][v][:, None],
                np.zeros((v.sum(), 1)), pred_labels[b][v][:, None]], 1)
            outputs.append(torch.tensor(rows, dtype=torch.float32))
        else:
            outputs.append(None)
    t_rows = []
    for b in range(B):
        for m in range(M):
            if gt_valid[b, m]:
                t_rows.append([b, gt_labels[b, m], *gt_boxes[b, m]])
    t_rows = torch.tensor(np.asarray(t_rows, np.float32))

    # reference scores column index 4 = obj conf; ours uses pred_scores.
    ref = ref_accuracy.get_batch_statistics(outputs, t_rows, 0.5)
    ref_tp = np.concatenate([r[0] for r in ref])
    ref_cls = np.concatenate([r[2] for r in ref])

    tp, conf, cls = metrics.batch_statistics(
        pred_boxes, pred_scores, pred_labels, pred_valid,
        gt_boxes, gt_labels, gt_valid, 0.5)
    np.testing.assert_array_equal(tp, ref_tp)
    np.testing.assert_array_equal(cls, ref_cls)


def test_evaluate_map_perfect_predictions():
    """Predicting exactly the GT boxes gives mAP 1.0."""
    gt_boxes = np.asarray([[[10, 10, 50, 60], [100, 100, 150, 160]]],
                          np.float32)
    gt_labels = np.asarray([[1, 2]])
    gt_valid = np.ones((1, 2), bool)
    stats = metrics.batch_statistics(
        gt_boxes, np.asarray([[0.9, 0.8]]), gt_labels, gt_valid,
        gt_boxes, gt_labels, gt_valid)
    res = metrics.evaluate_map([stats], gt_labels[gt_valid])
    assert res["mAP"] == 1.0 and res["recall"] == 1.0
