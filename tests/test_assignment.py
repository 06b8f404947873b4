"""Golden-parity tests: vectorized assignment vs the reference build_targets."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from objectdetectionpl_tpu.ops import assignment
from tests.conftest import make_padded_targets, to_reference_rows


@pytest.fixture(scope="module")
def ref_accuracy(reference_path):
    sys.path.insert(0, reference_path)
    import importlib
    return importlib.import_module("LightningFunc.accuracy")


def _setup(rng, B=3, M=7, A=5, g=13, C=20):
    labels, boxes, mask = make_padded_targets(rng, B, M, C)
    pred_boxes = rng.uniform(0, g, size=(B, A, g, g, 4)).astype(np.float32)
    pred_cls = rng.uniform(0, 1, size=(B, A, g, g, C)).astype(np.float32)
    anchors = rng.uniform(0.5, 8, size=(A, 2)).astype(np.float32)
    return labels, boxes, mask, pred_boxes, pred_cls, anchors


def test_build_targets_yolo_parity(rng, ref_accuracy):
    import torch
    labels, boxes, mask, pred_boxes, pred_cls, anchors = _setup(rng)
    rows = to_reference_rows(labels, boxes, mask)

    ref = ref_accuracy.build_targets(
        torch.tensor(pred_boxes), torch.tensor(pred_cls), torch.tensor(rows),
        torch.tensor(anchors), ignore_thres=0.5)
    (r_iou, r_clsmask, r_obj, r_noobj, r_tx, r_ty, r_tw, r_th, r_tcls,
     r_tconf) = [t.numpy() for t in ref]

    got = assignment.build_targets_yolo(
        jnp.asarray(pred_boxes), jnp.asarray(pred_cls), jnp.asarray(labels),
        jnp.asarray(boxes), jnp.asarray(mask), jnp.asarray(anchors), 0.5)

    np.testing.assert_array_equal(np.asarray(got.obj_mask > 0), r_obj > 0)
    np.testing.assert_array_equal(np.asarray(got.noobj_mask), r_noobj > 0)
    np.testing.assert_allclose(np.asarray(got.tx), r_tx, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.ty), r_ty, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.tw), r_tw, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.th), r_th, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.tcls), r_tcls, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.class_mask), r_clsmask, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.iou_scores), r_iou,
                               rtol=1e-4, atol=1e-5)


def test_build_targets_v5_parity(rng, ref_accuracy):
    import torch
    B, M, C = 2, 6, 20
    g = 16
    labels, boxes, mask = make_padded_targets(rng, B, M, C)
    rows = to_reference_rows(labels, boxes, mask)
    anchors_grid = np.array([[1.25, 1.625], [2.0, 3.75], [4.125, 2.875]],
                            np.float32)

    # reference wants p = list of [B, A, g, g, 5+C] maps for shape gains
    p = [torch.zeros((B, 3, g, g, 5 + C))]
    tcls, tbox, indices, anch = ref_accuracy.build_targets_v5(
        p, torch.tensor(rows), [torch.tensor(anchors_grid)], nl=1, na=3)
    rb, ra, rgj, rgi = [t.numpy() for t in indices[0]]
    r_tbox, r_anch, r_tcls = tbox[0].numpy(), anch[0].numpy(), tcls[0].numpy()

    got = assignment.build_targets_v5(jnp.asarray(labels), jnp.asarray(boxes),
                                      jnp.asarray(mask),
                                      jnp.asarray(anchors_grid), g)
    v = np.asarray(got.valid)
    g_set = set(zip(np.asarray(got.b)[v], np.asarray(got.a)[v],
                    np.asarray(got.gj)[v], np.asarray(got.gi)[v],
                    np.asarray(got.tcls)[v],
                    map(tuple, np.round(np.asarray(got.tbox)[v], 4)),
                    map(tuple, np.round(np.asarray(got.anch)[v], 4))))
    r_set = set(zip(rb, ra, rgj, rgi, r_tcls.astype(np.int32),
                    map(tuple, np.round(r_tbox, 4)),
                    map(tuple, np.round(r_anch, 4))))
    assert g_set == r_set


def test_ssd_match_forced_positive(rng):
    """Every valid annotation must claim at least its best default box."""
    from objectdetectionpl_tpu.ops import anchors as anchor_lib
    dboxes = jnp.asarray(anchor_lib.ssd_dboxes())
    labels, boxes, mask = make_padded_targets(rng, 1, 4, 10)
    m = assignment.ssd_match(dboxes, jnp.asarray(labels[0]),
                             jnp.asarray(boxes[0]), jnp.asarray(mask[0]))
    assert int(jnp.sum(m.matched)) >= int(mask[0].sum())
    # matched boxes carry the annotation's class + 1
    assert set(np.asarray(m.true_classes[m.matched]).tolist()) <= set(
        (1 + labels[0][mask[0]]).tolist())


def test_retina_match_bands(rng):
    """cls targets: 0 below 0.4, -1 in (0.4, 0.5), 1+label above 0.5."""
    anchors_xywh = jnp.asarray([[100.0, 100.0, 50.0, 50.0],
                                [300.0, 300.0, 60.0, 60.0]])
    labels = jnp.asarray([3])
    boxes = jnp.asarray([[100.0 / 600, 100.0 / 600, 50.0 / 600, 50.0 / 600]])
    mask = jnp.asarray([True])
    m = assignment.retina_match(anchors_xywh, labels, boxes, mask, 600.0)
    assert int(m.cls_targets[0]) == 4     # perfect overlap -> 1 + 3
    assert int(m.cls_targets[1]) == 0     # disjoint -> background
