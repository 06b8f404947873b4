"""Unit + golden-parity tests for ops/boxes.py against the torch reference."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from objectdetectionpl_tpu.ops import boxes as box_ops


def _rand_xyxy(rng, n):
    x1 = rng.uniform(0, 50, n)
    y1 = rng.uniform(0, 50, n)
    w = rng.uniform(1, 60, n)
    h = rng.uniform(1, 60, n)
    return np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)


def test_xywh_roundtrip(rng):
    b = _rand_xyxy(rng, 32)
    rt = box_ops.xywh_to_xyxy(box_ops.xyxy_to_xywh(jnp.asarray(b)))
    np.testing.assert_allclose(rt, b, rtol=1e-5, atol=1e-5)


def test_iou_corner_identity(rng):
    b = jnp.asarray(_rand_xyxy(rng, 8))
    np.testing.assert_allclose(box_ops.iou_corner(b, b), 1.0, rtol=1e-6)


def test_iou_disjoint():
    a = jnp.array([0.0, 0.0, 1.0, 1.0])
    b = jnp.array([5.0, 5.0, 6.0, 6.0])
    assert float(box_ops.iou_corner(a, b)) == 0.0


def test_ssd_codec_roundtrip(rng):
    from objectdetectionpl_tpu.ops import anchors
    dboxes = jnp.asarray(anchors.ssd_dboxes()[:64])
    gt = jnp.asarray(np.stack([rng.uniform(0.2, 0.8, 64),
                               rng.uniform(0.2, 0.8, 64),
                               rng.uniform(0.05, 0.4, 64),
                               rng.uniform(0.05, 0.4, 64)], -1).astype(np.float32))
    enc = box_ops.ssd_encode(gt, dboxes)
    dec = box_ops.ssd_decode(enc, dboxes, use_variance=True)
    np.testing.assert_allclose(dec, gt, rtol=1e-4, atol=1e-5)


def test_retina_codec_roundtrip(rng):
    anchors = jnp.asarray(np.stack([rng.uniform(10, 500, 64),
                                    rng.uniform(10, 500, 64),
                                    rng.uniform(20, 200, 64),
                                    rng.uniform(20, 200, 64)], -1).astype(np.float32))
    gt = anchors * jnp.asarray([1.1, 0.9, 1.3, 0.7])
    dec = box_ops.retina_decode(box_ops.retina_encode(gt, anchors), anchors)
    np.testing.assert_allclose(dec, gt, rtol=1e-4)


# --- golden parity vs torch reference ------------------------------------------


@pytest.fixture(scope="module")
def ref_accuracy(reference_path):
    sys.path.insert(0, reference_path)
    import importlib
    mod = importlib.import_module("LightningFunc.accuracy")
    return mod


def test_bbox_iou_parity(rng, ref_accuracy):
    import torch
    a = _rand_xyxy(rng, 64)
    b = _rand_xyxy(rng, 64)
    ref = ref_accuracy.bbox_iou(torch.tensor(a), torch.tensor(b)).numpy()
    got = np.asarray(box_ops.iou_plus1(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_bbox_iou_xywh_parity(rng, ref_accuracy):
    import torch
    a = np.abs(_rand_xyxy(rng, 64))
    b = np.abs(_rand_xyxy(rng, 64))
    ref = ref_accuracy.bbox_iou(torch.tensor(a), torch.tensor(b),
                                x1y1x2y2=False).numpy()
    got = np.asarray(box_ops.iou_plus1(jnp.asarray(a), jnp.asarray(b),
                                       xyxy=False))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("variant", ["plain", "giou", "diou", "ciou"])
def test_bbox_iou_v5_parity(rng, ref_accuracy, variant):
    import torch
    a = _rand_xyxy(rng, 64)
    b = _rand_xyxy(rng, 64)
    kw = {} if variant == "plain" else {
        {"giou": "GIoU", "diou": "DIoU", "ciou": "CIoU"}[variant]: True}
    # reference signature: box1 [4, N]-style columns (box1[0] = x1 vector)
    ref = ref_accuracy.bbox_iou_v5(torch.tensor(a).t(), torch.tensor(b).t(),
                                   **kw).numpy()
    jkw = {variant: True} if variant != "plain" else {}
    got = np.asarray(box_ops.iou_v5(jnp.asarray(a), jnp.asarray(b), **jkw))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_wh_iou_parity(rng, ref_accuracy):
    import torch
    wh1 = rng.uniform(1, 20, (2,)).astype(np.float32)
    wh2 = rng.uniform(1, 20, (32, 2)).astype(np.float32)
    ref = ref_accuracy.bbox_wh_iou(torch.tensor(wh1), torch.tensor(wh2)).numpy()
    got = np.asarray(box_ops.wh_iou(jnp.asarray(wh1), jnp.asarray(wh2)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_ssd_iou_parity(rng, ref_accuracy):
    import torch
    a = _rand_xyxy(rng, 48) / 100.0
    b = _rand_xyxy(rng, 48) / 100.0
    ref = ref_accuracy.iou(torch.tensor(a), torch.tensor(b)).numpy()
    got = np.asarray(box_ops.iou_corner(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
