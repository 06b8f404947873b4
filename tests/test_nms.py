"""NMS tests: XLA vs Pallas-interpret parity, merge semantics, anchor NMS."""

import numpy as np

import jax
import jax.numpy as jnp

from objectdetectionpl_tpu.ops import boxes as box_ops
from objectdetectionpl_tpu.ops import nms as nms_lib
from objectdetectionpl_tpu.ops.pallas.nms_kernel import pallas_greedy_nms


def _candidates(rng, B=2, K=64, C=5):
    cx = rng.uniform(50, 550, (B, K))
    cy = rng.uniform(50, 550, (B, K))
    w = rng.uniform(20, 120, (B, K))
    h = rng.uniform(20, 120, (B, K))
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     -1).astype(np.float32)
    scores = np.sort(rng.rand(B, K).astype(np.float32))[:, ::-1].copy()
    scores[:, -10:] = nms_lib.NEG_INF
    labels = rng.randint(0, C, (B, K)).astype(np.int32)
    obj = rng.rand(B, K).astype(np.float32)
    return boxes, scores, labels, obj


def test_pallas_interpret_matches_xla(rng):
    boxes, scores, labels, obj = _candidates(rng)
    K = boxes.shape[1]
    xb, xk = jax.vmap(
        lambda b, s, l, o: nms_lib._greedy_nms_single(
            b, s, l, K, 0.4, lambda x, y: box_ops.iou_plus1(x, y),
            class_aware=True, merge=True,
            obj_conf=jnp.where(s > nms_lib.NEG_INF, o, 0.0)))(
        *map(jnp.asarray, (boxes, scores, labels, obj)))
    pb, pk = pallas_greedy_nms(*map(jnp.asarray, (boxes, scores, labels, obj)),
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(pk), np.asarray(xk))
    kk = np.asarray(xk)
    np.testing.assert_allclose(np.asarray(pb)[kk], np.asarray(xb)[kk],
                               rtol=1e-4, atol=1e-3)


def test_blocked_matches_loop_merge(rng):
    # dense overlaps (small coordinate range) to exercise suppression chains
    boxes, scores, labels, obj = _candidates(rng, B=3, K=100, C=3)
    boxes[..., [0, 2]] /= 4.0
    boxes[..., [1, 3]] /= 4.0
    K = boxes.shape[1]
    for class_aware, merge in ((True, True), (False, False)):
        xb, xk = jax.vmap(
            lambda b, s, l, o: nms_lib._greedy_nms_single(
                b, s, l, K, 0.4, lambda x, y: box_ops.iou_plus1(x, y),
                class_aware=class_aware, merge=merge,
                obj_conf=jnp.where(s > nms_lib.NEG_INF, o, 0.0)))(
            *map(jnp.asarray, (boxes, scores, labels, obj)))
        bb, bk = nms_lib.blocked_greedy_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
            jnp.where(jnp.asarray(scores) > nms_lib.NEG_INF,
                      jnp.asarray(obj), 0.0),
            nms_thresh=0.4, class_aware=class_aware, merge=merge, tile=32)
        np.testing.assert_array_equal(np.asarray(bk), np.asarray(xk))
        kk = np.asarray(xk)
        np.testing.assert_allclose(np.asarray(bb)[kk], np.asarray(xb)[kk],
                                   rtol=1e-4, atol=1e-3)


def test_merge_combines_same_class_overlaps():
    C = 8
    p = np.zeros((1, 4, 5 + C), np.float32)
    p[0, 0] = [100, 100, 40, 40, 0.9] + [0] * C
    p[0, 0, 5 + 3] = 0.8
    p[0, 1] = [102, 102, 40, 40, 0.8] + [0] * C
    p[0, 1, 5 + 3] = 0.7
    p[0, 2] = [300, 300, 40, 40, 0.95] + [0] * C
    p[0, 2, 5 + 5] = 0.9
    res = nms_lib.yolo_nms(jnp.asarray(p), conf_thres=0.5, top_k=4,
                           use_pallas=False)
    v = np.asarray(res.valid[0])
    assert v.sum() == 2
    labels = np.asarray(res.labels[0])[v]
    assert set(labels.tolist()) == {3, 5}
    # merged box lies between the two overlapping candidates
    kept3 = np.asarray(res.boxes[0])[v][labels == 3][0]
    cx = (kept3[0] + kept3[2]) / 2
    assert 100 < cx < 102


def test_different_class_overlaps_survive():
    C = 8
    p = np.zeros((1, 2, 5 + C), np.float32)
    p[0, 0] = [100, 100, 40, 40, 0.9] + [0] * C
    p[0, 0, 5 + 1] = 0.8
    p[0, 1] = [100, 100, 40, 40, 0.8] + [0] * C
    p[0, 1, 5 + 2] = 0.7
    res = nms_lib.yolo_nms(jnp.asarray(p), conf_thres=0.5, top_k=2,
                           use_pallas=False)
    assert int(res.valid.sum()) == 2    # class-aware: both kept


def test_conf_threshold_filters():
    C = 4
    p = np.zeros((1, 3, 5 + C), np.float32)
    p[0, 0] = [100, 100, 40, 40, 0.4] + [0] * C
    res = nms_lib.yolo_nms(jnp.asarray(p), conf_thres=0.5, top_k=3,
                           use_pallas=False)
    assert int(res.valid.sum()) == 0


def test_anchor_nms_basic(rng):
    from objectdetectionpl_tpu.ops import anchors as anchor_lib
    dboxes = anchor_lib.ssd_dboxes()
    D = dboxes.shape[0]
    loc = jnp.zeros((1, D, 4))
    cls = jnp.full((1, D, 5), -10.0)
    # one strong detection at dbox 100
    cls = cls.at[0, 100, 2].set(5.0)
    res = nms_lib.anchor_nms(loc, cls, dboxes, use_pallas=False)
    v = np.asarray(res.valid[0])
    assert v.sum() >= 1
    assert np.asarray(res.labels[0])[v][0] == 2


def test_decode_select_matches_dense_chain(rng):
    """Fused decode_select_yolov5 -> yolo_nms == dense decode -> yolo_nms
    (exact top-k on CPU), including an under-full image where fewer than
    top_k candidates pass the obj threshold."""
    from objectdetectionpl_tpu.ops import anchors as anchor_lib

    B, C = 3, 6
    anchors, strides = anchor_lib.YOLOV5_ANCHORS, anchor_lib.YOLOV5_STRIDES
    outputs = []
    for si, stride in enumerate(strides):
        g = 64 // stride
        x = rng.randn(B, 3, g, g, 5 + C).astype(np.float32) * 2.0
        x[..., 4] -= 2.0          # thin the candidate field
        x[2, :, :, :, 4] = -8.0   # image 2: almost nothing passes
        x[2, 0, 0, 0, 4] = 4.0
        outputs.append(jnp.asarray(x))

    dense = nms_lib.decode_yolov5_predictions(outputs, anchors, strides, C)
    want = nms_lib.yolo_nms(dense, conf_thres=0.5, nms_thres=0.4,
                            top_k=64, exact_topk=True)

    cand = nms_lib.decode_select_yolov5(outputs, anchors, strides, C,
                                        top_k=64, conf_thres=0.5,
                                        exact_topk=True)
    got = nms_lib.yolo_nms(cand, conf_thres=0.5, nms_thres=0.4,
                           top_k=64, exact_topk=True)

    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(want.valid))
    v = np.asarray(want.valid)
    np.testing.assert_allclose(np.asarray(got.boxes)[v],
                               np.asarray(want.boxes)[v],
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.scores)[v],
                               np.asarray(want.scores)[v],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.labels)[v],
                                  np.asarray(want.labels)[v])
