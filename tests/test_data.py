"""Data layer tests: parsers on tiny fixtures, pipeline, device augmentation."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from objectdetectionpl_tpu.config import Config
from objectdetectionpl_tpu.data import build_datamodule
from objectdetectionpl_tpu.data.pipeline import Loader
from objectdetectionpl_tpu.data.synthetic import SyntheticParser


def _write_jpg(path, rng, hw=(48, 64)):
    from PIL import Image
    arr = rng.randint(0, 255, (*hw, 3)).astype(np.uint8)
    Image.fromarray(arr).save(path, "JPEG")


def _voc_xml(path, objs, classes):
    rows = "".join(
        f"<object><name>{classes[c]}</name><bndbox><xmin>{x}</xmin>"
        f"<ymin>{y}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox></object>"
        for (x, y, x2, y2, c) in objs)
    with open(path, "w") as f:
        f.write(f"<annotation>{rows}</annotation>")


@pytest.fixture
def voc_root(tmp_path, rng):
    from objectdetectionpl_tpu.data.parsers.pascal import VOC_CLASSES
    base = tmp_path / "VOC2012"
    for d in ("JPEGImages", "Annotations", "ImageSets/Main"):
        (base / d).mkdir(parents=True)
    ids = [f"im{i}" for i in range(6)]
    for i, _id in enumerate(ids):
        _write_jpg(str(base / "JPEGImages" / f"{_id}.jpg"), rng)
        _voc_xml(str(base / "Annotations" / f"{_id}.xml"),
                 [(5, 5, 30, 25, i % 20)], VOC_CLASSES)
    (base / "ImageSets/Main/train.txt").write_text("\n".join(ids[:4]))
    (base / "ImageSets/Main/val.txt").write_text("\n".join(ids[4:]))
    return str(tmp_path)


def test_voc_parser(voc_root):
    from objectdetectionpl_tpu.data.parsers import VOCParser
    p = VOCParser(voc_root, "2012", "train")
    assert len(p) == 4
    ex = p[0]
    assert ex.image.dtype == np.uint8 and ex.image.shape[-1] == 3
    # -1 offset applied: xmin 5 -> 4
    np.testing.assert_allclose(ex.boxes[0], [4, 4, 25, 20])
    assert ex.labels[0] == 0


def test_voc_datamodule_split(voc_root):
    cfg = Config(data_module="VOC", data_root=voc_root, batch_size=1,
                 img_size=64, max_boxes=5)
    dm = build_datamodule(cfg)
    assert len(dm.get_class()) == 20
    # 80/20 of 4 -> 3/1
    assert len(dm.train_idx) == 3 and len(dm.val_idx) == 1
    batch = next(iter(dm.train_dataloader()))
    assert batch.images.shape == (1, 64, 64, 3)
    assert batch.images.max() <= 1.0
    assert batch.mask.sum() == 1
    # center-form conversion: cx = (4 + 25/2) / 64-width-scale
    cx, cy, w, h = batch.boxes[0, 0]
    assert 0 < cx < 1 and 0 < w < 1


def test_coco_parser(tmp_path, rng):
    from objectdetectionpl_tpu.data.parsers import COCOParser
    img_dir = tmp_path / "images" / "train2017"
    ann_dir = tmp_path / "annotations"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir()
    _write_jpg(str(img_dir / "a.jpg"), rng)
    data = {
        "images": [{"id": 7, "file_name": "a.jpg"}],
        "annotations": [
            {"image_id": 7, "category_id": 3, "bbox": [10, 12, 20, 14]},
            {"image_id": 7, "category_id": 90, "bbox": [1, 2, 3, 4]},
            {"image_id": 99, "category_id": 1, "bbox": [0, 0, 5, 5]},
        ],
    }
    (ann_dir / "instances_train2017.json").write_text(json.dumps(data))
    p = COCOParser(str(tmp_path), "2017", "train")
    assert len(p) == 1
    ex = p[0]
    assert len(ex.labels) == 2
    assert ex.labels[0] == 2          # category 3 -> contiguous 2
    assert ex.labels[1] == 79         # category 90 -> contiguous 79


def test_widerperson_parser(tmp_path, rng):
    from objectdetectionpl_tpu.data.parsers import WiderPersonParser
    (tmp_path / "Images").mkdir()
    (tmp_path / "Annotations").mkdir()
    _write_jpg(str(tmp_path / "Images" / "x.jpg"), rng)
    (tmp_path / "Annotations" / "x.jpg.txt").write_text(
        "2\n1 5 6 25 30\n3 0 0 10 10\n")
    (tmp_path / "train.txt").write_text("x\n")
    p = WiderPersonParser(str(tmp_path), "train")
    ex = p[0]
    assert list(ex.labels) == [0, 2]
    np.testing.assert_allclose(ex.boxes[0], [5, 6, 20, 24])


def test_bdd100k_parser(tmp_path, rng):
    from objectdetectionpl_tpu.data.parsers import BDD100KParser
    img_dir = tmp_path / "images" / "track" / "train" / "vid1"
    lbl_dir = tmp_path / "labels" / "box_track_20" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    _write_jpg(str(img_dir / "f0.jpg"), rng)
    frames = [{"name": "f0.jpg", "labels": [
        {"category": "pedestrian", "box2d": {"x1": 1, "y1": 2, "x2": 11, "y2": 22}},
        {"category": "other vehicle", "box2d": {"x1": 0, "y1": 0, "x2": 5, "y2": 5}},
        {"category": "trailer", "box2d": {"x1": 3, "y1": 3, "x2": 9, "y2": 9}},
    ]}]
    (lbl_dir / "vid1.json").write_text(json.dumps(frames))
    p = BDD100KParser(str(tmp_path), "train")
    ex = p[0]
    assert len(ex.labels) == 2                      # 'other vehicle' dropped
    assert ex.labels[0] == 4                        # pedestrian -> person
    assert ex.labels[1] == 9                        # trailer -> truck


def test_synthetic_deterministic():
    p = SyntheticParser(8, img_hw=128)
    a, b = p[3], p[3]
    np.testing.assert_array_equal(a.image, b.image)
    assert len(a.labels) >= 1


def test_loader_shapes_and_drop_last():
    p = SyntheticParser(10, img_hw=96)
    loader = Loader(p, img_size=64, batch_size=4, max_boxes=8, shuffle=True)
    batches = list(loader)
    assert len(batches) == 2                        # drop_last
    for b in batches:
        assert b.images.shape == (4, 64, 64, 3)
        assert b.boxes.shape == (4, 8, 4)
        assert b.mask.any()


def test_augment_batch_preserves_shapes_and_ranges(rng):
    from objectdetectionpl_tpu.data.augment import augment_batch
    p = SyntheticParser(4, img_hw=64)
    loader = Loader(p, img_size=64, batch_size=4, max_boxes=8)
    b = next(iter(loader))
    imgs, boxes, mask = augment_batch(
        jax.random.PRNGKey(0), jnp.asarray(b.images), jnp.asarray(b.boxes),
        jnp.asarray(b.mask))
    assert imgs.shape == b.images.shape
    assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0
    assert boxes.shape == b.boxes.shape
    v = np.asarray(boxes)[np.asarray(mask)]
    assert (v >= -1e-5).all() and (v <= 1 + 1e-5).all()


def test_container_parser(tmp_path, rng):
    """Mosquito-Container fixture parity (dataset/Container.py:99-109):
    VOC-style XML under train_cdc/train_annotations, -1 offset, degenerate
    boxes dropped."""
    from objectdetectionpl_tpu.data.parsers.container import (
        CONTAINER_CLASSES, ContainerParser)
    img_dir = tmp_path / "train_cdc" / "train_images"
    ann_dir = tmp_path / "train_cdc" / "train_annotations"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    for i in range(2):
        _write_jpg(str(img_dir / f"c{i}.jpg"), rng)
        _voc_xml(str(ann_dir / f"c{i}.xml"),
                 [(6, 8, 30, 28, i), (0, 0, 0, 0, 1)],   # 2nd degenerate
                 CONTAINER_CLASSES)
    p = ContainerParser(str(tmp_path))
    assert len(p) == 2
    ex = p[0]
    assert len(ex.labels) == 1                       # degenerate box dropped
    np.testing.assert_allclose(ex.boxes[0], [5, 7, 24, 20])  # -1 offset
    assert ex.labels[0] == 0
    assert len(CONTAINER_CLASSES) == 13


def test_asiatraffic_parser(tmp_path, rng):
    """Asia-Traffic fixture parity (dataset/AsiaTraffic.py:74-122): ids from
    ImageSets/All.txt, VOC-style XML, 4 classes."""
    from objectdetectionpl_tpu.data.parsers.asiatraffic import (
        ASIA_CLASSES, AsiaTrafficParser)
    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "Annotations").mkdir()
    (tmp_path / "ImageSets").mkdir()
    ids = ["t0", "t1", "t2"]
    for i, _id in enumerate(ids):
        _write_jpg(str(tmp_path / "JPEGImages" / f"{_id}.jpg"), rng)
        _voc_xml(str(tmp_path / "Annotations" / f"{_id}.xml"),
                 [(4, 5, 20, 22, i % 4)], ASIA_CLASSES)
    (tmp_path / "ImageSets" / "All.txt").write_text("\n".join(ids))
    p = AsiaTrafficParser(str(tmp_path))
    assert len(p) == 3
    ex = p[1]
    np.testing.assert_allclose(ex.boxes[0], [3, 4, 16, 17])
    assert ex.labels[0] == 1
    assert len(ASIA_CLASSES) == 4


def test_loader_microbatch_flush_weights():
    """Train-step weights: a zero-weight padded micro must not change params
    differently from the unpadded half-window (regression for the tail-drop)."""
    import jax
    import jax.numpy as jnp
    import optax
    from objectdetectionpl_tpu.models import build_model
    from objectdetectionpl_tpu.ops import losses as loss_lib
    from objectdetectionpl_tpu.train import state as state_lib, step as step_lib

    model = build_model("YOLOv2", 3)
    tx = optax.sgd(0.1)
    st = state_lib.create_train_state(model, tx, jax.random.PRNGKey(0), 64,
                                      batch_size=2)
    loss_fn = loss_lib.make_loss("YOLOv2", 3, 64)
    step2 = step_lib.make_train_step(model, loss_fn, tx, accum_steps=2)

    rng = np.random.RandomState(0)
    im = jnp.asarray(rng.rand(1, 2, 64, 64, 3), jnp.float32)
    lb = jnp.zeros((1, 2, 4), jnp.int32)
    bx = jnp.tile(jnp.asarray([0.5, 0.5, 0.4, 0.4]), (1, 2, 4, 1))
    mk = jnp.ones((1, 2, 4), bool).at[:, :, 2:].set(False)

    # train_step donates its state argument; copy per call
    copy_state = lambda s: jax.tree.map(jnp.copy, s)
    pad = lambda a: jnp.concatenate([a, a], axis=0)
    w = jnp.asarray([1.0, 0.0])
    s_pad, m_pad = step2(copy_state(st), pad(im), pad(lb), pad(bx), pad(mk), w)

    # reference: single-micro window with accum=1
    step1 = step_lib.make_train_step(model, loss_fn, tx, accum_steps=1)
    s_one, m_one = step1(copy_state(st), im, lb, bx, mk)

    np.testing.assert_allclose(float(m_pad["loss"]), float(m_one["loss"]),
                               rtol=1e-6)
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     s_pad.params, s_one.params)
    # accum=1 takes the no-scan fast path (train/step.py), so the two
    # backward passes are *differently compiled* programs; XLA reassociates
    # the f32 conv-grad reductions, giving ~4e-5 param drift after one
    # lr=0.1 SGD step (measured; forward loss above stays bit-exact).
    # Bound at 2.5x the measured drift so a real divergence cannot hide.
    assert max(jax.tree.leaves(d)) < 1e-4


def test_affine_warp_rotates_about_center():
    """Pure rotation must keep centered content centered (regression: the
    normalized-coords matrix was applied to raw pixel coords, rotating the
    image about the corner while boxes rotated about the center)."""
    import jax.numpy as jnp
    from objectdetectionpl_tpu.data.augment import (_affine_warp,
                                                    _rot_shift_scale_matrix)
    S = 64
    img = np.zeros((S, S, 3), np.float32)
    img[24:40, 28:36] = 1.0                   # tall box at center
    fwd = _rot_shift_scale_matrix(jnp.deg2rad(90.0), 1.0, 0.0, 0.0)
    out = np.asarray(_affine_warp(jnp.asarray(img), jnp.linalg.inv(fwd)))
    ys, xs = np.nonzero(out[..., 0] > 0.5)
    # mass stays centered and the box is now wide
    assert abs(ys.mean() - 31.5) < 1.0 and abs(xs.mean() - 31.5) < 1.0
    assert ys.max() - ys.min() < xs.max() - xs.min()


def test_packed_cache_roundtrip(tmp_path):
    """Packed pre-decoded cache (data/cache.py): cached epochs are
    numerically identical to live decode epochs (images via uint8/255,
    targets exactly), across both plain-resize and letterbox geometry."""
    from objectdetectionpl_tpu.data import cache as cache_lib

    parser = SyntheticParser(10, img_hw=64)
    for letterbox in (False, True):
        d = str(tmp_path / f"cache_lb{int(letterbox)}")
        cache_lib.build_packed_cache(parser, 64, d, letterbox=letterbox)
        assert cache_lib.cache_valid(d, 10, 64, letterbox)
        # rebuild is a no-op (idempotent)
        cache_lib.build_packed_cache(parser, 64, d, letterbox=letterbox)

        live = Loader(parser, 64, batch_size=4, max_boxes=8, shuffle=True,
                      seed=3, letterbox=letterbox)
        cached = Loader(parser, 64, batch_size=4, max_boxes=8, shuffle=True,
                        seed=3, letterbox=letterbox, cache_dir=d)
        assert cached.cache is not None
        for lb, cb in zip(live, cached):
            assert cb.images.dtype == np.uint8
            np.testing.assert_allclose(
                cb.images.astype(np.float32) / 255.0, lb.images, atol=1e-6)
            np.testing.assert_array_equal(cb.labels, lb.labels)
            np.testing.assert_allclose(cb.boxes, lb.boxes, atol=1e-6)
            np.testing.assert_array_equal(cb.mask, lb.mask)

    # geometry mismatch -> cache refused, live path used
    stale = Loader(parser, 32, batch_size=4, max_boxes=8,
                   cache_dir=str(tmp_path / "cache_lb0"))
    assert stale.cache is None
