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
