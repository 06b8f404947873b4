"""Native C++ preprocessing library tests (auto-built via make)."""

import numpy as np
import pytest

from objectdetectionpl_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++?)")


def test_native_resize_matches_python(rng):
    imgs = [rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
            for h, w in [(120, 200), (64, 64), (300, 150)]]
    batch, scales, pxs, pys = native.preproc_batch(imgs, 96, letterbox=False)
    assert batch.shape == (3, 96, 96, 3)
    assert batch.min() >= 0 and batch.max() <= 1
    try:
        import cv2
        ref = cv2.resize(imgs[0], (96, 96),
                         interpolation=cv2.INTER_LINEAR).astype(np.float32) / 255
        assert np.abs(batch[0] - ref).max() < 0.02
    except ImportError:
        pass


def test_native_letterbox_matches_python(rng):
    from objectdetectionpl_tpu.data.pipeline import _resize_letterbox
    img = rng.randint(0, 255, (120, 200, 3)).astype(np.uint8)
    batch, scales, pxs, pys = native.preproc_batch([img], 96, letterbox=True)
    canvas, s, px, py = _resize_letterbox(img, 96)
    assert abs(float(scales[0]) - s) < 1e-6
    assert int(pxs[0]) == px and int(pys[0]) == py
    assert np.abs(batch[0] - canvas.astype(np.float32) / 255).max() < 0.02


def test_loader_uses_native_consistently(rng):
    """Loader output with native path matches target semantics."""
    from objectdetectionpl_tpu.data.pipeline import Loader
    from objectdetectionpl_tpu.data.synthetic import SyntheticParser
    p = SyntheticParser(4, img_hw=100)
    b = next(iter(Loader(p, img_size=64, batch_size=2, max_boxes=8)))
    assert b.images.dtype == np.float32
    assert b.images.shape == (2, 64, 64, 3)
    v = b.boxes[b.mask]
    assert (v > 0).all() and (v <= 1).all()


def test_fused_decode_matches_fallback(rng, tmp_path):
    """Fused JPEG decode path ~= PIL/cv2 decode + python preprocess."""
    from PIL import Image
    from objectdetectionpl_tpu.data import native as nat

    paths = []
    for i, (h, w) in enumerate([(96, 160), (200, 120)]):
        arr = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        p = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(arr).save(p, "JPEG", quality=95)
        paths.append(p)

    out = nat.decode_preproc_batch(paths, 64, letterbox=False)
    assert out is not None
    imgs, ows, ohs, scales, pxs, pys, ok = out
    assert ok.all()
    assert list(ows) == [160, 120] and list(ohs) == [96, 200]
    assert imgs.shape == (2, 64, 64, 3)

    # reference: decode with PIL, resize via the python path
    from objectdetectionpl_tpu.data.pipeline import _resize
    ref = np.asarray(Image.open(paths[0]).convert("RGB"))
    ref = _resize(ref, 64).astype(np.float32) / 255.0
    # JPEG decoders differ by a few LSB; compare loosely
    assert np.abs(imgs[0] - ref).mean() < 0.02


def test_loader_fused_path_jpeg(rng, tmp_path):
    """VOC-style parser + jpg files -> fused path produces a valid batch."""
    from objectdetectionpl_tpu.data.parsers import VOCParser
    from objectdetectionpl_tpu.data.pipeline import Loader
    from objectdetectionpl_tpu.data.parsers.pascal import VOC_CLASSES
    from PIL import Image

    base = tmp_path / "VOC2012"
    for d in ("JPEGImages", "Annotations", "ImageSets/Main"):
        (base / d).mkdir(parents=True)
    ids = []
    for i in range(3):
        _id = f"x{i}"
        ids.append(_id)
        arr = rng.randint(0, 255, (80, 100, 3)).astype(np.uint8)
        Image.fromarray(arr).save(str(base / "JPEGImages" / f"{_id}.jpg"))
        (base / "Annotations" / f"{_id}.xml").write_text(
            f"<annotation><object><name>{VOC_CLASSES[i]}</name>"
            "<bndbox><xmin>10</xmin><ymin>10</ymin>"
            "<xmax>50</xmax><ymax>40</ymax></bndbox></object></annotation>")
    (base / "ImageSets/Main/train.txt").write_text("\n".join(ids))
    p = VOCParser(str(tmp_path), "2012", "train")
    b = next(iter(Loader(p, img_size=64, batch_size=3, max_boxes=4)))
    assert b.images.shape == (3, 64, 64, 3)
    assert b.mask.sum() == 3
    v = b.boxes[b.mask]
    # cx = (9 + 40/2)/100 = 0.29 for each image
    np.testing.assert_allclose(v[:, 0], 0.29, atol=0.01)
