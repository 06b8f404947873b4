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
