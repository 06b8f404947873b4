"""Anchor-generator parity tests against the torch reference generators."""

import sys

import numpy as np
import pytest

from objectdetectionpl_tpu.ops import anchors


def test_ssd_dbox_count_and_range():
    d = anchors.ssd_dboxes()
    assert d.shape == (8732, 4)
    assert d.max() <= 1.0
    assert d.min() >= 0.0


def test_retina_anchor_count():
    a = anchors.retina_anchors(600)
    # p3..p7 feature maps of ceil(600 / 2^(i+3)), 9 anchors per cell
    expected = sum(int(np.ceil(600 / 2 ** (i + 3))) ** 2 * 9 for i in range(5))
    assert a.shape == (expected, 4)


def test_yolo_grid_layout():
    g = anchors.yolo_grid(4)
    assert g.shape == (4, 4, 2)
    assert g[0, 3, 0] == 3 and g[0, 3, 1] == 0     # x varies along axis 1
    assert g[3, 0, 0] == 0 and g[3, 0, 1] == 3


@pytest.fixture(scope="module")
def ref_utils(reference_path):
    sys.path.insert(0, reference_path)
    import importlib
    ssd = importlib.import_module("LightningFunc.utils.SSDUtils")
    retina = importlib.import_module("LightningFunc.utils.RetinaUtils")
    return ssd, retina


def test_ssd_dboxes_parity(ref_utils):
    ssd, _ = ref_utils
    ref = ssd.get_dboxes().numpy()
    got = anchors.ssd_dboxes()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_retina_anchors_parity(ref_utils):
    import torch
    _, retina = ref_utils
    ref = retina.get_anchor_boxes(torch.tensor([600.0, 600.0])).numpy()
    got = anchors.retina_anchors(600)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)
