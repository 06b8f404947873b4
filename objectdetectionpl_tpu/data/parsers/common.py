"""Shared parser helpers (image IO, VOC-style XML)."""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import List, Sequence, Tuple

import numpy as np

from objectdetectionpl_tpu.data.types import Example


def load_image_rgb(path: str) -> np.ndarray:
    """uint8 RGB HWC.  (The reference uses cv2.imread and keeps BGR end to
    end, dataset/Coco.py:136 — we standardize on RGB.)"""
    try:
        import cv2
        img = cv2.imread(path)
        if img is None:
            raise IOError(f"cannot read image {path!r}")
        return img[:, :, ::-1].copy()
    except ImportError:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"))


def parse_voc_xml(xml_path: str, classes: Sequence[str],
                  offset: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """VOC bndbox XML -> (boxes top-left xywh px, labels).

    Coordinates get a -1 offset and degenerate boxes are dropped
    (dataset/Pascal.py:105-115, dataset/AsiaTraffic.py:113-122).
    """
    annot = ET.parse(xml_path)
    boxes: List[List[float]] = []
    labels: List[int] = []
    for obj in annot.findall("object"):
        bnd = obj.find("bndbox")
        xmin, xmax, ymin, ymax = (
            float(bnd.find(t).text) - offset
            for t in ("xmin", "xmax", "ymin", "ymax"))
        name = obj.find("name").text.lower().strip()
        if name not in classes:
            continue
        w, h = xmax - xmin, ymax - ymin
        if xmin >= 0 and ymin >= 0 and w >= 0 and h >= 0:
            boxes.append([xmin, ymin, w, h])
            labels.append(classes.index(name))
    return (np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(labels, np.int32))


def make_example(img_path: str, boxes: np.ndarray,
                 labels: np.ndarray) -> Example:
    return Example(load_image_rgb(img_path), boxes, labels)


def read_id_list(path: str) -> List[str]:
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def exists(p: str) -> bool:
    return os.path.exists(p)
