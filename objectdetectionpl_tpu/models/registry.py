"""Model registry: string name -> (flax module, default img_size).

Parity with the reference's model dispatch (run.py:52-61) and the per-model
image-size table (run.py:35-38): RetinaNet 600, SSD 300, YOLOv5 640, else 416.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from objectdetectionpl_tpu.models.retinanet import RetinaNet
from objectdetectionpl_tpu.models.ssd import SSD
from objectdetectionpl_tpu.models.yolov2 import YOLOv2
from objectdetectionpl_tpu.models.yolov3 import YOLOv3
from objectdetectionpl_tpu.models.yolov4 import YOLOv4
from objectdetectionpl_tpu.models.yolov5 import YOLOv5

MODELS = {
    "YOLOv2": (YOLOv2, 416),
    "YOLOv3": (YOLOv3, 416),
    "YOLOv4": (YOLOv4, 416),
    "YOLOv5": (YOLOv5, 640),
    "SSD": (SSD, 300),
    "RetinaNet": (RetinaNet, 600),
}


def default_img_size(model_name: str) -> int:
    return MODELS[model_name][1]


def build_model(model_name: str, num_classes: int, dtype: Any = jnp.float32,
                yolov5_type: str = "Yolov5s", remat: str = "none",
                ssd_bn: bool = False):
    """Instantiate a detector module by config name.

    ``remat``: activation rematerialization policy for models that support it
    (currently YOLOv5: "none" | "early" | "all"); ignored elsewhere.
    ``ssd_bn``: BN-VGG backbone for SSD (flagged divergence #27); ignored
    elsewhere.
    """
    cls, _ = MODELS[model_name]
    if model_name == "YOLOv5":
        return cls(num_classes=num_classes, variant=yolov5_type, dtype=dtype,
                   remat=remat)
    if model_name == "SSD":
        return cls(num_classes=num_classes, dtype=dtype, use_bn=ssd_bn)
    return cls(num_classes=num_classes, dtype=dtype)
