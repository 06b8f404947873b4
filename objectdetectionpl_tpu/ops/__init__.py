"""Pure-functional detection ops: boxes, anchors, assignment, losses, NMS, metrics.

All ops are jit-compatible (static shapes, masked variable-length data) and are
the TPU-native equivalents of the reference's `LightningFunc/{losses,accuracy}.py`
plus the per-model NMS methods in `model/*.py`.
"""

from objectdetectionpl_tpu.ops import anchors, assignment, boxes, losses, metrics, nms  # noqa: F401
