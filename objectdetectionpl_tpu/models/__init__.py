"""The six detector families, as pure flax modules over NHWC inputs.

Output contracts match the reference models (SURVEY.md §2.3) so the shared
losses/NMS consume them unchanged:

- YOLOv2:    single raw map  [B, A*(5+C), g, g]
- YOLOv3:    3 raw maps, strides (32, 16, 8)
- YOLOv4:    3 raw maps, strides (8, 16, 32)
- YOLOv5:    3 reshaped maps [B, 3, g, g, 5+C], strides (8, 16, 32)
- SSD:       (loc [B, 8732, 4], cls [B, 8732, 1+C])
- RetinaNet: (loc [B, A, 4],   cls [B, A, C])
"""

from objectdetectionpl_tpu.models.registry import MODELS, build_model  # noqa: F401
