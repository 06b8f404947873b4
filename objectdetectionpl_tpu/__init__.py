"""TPU-native object-detection framework.

A brand-new JAX / XLA / Pallas / pjit re-design of the capability surface of
Leyan529/ObjectDetectionPL (reference mounted at /root/reference):

- six dataset loaders (COCO, Pascal VOC, BDD100K, WiderPerson, Mosquito-Container,
  Asia-Traffic) feeding a fixed-shape, device-side preprocessing pipeline,
- six anchor-based detector families (SSD-300/VGG16, RetinaNet/ResNet50-FPN,
  YOLOv2/Darknet19, YOLOv3/Darknet53, YOLOv4/CSPDarknet+SPP+PAN, YOLOv5 s/m/l/x),
- box / anchor / target-assignment / loss / NMS / mAP ops written jit-first
  (static shapes, masked ragged data, no Python loops over data),
- a config-driven train/eval CLI with data-parallel `shard_map` over a TPU mesh,
  top-k checkpointing, early stopping, and TensorBoard logging.

Everything under `ops/` and `models/` is pure-functional JAX; batching conventions
are NHWC images `[B, S, S, 3]` in [0, 1] and padded targets
(`boxes [B, M, 4]` xywh-normalized, `labels [B, M]`, `mask [B, M]`), the TPU-native
equivalent of the reference's ragged `[N, 6]` target tensor
(reference: dataset/Pascal.py:144-186).
"""

# NOTE: this module (and cli/__init__.py) must stay jax-free: the CLIs'
# CPU override (cli/_platform.py) must run before any jax backend touch.

__version__ = "0.1.0"
