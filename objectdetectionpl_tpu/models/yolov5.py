"""YOLOv5 s/m/l/x: Focus stem + CSPDarknet + SPP + top-down PANet head.

TPU-native (NHWC flax) re-design of reference ``model/YOLOV5.py:20-155``
(backbone_head + Yolo_Layers).  Width/depth multiples select the s/m/l/x
variants (model/YOLOV5.py:23-34).

Output contract: list of 3 reshaped maps [B, 3, g, g, 5+C] at strides
(8, 16, 32) — the reference's Yolo_Layers layout (model/YOLOV5.py:95-99).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from objectdetectionpl_tpu.nn.blocks import (
    SPP, BottleneckCSP, BottleneckV5, ConvBN, Focus, scale_ch, scale_depth,
    upsample2x)

VARIANTS = {
    "Yolov5s": (0.33, 0.50),
    "Yolov5m": (0.67, 0.75),
    "Yolov5l": (1.00, 1.00),
    "Yolov5x": (1.33, 1.25),
}


class YOLOv5(nn.Module):
    num_classes: int
    variant: str = "Yolov5s"
    num_anchors: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dm, wm = VARIANTS[self.variant]
        C = lambda c: scale_ch(c, wm)
        D = lambda n: scale_depth(n, dm)
        no = (5 + self.num_classes) * self.num_anchors
        conv = lambda c, k, s: ConvBN(C(c), k, stride=s, act="leaky",
                                      dtype=self.dtype)
        csp = lambda c, n, sc=True: BottleneckCSP(C(c), D(n), shortcut=sc,
                                                  dtype=self.dtype)
        head = lambda: nn.Conv(no, (1, 1), use_bias=True, dtype=self.dtype)

        x = Focus(C(64), 3, dtype=self.dtype)(x, train)          # /2
        x = conv(128, 3, 2)(x, train)                            # /4
        x = BottleneckV5(C(128), dtype=self.dtype)(x, train)
        x = conv(256, 3, 2)(x, train)                            # /8
        rt0 = csp(256, 9)(x, train)
        x = conv(512, 3, 2)(rt0, train)                          # /16
        rt1 = csp(512, 9)(x, train)
        x = conv(1024, 3, 2)(rt1, train)                         # /32
        x = SPP(C(1024), dtype=self.dtype)(x, train)
        x = csp(1024, 6)(x, train)
        route = csp(1024, 3, sc=False)(x, train)
        out0 = head()(route)                                     # stride 32

        x = jnp.concatenate([upsample2x(route), rt1], axis=-1)
        x = conv(512, 1, 1)(x, train)
        route = csp(512, 3, sc=False)(x, train)
        out1 = head()(route)                                     # stride 16

        x = jnp.concatenate([upsample2x(route), rt0], axis=-1)
        x = conv(256, 1, 1)(x, train)
        x = csp(256, 3, sc=False)(x, train)
        out2 = head()(x)                                         # stride 8

        def reshape(t):
            B, H, W, _ = t.shape
            t = t.reshape(B, H, W, self.num_anchors, 5 + self.num_classes)
            return jnp.transpose(t, (0, 3, 1, 2, 4))   # [B, 3, g, g, 5+C]

        return [reshape(out2), reshape(out1), reshape(out0)]
