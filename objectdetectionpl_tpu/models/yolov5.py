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
    # "none" | "early" | "all": rematerialize block activations in the
    # backward pass.  "early" recomputes only the high-resolution stem
    # (strides /2-/8) whose activations dominate HBM bytes but cost few
    # FLOPs — the right trade when large train batches hit memory pressure.
    # Explicit block names keep the param tree identical across settings.
    remat: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = True):
        dm, wm = VARIANTS[self.variant]
        C = lambda c: scale_ch(c, wm)
        D = lambda n: scale_depth(n, dm)
        no = (5 + self.num_classes) * self.num_anchors

        def lift(cls, late=True):
            if self.remat == "all" or (self.remat == "early" and not late):
                return nn.remat(cls, static_argnums=(2,))
            return cls

        def conv(c, k, s, name, late=True):
            return lift(ConvBN, late)(C(c), k, stride=s, act="leaky",
                                      dtype=self.dtype, name=name)

        def csp(c, n, name, sc=True, late=True):
            return lift(BottleneckCSP, late)(C(c), D(n), shortcut=sc,
                                             dtype=self.dtype, name=name)

        def head(name):
            return nn.Conv(no, (1, 1), use_bias=True, dtype=self.dtype,
                           name=name)

        x = lift(Focus, late=False)(C(64), 3, dtype=self.dtype,
                                    name="Focus_0")(x, train)    # /2
        x = conv(128, 3, 2, "ConvBN_0", late=False)(x, train)    # /4
        x = lift(BottleneckV5, late=False)(C(128), dtype=self.dtype,
                                           name="BottleneckV5_0")(x, train)
        x = conv(256, 3, 2, "ConvBN_1", late=False)(x, train)    # /8
        rt0 = csp(256, 9, "BottleneckCSP_0", late=False)(x, train)
        x = conv(512, 3, 2, "ConvBN_2")(rt0, train)              # /16
        rt1 = csp(512, 9, "BottleneckCSP_1")(x, train)
        x = conv(1024, 3, 2, "ConvBN_3")(rt1, train)             # /32
        x = lift(SPP)(C(1024), dtype=self.dtype, name="SPP_0")(x, train)
        x = csp(1024, 6, "BottleneckCSP_2")(x, train)
        route = csp(1024, 3, "BottleneckCSP_3", sc=False)(x, train)
        out0 = head("Conv_0")(route)                             # stride 32

        x = jnp.concatenate([upsample2x(route), rt1], axis=-1)
        x = conv(512, 1, 1, "ConvBN_4")(x, train)
        route = csp(512, 3, "BottleneckCSP_4", sc=False)(x, train)
        out1 = head("Conv_1")(route)                             # stride 16

        x = jnp.concatenate([upsample2x(route), rt0], axis=-1)
        x = conv(256, 1, 1, "ConvBN_5", late=False)(x, train)
        x = csp(256, 3, "BottleneckCSP_5", sc=False, late=False)(x, train)
        out2 = head("Conv_2")(x)                                 # stride 8

        def reshape(t):
            B, H, W, _ = t.shape
            t = t.reshape(B, H, W, self.num_anchors, 5 + self.num_classes)
            return jnp.transpose(t, (0, 3, 1, 2, 4))   # [B, 3, g, g, 5+C]

        return [reshape(out2), reshape(out1), reshape(out0)]
