"""RetinaNet: ResNet50-FPN (p3..p7) with shared 4-conv loc/cls heads.

TPU-native (NHWC flax) re-design of reference ``model/RetinaNet.py:17-115``
and ``model/backbone/RetinaNetbone.py:8-76``: bottleneck ResNet-50
([3, 4, 6, 3]), lateral 1x1 + bilinear top-down FPN, p6/p7 strided convs,
shared heads (4 x conv256+relu then 3x3 out conv).

Output contract: (loc [B, A, 4], cls [B, A, C]) with A anchors ordered
p3..p7, row-major (y, x, anchor) per level — matching
``ops.anchors.retina_anchors``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from objectdetectionpl_tpu.nn.blocks import ConvBN, max_pool, resize_bilinear


class Bottleneck(nn.Module):
    """ResNet bottleneck, expansion 4 (model/RetinaNet.py:17-42)."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        out_ch = 4 * self.planes
        h = ConvBN(self.planes, 1, act="relu", dtype=self.dtype)(x, train)
        h = ConvBN(self.planes, 3, stride=self.stride, act="relu",
                   dtype=self.dtype)(h, train)
        h = ConvBN(out_ch, 1, act="linear", dtype=self.dtype)(h, train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            x = ConvBN(out_ch, 1, stride=self.stride, act="linear",
                       dtype=self.dtype)(x, train)
        return jnp.maximum(h + x, 0)


class ResNetFPN(nn.Module):
    """Returns (p3, p4, p5, p6, p7), all 256ch."""

    num_blocks: tuple = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvBN(64, 7, stride=2, act="relu", dtype=self.dtype)(x, train)
        x = max_pool(x, 3, 2, 1)

        feats = []
        for i, (planes, n) in enumerate(zip((64, 128, 256, 512),
                                            self.num_blocks)):
            stride = 1 if i == 0 else 2
            x = Bottleneck(planes, stride, dtype=self.dtype)(x, train)
            for _ in range(n - 1):
                x = Bottleneck(planes, 1, dtype=self.dtype)(x, train)
            feats.append(x)
        _, c3, c4, c5 = feats

        lat = lambda: nn.Conv(256, (1, 1), dtype=self.dtype)
        smooth = lambda: nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                                 dtype=self.dtype)
        p6 = nn.Conv(256, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     dtype=self.dtype)(c5)
        p7 = nn.Conv(256, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     dtype=self.dtype)(jnp.maximum(p6, 0))
        p5 = lat()(c5)
        p4 = smooth()(resize_bilinear(p5, c4.shape[1:3]) + lat()(c4))
        p3 = smooth()(resize_bilinear(p4, c3.shape[1:3]) + lat()(c3))
        return p3, p4, p5, p6, p7


class RetinaNet(nn.Module):
    num_classes: int
    num_anchors: int = 9
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        fms = ResNetFPN(dtype=self.dtype)(x, train)

        # Shared heads across levels (model/RetinaNet.py:103-109): 4 conv+relu
        # then the output conv; flax shares params by reusing module instances.
        loc_head = _Head(self.num_anchors * 4, dtype=self.dtype)
        cls_head = _Head(self.num_anchors * self.num_classes, dtype=self.dtype)

        locs, clss = [], []
        B = x.shape[0]
        for fm in fms:
            locs.append(loc_head(fm).reshape(B, -1, 4))
            clss.append(cls_head(fm).reshape(B, -1, self.num_classes))
        return jnp.concatenate(locs, 1), jnp.concatenate(clss, 1)


class _Head(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(4):
            x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype)(x)
            x = jnp.maximum(x, 0)
        return nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype)(x)
