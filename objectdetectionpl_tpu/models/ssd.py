"""SSD-300 with a VGG16 backbone.

TPU-native (NHWC flax) re-design of reference ``model/SSD.py:16-246``: VGG16
features through conv4_3 (pool3 ceil-mode), pool5 changed to 3x3/1, dilated
conv6 + 1x1 conv7, extra feature blocks f3-f6, and per-scale cl/bbx heads with
(4, 6, 6, 6, 4, 4) anchors per cell.

Divergences (documented): no pretrained torchvision weights in this
environment (model/SSD.py:46 loads vgg16(pretrained=True)) — backbone trains
from scratch; class heads emit 1+C channels with an explicit background
channel (see ops/assignment.py ssd_match docstring).

Output contract: (loc [B, 8732, 4], cls [B, 8732, 1+C]).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from objectdetectionpl_tpu.nn.blocks import ConvBN, max_pool

# VGG16 'D' configuration through conv4_3 / conv5_3.
_VGG_F1 = [64, 64, "M", 128, 128, "M", 256, 256, 256, "Mceil", 512, 512, 512]
_VGG_BASE1 = ["M", 512, 512, 512, "M311"]

# (anchors per cell) per scale — SSDUtils num_boxes + 1 geometric-mean box.
ANCHORS_PER_CELL: Sequence[int] = (4, 6, 6, 6, 4, 4)


def _ceil_pool(x):
    """2x2/2 max-pool with ceil_mode=True (pad bottom/right when odd)."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = h % 2, w % 2
    return nn.max_pool(x, (2, 2), strides=(2, 2),
                       padding=((0, ph), (0, pw)))


class _VGGStack(nn.Module):
    cfg: tuple
    dtype: jnp.dtype = jnp.float32
    use_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        # Kaiming/He fan-out init — torchvision's own from-scratch init for
        # VGG (vgg._initialize_weights: kaiming_normal_(fan_out, relu)).
        # The reference loads *pretrained* torchvision weights
        # (model/SSD.py:46); training from scratch here, flax's default
        # lecun_normal halves activation variance at every one of the 13
        # no-BN ReLU convs (~2^-13 by conv5_3) and the net cannot even
        # memorize 64 images (measured: synthetic run stuck at mAP 0.001
        # after 150 epochs; see BASELINE.md).
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        for spec in self.cfg:
            if spec == "M":
                x = max_pool(x, 2, 2)
            elif spec == "Mceil":
                x = _ceil_pool(x)
            elif spec == "M311":
                x = max_pool(x, 3, 1, 1)
            else:
                x = ConvBN(spec, 3, act="relu", use_bn=self.use_bn,
                           dtype=self.dtype, kernel_init=kaiming)(x, train)
        return x


class SSD(nn.Module):
    num_classes: int                       # foreground classes C
    dtype: jnp.dtype = jnp.float32
    use_bn: bool = False                   # BN-VGG backbone (vgg16_bn layout).
                                           # Flagged divergence (#27): the
                                           # reference trains SSD only from
                                           # pretrained no-BN VGG weights
                                           # (model/SSD.py:46); from scratch
                                           # that stack memorizes without
                                           # generalizing (BASELINE.md r4).
                                           # BN on the 13 feature convs is the
                                           # standard torchvision vgg16_bn
                                           # remedy; extras/heads unchanged.

    @nn.compact
    def __call__(self, x, train: bool = True):
        cls_ch = self.num_classes + 1
        # extras + heads use Xavier init like the reference (model/SSD.py:230)
        xavier = nn.initializers.xavier_normal()
        relu_conv = lambda f, k, s=1, d=1: ConvBN(
            f, k, stride=s, dilation=d, act="relu", use_bn=False,
            dtype=self.dtype, kernel_init=xavier)
        head = lambda ch: nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                                  dtype=self.dtype, kernel_init=xavier)

        feats = []
        x = _VGGStack(tuple(_VGG_F1), dtype=self.dtype,
                      use_bn=self.use_bn)(x, train)
        feats.append(x)                                        # 38x38x512
        x = _VGGStack(tuple(_VGG_BASE1), dtype=self.dtype,
                      use_bn=self.use_bn)(x, train)
        x = relu_conv(1024, 3, d=3)(x, train)                  # dilated conv6
        x = relu_conv(1024, 1)(x, train)                       # conv7
        feats.append(x)                                        # 19x19x1024
        x = relu_conv(256, 1)(x, train)
        x = relu_conv(512, 3, s=2)(x, train)
        feats.append(x)                                        # 10x10x512
        x = relu_conv(128, 1)(x, train)
        x = relu_conv(256, 3, s=2)(x, train)
        feats.append(x)                                        # 5x5x256
        # f5/f6: 3x3 VALID convs shrink 5 -> 3 -> 1 (model/SSD.py:126-155).
        valid3 = lambda: nn.Conv(256, (3, 3), padding="VALID",
                                 dtype=self.dtype, kernel_init=xavier)
        x = relu_conv(128, 1)(x, train)
        x = jnp.maximum(valid3()(x), 0)
        feats.append(x)                                        # 3x3x256
        x2 = relu_conv(128, 1)(x, train)
        x2 = jnp.maximum(valid3()(x2), 0)
        feats.append(x2)                                       # 1x1x256

        locs, clss = [], []
        for f, a in zip(feats, ANCHORS_PER_CELL):
            B = f.shape[0]
            cl = head(a * cls_ch)(f).reshape(B, -1, cls_ch)
            bb = head(a * 4)(f).reshape(B, -1, 4)
            clss.append(cl)
            locs.append(bb)
        return jnp.concatenate(locs, 1), jnp.concatenate(clss, 1)
