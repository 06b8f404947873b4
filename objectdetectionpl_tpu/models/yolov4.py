"""YOLOv4: CSPDarknet53 backbone + SPP/PAN neck + 3-scale head.

TPU-native (NHWC flax) re-design of reference ``model/YOLOV4.py:136-283`` and
``LightningFunc/utils/YoloV4Utils.py:264-481`` (DownSample1-5, Neck, Yolov4Head).

Output contract: list of 3 raw maps [B, 3*(5+C), g, g] at strides (8, 16, 32).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from objectdetectionpl_tpu.nn.blocks import ConvBN, MishResBlock, max_pool, upsample2x


class DownSampleCSP(nn.Module):
    """CSP downsample stage (YoloV4Utils DownSample2-5 pattern): strided conv,
    split into two 1x1 routes, residual stack on one route, concat, fuse."""

    out_ch: int
    nblocks: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        half = self.out_ch // 2
        x1 = ConvBN(self.out_ch, 3, stride=2, act="mish", dtype=self.dtype)(x, train)
        route = ConvBN(half, 1, act="mish", dtype=self.dtype)(x1, train)
        h = ConvBN(half, 1, act="mish", dtype=self.dtype)(x1, train)
        h = MishResBlock(half, self.nblocks, dtype=self.dtype)(h, train)
        h = ConvBN(half, 1, act="mish", dtype=self.dtype)(h, train)
        h = jnp.concatenate([h, route], axis=-1)
        return ConvBN(self.out_ch, 1, act="mish", dtype=self.dtype)(h, train)


class DownSample1(nn.Module):
    """First stage with full-width CSP routes (YoloV4Utils.py:264-300)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvBN(32, 3, act="mish", dtype=self.dtype)(x, train)
        x2 = ConvBN(64, 3, stride=2, act="mish", dtype=self.dtype)(x, train)
        x3 = ConvBN(64, 1, act="mish", dtype=self.dtype)(x2, train)
        x4 = ConvBN(64, 1, act="mish", dtype=self.dtype)(x2, train)
        h = ConvBN(32, 1, act="mish", dtype=self.dtype)(x4, train)
        h = ConvBN(64, 3, act="mish", dtype=self.dtype)(h, train)
        x6 = h + x4
        x7 = ConvBN(64, 1, act="mish", dtype=self.dtype)(x6, train)
        x7 = jnp.concatenate([x7, x3], axis=-1)
        return ConvBN(64, 1, act="mish", dtype=self.dtype)(x7, train)


class Neck(nn.Module):
    """SPP (5/9/13) + PAN top-down (YoloV4Utils.py:400-481)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, d5, d4, d3, train: bool = True):
        cbn = lambda f, k: ConvBN(f, k, act="leaky", dtype=self.dtype)
        x = cbn(512, 1)(d5, train)
        x = cbn(1024, 3)(x, train)
        x3 = cbn(512, 1)(x, train)
        spp = jnp.concatenate([max_pool(x3, 13, 1, 6), max_pool(x3, 9, 1, 4),
                               max_pool(x3, 5, 1, 2), x3], axis=-1)
        x = cbn(512, 1)(spp, train)
        x = cbn(1024, 3)(x, train)
        x6 = cbn(512, 1)(x, train)
        x = cbn(256, 1)(x6, train)
        up = upsample2x(x)
        l4 = cbn(256, 1)(d4, train)
        x = jnp.concatenate([l4, up], axis=-1)
        x = cbn(256, 1)(x, train)
        x = cbn(512, 3)(x, train)
        x = cbn(256, 1)(x, train)
        x = cbn(512, 3)(x, train)
        x13 = cbn(256, 1)(x, train)
        x = cbn(128, 1)(x13, train)
        up = upsample2x(x)
        l3 = cbn(128, 1)(d3, train)
        x = jnp.concatenate([l3, up], axis=-1)
        x = cbn(128, 1)(x, train)
        x = cbn(256, 3)(x, train)
        x = cbn(128, 1)(x, train)
        x = cbn(256, 3)(x, train)
        x20 = cbn(128, 1)(x, train)
        return x20, x13, x6


class YOLOv4(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        out_ch = 3 * (5 + self.num_classes)
        cbn = lambda f, k, s=1: ConvBN(f, k, stride=s, act="leaky",
                                       dtype=self.dtype)
        head_conv = lambda: nn.Conv(out_ch, (1, 1), use_bias=True,
                                    dtype=self.dtype)

        d1 = DownSample1(dtype=self.dtype)(x, train)
        d2 = DownSampleCSP(128, 2, dtype=self.dtype)(d1, train)
        d3 = DownSampleCSP(256, 8, dtype=self.dtype)(d2, train)
        d4 = DownSampleCSP(512, 8, dtype=self.dtype)(d3, train)
        d5 = DownSampleCSP(1024, 4, dtype=self.dtype)(d4, train)

        n20, n13, n6 = Neck(dtype=self.dtype)(d5, d4, d3, train)

        # Head (model/YOLOV4.py:52-134): small scale direct, PAN bottom-up
        # strided fusions for medium/large.
        h = cbn(256, 3)(n20, train)
        out_s8 = head_conv()(h)

        h = cbn(256, 3, 2)(n20, train)
        h = jnp.concatenate([h, n13], axis=-1)
        h = cbn(256, 1)(h, train)
        h = cbn(512, 3)(h, train)
        h = cbn(256, 1)(h, train)
        h = cbn(512, 3)(h, train)
        x8 = cbn(256, 1)(h, train)
        h = cbn(512, 3)(x8, train)
        out_s16 = head_conv()(h)

        h = cbn(512, 3, 2)(x8, train)
        h = jnp.concatenate([h, n6], axis=-1)
        h = cbn(512, 1)(h, train)
        h = cbn(1024, 3)(h, train)
        h = cbn(512, 1)(h, train)
        h = cbn(1024, 3)(h, train)
        h = cbn(512, 1)(h, train)
        h = cbn(1024, 3)(h, train)
        out_s32 = head_conv()(h)

        to_nchw = lambda t: jnp.transpose(t, (0, 3, 1, 2))
        return [to_nchw(out_s8), to_nchw(out_s16), to_nchw(out_s32)]
