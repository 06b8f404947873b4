"""YOLOv3 / Darknet53 with 3-scale upsample+concat FPN head.

TPU-native (NHWC flax) re-design of reference ``model/YOLOV3.py:19-335``:
Darknet53 extractor with residual-group taps at 256ch ("k_residual") and
512ch ("s_residual"), then three detection sequences with two upsample+concat
lateral fusions.

Output contract: list of 3 raw maps [B, 3*(5+C), g, g] at strides (32, 16, 8)
— g = (13, 26, 52) at 416 input.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from objectdetectionpl_tpu.nn.blocks import ConvBN, Residual, upsample2x

# Darknet53 residual-group sizes (model/YOLOV3.py:73-175).
_GROUPS = [(64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)]


class Darknet53(nn.Module):
    """Feature extractor returning (c5 1024ch, tap512, tap256)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvBN(32, 3, act="leaky", dtype=self.dtype)(x, train)
        taps = {}
        for ch, n_res in _GROUPS:
            x = ConvBN(ch, 3, stride=2, act="leaky", dtype=self.dtype)(x, train)
            for _ in range(n_res):
                x = Residual(ch // 2, ch, dtype=self.dtype)(x, train)
            if ch in (256, 512):
                taps[ch] = x
        return x, taps[512], taps[256]


class _DetectSeq(nn.Module):
    """(1x1, 3x3) x3 alternating convs with a tap after the 5th, then the
    detection conv (model/YOLOV3.py:179-234 sequences 0/2/4)."""

    mid: int
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvBN(self.mid, 1, act="leaky", dtype=self.dtype)(x, train)
        x = ConvBN(self.mid * 2, 3, act="leaky", dtype=self.dtype)(x, train)
        x = ConvBN(self.mid, 1, act="leaky", dtype=self.dtype)(x, train)
        x = ConvBN(self.mid * 2, 3, act="leaky", dtype=self.dtype)(x, train)
        tap = ConvBN(self.mid, 1, act="leaky", dtype=self.dtype)(x, train)
        x = ConvBN(self.mid * 2, 3, act="leaky", dtype=self.dtype)(tap, train)
        x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype)(x)
        return x, tap


class YOLOv3(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        out_ch = 3 * (5 + self.num_classes)
        c5, s_res, k_res = Darknet53(dtype=self.dtype)(x, train)

        out0, tap57 = _DetectSeq(512, out_ch, dtype=self.dtype)(c5, train)

        h = ConvBN(256, 1, act="leaky", dtype=self.dtype)(tap57, train)
        h = upsample2x(h)
        h = jnp.concatenate([h, s_res], axis=-1)
        out1, tap66 = _DetectSeq(256, out_ch, dtype=self.dtype)(h, train)

        h = ConvBN(128, 1, act="leaky", dtype=self.dtype)(tap66, train)
        h = upsample2x(h)
        h = jnp.concatenate([h, k_res], axis=-1)
        out2, _ = _DetectSeq(128, out_ch, dtype=self.dtype)(h, train)

        to_nchw = lambda t: jnp.transpose(t, (0, 3, 1, 2))
        return [to_nchw(out0), to_nchw(out1), to_nchw(out2)]
