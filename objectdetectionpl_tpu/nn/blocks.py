"""Flax NN building blocks shared by the six detector families.

TPU-native re-designs of the reference's reusable torch blocks
(``LightningFunc/utils/YoloV3Utils.py:8-197``, ``YoloV4Utils.py:178-481``,
``YoloV5Utils.py:9-263``):

- NHWC layout everywhere (TPU conv layout; the reference is NCHW),
- explicit torch-style ``k // 2`` padding so spatial arithmetic matches the
  reference exactly on its even input sizes,
- a ``dtype`` knob for bfloat16 compute with float32 params/BN statistics,
- space-to-depth via reshape/transpose (XLA fuses it; the reference's Reorg
  does a 6-D view/permute on device, model/YOLOV2.py:147-151).

BatchNorm runs with *global* batch statistics under pjit-style sharding: the
train step jits over a Mesh with the batch dim sharded, so the mean/variance
reductions are global reductions that XLA lowers to ICI collectives — no
``axis_name`` plumbing needed (unlike pmap-style per-replica BN).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def mish(x):
    """x * tanh(softplus(x)) (YoloV4Utils.py:178-184)."""
    return x * jnp.tanh(jax.nn.softplus(x))


ACTIVATIONS = {
    "leaky": lambda x: jax.nn.leaky_relu(x, 0.1),
    "relu": jax.nn.relu,
    "mish": mish,
    "silu": jax.nn.silu,
    "linear": lambda x: x,
}


class BatchNorm(nn.Module):
    """Drop-in for flax ``nn.BatchNorm`` (feature axis -1) that never touches
    the activation tensor in float32.

    flax's BatchNorm converts x to f32 and runs the whole
    subtract/multiply/add normalize pipeline in f32 activation space
    (flax normalization.py:205-226); under bfloat16 compute that pushes f32
    activation-sized intermediates through HBM in forward and backward
    (measured: 61.4 GB accessed per YOLOv5s-640 B=64 model fwd+bwd, an
    84 ms bandwidth roofline on the v5e). Here instead:

    - batch moments are single-pass f32-*accumulated* reductions of the
      compute-dtype tensor (sum / sum-of-squares; the converts fuse into the
      reduces and never materialize),
    - the normalize folds into one per-channel affine ``y = x*a + b`` with
      ``a = scale * rsqrt(var + eps)``, ``b = bias - mean*a`` computed in f32
      at [C] size and cast once to the compute dtype,

    so every activation-sized op stays in the compute dtype. Variable
    collections/names match nn.BatchNorm exactly (params: scale, bias;
    batch_stats: mean, var; auto-name ``BatchNorm_N``) and so do the
    momentum/epsilon semantics (biased batch variance, running =
    m*running + (1-m)*batch), so existing checkpoints and the torch weight
    transplants load unchanged.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        # Benchmark-only knob (read at trace time, like OBJDET_S2D): force
        # running-average statistics in train mode to isolate the cost of the
        # batch-moment reductions + their backward in a train-step A/B.
        # NEVER a production setting — it changes training semantics.
        if self.use_running_average or os.environ.get(
                "OBJDET_BN_FROZEN", "0") == "1":
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            n = x.size // C
            mean = jnp.sum(x, axis=axes, dtype=jnp.float32) / n
            mean_sq = jnp.sum(jnp.square(x), axis=axes, dtype=jnp.float32) / n
            # E[x^2] - E[x]^2: post-conv pre-BN activations are near
            # zero-mean, so the cancellation is benign; clamp for safety.
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        return x * a.astype(x.dtype) + b.astype(x.dtype)


class ConvBN(nn.Module):
    """Conv2d + optional BatchNorm + activation.

    Matches Conv_Bn_Activation (YoloV4Utils.py:206-233) / Conv2dBatchReLU
    (YoloV3Utils.py) semantics: bias off when BN is on, pad = k // 2.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    act: str = "leaky"
    use_bn: bool = True
    dilation: int = 1
    groups: int = 1
    dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, train: bool = True):
        p = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups,
                    use_bias=not self.use_bn, dtype=self.dtype,
                    kernel_init=self.kernel_init)(x)
        if self.use_bn:
            x = BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype)(x)
        import os
        # Benchmark-only knob (trace-time, cf. OBJDET_BN_FROZEN): swap every
        # activation for a cheaper one to bound the VPU/elementwise share of
        # a train step.  Never a production setting.
        act = os.environ.get("OBJDET_ACT_OVERRIDE", self.act)
        return ACTIVATIONS[act](x)


def max_pool(x, window: int, stride: int, pad: int = 0):
    """torch-style MaxPool2d over NHWC."""
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=((pad, pad), (pad, pad)))


def space_to_depth(x, block: int = 2, via: str = None):
    """NHWC space-to-depth: [B, H, W, C] -> [B, H/b, W/b, C*b*b].

    Functional equivalent (up to a learned-away channel permutation) of the
    reference's Reorg (model/YOLOV2.py:147-151) and Focus slicing
    (YoloV5Utils.py:117-127).  Channel blocks are ordered (row-phase,
    col-phase, C) identically in both implementations:

    - ``slices``: b*b strided phase slices + concat.  The B=128 train-step
      HLO shows these compile to 4 separate gather fusions that each re-read
      the full input (~1.26 GB read for a 315 MB tensor) — they do NOT fuse
      into the consumer conv.
    - ``transpose``: reshape -> single 6-D transpose -> reshape; one
      read + one write pass.
    """
    if via is None:
        import os
        via = os.environ.get("OBJDET_S2D", "slices")
    if via not in ("slices", "transpose"):
        raise ValueError(f"space_to_depth via={via!r}: expected 'slices' or "
                         "'transpose' (OBJDET_S2D is read at trace time)")
    if via == "slices":
        return jnp.concatenate(
            [x[:, i::block, j::block, :]
             for i in range(block) for j in range(block)], axis=-1)
    B, H, W, C = x.shape
    t = x.reshape(B, H // block, block, W // block, block, C)
    t = jnp.transpose(t, (0, 1, 3, 2, 4, 5))
    return t.reshape(B, H // block, W // block, block * block * C)


def reorg_darknet_bug(x):
    """Bit-exact replica of the reference's passthrough "reorg"
    (model/YOLOV2.py:144-151): a channel-block view/permute that is NOT a true
    space-to-depth — it scrambles (channel, spatial) positions the same way
    the well-known buggy darknet-pytorch reorg does.  Provided so weight
    transplants from the reference reproduce its forward exactly; pure
    reshape/transpose, so XLA compiles it to a copy like ``space_to_depth``.

    NHWC in [B, H, W, C] -> [B, H/2, W/2, 4C].
    """
    B, H, W, C = x.shape
    t = jnp.transpose(x, (0, 3, 1, 2))              # NCHW like the reference
    t = t.reshape(B, C // 4, H, 2, W, 2)            # .view(B, C/4, H, 2, W, 2)
    t = jnp.transpose(t, (0, 3, 5, 1, 2, 4))        # .permute(0, 3, 5, 1, 2, 4)
    t = t.reshape(B, 4 * C, H // 2, W // 2)         # .view(B, -1, H/2, W/2)
    return jnp.transpose(t, (0, 2, 3, 1))           # back to NHWC


def upsample2x(x):
    """Nearest-neighbor 2x upsample, NHWC (detector FPN paths)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


def resize_bilinear(x, size: Tuple[int, int]):
    """Bilinear resize to (H, W) — RetinaNet's _upsample_add
    (model/backbone/RetinaNetbone.py:42-59)."""
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, size[0], size[1], C), method="bilinear")


class Residual(nn.Module):
    """Two ConvBN-leaky layers with skip (YoloV3Utils Residual)."""

    mid: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = ConvBN(self.mid, 1, act="leaky", dtype=self.dtype)(x, train)
        h = ConvBN(self.out, 3, act="leaky", dtype=self.dtype)(h, train)
        return x + h


class MishResBlock(nn.Module):
    """n x (1x1 + 3x3 mish conv) residual blocks (YoloV4Utils ResBlock)."""

    ch: int
    nblocks: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(self.nblocks):
            h = ConvBN(self.ch, 1, act="mish", dtype=self.dtype)(x, train)
            h = ConvBN(self.ch, 3, act="mish", dtype=self.dtype)(h, train)
            x = x + h
        return x


# --- YOLOv5 family (width/depth-multiple aware) -----------------------------------


def scale_ch(c: int, width_multiple: float) -> int:
    """Width-multiple channel scaling (YoloV5Utils.py:40-43 rounding)."""
    return int(round(c * width_multiple, 1))


def scale_depth(n: int, depth_multiple: float) -> int:
    return max(1, int(round(n * depth_multiple, 1)))


class BottleneckV5(nn.Module):
    """Standard v5 bottleneck (YoloV5Utils.py:55-69)."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        c_ = int(self.c2 * self.e)
        h = ConvBN(c_, 1, act="leaky", dtype=self.dtype)(x, train)
        h = ConvBN(self.c2, 3, act="leaky", dtype=self.dtype)(h, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + h
        return h


class BottleneckCSP(nn.Module):
    """CSP bottleneck (YoloV5Utils.py:71-94): split -> n bottlenecks -> fuse."""

    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        c_ = int(self.c2 * self.e)
        y1 = ConvBN(c_, 1, act="leaky", dtype=self.dtype)(x, train)
        for _ in range(self.n):
            y1 = BottleneckV5(c_, self.shortcut, e=1.0, dtype=self.dtype)(
                y1, train)
        y1 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype)(y1)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = BatchNorm(use_running_average=not train, momentum=0.9,
                      epsilon=1e-5, dtype=self.dtype)(y)
        y = jax.nn.leaky_relu(y, 0.1)
        return ConvBN(self.c2, 1, act="leaky", dtype=self.dtype)(y, train)


class SPP(nn.Module):
    """Spatial pyramid pooling 5/9/13 (YoloV5Utils.py:96-109; same kernels as
    the v4 Neck SPP, YoloV4Utils.py:407-412)."""

    c2: int
    kernels: Sequence[int] = (5, 9, 13)
    act: str = "leaky"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        c_ = x.shape[-1] // 2
        x = ConvBN(c_, 1, act=self.act, dtype=self.dtype)(x, train)
        pools = [max_pool(x, k, 1, k // 2) for k in self.kernels]
        x = jnp.concatenate([x] + pools, axis=-1)
        return ConvBN(self.c2, 1, act=self.act, dtype=self.dtype)(x, train)


class Focus(nn.Module):
    """Space-to-depth + conv stem (YoloV5Utils.py:111-127)."""

    c2: int
    kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        return ConvBN(self.c2, self.kernel, act="leaky", dtype=self.dtype)(
            space_to_depth(x, 2), train)
