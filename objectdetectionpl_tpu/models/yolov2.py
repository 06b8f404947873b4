"""YOLOv2 / Darknet19 with passthrough (reorg) connection.

TPU-native (NHWC flax) re-design of reference ``model/YOLOV2.py:17-222``:
13-conv Darknet19 stage 1, stage-2a deep path, stage-2b 1x1 + space-to-depth
passthrough, concat, 3x3 fuse, 1x1 detection conv.

Output contract: raw map [B, A*(5+C), 13, 13] (A=5), consumed by
``ops.losses.region_loss`` and ``ops.nms.decode_yolo_predictions``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from objectdetectionpl_tpu.nn.blocks import (ConvBN, max_pool,
                                             reorg_darknet_bug,
                                             space_to_depth)

# (features, kernel) per conv; 'M' = 2x2/2 maxpool.  Mirrors the stage-1 stack
# of model/YOLOV2.py:42-76.
_STAGE1 = [(32, 3), "M", (64, 3), "M", (128, 3), (64, 1), (128, 3), "M",
           (256, 3), (128, 1), (256, 3), "M", (512, 3), (256, 1), (512, 3),
           (256, 1), (512, 3)]
_STAGE2A = [(1024, 3), (512, 1), (1024, 3), (512, 1), (1024, 3), (1024, 3),
            (1024, 3)]


class YOLOv2(nn.Module):
    num_classes: int
    num_anchors: int = 5
    dtype: jnp.dtype = jnp.float32
    # 's2d': true space-to-depth (default; the sane op, divergence documented
    # in blocks.space_to_depth).  'darknet': bit-exact replica of the
    # reference's scrambled reorg (model/YOLOV2.py:144-151) for weight
    # transplants / bug-for-bug forward parity.
    reorg: str = "s2d"

    @nn.compact
    def __call__(self, x, train: bool = True):
        for spec in _STAGE1:
            if spec == "M":
                x = max_pool(x, 2, 2)
            else:
                f, k = spec
                x = ConvBN(f, k, act="leaky", dtype=self.dtype)(x, train)
        residual = x                                  # 26x26x512

        h = max_pool(x, 2, 2)
        for f, k in _STAGE2A:
            h = ConvBN(f, k, act="leaky", dtype=self.dtype)(h, train)

        # Passthrough: 1x1 to 64ch then space-to-depth 2x -> 256ch @ 13x13
        # (model/YOLOV2.py:96-97,144-151).
        p = ConvBN(64, 1, act="leaky", dtype=self.dtype)(residual, train)
        p = (reorg_darknet_bug(p) if self.reorg == "darknet"
             else space_to_depth(p, 2))

        h = jnp.concatenate([h, p], axis=-1)
        h = ConvBN(1024, 3, act="leaky", dtype=self.dtype)(h, train)
        out_ch = self.num_anchors * (5 + self.num_classes)
        # Reference detection conv is 1x1, no BN, bias=False (YOLOV2.py:102).
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(h)
        return jnp.transpose(h, (0, 3, 1, 2))        # [B, A*(5+C), g, g]
