"""Conv+BatchNorm folding for serving (fuse_conv_and_bn parity).

Reference: LightningFunc/utils/YoloV5Utils.py:257-263 folds BN into the
preceding conv for inference.  On TPU, XLA already fuses the BN affine into
the conv epilogue at compile time, so this is a *weight* transform for
exported/serialized models: W' = W * gamma / sqrt(var + eps) (per out
channel), b' = beta - gamma * mean / sqrt(var + eps).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

BN_EPS = 1e-5


def fuse_conv_bn(kernel, bn_scale, bn_bias, bn_mean, bn_var,
                 eps: float = BN_EPS) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold BN statistics into a flax conv kernel [kh, kw, in, out].

    Returns (fused_kernel, fused_bias) such that
    ``conv(x, fused_kernel) + fused_bias == BN(conv(x, kernel))``
    under running statistics.
    """
    factor = bn_scale / jnp.sqrt(bn_var + eps)       # [out]
    fused_kernel = kernel * factor[None, None, None, :]
    fused_bias = bn_bias - bn_mean * factor
    return fused_kernel, fused_bias


def fold_input_scale(params, scale: float,
                     path=("Focus_0", "ConvBN_0", "Conv_0")):
    """Fold an input normalization ``x * scale`` into the first conv kernel.

    ``conv(x * scale, W) == conv(x, W * scale)`` exactly, so pre-scaling the
    stem kernel lets the serving path consume raw uint8 (cast only) and skip
    the full-image normalize pass (~1 GB of HBM traffic per 256x640px batch
    in the inference HLO).  Returns a new params tree; BN layers downstream
    are unaffected (their input is bit-identical up to f32->bf16 rounding of
    the pre-scaled kernel).
    """
    import jax

    def walk(tree, parts):
        if not parts:
            return {**tree, "kernel": tree["kernel"] * scale}
        head, *rest = parts
        return {**tree, head: walk(tree[head], rest)}

    return walk(jax.tree_util.tree_map(lambda x: x, params), list(path))
