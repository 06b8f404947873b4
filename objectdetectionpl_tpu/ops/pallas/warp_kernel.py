"""Pallas TPU kernel: batched affine bilinear warp (shift-scale-rotate).

The device-side SSR augmentation (data/augment.py, reference semantics
``A.ShiftScaleRotate``, dataset/Pascal.py:213-229) was gather-bound under
XLA: per-pixel 4-tap gathers run at ~1e8 taps/s on TPU (~0.8 s per 64-image
batch at 640).  This kernel removes every gather:

Two-pass shear/scale decomposition.  The inverse pixel map
``src = A @ dst + t`` factors (for ``A[1,1] != 0``, always true for the SSR
parameter range |rotate| <= 45 deg, scale in [0.9, 1.1]) into

  pass 1 (x): h(y, x)   = in(y,  p1*x + q1*y + r1)
  pass 2 (y): out(y, x) = h(p2*y + q2*x + r2,  x)

with  q1 = A01/A11, p1 = det(A)/A11, r1 = tx - q1*ty,
      p2 = A11,     q2 = A10,        r2 = ty.

Each pass is a per-row 1-D resample at positions p*x + (q*y + r):
  - the row-dependent offset (integer k + fraction phi) is realized with two
    dynamic slices from a zero-padded row buffer + lerp (VPU, no gather);
  - the shared scale p is one [S, S] two-hot interpolation-matrix matmul on
    the MXU, amortized over all rows and channels.

The y-pass runs the same kernel on the transposed planes.  Composing two
1-D bilinear resamples adds half-texel smoothing vs a single 2-D bilinear
sample (the classic multi-pass-warp tradeoff — fine for augmentation and
documented as a divergence from the XLA gather path it replaces).

Layout: channel-planar [K, 3, S, S] float32, whole plane-set in VMEM
(S=640: in 4.9 MB + out 4.9 MB + W 1.6 MB + row scratch ~16 KB < 16 MB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pass_kernel(params_ref, img_ref, out_ref, row_scratch):
    """One shear/scale pass over one image's planes.

    params_ref: SMEM [4] float32 — (p, q, r, S) with resample index
                p*x + q*y + r for output pixel (y, x).
    img_ref/out_ref: VMEM [C, S, S] float32.
    row_scratch: VMEM [C, 3*S] zero-padded row buffer.
    """
    C, S = img_ref.shape[0], img_ref.shape[1]
    p = params_ref[0]
    q = params_ref[1]
    r = params_ref[2]

    # Shared scale matrix W[x_out, x_in] = tri(p * x_out - x_in), two-hot
    # bilinear weights; rows whose source leaves [0, S) are all-zero, giving
    # constant (0) padding for free.
    xo = jax.lax.broadcasted_iota(jnp.float32, (S, S), 0)
    xi = jax.lax.broadcasted_iota(jnp.float32, (S, S), 1)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(p * xo - xi))

    # Row scratch: [C, 3S], input row written at offset S each iteration;
    # the flanks stay zero (constant padding for the shift).
    row_scratch[:, :] = jnp.zeros_like(row_scratch)

    def body(y, _):
        # offset for this output row: k + phi
        off = q * y.astype(jnp.float32) + r
        k = jnp.floor(off)
        phi = off - k
        ki = jnp.clip(k.astype(jnp.int32), -S, S - 1)
        row_scratch[:, pl.ds(S, S)] = img_ref[:, y, :]
        t0 = row_scratch[:, pl.ds(S + ki, S)]          # row[x + k]
        t1 = row_scratch[:, pl.ds(S + ki + 1, S)]      # row[x + k + 1]
        out_ref[:, y, :] = t0 * (1.0 - phi) + t1 * phi
        return 0

    jax.lax.fori_loop(0, S, body, 0)

    # Scale pass on the MXU: out[c, y, :] = shifted[c, y, :] @ W^T.
    for c in range(C):
        out_ref[c, :, :] = jax.lax.dot_general(
            out_ref[c, :, :], w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


def _warp_pass(planes, params, interpret: bool):
    """planes [K, C, S, S]; params [K, 4] (p, q, r, S)."""
    K, C, S = planes.shape[0], planes.shape[1], planes.shape[2]
    return pl.pallas_call(
        _pass_kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((4,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, S, S), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, S, S), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, C, S, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, 3 * S), jnp.float32)],
        interpret=interpret,
    )(params, planes)


def _pass_params(inv_px):
    """Per-image (p1, q1, r1), (p2, q2, r2) from the inverse pixel matrix."""
    a, b, tx = inv_px[0, 0], inv_px[0, 1], inv_px[0, 2]
    c, d, ty = inv_px[1, 0], inv_px[1, 1], inv_px[1, 2]
    det = a * d - b * c
    q1 = b / d
    p1 = det / d
    r1 = tx - q1 * ty
    return (p1, q1, r1), (d, c, ty)


@functools.partial(jax.jit, static_argnames=("interpret",))
def affine_warp_batch(images, inv_norm, interpret: bool = False):
    """Batched inverse affine warp, Pallas two-pass.

    images: [K, S, S, C] float32 in [0, 1].
    inv_norm: [K, 3, 3] output->input affine in *normalized* [0,1] coords
              (the frame data/augment.py builds).
    Returns warped [K, S, S, C]; outside pixels are 0.
    """
    K, S = images.shape[0], images.shape[1]
    # normalized -> pixel frame (pixel-center convention, see _affine_warp)
    # x_n = (x_p + 0.5)/S  =>  M_px = D @ M_n @ D^-1 with the 0.5 folded in.
    half = 0.5
    scale = jnp.asarray([[S, 0, 0], [0, S, 0], [0, 0, 1]], jnp.float32)
    unscale = jnp.asarray(
        [[1.0 / S, 0, half / S], [0, 1.0 / S, half / S], [0, 0, 1]],
        jnp.float32)
    shift = jnp.asarray([[1, 0, -half], [0, 1, -half], [0, 0, 1]],
                        jnp.float32)
    inv_px = jnp.einsum("ij,kjl,lm->kim", shift @ scale, inv_norm, unscale)

    (p1, q1, r1), (p2, q2, r2) = jax.vmap(_pass_params)(inv_px)
    params1 = jnp.stack([p1, q1, r1, jnp.full_like(p1, S)], axis=-1)
    params2 = jnp.stack([p2, q2, r2, jnp.full_like(p2, S)], axis=-1)

    planes = jnp.transpose(images, (0, 3, 1, 2)).astype(jnp.float32)
    h = _warp_pass(planes, params1, interpret)             # x-pass
    h = jnp.transpose(h, (0, 1, 3, 2))                     # swap x<->y
    o = _warp_pass(h, params2, interpret)                  # y-pass
    o = jnp.transpose(o, (0, 1, 3, 2))
    return jnp.transpose(o, (0, 2, 3, 1))


def pallas_warp_available() -> bool:
    """True when the default backend can run the compiled kernel."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
