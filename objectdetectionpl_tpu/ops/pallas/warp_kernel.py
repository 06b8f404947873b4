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


def _pass_kernel(params_ref, img_ref, out_ref, inter, row_scratch):
    """One shear/scale pass over one channel plane of one image.

    params_ref: SMEM [K, 4] float32 (whole array, row = image program id) —
                (p, q, r, S) with resample index p*x + q*y + r for output
                pixel (y, x).
    img_ref/out_ref: VMEM [1, S, S] float32 (grid is (K, C): one program per
                channel plane, keeping the VMEM working set ~9 MB at S=640 —
                whole [C, S, S] blocks overflow the 16 MB scoped limit once
                the pipeline double-buffers them).
    inter: VMEM [1, TR, D] row-block intermediate on the *extended* domain
           u in [0, D): inter[0, t, u] = img[y, u + off_y] (zeros outside).
           D >= max|p| * S so the shared matrix position p*x stays inside
           the window for any per-row offset — sampling the shifted row on
           the un-extended [0, S) window silently zero-clips sources that
           are in range whenever p*x leaves [0, S-1].  Max |p| for SSR is
           1/((1-scale_limit)*cos(rotate_limit)) = 1.571 at the defaults
           (0.1 / 45 deg); the caller sizes D from its own bounds.
    row_scratch: VMEM [1, ~(2*S + D)] zero-padded row buffer.
    """
    S = img_ref.shape[1]
    TR, D = inter.shape[1], inter.shape[2]
    i = pl.program_id(0)
    p = params_ref[i, 0]
    q = params_ref[i, 1]
    r = params_ref[i, 2]

    # Shared scale matrix W[x_out, u] = tri(p * x_out - u) over the extended
    # domain, two-hot bilinear weights (the per-row shift already folded the
    # offset into u).
    xo = jax.lax.broadcasted_iota(jnp.int32, (S, D), 0).astype(jnp.float32)
    xi = jax.lax.broadcasted_iota(jnp.int32, (S, D), 1).astype(jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(p * xo - xi))

    # Row scratch: input row written at offset S each iteration; the flanks
    # stay zero (constant padding for the shift).
    row_scratch[:, :] = jnp.zeros_like(row_scratch)

    for blk in range(-(-S // TR)):          # static row blocks
        rows = min(TR, S - blk * TR)

        def body(t, _):
            y = blk * TR + t
            # offset for this output row: k + phi
            off = q * y.astype(jnp.float32) + r
            k = jnp.floor(off)
            phi = off - k
            ki = jnp.clip(k.astype(jnp.int32), -S, S - 1)
            row_scratch[:, S:2 * S] = img_ref[:, y, :]
            # Dynamic-start lane slices must be 128-aligned on TPU; a lane
            # *rotate* by a dynamic amount is supported (tpu.dynamic_rotate),
            # so realize row[u + k] as roll(buf, -(S+k))[u] — the buffer is
            # long enough (L >= 2S + D) that the window never wraps into
            # image content, only into zero flanks.
            buf = row_scratch[:, :]
            t0 = pltpu.roll(buf, -(S + ki), axis=1)[:, :D]       # row[u+k]
            t1 = pltpu.roll(buf, -(S + ki + 1), axis=1)[:, :D]   # row[u+k+1]
            inter[:, t, :] = t0 * (1.0 - phi) + t1 * phi
            return 0

        jax.lax.fori_loop(0, rows, body, 0)

        # Scale on the MXU: out[y, :] = inter[0, t, :] @ W^T.
        out_ref[0, blk * TR:blk * TR + rows, :] = jax.lax.dot_general(
            inter[0, :rows, :], w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


def _warp_pass(planes, params, interpret: bool, dom_mult: float = 1.7):
    """planes [K, C, S, S]; params [K, 4] (p, q, r, S).

    ``dom_mult``: extended-domain size factor — must cover the matrix
    positions p*x for x in [0, S), i.e. dom_mult >= max |p|.  For SSR the
    x-pass scale is p1 = 1 / (scale * cos(rot)) with scale >= 1 -
    scale_limit, so the caller derives dom_mult from its AugmentConfig
    bounds (augment_batch falls back to the XLA warp outside the kernel's
    validated range rot <= 45 deg / |p| <= 3)."""
    K, C, S = planes.shape[0], planes.shape[1], planes.shape[2]
    D = -(-int(dom_mult * S) // 128) * 128
    TR = min(128, S)
    return pl.pallas_call(
        _pass_kernel,
        grid=(K, C),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # whole [K, 4] params
            pl.BlockSpec((None, 1, S, S), lambda i, c: (i, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 1, S, S), lambda i, c: (i, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, C, S, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, TR, D), jnp.float32),
                        pltpu.VMEM((1, -(-(2 * S + D) // 128) * 128),
                                   jnp.float32)],
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


@functools.partial(jax.jit, static_argnames=("interpret", "dom_mult"))
def affine_warp_batch(images, inv_norm, interpret: bool | None = None,
                      dom_mult: float = 1.7):
    """Batched inverse affine warp, Pallas two-pass.

    images: [K, S, S, C] float32 in [0, 1].
    inv_norm: [K, 3, 3] output->input affine in *normalized* [0,1] coords
              (the frame data/augment.py builds).
    interpret: None -> compiled on TPU, interpret elsewhere (the compiled
               kernel only exists for the TPU backend).
    dom_mult: extended-domain factor, must be >= the max per-pass scale |p|
              (augment_batch derives it from its AugmentConfig bounds).
    Returns warped [K, S, S, C]; outside pixels are 0.
    """
    if interpret is None:
        interpret = not pallas_warp_available()
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
    h = _warp_pass(planes, params1, interpret, dom_mult)   # x-pass
    h = jnp.transpose(h, (0, 1, 3, 2))                     # swap x<->y
    o = _warp_pass(h, params2, interpret, dom_mult)        # y-pass
    o = jnp.transpose(o, (0, 1, 3, 2))
    return jnp.transpose(o, (0, 2, 3, 1))


def pallas_warp_available() -> bool:
    """True when the default backend can run the compiled kernel."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
