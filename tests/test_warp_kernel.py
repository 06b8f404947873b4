"""Pallas two-pass affine warp kernel vs the XLA gather warp.

The kernel (ops/pallas/warp_kernel.py) replaces the gather-bound XLA bilinear
warp for ShiftScaleRotate (reference semantics dataset/Pascal.py:213-229).
Interior pixels must match the XLA path exactly on piecewise-linear images
(bilinear chains are exact there); the only tolerated divergence is the
<=2-texel transition band where the source leaves the image (multipass
zero-padding smears the cut over two texels instead of one).

Runs in Pallas interpret mode on CPU (conftest forces the cpu backend).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from objectdetectionpl_tpu.data.augment import (AugmentConfig, _affine_warp,
                                                _rot_shift_scale_matrix,
                                                augment_batch)
from objectdetectionpl_tpu.ops.pallas.warp_kernel import affine_warp_batch


def _ramp(S):
    ys, xs = np.meshgrid(np.arange(S), np.arange(S), indexing="ij")
    return np.stack([xs, ys, xs + 2 * ys], -1).astype(np.float32) / (3 * S)


def _source_interior_mask(S, inv, margin=2.5):
    """Output pixels whose source (and pass-1 intermediate source) stays
    ``margin`` px inside the image on both axes."""
    ys, xs = np.meshgrid(np.arange(S), np.arange(S), indexing="ij")
    half = 0.5
    scale = np.array([[S, 0, 0], [0, S, 0], [0, 0, 1]], np.float32)
    unscale = np.array([[1 / S, 0, half / S], [0, 1 / S, half / S], [0, 0, 1]],
                       np.float32)
    shift = np.array([[1, 0, -half], [0, 1, -half], [0, 0, 1]], np.float32)
    m = shift @ scale @ np.asarray(inv) @ unscale
    sx = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
    sy = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
    a, b, tx = m[0]
    c, d, ty = m[1]
    s1 = (a * d - b * c) / d * xs + b / d * ys + (tx - b / d * ty)
    lo, hi = margin, S - 1 - margin
    return ((sx >= lo) & (sx <= hi) & (sy >= lo) & (sy <= hi)
            & (s1 >= lo) & (s1 <= hi))


@pytest.mark.parametrize("deg,scale,tx,ty", [
    (20.0, 1.05, 0.03, -0.02),
    (-41.0, 0.92, -0.06, 0.05),
    (44.0, 1.1, 0.06, 0.06),    # max p1 = scale/cos(rot) ~ 1.55
    (0.0, 1.0, 0.0, 0.0),
])
def test_pallas_warp_matches_xla_interior(deg, scale, tx, ty):
    S = 32
    img = jnp.asarray(_ramp(S))
    fwd = _rot_shift_scale_matrix(jnp.deg2rad(deg), scale, tx, ty)
    inv = jnp.linalg.inv(fwd)
    ref = np.asarray(_affine_warp(img, inv))
    out = np.asarray(affine_warp_batch(img[None], inv[None],
                                       interpret=True)[0])
    safe = _source_interior_mask(S, inv)
    np.testing.assert_allclose(out[safe], ref[safe], atol=2e-6)
    # boundary band: bounded by the image range (sanity, not equality)
    assert np.abs(out - ref).max() <= 1.0 + 1e-6


def test_pallas_warp_identity_exact():
    S = 32
    img = jnp.asarray(_ramp(S))
    out = affine_warp_batch(img[None], jnp.eye(3)[None], interpret=True)[0]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_pallas_warp_batch_mixed_params():
    """Batched images get their own matrices (params indexed by program).

    Ramp images: interior equality with the XLA path holds only on
    piecewise-linear content (on arbitrary images the two-pass resample
    differs by its documented half-texel smoothing everywhere).
    """
    S = 32
    K = 3
    base = _ramp(S)
    imgs = jnp.asarray(np.stack([base * (1.0 - 0.2 * i) for i in range(K)]))
    degs = [15.0, -30.0, 5.0]
    invs = jnp.stack([jnp.linalg.inv(_rot_shift_scale_matrix(
        jnp.deg2rad(d), 1.0 + 0.02 * i, 0.01 * i, -0.01)) for i, d in
        enumerate(degs)])
    out = affine_warp_batch(imgs, invs, interpret=True)
    for i in range(K):
        ref = np.asarray(_affine_warp(imgs[i], invs[i]))
        safe = _source_interior_mask(S, invs[i])
        np.testing.assert_allclose(np.asarray(out[i])[safe], ref[safe],
                                   atol=2e-6)
