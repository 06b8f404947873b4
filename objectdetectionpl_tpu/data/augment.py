"""Device-side, jitted batch augmentation.

The reference runs Albumentations per image in 5 CPU dataloader workers
(dataset/Pascal.py:213-229): Resize + HorizontalFlip(p=.2) + VerticalFlip(p=.2)
+ ShiftScaleRotate(p=.2) + RandomBrightnessContrast(p=.2) + RGBShift(30,p=.2).
Here the same pipeline is one jitted, vmapped function over the whole batch on
device — the host only decodes and resizes (SURVEY.md §7 step 3).

Geometry ops transform the center-form normalized boxes analytically; rotation
maps boxes to the enclosing axis-aligned box (Albumentations semantics).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class AugmentConfig(NamedTuple):
    p_hflip: float = 0.2
    p_vflip: float = 0.2
    p_ssr: float = 0.2          # shift-scale-rotate
    shift_limit: float = 0.0625
    scale_limit: float = 0.1
    rotate_limit: float = 45.0  # degrees
    p_brightness: float = 0.2
    brightness_limit: float = 0.2
    contrast_limit: float = 0.2
    p_rgb_shift: float = 0.2
    rgb_shift_limit: float = 30.0 / 255.0


def _affine_warp(img, matrix):
    """Inverse-warp one HWC image by a 3x3 affine matrix (output->input)."""
    H, W, _ = img.shape
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(xx)
    coords = jnp.stack([xx, yy, ones], 0).reshape(3, -1)       # [3, H*W]
    src = matrix @ coords                                      # [3, H*W]
    sx, sy = src[0], src[1]
    warp = functools.partial(
        jax.scipy.ndimage.map_coordinates, order=1, mode="constant", cval=0.0)
    out = jax.vmap(lambda c: warp(c, [sy, sx]), in_axes=-1, out_axes=-1)(img)
    return out.reshape(H, W, -1)


def _rot_shift_scale_matrix(angle_rad, scale, tx, ty):
    """Forward affine (input->output) around the image center, normalized
    [0,1] coordinate frame."""
    c, s = jnp.cos(angle_rad), jnp.sin(angle_rad)
    rot = jnp.array([[c * scale, -s * scale, 0.0],
                     [s * scale, c * scale, 0.0],
                     [0.0, 0.0, 1.0]])
    center = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
    uncenter = jnp.array([[1.0, 0.0, -0.5], [0.0, 1.0, -0.5], [0.0, 0.0, 1.0]])
    shift = jnp.array([[1.0, 0.0, tx], [0.0, 1.0, ty], [0.0, 0.0, 1.0]])
    return shift @ center @ rot @ uncenter


def _transform_boxes(boxes, mask, fwd):
    """Map center-form normalized boxes through a forward affine; enclose."""
    cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    corners_x = jnp.stack([cx - w / 2, cx + w / 2, cx - w / 2, cx + w / 2], -1)
    corners_y = jnp.stack([cy - h / 2, cy - h / 2, cy + h / 2, cy + h / 2], -1)
    ones = jnp.ones_like(corners_x)
    pts = jnp.stack([corners_x, corners_y, ones], -2)          # [M, 3, 4]
    out = jnp.einsum("ij,mjk->mik", fwd, pts)
    x1 = jnp.clip(out[:, 0].min(-1), 0.0, 1.0)
    x2 = jnp.clip(out[:, 0].max(-1), 0.0, 1.0)
    y1 = jnp.clip(out[:, 1].min(-1), 0.0, 1.0)
    y2 = jnp.clip(out[:, 1].max(-1), 0.0, 1.0)
    new = jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1)
    # drop boxes that left the frame entirely
    alive = mask & (new[..., 2] > 1e-4) & (new[..., 3] > 1e-4)
    return jnp.where(mask[..., None], new, boxes), alive


def _augment_one(rng, img, boxes, mask, cfg: AugmentConfig):
    r = jax.random.split(rng, 8)

    # Horizontal flip (p=.2): cx -> 1 - cx.
    do = jax.random.uniform(r[0]) < cfg.p_hflip
    img = jnp.where(do, img[:, ::-1, :], img)
    boxes = jnp.where(do, boxes.at[..., 0].set(1.0 - boxes[..., 0]), boxes)

    # Vertical flip (p=.2).
    do = jax.random.uniform(r[1]) < cfg.p_vflip
    img = jnp.where(do, img[::-1, :, :], img)
    boxes = jnp.where(do, boxes.at[..., 1].set(1.0 - boxes[..., 1]), boxes)

    # Shift-scale-rotate (p=.2, Albumentations default limits).
    do = jax.random.uniform(r[2]) < cfg.p_ssr
    ang = jnp.deg2rad(jax.random.uniform(
        r[3], minval=-cfg.rotate_limit, maxval=cfg.rotate_limit)) * do
    scale = 1.0 + jax.random.uniform(
        r[4], minval=-cfg.scale_limit, maxval=cfg.scale_limit) * do
    txy = jax.random.uniform(r[5], (2,), minval=-cfg.shift_limit,
                             maxval=cfg.shift_limit) * do
    fwd = _rot_shift_scale_matrix(ang, scale, txy[0], txy[1])
    inv = jnp.linalg.inv(fwd)
    img = _affine_warp(img, inv)
    boxes, mask = _transform_boxes(boxes, mask, fwd)

    # Random brightness/contrast (p=.2).
    do = jax.random.uniform(r[6]) < cfg.p_brightness
    beta = jax.random.uniform(r[7], minval=-cfg.brightness_limit,
                              maxval=cfg.brightness_limit) * do
    alpha = 1.0 + jax.random.uniform(
        jax.random.fold_in(r[7], 1), minval=-cfg.contrast_limit,
        maxval=cfg.contrast_limit) * do
    img = jnp.clip(img * alpha + beta, 0.0, 1.0)

    # RGB shift (p=.2, limit 30/255).
    do = jax.random.uniform(jax.random.fold_in(r[6], 1)) < cfg.p_rgb_shift
    shift = jax.random.uniform(jax.random.fold_in(r[6], 2), (3,),
                               minval=-cfg.rgb_shift_limit,
                               maxval=cfg.rgb_shift_limit) * do
    img = jnp.clip(img + shift, 0.0, 1.0)

    return img, boxes, mask


@functools.partial(jax.jit, static_argnames=("cfg",))
def augment_batch(rng, images, boxes, mask, cfg: AugmentConfig = AugmentConfig()):
    """Batched augmentation: images [B,S,S,3] in [0,1], boxes center-norm."""
    rngs = jax.random.split(rng, images.shape[0])
    return jax.vmap(lambda r, i, b, m: _augment_one(r, i, b, m, cfg))(
        rngs, images, boxes, mask)
