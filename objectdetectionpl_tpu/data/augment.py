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


# --- mosaic (YOLOv5-style 4-way paste, device-side) --------------------------------


@functools.partial(jax.jit, static_argnames=("p",))
def mosaic_batch(rng, images, boxes, labels, mask, p: float = 0.5):
    """4-image mosaic: output i pastes images (i..i+3 mod B) into the four
    quadrants around a random center (the YOLOv5 mosaic the BASELINE config
    names; the reference itself never implements it — its v5 pipeline uses
    plain Resize, dataset/Pascal.py:213-229).

    images [B,S,S,3]; boxes [B,M,4] center-norm; labels [B,M]; mask [B,M].
    Box capacity: each output keeps the M largest-area candidate boxes of the
    4M composited ones.  Applied with probability ``p`` per image.
    """
    B, S = images.shape[0], images.shape[1]
    M = boxes.shape[1]
    r_center, r_apply = jax.random.split(rng)
    centers = jax.random.uniform(r_center, (B, 2), minval=0.3, maxval=0.7)
    apply = jax.random.uniform(r_apply, (B,)) < p

    def one(i, center):
        cx, cy = center[0], center[1]
        # quadrant origins/sizes in normalized coords: TL, TR, BL, BR
        origins = jnp.stack([jnp.array([0.0, 0.0]), jnp.array([cx, 0.0]),
                             jnp.array([0.0, cy]), jnp.stack([cx, cy])])
        sizes = jnp.stack([jnp.stack([cx, cy]),
                           jnp.stack([1 - cx, cy]),
                           jnp.stack([cx, 1 - cy]),
                           jnp.stack([1 - cx, 1 - cy])])

        canvas = jnp.zeros_like(images[0])
        out_boxes, out_labels, out_valid, out_area = [], [], [], []
        ys = jnp.arange(S, dtype=jnp.float32)[:, None] / S
        xs = jnp.arange(S, dtype=jnp.float32)[None, :] / S
        for k in range(4):
            src = jax.tree.map(lambda a: a[(i + k) % B],
                               (images, boxes, labels, mask))
            img_k, box_k, lab_k, msk_k = src
            o, sz = origins[k], sizes[k]
            scaled = jax.image.scale_and_translate(
                img_k, (S, S, 3), (0, 1),
                jnp.stack([sz[1], sz[0]]) ,
                jnp.stack([o[1], o[0]]) * S, method="linear")
            in_quad = ((xs >= o[0]) & (xs < o[0] + sz[0])
                       & (ys >= o[1]) & (ys < o[1] + sz[1]))
            canvas = jnp.where(in_quad[:, :, None], scaled, canvas)

            nb = jnp.stack([o[0] + box_k[:, 0] * sz[0],
                            o[1] + box_k[:, 1] * sz[1],
                            box_k[:, 2] * sz[0],
                            box_k[:, 3] * sz[1]], axis=-1)
            out_boxes.append(nb)
            out_labels.append(lab_k)
            out_valid.append(msk_k)
            out_area.append(jnp.where(msk_k, nb[:, 2] * nb[:, 3], -1.0))

        all_boxes = jnp.concatenate(out_boxes)          # [4M, 4]
        all_labels = jnp.concatenate(out_labels)
        all_valid = jnp.concatenate(out_valid)
        all_area = jnp.concatenate(out_area)
        _, top = jax.lax.top_k(all_area, M)             # M largest boxes
        return (canvas, all_boxes[top], all_labels[top],
                all_valid[top] & (all_area[top] > 0))

    m_imgs, m_boxes, m_labels, m_mask = jax.vmap(one)(
        jnp.arange(B), centers)
    sel = lambda a, b: jnp.where(
        apply.reshape((B,) + (1,) * (a.ndim - 1)), a, b)
    return (sel(m_imgs, images), sel(m_boxes, boxes),
            sel(m_labels, labels), sel(m_mask, mask))
