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
    """Inverse-warp one HWC image by a 3x3 affine matrix (output->input).

    ``matrix`` maps *normalized* [0,1] output coords to normalized input
    coords (the frame _rot_shift_scale_matrix builds); pixel coords use the
    pixel-center convention x_n = (x_p + 0.5) / W so a rotation about
    normalized 0.5 rotates about the true image center.  (Regression: pixel
    coords were previously fed to the normalized matrix directly, rotating
    the image about the corner while boxes rotated about the center.)

    Hand-rolled bilinear warp gathering whole RGB pixels (one take per
    corner) — ~3x fewer gather ops than per-channel map_coordinates, the
    hot spot of device-side augmentation.
    """
    H, W, C = img.shape
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    sx = (matrix[0, 0] * xx + matrix[0, 1] * yy + matrix[0, 2]) * W - 0.5
    sy = (matrix[1, 0] * xx + matrix[1, 1] * yy + matrix[1, 2]) * H - 0.5

    inside = (sx >= 0) & (sx <= W - 1) & (sy >= 0) & (sy <= H - 1)
    sx = jnp.clip(sx, 0.0, W - 1.0)
    sy = jnp.clip(sy, 0.0, H - 1.0)
    x0 = sx.astype(jnp.int32)
    y0 = sy.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    dx = (sx - x0)[..., None]
    dy = (sy - y0)[..., None]

    flat = img.reshape(-1, C)
    take = lambda yi, xi: jnp.take(flat, (yi * W + xi).reshape(-1),
                                   axis=0).reshape(H, W, C)
    top = take(y0, x0) * (1 - dx) + take(y0, x1) * dx
    bot = take(y1, x0) * (1 - dx) + take(y1, x1) * dx
    out = top * (1 - dy) + bot * dy
    return jnp.where(inside[..., None], out, 0.0)   # constant padding


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


def _augment_cheap(u, img, boxes, mask, cfg: AugmentConfig):
    """Flips + color jitter for one image (u: [14] pre-drawn uniforms)."""
    span = lambda v, lim: (v * 2.0 - 1.0) * lim

    # Horizontal flip (p=.2): cx -> 1 - cx.
    do = u[0] < cfg.p_hflip
    img = jnp.where(do, img[:, ::-1, :], img)
    boxes = jnp.where(do, boxes.at[..., 0].set(1.0 - boxes[..., 0]), boxes)

    # Vertical flip (p=.2).
    do = u[1] < cfg.p_vflip
    img = jnp.where(do, img[::-1, :, :], img)
    boxes = jnp.where(do, boxes.at[..., 1].set(1.0 - boxes[..., 1]), boxes)

    # Random brightness/contrast (p=.2).
    do = u[7] < cfg.p_brightness
    beta = span(u[8], cfg.brightness_limit) * do
    alpha = 1.0 + span(u[9], cfg.contrast_limit) * do
    img = jnp.clip(img * alpha + beta, 0.0, 1.0)

    # RGB shift (p=.2, limit 30/255).
    do = u[10] < cfg.p_rgb_shift
    shift = span(u[11:14], cfg.rgb_shift_limit) * do
    img = jnp.clip(img + shift, 0.0, 1.0)

    return img, boxes, mask


def _ssr_params(u, cfg: AugmentConfig):
    """(fwd 3x3 matrix, applied?) for shift-scale-rotate from uniforms."""
    span = lambda v, lim: (v * 2.0 - 1.0) * lim
    do = u[2] < cfg.p_ssr
    ang = jnp.deg2rad(span(u[3], cfg.rotate_limit)) * do
    scale = 1.0 + span(u[4], cfg.scale_limit) * do
    tx = span(u[5], cfg.shift_limit) * do
    ty = span(u[6], cfg.shift_limit) * do
    return _rot_shift_scale_matrix(ang, scale, tx, ty), do


@functools.partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def augment_batch(rng, images, boxes, mask, cfg: AugmentConfig = AugmentConfig(),
                  use_pallas: bool | None = None):
    """Batched augmentation: images [B,S,S,3] in [0,1], boxes center-norm.

    All randomness is one batched uniform draw (per-image threefry chains
    cost ~80 ms/batch on TPU).  The bilinear warp is the expensive op
    (gather-bound under XLA: ~1e8 taps/s), so (a) it runs on a fixed-size
    subset of ~2*p_ssr*B slots — the images whose coin actually selected
    shift-scale-rotate — instead of warping the whole batch through an
    identity matrix, and (b) on TPU it dispatches to the gather-free Pallas
    two-pass kernel (ops/pallas/warp_kernel.py; ``use_pallas`` overrides the
    backend autodetect).  Box transforms are cheap and run for every image.
    """
    B = images.shape[0]
    u = jax.random.uniform(rng, (B, 14))
    images, boxes, mask = jax.vmap(
        lambda uu, i, b, m: _augment_cheap(uu, i, b, m, cfg))(
        u, images, boxes, mask)

    # K warp slots claimed by the smallest ssr coins (coins < p_ssr select).
    # SSR is applied iff selected AND slotted; with K = 2*p*B the overflow
    # probability is tiny (Chernoff) and overflow entries simply skip SSR,
    # keeping image and boxes consistent.
    K = max(1, min(B, int(round(B * min(2.0 * cfg.p_ssr, 1.0)))))
    _, top = jax.lax.top_k(-u[:, 2], K)
    covered = jnp.zeros((B,), bool).at[top].set(True)

    fwd, do = jax.vmap(lambda uu: _ssr_params(uu, cfg))(u)
    applied = do & covered
    fwd = jnp.where(applied[:, None, None], fwd, jnp.eye(3)[None])
    boxes, mask = jax.vmap(_transform_boxes)(boxes, mask, fwd)

    inv = jax.vmap(jnp.linalg.inv)(fwd[top])
    # Pallas two-pass kernel validity: the x-pass scale is
    # p1 = 1 / (scale * cos(rot)) and the row-shift factor is q1 = tan(rot);
    # the kernel's roll-based shift requires |q1| <= 1 (rot <= 45 deg) and
    # its extended domain must cover p1 (sized from the cfg bound below).
    # Outside that validated range, fall back to the XLA gather warp.
    import math
    theta = math.radians(min(abs(cfg.rotate_limit), 89.0))
    p_max = 1.0 / max((1.0 - abs(cfg.scale_limit)) * math.cos(theta), 1e-6)
    pallas_ok = (abs(cfg.rotate_limit) <= 45.0 + 1e-6
                 and abs(cfg.scale_limit) < 0.5
                 and abs(cfg.shift_limit) <= 0.5 and p_max <= 3.0)
    if use_pallas is None:
        from objectdetectionpl_tpu.ops.pallas.warp_kernel import \
            pallas_warp_available
        use_pallas = pallas_warp_available() and pallas_ok
    elif use_pallas and not pallas_ok:
        import warnings
        warnings.warn(
            f"AugmentConfig SSR bounds (rotate {cfg.rotate_limit}, scale "
            f"{cfg.scale_limit}, shift {cfg.shift_limit}) exceed the Pallas "
            f"warp kernel's validated range; using the XLA warp instead")
        use_pallas = False
    if use_pallas:
        from objectdetectionpl_tpu.ops.pallas.warp_kernel import \
            affine_warp_batch
        warped = affine_warp_batch(images[top], inv,
                                   dom_mult=max(1.6, 1.15 * p_max))
    else:
        warped = jax.vmap(_affine_warp)(images[top], inv)
    use = applied[top][:, None, None, None]
    images = images.at[top].set(jnp.where(use, warped, images[top]))
    return images, boxes, mask


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
