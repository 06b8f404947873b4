"""Packed pre-decoded dataset cache: memmapped uint8 image shards.

The reference hides its decode cost behind 5 dataloader worker processes
(dataset/Pascal.py:255-276); this host has ONE core, so on real datasets the
JPEG decode + resize would bound training (VERDICT r2 item 6).  The cache
pays that cost once: a single pass through a parser writes every image,
already resized/letterboxed to the training size, into one uint8 memmap
(plus the normalized targets), after which a Loader epoch is a fancy-index
gather — no decode, no resize, no per-image Python.

Layout under ``cache_dir``::

    images.u8    raw memmap [N, S, S, 3] uint8 (post-resize, RGB)
    targets.npz  boxes [T,4] f32 normalized center xywh, labels [T] i32,
                 offsets [N+1] i64 (ragged row spans)
    meta.json    {"n", "img_size", "letterbox", "version"}

Images stay uint8 end-to-end: the Loader emits uint8 batches (4x less
host->device traffic than f32) and the Trainer normalizes on device
(train/loop.py ``_device_batch``).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

_VERSION = 1


def cache_valid(cache_dir: str, n: int, img_size: int,
                letterbox: bool) -> bool:
    """True if ``cache_dir`` holds a complete cache matching the request."""
    meta_path = os.path.join(cache_dir, "meta.json")
    if not os.path.exists(meta_path):
        return False
    try:
        with open(meta_path) as f:
            meta = json.load(f)
    except (OSError, ValueError):
        return False
    return (meta.get("version") == _VERSION and meta.get("n") == n
            and meta.get("img_size") == img_size
            and bool(meta.get("letterbox")) == bool(letterbox)
            and os.path.exists(os.path.join(cache_dir, "images.u8"))
            and os.path.exists(os.path.join(cache_dir, "targets.npz")))


def build_packed_cache(parser, img_size: int, cache_dir: str,
                       letterbox: bool = False, log_every: int = 0) -> str:
    """One pass through ``parser`` -> packed cache directory (idempotent).

    Uses the same resize/letterbox + box-normalization code as the live
    Loader path so cached and uncached epochs are numerically identical
    (tests/test_data.py cache round-trip).
    """
    from objectdetectionpl_tpu.data.pipeline import (
        _letterbox_boxes, _resize, _resize_letterbox)
    from objectdetectionpl_tpu.data.types import topleft_to_center_norm

    n, S = len(parser), img_size
    if cache_valid(cache_dir, n, S, letterbox):
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)

    tmp = os.path.join(cache_dir, "images.u8.tmp")
    mm = np.memmap(tmp, np.uint8, "w+", shape=(n, S, S, 3))
    boxes_l, labels_l, offsets = [], [], [0]
    for i in range(n):
        ex = parser[i]
        h, w = ex.image.shape[:2]
        if letterbox:
            canvas, s, px, py = _resize_letterbox(ex.image, S)
            mm[i] = canvas
            bx = _letterbox_boxes(ex.boxes, s, px, py, S)
        else:
            mm[i] = _resize(ex.image, S)
            bx = topleft_to_center_norm(ex.boxes, w, h)
        boxes_l.append(bx.reshape(-1, 4))
        labels_l.append(np.asarray(ex.labels, np.int32).reshape(-1))
        offsets.append(offsets[-1] + len(labels_l[-1]))
        if log_every and (i + 1) % log_every == 0:
            print(f"[cache] {i + 1}/{n}", flush=True)
    mm.flush()
    del mm
    os.replace(tmp, os.path.join(cache_dir, "images.u8"))

    np.savez(os.path.join(cache_dir, "targets.npz"),
             boxes=(np.concatenate(boxes_l) if offsets[-1]
                    else np.zeros((0, 4), np.float32)).astype(np.float32),
             labels=(np.concatenate(labels_l) if offsets[-1]
                     else np.zeros((0,), np.int32)),
             offsets=np.asarray(offsets, np.int64))
    with open(os.path.join(cache_dir, "meta.json"), "w") as f:
        json.dump({"version": _VERSION, "n": n, "img_size": S,
                   "letterbox": bool(letterbox)}, f)
    return cache_dir


class PackedCache:
    """Reader over a packed cache directory (memmap-backed, zero decode)."""

    def __init__(self, cache_dir: str):
        with open(os.path.join(cache_dir, "meta.json")) as f:
            self.meta = json.load(f)
        n, S = self.meta["n"], self.meta["img_size"]
        self.images = np.memmap(os.path.join(cache_dir, "images.u8"),
                                np.uint8, "r", shape=(n, S, S, 3))
        t = np.load(os.path.join(cache_dir, "targets.npz"))
        self.boxes, self.labels = t["boxes"], t["labels"]
        self.offsets = t["offsets"]

    def __len__(self):
        return self.meta["n"]

    def willneed(self, idx) -> None:
        """Kernel read-ahead for the rows in ``idx`` (madvise WILLNEED).

        The cold-cache epoch is page-fault/disk-bound (~450 img/s measured
        round 4 vs the 795 img/s device demand, BASELINE.md): the gather in
        :meth:`batch` faults each 4 KB page in on demand, serially.  Advising
        the *next* batches' rows while the device chews on the current batch
        turns those synchronous faults into overlapped disk read-ahead.
        No-op (never an error) where madvise is unavailable.
        """
        import mmap
        base = self.images.base
        if not (isinstance(base, mmap.mmap) and hasattr(base, "madvise")
                and hasattr(mmap, "MADV_WILLNEED")):
            return
        S = self.meta["img_size"]
        row = S * S * 3
        page = mmap.PAGESIZE
        total = len(base)
        for i in np.asarray(idx).ravel():
            off = (int(i) * row // page) * page          # page-align down
            ln = min(row + page, total - off)
            if ln > 0:
                try:
                    base.madvise(mmap.MADV_WILLNEED, off, ln)
                except (OSError, ValueError):  # pragma: no cover
                    return

    def batch(self, idx: np.ndarray, max_boxes: int):
        """Gather a padded uint8 batch for the given index array."""
        from objectdetectionpl_tpu.data.types import Batch, pad_targets

        imgs = np.asarray(self.images[idx])          # one memmap gather
        boxes_l = [self.boxes[self.offsets[i]:self.offsets[i + 1]]
                   for i in idx]
        labels_l = [self.labels[self.offsets[i]:self.offsets[i + 1]]
                    for i in idx]
        boxes, labels, mask = pad_targets(boxes_l, labels_l, max_boxes)
        return Batch(imgs, labels, boxes, mask)


def maybe_open(cache_dir: Optional[str], n: int, img_size: int,
               letterbox: bool) -> Optional[PackedCache]:
    """Open ``cache_dir`` if it holds a valid matching cache, else None."""
    if not cache_dir or not cache_valid(cache_dir, n, img_size, letterbox):
        return None
    return PackedCache(cache_dir)
