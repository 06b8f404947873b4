"""Host-side batching pipeline: parsed examples -> fixed-shape Batch.

Replaces the reference's DataLoader + collate_fn (dataset/Pascal.py:177-186):
host does decode + resize to the static img_size; normalization and all
augmentation run on device (see augment.py), keeping the host loop minimal.

drop_last=True like the reference dataloaders (dataset/Pascal.py:255-276).
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np

from objectdetectionpl_tpu.data.types import Batch, pad_targets, topleft_to_center_norm


def _resize(img: np.ndarray, size: int) -> np.ndarray:
    try:
        import cv2
        return cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
    except ImportError:
        from PIL import Image
        return np.asarray(
            Image.fromarray(img).resize((size, size), Image.BILINEAR))


def _resize_letterbox(img: np.ndarray, size: int):
    """Aspect-preserving resize + centered gray padding (YOLOv5 letterbox).

    Returns (canvas, scale, pad_x, pad_y) in pixels.  The reference's v5
    pipeline uses plain A.Resize (dataset/Pascal.py:213-229); letterbox is the
    BASELINE.json v5 configuration.
    """
    h, w = img.shape[:2]
    scale = size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = _resize_exact(img, nw, nh)
    canvas = np.full((size, size, 3), 114, np.uint8)
    pad_y, pad_x = (size - nh) // 2, (size - nw) // 2
    canvas[pad_y:pad_y + nh, pad_x:pad_x + nw] = resized
    return canvas, scale, pad_x, pad_y


def _resize_exact(img: np.ndarray, w: int, h: int) -> np.ndarray:
    try:
        import cv2
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    except ImportError:
        from PIL import Image
        return np.asarray(Image.fromarray(img).resize((w, h), Image.BILINEAR))


class Loader:
    """Iterates padded batches over a parser (or an index subset of one)."""

    def __init__(self, parser, img_size: int, batch_size: int,
                 max_boxes: int = 100, shuffle: bool = False, seed: int = 0,
                 indices: Optional[Sequence[int]] = None,
                 drop_last: bool = True, limit_batches: Optional[int] = None,
                 letterbox: bool = False, num_shards: int = 1,
                 shard_id: int = 0, cache_dir: Optional[str] = None,
                 read_ahead_batches: int = 32):
        self.parser = parser
        self.img_size = img_size
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.indices = (np.asarray(indices, np.int64) if indices is not None
                        else np.arange(len(parser)))
        self.drop_last = drop_last
        self.limit_batches = limit_batches
        self.letterbox = letterbox
        # Per-host input sharding (multi-process data parallelism): every
        # host shuffles the FULL index list with the same seed, then takes a
        # process-strided, equal-length slice — the DistributedSampler
        # analogue.  Equal lengths keep hosts in lockstep at collectives.
        self.num_shards = max(int(num_shards), 1)
        self.shard_id = int(shard_id)
        # Packed pre-decoded cache (data/cache.py): when cache_dir holds a
        # valid matching cache, epochs skip decode/resize entirely — a
        # memmap gather per batch, emitting uint8 (the Trainer normalizes on
        # device).  The 1-core host cannot otherwise keep up with the v5e
        # (benchmarks/host_pipeline_bench.py).
        self.cache = None
        self.read_ahead_batches = max(int(read_ahead_batches), 0)
        if cache_dir:
            from objectdetectionpl_tpu.data import cache as cache_lib
            self.cache = cache_lib.maybe_open(cache_dir, len(parser),
                                              img_size, letterbox)

    def _shard_len(self) -> int:
        return len(self.indices) // self.num_shards

    def __len__(self):
        n_items = (self._shard_len() if self.num_shards > 1
                   else len(self.indices))
        n = n_items // self.batch_size
        if not self.drop_last and n_items % self.batch_size:
            n += 1
        return min(n, self.limit_batches) if self.limit_batches else n

    def _fused_batch(self, recs):
        """Native fused JPEG decode + preprocess (one C++ call per batch).

        recs: [(path, boxes top-left px, labels), ...].  Returns None if the
        native decode fails for any image (caller falls back per-batch).
        """
        from objectdetectionpl_tpu.data import native

        S = self.img_size
        out = native.decode_preproc_batch([r[0] for r in recs], S,
                                          self.letterbox)
        if out is None:
            return None
        imgs, ows, ohs, scales, pad_xs, pad_ys, ok = out
        if not ok.all():
            return None
        boxes_l = []
        for (_, bx, _), ow, oh, s, px, py in zip(recs, ows, ohs, scales,
                                                 pad_xs, pad_ys):
            if self.letterbox:
                boxes_l.append(_letterbox_boxes(bx, float(s), float(px),
                                                float(py), S))
            else:
                boxes_l.append(topleft_to_center_norm(bx, int(ow), int(oh)))
        boxes, labels, mask = pad_targets(boxes_l, [r[2] for r in recs],
                                          self.max_boxes)
        return Batch(imgs, labels, boxes, mask)

    def __iter__(self) -> Iterator[Batch]:
        order = self.indices.copy()
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
        self.epoch += 1
        if self.num_shards > 1:
            order = order[self.shard_id::self.num_shards][:self._shard_len()]

        n_batches = len(self)
        if self.cache is not None:
            # Cold-page read-ahead: advise the next ``ra`` batches' rows
            # before gathering the current one, so the kernel pulls upcoming
            # pages from disk while the device consumes this batch
            # (cache.PackedCache.willneed; closes the 450-vs-795 img/s
            # first-epoch gap, BASELINE.md round 5).
            bs, ra = self.batch_size, self.read_ahead_batches
            if ra:
                self.cache.willneed(order[:ra * bs])
            for b in range(n_batches):
                idx = order[b * bs:(b + 1) * bs]
                if ra:
                    self.cache.willneed(
                        order[(b + ra) * bs:(b + ra + 1) * bs])
                yield self.cache.batch(idx, self.max_boxes)
            return

        from objectdetectionpl_tpu.data import native

        use_native = native.available()
        fused = use_native and hasattr(self.parser, "record")
        S = self.img_size
        for b in range(n_batches):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]

            if fused:
                recs = [self.parser.record(int(i)) for i in idx]
                if all(r[0].lower().endswith((".jpg", ".jpeg"))
                       for r in recs):
                    batch = self._fused_batch(recs)
                    if batch is not None:
                        yield batch
                        continue

            examples = [self.parser[int(i)] for i in idx]
            labels_l = [ex.labels for ex in examples]
            boxes_l = []

            if use_native:
                packed = native.preproc_batch(
                    [ex.image for ex in examples], S, self.letterbox)
            else:
                packed = None

            if packed is not None:
                imgs, scales, pad_xs, pad_ys = packed
                for ex, s, px, py in zip(examples, scales, pad_xs, pad_ys):
                    h, w = ex.image.shape[:2]
                    if self.letterbox:
                        boxes_l.append(_letterbox_boxes(ex.boxes, s, px, py, S))
                    else:
                        boxes_l.append(topleft_to_center_norm(ex.boxes, w, h))
            else:
                images = []
                for ex in examples:
                    h, w = ex.image.shape[:2]
                    if self.letterbox:
                        canvas, s, px, py = _resize_letterbox(ex.image, S)
                        images.append(canvas)
                        boxes_l.append(_letterbox_boxes(ex.boxes, s, px, py, S))
                    else:
                        images.append(_resize(ex.image, S))
                        boxes_l.append(topleft_to_center_norm(ex.boxes, w, h))
                imgs = (np.stack(images).astype(np.float32) / 255.0)

            boxes, labels, mask = pad_targets(boxes_l, labels_l, self.max_boxes)
            yield Batch(imgs, labels, boxes, mask)


def _letterbox_boxes(boxes_px: np.ndarray, s: float, px: float, py: float,
                     S: int) -> np.ndarray:
    """Top-left pixel xywh -> normalized center xywh under letterbox."""
    bx = boxes_px.astype(np.float32).reshape(-1, 4)
    return np.stack([
        ((bx[:, 0] + bx[:, 2] / 2) * s + px) / S,
        ((bx[:, 1] + bx[:, 3] / 2) * s + py) / S,
        bx[:, 2] * s / S, bx[:, 3] * s / S], -1)


def prefetch(gen, depth: int = 2):
    """Run a generator in a background thread with a bounded queue.

    Used to overlap host-side decode/preproc (and async device-put dispatch)
    with device compute — the double-buffered input pipeline that keeps the
    train step device-bound (the 1-core host loop was epoch-dominant).
    JAX dispatch is thread-safe; items are consumed in order.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(int(depth), 1))
    end = object()
    err = []

    def worker():
        try:
            for item in gen:
                q.put(item)
        except BaseException as e:      # propagate into the consumer
            err.append(e)
        finally:
            q.put(end)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is end:
            if err:
                raise err[0]
            return
        yield item


def random_split_indices(n: int, frac: float = 0.8, seed: int = 42):
    """80/20 split (torch random_split parity in spirit; seeded for
    reproducibility — the reference's split is unseeded, dataset/Pascal.py:205)."""
    rng = np.random.RandomState(seed)
    order = rng.permutation(n)
    k = int(round(n * frac))
    return order[:k], order[k:]
