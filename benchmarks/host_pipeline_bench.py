"""Host input-pipeline throughput: what can the 1-core Loader sustain?

VERDICT r2 item 6: device training consumes 559-900 img/s and inference
~4,000 img/s, but nothing measured the host side.  This script writes N
synthetic JPEGs at VOC-ish resolution, then measures Loader img/s through
each host path:

  fused    native C++ JPEG decode + resize + normalize (data/native.py,
           one call per batch) — the live-dataset training path
  python   PIL decode per image + native preproc (the non-.jpg fallback)
  pure     PIL decode + python resize (no native lib)
  packed   pre-decoded uint8 memmap cache (data/cache.py) — the path that
           must beat device demand

The reference's analogue is a 5-worker cv2 DataLoader
(dataset/Pascal.py:255-276); this host has ONE core, so these numbers
decide whether training on real VOC/COCO is host-bound and by how much.

Usage: python benchmarks/host_pipeline_bench.py [--n 256] [--img 640]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class JpegParser:
    """Minimal disk-JPEG parser (record() enables the fused native path)."""

    def __init__(self, paths, boxes, labels):
        self.paths, self.boxes, self.labels = paths, boxes, labels

    def __len__(self):
        return len(self.paths)

    def record(self, i):
        return self.paths[i], self.boxes[i], self.labels[i]

    def __getitem__(self, i):
        from PIL import Image
        from objectdetectionpl_tpu.data.types import Example
        img = np.asarray(Image.open(self.paths[i]).convert("RGB"))
        return Example(img, self.boxes[i], self.labels[i])


class NoRecordParser(JpegParser):
    """Same data, no record() -> forces the python-decode path."""
    record = None

    def __init__(self, base):
        super().__init__(base.paths, base.boxes, base.labels)

    def __getattribute__(self, name):
        if name == "record":
            raise AttributeError("record")
        return super().__getattribute__(name)


def make_jpegs(root, n, hw=(375, 500), quality=90, seed=0):
    from PIL import Image
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    paths, boxes, labels = [], [], []
    base = rng.randint(0, 255, (*hw, 3)).astype(np.uint8)
    for i in range(n):
        arr = np.roll(base, i * 7, axis=1).copy()
        arr[:50] = (i * 31) % 255                       # per-image variation
        p = os.path.join(root, f"img_{i:05d}.jpg")
        Image.fromarray(arr).save(p, "JPEG", quality=quality)
        k = rng.randint(1, 5)
        bx = np.stack([rng.uniform(0, hw[1] / 2, k),
                       rng.uniform(0, hw[0] / 2, k),
                       rng.uniform(20, hw[1] / 2, k),
                       rng.uniform(20, hw[0] / 2, k)], -1).astype(np.float32)
        paths.append(p)
        boxes.append(bx)
        labels.append(rng.randint(0, 20, k).astype(np.int32))
    return JpegParser(paths, boxes, labels)


def bench_loader(loader, epochs=2):
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in loader:
            n += batch.images.shape[0]
            batch.images.sum()      # touch (memmap pages must actually load)
    dt = time.perf_counter() - t0
    return n / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--img", type=int, default=640)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--root", default="/tmp/host_pipe_bench")
    args = p.parse_args()

    from objectdetectionpl_tpu.data import cache as cache_lib, native
    from objectdetectionpl_tpu.data.pipeline import Loader

    parser = make_jpegs(os.path.join(args.root, "jpgs"), args.n)
    S, B = args.img, args.batch
    results = {"n": args.n, "img": S, "native": native.available()}

    mk = lambda par, **kw: Loader(par, S, B, max_boxes=8, shuffle=False, **kw)

    results["fused_img_s"] = round(bench_loader(mk(parser)), 1)

    results["python_decode_img_s"] = round(
        bench_loader(mk(NoRecordParser(parser))), 1)

    cache_dir = os.path.join(args.root, f"packed_{S}")
    t0 = time.perf_counter()
    cache_lib.build_packed_cache(parser, S, cache_dir)
    results["cache_build_s"] = round(time.perf_counter() - t0, 1)
    results["packed_img_s"] = round(
        bench_loader(mk(parser, cache_dir=cache_dir), epochs=4), 1)

    # Cold-page A/B (VERDICT r4 weak item 3): evict the cache file from the
    # OS page cache (fadvise DONTNEED + fsync), then time ONE epoch — first
    # with the madvise read-ahead disabled, then enabled.  The read-ahead
    # must bring the cold rate to (or near) the ~795 img/s device demand.
    def evict():
        path = os.path.join(cache_dir, "images.u8")
        fd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(fd)
            os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
        finally:
            os.close(fd)

    if hasattr(os, "posix_fadvise"):
        evict()
        results["packed_cold_img_s"] = round(bench_loader(
            mk(parser, cache_dir=cache_dir, read_ahead_batches=0),
            epochs=1), 1)
        evict()
        results["packed_cold_readahead_img_s"] = round(bench_loader(
            mk(parser, cache_dir=cache_dir, read_ahead_batches=32),
            epochs=1), 1)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
