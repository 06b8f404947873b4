"""NMS implementation shoot-out: blocked matrix vs Pallas while-loop kernel.

VERDICT r2 item 5: bench.py's batch sweep showed end-to-end throughput
*falling* past B=256; the suspect is blocked_greedy_nms's [B, K, K]
thresholded-IoU mask in HBM (O(B K^2) traffic).  The Pallas kernel holds
O(K) state in VMEM per image and never materializes the matrix — this
script measures both at the same operating points to decide the default.

Methodology (CLAUDE.md "Measurement gotcha"): N iterations chained in ONE
jitted fori_loop, inputs perturbed by the carried checksum, one scalar
fetch at the end.

Usage: python benchmarks/nms_bench.py [--batches 256,384,512,768] [--k 300]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

import jax
import jax.numpy as jnp

try:  # persistent compilation cache (remote compiles take minutes here)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def make_candidates(rng, B, K, img=640, density=0.6):
    """Score-sorted candidate sets with realistic overlap structure."""
    cx = rng.uniform(0, img, (B, K))
    cy = rng.uniform(0, img, (B, K))
    w = rng.uniform(8, 160, (B, K))
    h = rng.uniform(8, 160, (B, K))
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    scores = -np.sort(-rng.uniform(0, 1, (B, K)))          # descending
    live = rng.uniform(size=(B, K)) < density
    scores = np.where(live, scores, -1e9)
    labels = rng.randint(0, 10, (B, K))
    obj = rng.uniform(0.3, 1.0, (B, K)) * live
    return (jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32),
            jnp.asarray(labels, jnp.int32), jnp.asarray(obj, jnp.float32))


def bench_impl(fn, boxes, scores, labels, obj, iters=20):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(b, s, l, o, n):
        def body(_, acc):
            bb = b + (acc % 2.0) * 1e-3           # data dependence
            out, keep = fn(bb, s, l, o)
            return acc + out[..., 0].astype(jnp.float32).sum() + keep.sum()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chain(boxes, scores, labels, obj, iters))       # compile + warm
    t0 = time.perf_counter()
    float(chain(boxes, scores, labels, obj, iters))
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="256,384,512,768")
    p.add_argument("--k", type=int, default=300)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--density", type=float, default=0.6)
    args = p.parse_args()

    from objectdetectionpl_tpu.ops.nms import blocked_greedy_nms
    from objectdetectionpl_tpu.ops.pallas.nms_kernel import pallas_greedy_nms

    rng = np.random.RandomState(0)
    K = args.k
    impls = {
        "blocked": lambda b, s, l, o: blocked_greedy_nms(
            b, s, l, o, nms_thresh=0.4, class_aware=True, merge=True),
        "pallas": lambda b, s, l, o: pallas_greedy_nms(
            b, s, l, o, nms_thresh=0.4, class_aware=True, merge=True),
    }
    for B in [int(x) for x in args.batches.split(",")]:
        cands = make_candidates(rng, B, K, density=args.density)
        row = {"B": B, "K": K, "density": args.density}
        for name, fn in impls.items():
            try:
                dt = bench_impl(fn, *cands, iters=args.iters)
                row[f"{name}_ms"] = round(dt * 1e3, 2)
                row[f"{name}_img_s"] = round(B / dt, 0)
            except Exception as e:              # OOM etc.
                row[f"{name}_ms"] = f"ERR {type(e).__name__}"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
