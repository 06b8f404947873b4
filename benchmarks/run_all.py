"""Measure end-to-end inference throughput for every detector family.

Writes benchmarks/RESULTS.md and prints one JSON line per config.
(bench.py stays the single-line headline benchmark the driver consumes.)

Usage: python benchmarks/run_all.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

CONFIGS = [
    # (model, variant, img, batch, classes)  — batch tuned per memory footprint
    ("YOLOv2", None, 416, 256, 20),
    ("YOLOv3", None, 416, 128, 80),
    ("YOLOv4", None, 416, 96, 80),
    ("YOLOv5", "Yolov5s", 640, 384, 10),
    ("YOLOv5", "Yolov5m", 640, 192, 10),
    ("SSD", None, 300, 256, 20),
    ("RetinaNet", None, 600, 64, 80),
]


def bench_one(model_name, variant, img, batch, classes, iters=10, warmup=2):
    import functools

    from objectdetectionpl_tpu.models import build_model
    from objectdetectionpl_tpu.train.step import make_postprocess

    model = build_model(model_name, classes, dtype=jnp.bfloat16,
                        yolov5_type=variant or "Yolov5s")
    # exact_topk=None: benchmark the TPU approx_max_k path (bench.py's
    # configuration); eval/mAP paths default to exact selection
    post = make_postprocess(model_name, classes, img, exact_topk=None)
    x0 = jnp.zeros((batch, img, img, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    def e2e(raw):
        images = raw.astype(jnp.bfloat16) / 255.0
        return post(model.apply(variables, images, train=False))

    # Same methodology as bench.py: through the remote-device tunnel,
    # block_until_ready is NOT a reliable barrier and every dispatch+fetch
    # round trip costs ~30 ms of host latency production hosts don't pay, so
    # the iterations run chained inside one jitted fori_loop (the carried
    # checksum perturbs each iteration's input -> no hoisting) and one scalar
    # fetch forces the chain.
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(raw, n):
        def body(_, acc):
            r = raw + (acc % 2).astype(raw.dtype)
            return acc + e2e(r).valid.sum().astype(jnp.int32)
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    raw = jax.device_put(np.random.randint(
        0, 255, (batch, img, img, 3)).astype(np.uint8))
    for _ in range(warmup):
        float(loop(raw, iters))
    t0 = time.perf_counter()
    float(loop(raw, iters))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="smaller batches, fewer iters")
    args = p.parse_args()

    rows = []
    for model_name, variant, img, batch, classes in CONFIGS:
        if args.quick:
            batch = max(batch // 4, 8)
        name = variant or model_name
        try:
            ips = bench_one(model_name, variant, img, batch, classes,
                            iters=5 if args.quick else 10)
            rows.append((name, img, batch, round(ips, 1)))
            print(json.dumps({"model": name, "img": img, "batch": batch,
                              "images_per_sec_chip": round(ips, 1)}),
                  flush=True)
        except Exception as e:
            rows.append((name, img, batch, f"failed: {type(e).__name__}"))
            print(json.dumps({"model": name, "error": str(e)[:120]}),
                  flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "RESULTS.md")
    with open(out, "w") as f:
        f.write("# End-to-end inference throughput (preproc+forward+decode"
                "+NMS)\n\nbfloat16, one chip, fixed-shape batched NMS.\n"
                "Methodology: 10 iterations chained inside one jitted "
                "fori_loop\n(checksum-perturbed input, single scalar fetch) "
                "— see CLAUDE.md.\n\n"
                "| model | img | batch | images/sec/chip |\n|---|---|---|---|\n")
        for name, img, batch, ips in rows:
            f.write(f"| {name} | {img} | {batch} | {ips} |\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
