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

try:  # persistent compilation cache (remote compiles take minutes here)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

CONFIGS = [
    # (model, variant, img, infer_batch, train_batch, classes)
    # batches tuned per memory footprint; infer batch 256 is the measured
    # sweet spot for YOLOv5s (bench.py sweep), train batch 128 (BASELINE.md)
    ("YOLOv2", None, 416, 256, 128, 20),
    ("YOLOv3", None, 416, 128, 64, 80),
    ("YOLOv4", None, 416, 96, 96, 80),   # train b96: 277.9 vs 233.4 img/s
                                         # at b48 (r5 diagnosis, BASELINE.md)
    ("YOLOv5", "Yolov5s", 640, 256, 128, 10),
    ("YOLOv5", "Yolov5m", 640, 192, 48, 10),
    ("YOLOv5", "Yolov5l", 640, 128, 32, 10),
    ("YOLOv5", "Yolov5x", 640, 96, 16, 10),
    ("SSD", None, 300, 256, 128, 20),
    ("RetinaNet", None, 600, 64, 32, 80),
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

    def e2e(v, raw):
        images = raw.astype(jnp.bfloat16) / 255.0
        return post(model.apply(v, images, train=False))

    # Same methodology as bench.py: through the remote-device tunnel,
    # block_until_ready is NOT a reliable barrier and every dispatch+fetch
    # round trip costs ~30 ms of host latency production hosts don't pay, so
    # the iterations run chained inside one jitted fori_loop (the carried
    # checksum perturbs each iteration's input -> no hoisting) and one scalar
    # fetch forces the chain.  ``variables`` is an ARGUMENT, not a closure:
    # closed-over arrays bake into the HLO as literals and the v5x param set
    # (~350 MB f32) blows the compile service's request-body limit (HTTP
    # 413) — the same mechanism as the bench_train_one batch-closure bug.
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(v, raw, n):
        def body(_, acc):
            r = raw + (acc % 2).astype(raw.dtype)
            return acc + e2e(v, r).valid.sum().astype(jnp.int32)
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    raw = jax.device_put(np.random.randint(
        0, 255, (batch, img, img, 3)).astype(np.uint8))
    for _ in range(warmup):
        float(loop(variables, raw, iters))
    t0 = time.perf_counter()
    float(loop(variables, raw, iters))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_train_one(model_name, variant, img, batch, classes,
                    steps=6, warmup=1):
    """Full production train step (fwd + loss + bwd + Adam), bf16."""
    from objectdetectionpl_tpu.config import Config
    from objectdetectionpl_tpu.models import build_model
    from objectdetectionpl_tpu.ops import losses as loss_lib
    from objectdetectionpl_tpu.train import (
        build_optimizer, create_train_state, make_train_step)

    cfg = Config(optimizer="Adam", lr=1e-3, weight_decay=1e-5)
    model = build_model(model_name, classes, dtype=jnp.bfloat16,
                        yolov5_type=variant or "Yolov5s")
    loss_fn = loss_lib.make_loss(model_name, classes, img)
    tx = build_optimizer(cfg)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), img,
                               batch_size=1)
    train_step = make_train_step(model, loss_fn, tx, accum_steps=1)

    M = 32
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, batch, img, img, 3), jnp.bfloat16)
    labels = jnp.asarray(rng.randint(0, classes, (1, batch, M)), jnp.int32)
    boxes = jnp.asarray(
        np.stack([rng.uniform(0.3, 0.7, (1, batch, M, 2)),
                  rng.uniform(0.05, 0.3, (1, batch, M, 2))],
                 axis=-2).reshape(1, batch, M, 4), jnp.float32)
    mask = jnp.asarray(rng.rand(1, batch, M) < 0.5)

    # data passed as ARGUMENTS, never closed over: a closed-over batch is
    # baked into the HLO as a literal (b128@640 = ~300 MB) and the remote
    # compile service rejects the request body with HTTP 413 — the round-4/5
    # v5s failure mode.
    @jax.jit
    def chain(state, im, lb, bx, mk):
        def body(st, _):
            st, metrics = train_step(st, im, lb, bx, mk)
            return st, metrics["loss"]
        st, losses = jax.lax.scan(body, state, None, length=steps)
        return st, losses.sum()

    st, s = chain(state, images, labels, boxes, mask)
    float(s)                                  # compile + warm, forced barrier
    for _ in range(warmup - 1):
        st, s = chain(st, images, labels, boxes, mask)
        float(s)
    t0 = time.perf_counter()
    st, s = chain(st, images, labels, boxes, mask)
    float(s)
    dt = (time.perf_counter() - t0) / steps
    return batch / dt


def measure_config(i: int, quick: bool, train: bool) -> dict:
    model_name, variant, img, batch, tbatch, classes = CONFIGS[i]
    if quick:
        batch = max(batch // 4, 8)
        tbatch = max(tbatch // 4, 8)
    name = variant or model_name
    row = {"model": name, "img": img, "batch": batch}
    try:
        ips = bench_one(model_name, variant, img, batch, classes,
                        iters=5 if quick else 10)
        row["images_per_sec_chip"] = round(ips, 1)
    except Exception as e:
        row["images_per_sec_chip"] = f"failed: {type(e).__name__}"
        print(json.dumps({"model": name, "infer_error": str(e)[:120]}),
              flush=True)
    if train:
        try:
            tips = bench_train_one(model_name, variant, img, tbatch,
                                   classes, steps=3 if quick else 6)
            row.update(train_batch=tbatch,
                       train_images_per_sec_chip=round(tips, 1))
        except Exception as e:
            row.update(train_batch=tbatch,
                       train_images_per_sec_chip=f"failed: "
                                                 f"{type(e).__name__}")
            print(json.dumps({"model": name,
                              "train_error": str(e)[:120]}), flush=True)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="smaller batches, fewer iters")
    p.add_argument("--train", action="store_true",
                   help="also measure the production train step per family")
    p.add_argument("--only", type=int, default=None,
                   help="measure CONFIGS[i] in this process and print its "
                        "JSON row (no RESULTS.md write)")
    p.add_argument("--in-process", action="store_true",
                   help="run every config in this one process (the round-4 "
                        "mode; one giant compile session occasionally drew "
                        "HTTP 413 from the remote-compile service on v5s)")
    args = p.parse_args()

    if args.only is not None:
        print("ROW " + json.dumps(measure_config(args.only, args.quick,
                                                 args.train)), flush=True)
        return

    rows = []
    for i in range(len(CONFIGS)):
        if args.in_process:
            rows.append(measure_config(i, args.quick, args.train))
            print(json.dumps(rows[-1]), flush=True)
            continue
        # Default: one fresh subprocess per config — each remote-compile
        # session stays small (the HTTP 413 workaround), a crash in one
        # family cannot take down the pass, and one transparent retry
        # absorbs transient compile-service failures.
        import subprocess
        cmd = [sys.executable, os.path.abspath(__file__),
               "--only", str(i)] + (["--quick"] if args.quick else []) \
            + (["--train"] if args.train else [])
        row = None
        for attempt in range(2):
            try:
                r = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=3600)
            except subprocess.TimeoutExpired:
                print(json.dumps({"config": i, "attempt": attempt,
                                  "error": "timeout 3600s"}), flush=True)
                continue
            for line in r.stdout.splitlines():
                if line.startswith("ROW "):
                    row = json.loads(line[4:])
            ok = row is not None and not any(
                isinstance(v, str) and v.startswith("failed")
                for v in row.values())
            if ok:
                break
            print(json.dumps({"config": i, "attempt": attempt,
                              "stderr": (r.stderr or "")[-200:]}), flush=True)
        if row is None:
            name = CONFIGS[i][1] or CONFIGS[i][0]
            row = {"model": name, "img": CONFIGS[i][2],
                   "batch": CONFIGS[i][3],
                   "images_per_sec_chip": "failed: subprocess"}
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "RESULTS.md")
    with_train = args.train and any("train_images_per_sec_chip" in r
                                    for r in rows)
    with open(out, "w") as f:
        f.write("# Per-family throughput (one TPU v5e chip, bfloat16)\n\n"
                "Inference = uint8 preproc + forward + decode + fixed-shape "
                "batched NMS.\nTrain = production train step (fwd + loss + "
                "bwd + Adam).\nMethodology: iterations chained inside one "
                "jitted fori_loop/scan\n(data-dependent carry, single scalar "
                "fetch) — see CLAUDE.md.\nProvenance: every row from one "
                "subprocess-isolated pass of this script,\nno other process "
                "sharing the chip (the r4 table carried ~78% contention\n"
                "inflation on YOLOv4 — BASELINE.md r5 (d)).\n\n")
        if with_train:
            f.write("| model | img | infer batch | infer img/s | train batch"
                    " | train img/s |\n|---|---|---|---|---|---|\n")
        else:
            f.write("| model | img | batch | images/sec/chip |\n"
                    "|---|---|---|---|\n")
        for r in rows:
            if with_train:
                f.write(f"| {r['model']} | {r['img']} | {r['batch']} | "
                        f"{r['images_per_sec_chip']} | "
                        f"{r.get('train_batch', '—')} | "
                        f"{r.get('train_images_per_sec_chip', '—')} |\n")
            else:
                f.write(f"| {r['model']} | {r['img']} | {r['batch']} | "
                        f"{r['images_per_sec_chip']} |\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
