"""Benchmark: YOLOv5s-640 end-to-end images/sec/chip (preproc + infer + NMS).

The BASELINE.json headline metric.  Runs on whatever jax.devices() offers
(the driver runs it on one real TPU chip); bfloat16 compute, batch tuned for
single-chip throughput.  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline is measured against A100_PT_BASELINE_IPS, a nominal
A100-PyTorch YOLOv5s-640 end-to-end (decode+aug+infer+NMS) throughput.  The
reference publishes no numbers (BASELINE.md); 250 img/s is the provisional
stand-in until the reference harness is measured — the driver-set target is
5x that on v5e (BASELINE.json north_star).
"""

from __future__ import annotations

import functools
import json
import time

import os

import jax
import jax.numpy as jnp
import numpy as np

try:  # persistent compilation cache
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

# Measured A/B (round 4, one v5e): baseline 4000 img/s; s2d=transpose alone
# 4017 (noise); preproc-fold alone 3732 (the uint8 cast fused into 4 strided
# gathers re-reads the raw image 4x — regression); fold+transpose 4104
# (+2.6%): one transpose pass does the cast once and the stem kernel carries
# the /255.  Defaults pin the winning combination.
os.environ.setdefault("OBJDET_S2D", "transpose")
os.environ.setdefault("OBJDET_FOLD_PREPROC", "1")

A100_PT_BASELINE_IPS = 250.0
BATCH = 256     # sweep 256/384/512/768 -> 3974/3827/3829/3821 img/s.
                # NOT the NMS mask: benchmarks/nms_bench.py measured the
                # [B,K,K] blocked NMS at 2.6-5.3 ms over that whole range
                # (BASELINE.md round-3 shoot-out); the falloff past 256 is
                # the model forward's HBM working set.
IMG = 640
WARMUP = 2
ITERS = 20


def main():
    from objectdetectionpl_tpu.models import build_model
    from objectdetectionpl_tpu.ops import anchors as anchor_lib
    from objectdetectionpl_tpu.ops import nms

    num_classes = 10  # BDD100K class count (headline config)
    model = build_model("YOLOv5", num_classes, dtype=jnp.bfloat16,
                        yolov5_type="Yolov5s")
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((BATCH, IMG, IMG, 3), jnp.bfloat16)
    variables = model.init(rng, x0, train=False)

    # serving optimization (exact): fold the /255 normalize into the stem
    # conv kernel so raw uint8 feeds the net with a cast only
    # (utils/fuse.fold_input_scale); enabled via OBJDET_FOLD_PREPROC=1.
    fold = os.environ.get("OBJDET_FOLD_PREPROC", "0") == "1"
    if fold:
        from objectdetectionpl_tpu.utils.fuse import fold_input_scale
        variables = {**variables,
                     "params": fold_input_scale(variables["params"],
                                                1.0 / 255.0)}

    # serving-tail A/B (round 5, measured): fused score->top-k->gather->
    # decode (decode_select_yolov5) 4290.8 img/s vs dense decode 4316.1 in
    # the same session — NEUTRAL (XLA already fuses the dense decode into
    # the NMS ranking reads; the top-k over [B,25k] dominates either way).
    # Default stays dense; the fused path may pay off at COCO-scale class
    # counts (85 decoded channels vs 15 here) — unmeasured.
    prefilter = os.environ.get("OBJDET_PREFILTER", "0") == "1"

    def end_to_end(raw_uint8):
        # preproc: normalize uint8 -> [0,1] bf16 (device-side); with the
        # fold, the scale lives in the stem kernel and only the cast remains
        images = raw_uint8.astype(jnp.bfloat16)
        if not fold:
            images = images / 255.0
        out = model.apply(variables, images, train=False)
        if prefilter:
            preds = nms.decode_select_yolov5(
                out, anchor_lib.YOLOV5_ANCHORS, anchor_lib.YOLOV5_STRIDES,
                num_classes, top_k=300, conf_thres=0.5)
        else:
            preds = nms.decode_yolov5_predictions(
                out, anchor_lib.YOLOV5_ANCHORS, anchor_lib.YOLOV5_STRIDES,
                num_classes)
        return nms.yolo_nms(preds, conf_thres=0.5, nms_thres=0.4, top_k=300)

    # Measurement methodology: through the remote-device tunnel,
    # (a) block_until_ready is NOT a reliable execution barrier, and
    # (b) every dispatch+fetch round trip costs ~30 ms of host latency that a
    #     production TPU host does not pay.  So the ITERS iterations run
    #     inside ONE jitted fori_loop: each iteration's input is perturbed by
    #     the carried checksum (data dependence -> XLA cannot hoist the
    #     loop-invariant body or overlap iterations), and a single scalar
    #     fetch of the carry forces the whole chain.
    @functools.partial(jax.jit, static_argnames=("iters",))
    def bench_loop(raw_uint8, iters):
        def body(_, acc):
            r = raw_uint8 + (acc % 2).astype(raw_uint8.dtype)
            res = end_to_end(r)
            return acc + res.valid.sum().astype(jnp.int32)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    host = np.random.RandomState(0).randint(
        0, 255, (BATCH, IMG, IMG, 3)).astype(np.uint8)
    batch = jax.device_put(host)

    for _ in range(WARMUP):   # same static iters -> warms the timed program
        float(bench_loop(batch, ITERS))

    t0 = time.perf_counter()
    checksum = float(bench_loop(batch, ITERS))
    dt = time.perf_counter() - t0
    assert checksum >= 0.0

    ips = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "YOLOv5s-640 end-to-end images/sec/chip (preproc+infer+NMS)",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / A100_PT_BASELINE_IPS, 3),
    }))


if __name__ == "__main__":
    # Retry transient TPU/compile-service failures (FAILED_PRECONDITION after
    # another process releases the chip, remote-compile timeouts).
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:
            if attempt == 2:
                raise
            print(f"# bench attempt {attempt} failed "
                  f"({type(e).__name__}); retrying", flush=True)
            time.sleep(30)
