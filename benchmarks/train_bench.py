"""Measure production train-step throughput (fwd + loss + bwd + optimizer).

Uses the same barrier methodology as bench.py (CLAUDE.md "Measurement
gotcha"): N steps chained inside ONE jitted lax.scan — the carried TrainState
makes every step data-dependent on the previous one, so XLA cannot hoist or
elide the model compute — and a single scalar fetch at the end forces the
chain. Per-step time = wall / N.

Usage: python benchmarks/train_bench.py [--batch 64] [--accum 1] [--steps 8]
       [--model YOLOv5] [--img 640] [--classes 10] [--fwd-only]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64, help="microbatch size")
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--steps", type=int, default=8, help="chained train steps")
    p.add_argument("--model", default="YOLOv5")
    p.add_argument("--variant", default="Yolov5s")
    p.add_argument("--img", type=int, default=640)
    p.add_argument("--classes", type=int, default=10)
    p.add_argument("--max-boxes", type=int, default=32)
    p.add_argument("--fwd-only", action="store_true",
                   help="time the train-mode forward alone (no grad)")
    p.add_argument("--trivial-loss", action="store_true",
                   help="replace the detection loss with sum(outputs): "
                        "isolates model fwd+bwd+Adam from the loss segment")
    p.add_argument("--remat", default="none", choices=["none", "early", "all"],
                   help="activation rematerialization policy (YOLOv5)")
    args = p.parse_args()

    from objectdetectionpl_tpu.config import Config
    from objectdetectionpl_tpu.models import build_model
    from objectdetectionpl_tpu.ops import losses as loss_lib
    from objectdetectionpl_tpu.train import (
        build_optimizer, create_train_state, make_train_step)

    cfg = Config(optimizer="Adam", lr=1e-3, weight_decay=1e-5)
    model = build_model(args.model, args.classes, dtype=jnp.bfloat16,
                        yolov5_type=args.variant, remat=args.remat)
    if args.trivial_loss:
        def loss_fn(out, labels, boxes, mask):
            leaves = jax.tree.leaves(out)
            return {"loss": sum(o.astype(jnp.float32).mean()
                                for o in leaves)}
    else:
        loss_fn = loss_lib.make_loss(args.model, args.classes, args.img)
    tx = build_optimizer(cfg)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), args.img,
                               batch_size=1)

    A, B, S, M = args.accum, args.batch, args.img, args.max_boxes
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(A, B, S, S, 3), jnp.bfloat16)
    labels = jnp.asarray(rng.randint(0, args.classes, (A, B, M)), jnp.int32)
    boxes = jnp.asarray(
        np.stack([rng.uniform(0.3, 0.7, (A, B, M, 2)),
                  rng.uniform(0.05, 0.3, (A, B, M, 2))], axis=-2)
        .reshape(A, B, M, 4), jnp.float32)
    mask = jnp.asarray(rng.rand(A, B, M) < 0.5)

    if args.fwd_only:
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(im, n):
            def body(_, acc):
                x = im[0] + (acc % 2).astype(im.dtype) * 1e-3
                out, _ = model.apply(variables, x, train=True,
                                     mutable=["batch_stats"])
                leaves = [o.astype(jnp.float32).sum() for o in jax.tree.leaves(out)]
                return acc + sum(leaves)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(chain(images, args.steps))          # compile + warm
        t0 = time.perf_counter()
        float(chain(images, args.steps))
        dt = (time.perf_counter() - t0) / args.steps
        ips = A * B / dt
        print(json.dumps({"mode": "fwd_train", "batch": B, "accum": A,
                          "ms_per_step": round(dt * 1e3, 2),
                          "images_per_sec": round(ips, 1)}))
        return

    train_step = make_train_step(model, loss_fn, tx, accum_steps=A)

    @jax.jit
    def chain(state, im, lb, bx, mk):
        def body(carry, _):
            st = carry
            # the carried params/opt/BN state make each step data-dependent
            # on the previous one — XLA cannot hoist the model compute
            st, metrics = train_step(st, im, lb, bx, mk)
            return st, metrics["loss"]
        st, losses = jax.lax.scan(body, state, None, length=args.steps)
        return st, losses.sum()

    st, s = chain(state, images, labels, boxes, mask)   # compile + warm
    float(s)
    t0 = time.perf_counter()
    st2, s = chain(st, images, labels, boxes, mask)
    loss_sum = float(s)
    dt = (time.perf_counter() - t0) / args.steps
    ips = A * B / dt
    print(json.dumps({"mode": "train_step", "model": args.model,
                      "remat": args.remat,
                      "batch": B, "accum": A, "img": S,
                      "ms_per_step": round(dt * 1e3, 2),
                      "images_per_sec": round(ips, 1),
                      "loss_sum": round(loss_sum, 3)}))


if __name__ == "__main__":
    main()
