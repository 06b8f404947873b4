"""AOT-compile the production YOLOv5s train step and dump optimized HLO.

Never executes on the device: the TrainState is built with jax.eval_shape
and the step is lower()+compile()d only (remote compile service).  Output:
/tmp/trainstep_b<B>.hlo plus the compiler's cost/memory analysis.

Usage: python tools/dump_train_hlo.py [--batch 128] [--img 640]
       [--model YOLOv5] [--fwd-only]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

p = argparse.ArgumentParser()
p.add_argument("--batch", type=int, default=128)
p.add_argument("--img", type=int, default=640)
p.add_argument("--model", default="YOLOv5")
p.add_argument("--classes", type=int, default=10)
p.add_argument("--max-boxes", type=int, default=32)
p.add_argument("--out", default=None)
p.add_argument("--fwd-only", action="store_true")
args = p.parse_args()

from objectdetectionpl_tpu.config import Config
from objectdetectionpl_tpu.models import build_model
from objectdetectionpl_tpu.ops import losses as loss_lib
from objectdetectionpl_tpu.train import (build_optimizer, create_train_state,
                                         make_train_step)

B, S, M, C = args.batch, args.img, args.max_boxes, args.classes
cfg = Config(optimizer="Adam", lr=1e-3, weight_decay=1e-5)
model = build_model(args.model, C, dtype=jnp.bfloat16, yolov5_type="Yolov5s")
loss_fn = loss_lib.make_loss(args.model, C, S)
tx = build_optimizer(cfg)

state_sd = jax.eval_shape(
    lambda: create_train_state(model, tx, jax.random.PRNGKey(0), S,
                               batch_size=1))
sds = jax.ShapeDtypeStruct
train_args = (state_sd,
              sds((1, B, S, S, 3), jnp.bfloat16),
              sds((1, B, M), jnp.int32),
              sds((1, B, M, 4), jnp.float32),
              sds((1, B, M), jnp.bool_))

if args.fwd_only:
    def fwd(state, images, labels, boxes, mask):
        out, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images[0], train=True, mutable=["batch_stats"])
        return [o.astype(jnp.float32).sum() for o in jax.tree.leaves(out)]
    step = jax.jit(fwd)
else:
    step = make_train_step(model, loss_fn, tx, accum_steps=1)

comp = step.lower(*train_args).compile()
out = args.out or f"/tmp/trainstep_b{B}{'_fwd' if args.fwd_only else ''}.hlo"
with open(out, "w") as f:
    f.write(comp.as_text())
print("wrote", out)

ca = comp.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
if ca:
    fl = ca.get("flops", 0.0)
    by = ca.get("bytes accessed", 0.0)
    print(f"cost_analysis: flops={fl:.3e} ({fl/1e12:.2f} TF)  "
          f"bytes={by:.3e} ({by/1e9:.2f} GB)")
    print(f"  ideal ms @197TF/s: {fl/197e12*1e3:.2f}   "
          f"ideal ms @819GB/s: {by/819e9*1e3:.2f}")
mem = comp.memory_analysis()
if mem:
    print(f"memory: args={mem.argument_size_in_bytes/1e9:.2f} GB  "
          f"temps={mem.temp_size_in_bytes/1e9:.2f} GB  "
          f"out={mem.output_size_in_bytes/1e9:.2f} GB")
