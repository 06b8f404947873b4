import glob
import os

import numpy as np
import jax, jax.numpy as jnp

from objectdetectionpl_tpu.models import build_model

B, S, C = 64, 640, 10
model = build_model("YOLOv5", C, dtype=jnp.bfloat16, yolov5_type="Yolov5s")
x = jnp.zeros((B, S, S, 3), jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, S, S, 3), jnp.bfloat16), train=True)

def loss(params, bstats, im):
    out, upd = model.apply({"params": params, "batch_stats": bstats}, im,
                           train=True, mutable=["batch_stats"])
    return sum(o.astype(jnp.float32).sum() for o in jax.tree.leaves(out)), upd

grad = jax.jit(jax.value_and_grad(loss, has_aux=True))
(v, _), g = grad(variables["params"], variables["batch_stats"], x)
print("warm", float(v), flush=True)
with jax.profiler.trace("/tmp/jaxtrace"):
    (v, _), g = grad(variables["params"], variables["batch_stats"], x)
    print("traced", float(v), flush=True)
for f in glob.glob("/tmp/jaxtrace/**/*", recursive=True):
    if os.path.isfile(f):
        print(f, os.path.getsize(f))
