"""Dump optimized HLO of model fwd+bwd (trivial loss) and tally big buffers."""
import re
import sys
from collections import Counter

import numpy as np
import jax, jax.numpy as jnp

from objectdetectionpl_tpu.models import build_model

B, S, C = 64, 640, 10
model = build_model("YOLOv5", C, dtype=jnp.bfloat16, yolov5_type="Yolov5s")
x = jnp.zeros((B, S, S, 3), jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.bfloat16),
                       train=True)

def loss(params, bstats, im):
    out, upd = model.apply({"params": params, "batch_stats": bstats}, im,
                           train=True, mutable=["batch_stats"])
    return sum(o.astype(jnp.float32).sum() for o in jax.tree.leaves(out)), upd

grad = jax.jit(jax.value_and_grad(loss, has_aux=True))
comp = grad.lower(variables["params"], variables["batch_stats"], x).compile()
txt = comp.as_text()
open("/tmp/trainstep.hlo", "w").write(txt)

# tally every tensor literal shape by dtype and total bytes
sizes = Counter()
counts = Counter()
for m in re.finditer(r"\b(f32|bf16|f16|s32|pred|u32|s8)\[([0-9,]*)\]", txt):
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    bytes_ = n * {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                  "pred": 1, "s8": 1}[dt]
    if bytes_ >= 50e6:
        key = f"{dt}[{dims}]"
        sizes[key] += bytes_
        counts[key] += 1

print("== tensor shapes >=50MB appearing in HLO (count x size) ==")
for k, v in sorted(sizes.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{counts[k]:4d} x {v/counts[k]/1e6:8.1f} MB  {k}")

ca = comp.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
print("flops", f"{ca.get('flops',0):.3e}", "bytes", f"{ca.get('bytes accessed',0):.3e}")
