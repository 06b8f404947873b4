"""Cost analysis of the YOLOv5s train step: FLOPs vs bytes accessed."""
import numpy as np
import jax, jax.numpy as jnp

from objectdetectionpl_tpu.config import Config
from objectdetectionpl_tpu.models import build_model
from objectdetectionpl_tpu.ops import losses as loss_lib
from objectdetectionpl_tpu.train import (build_optimizer, create_train_state,
                                         make_train_step)

B, S, M, C = 64, 640, 32, 10
cfg = Config(optimizer="Adam", lr=1e-3, weight_decay=1e-5)
model = build_model("YOLOv5", C, dtype=jnp.bfloat16, yolov5_type="Yolov5s")
loss_fn = loss_lib.make_loss("YOLOv5", C, S)
tx = build_optimizer(cfg)
state = create_train_state(model, tx, jax.random.PRNGKey(0), S, batch_size=1)
step = make_train_step(model, loss_fn, tx, accum_steps=1)

rng = np.random.RandomState(0)
args = (state,
        jnp.zeros((1, B, S, S, 3), jnp.bfloat16),
        jnp.zeros((1, B, M), jnp.int32),
        jnp.asarray(rng.rand(1, B, M, 4), jnp.float32),
        jnp.ones((1, B, M), bool))
lowered = step.lower(*args)
comp = lowered.compile()
ca = comp.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
fl = ca.get("flops", 0.0)
by = ca.get("bytes accessed", 0.0)
print(f"flops={fl:.3e}  bytes={by:.3e}")
print(f"ideal ms @197TF/s: {fl/197e12*1e3:.1f}   ideal ms @819GB/s: {by/819e9*1e3:.1f}")
for k in sorted(ca):
    if "bytes accessed" in k:
        print(k, f"{ca[k]:.3e}")
mem = comp.memory_analysis()
print("peak temp bytes:", getattr(mem, "temp_size_in_bytes", None))
