"""Model summary + compiled-cost reporting.

Parity with the reference's torchinfo summary written to
``log_dir/<ds>/<model>/summary.txt`` (LightningFunc/lightningUtils.py:7-15),
plus the TPU-native extra: XLA cost analysis (FLOPs / bytes) of the jitted
forward, which torchinfo cannot see.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def model_summary(model, img_size: int, batch_size: int = 1) -> str:
    """Tabulated layer/param summary via flax + XLA cost analysis."""
    x = jnp.zeros((batch_size, img_size, img_size, 3), jnp.float32)
    lines = [model.tabulate(jax.random.PRNGKey(0), x, train=False,
                            depth=2, console_kwargs={"width": 120})]
    try:
        variables = jax.eval_shape(
            lambda r, xx: model.init(r, xx, train=False),
            jax.random.PRNGKey(0), x)
        n_params = sum(int(jnp.prod(jnp.asarray(l.shape)))
                       for l in jax.tree.leaves(variables["params"]))
        lines.append(f"\nTotal parameters: {n_params:,}")
    except Exception:
        pass
    return "\n".join(lines)


def compiled_cost(fn, *args) -> Optional[dict]:
    """FLOPs / bytes-accessed of a jitted function, from XLA's cost analysis."""
    try:
        lowered = jax.jit(fn).lower(*args)
        compiled = lowered.compile()
        return dict(compiled.cost_analysis())
    except Exception:
        return None


def save_summary(model, img_size: int, out_dir: str):
    """Write summary.txt (lightningUtils.py:7-15 parity)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "summary.txt"), "w") as f:
        f.write(model_summary(model, img_size))
