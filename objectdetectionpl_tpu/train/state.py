"""Train state: params + BatchNorm statistics + optimizer state + step/rng.

The reference keeps all of this implicit in torch Module buffers and Lightning
internals; here it is one explicit, checkpointable pytree.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    ema_params: Any = None      # exponential moving average (None = disabled)

    @property
    def eval_params(self):
        """Parameters to evaluate/serve with (EMA when enabled)."""
        return self.ema_params if self.ema_params is not None else self.params


def create_train_state(model, tx, rng, img_size: int, batch_size: int = 1,
                       dtype=jnp.float32, ema_decay: float = 0.0) -> TrainState:
    """Initialize model variables and optimizer state."""
    init_rng, state_rng = jax.random.split(rng)
    x = jnp.zeros((batch_size, img_size, img_size, 3), dtype)
    variables = model.init(init_rng, x, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rng=state_rng,
        ema_params=jax.tree.map(jnp.copy, params) if ema_decay > 0 else None,
    )


def param_count(params) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree.leaves(params))
