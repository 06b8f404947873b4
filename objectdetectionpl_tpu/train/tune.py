"""Tuning utilities: LR range test + batch-size power scaling.

Parity with the reference's ``fitune`` section (configs/config.yaml:63-66) and
Lightning's ``trainer.tune`` (run.py:112-113): ``auto_lr_find`` runs an
exponential LR sweep and suggests the steepest-descent LR;
``auto_scale_batch_size`` doubles the batch until compilation/execution fails
('power' mode).
"""

from __future__ import annotations

import math
from typing import List

import jax
import numpy as np


def auto_lr_find(trainer, num_steps: int = 25, min_lr: float = 1e-7,
                 max_lr: float = 1.0) -> float:
    """Exponential LR sweep on throwaway state; returns the suggested LR.

    Suggestion rule (Lightning-style): the LR one decade below the point of
    steepest smoothed loss descent, clipped to the sweep range.
    """
    from objectdetectionpl_tpu.train import optim

    lrs = np.geomspace(min_lr, max_lr, num_steps)
    import jax.numpy as jnp
    # true buffer copies: train_step donates its input state
    sweep_state = jax.tree.map(jnp.copy, trainer.state)
    losses: List[float] = []
    it = iter(trainer.dm.train_dataloader())
    cfg = trainer.cfg

    micro = []
    for lr in lrs:
        optim.set_learning_rate(sweep_state.opt_state, float(lr))
        while len(micro) < cfg.accumulate_grad_batches:
            try:
                batch = next(it)
            except StopIteration:
                it = iter(trainer.dm.train_dataloader())
                batch = next(it)
            micro.append(trainer._device_batch(batch, augment=True))
        stacked = [np.stack([np.asarray(m[i]) for m in micro])
                   for i in range(4)]
        micro = []
        sweep_state, metrics = trainer.train_step(sweep_state, *stacked)
        loss = float(metrics["loss"])
        if not math.isfinite(loss):
            break
        losses.append(loss)

    if len(losses) < 3:
        return trainer.cfg.lr
    smooth = np.convolve(losses, np.ones(3) / 3, mode="valid")
    grads = np.diff(smooth)
    best = int(np.argmin(grads))                # steepest descent
    suggestion = float(lrs[min(best + 1, len(lrs) - 1)]) / 10.0
    return float(np.clip(suggestion, min_lr, max_lr))


def auto_scale_batch_size(trainer, start: int = 2, max_trials: int = 6
                          ) -> int:
    """'power' scaling: double the batch until a train step fails.

    Returns the largest working batch size (per the reference's
    auto_scale_batch_size: power, configs/config.yaml:66).
    """
    import jax.numpy as jnp

    good = start
    bs = start
    M = trainer.cfg.max_boxes
    S = trainer.img_size
    for _ in range(max_trials):
        try:
            rng = np.random.RandomState(0)
            images = jnp.asarray(rng.rand(1, bs, S, S, 3), jnp.float32)
            labels = jnp.zeros((1, bs, M), jnp.int32)
            boxes = jnp.tile(jnp.asarray([0.5, 0.5, 0.2, 0.2]),
                             (1, bs, M, 1)).astype(jnp.float32)
            mask = jnp.zeros((1, bs, M), bool).at[:, :, 0].set(True)
            state = jax.tree.map(jnp.copy, trainer.state)
            state, metrics = trainer.train_step(state, images, labels,
                                                boxes, mask)
            jax.block_until_ready(metrics["loss"])
            good = bs
            bs *= 2
        except Exception:
            break
    return good
