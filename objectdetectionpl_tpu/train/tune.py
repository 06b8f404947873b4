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
                 max_lr: float = 1.0, deadline_s: float = 300.0) -> float:
    """Exponential LR sweep on throwaway state; returns the suggested LR.

    Suggestion rule (Lightning-style): the LR one decade below the point of
    steepest smoothed loss descent, clipped to the sweep range.

    ``deadline_s`` bounds the sweep's wall clock: the loop stops issuing new
    steps once the budget is spent and suggests from whatever it has.  On
    this environment a TPU run must never be killed mid-execution (the chip
    lease strands ~1 h, CLAUDE.md) — so the bound is a cooperative
    stop-issuing check between steps, never a mid-step interrupt, mirroring
    how ``auto_scale_batch_size`` was made lease-safe (AOT-only).
    """
    import time

    from objectdetectionpl_tpu.train import optim

    t0 = time.monotonic()
    lrs = np.geomspace(min_lr, max_lr, num_steps)
    import jax.numpy as jnp
    # true buffer copies: train_step donates its input state
    sweep_state = jax.tree.map(jnp.copy, trainer.state)
    losses: List[float] = []
    it = iter(trainer.dm.train_dataloader())
    cfg = trainer.cfg

    micro = []
    for lr in lrs:
        if time.monotonic() - t0 > deadline_s:
            break             # budget spent: suggest from what we have
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


def _device_bytes_limit() -> float:
    """Per-device memory budget in bytes.

    Backends with no reported ``bytes_limit`` (CPU) fall back to the host's
    currently-available RAM — without this, every compilable candidate would
    "fit" and power scaling would always return start*2^(max_trials-1)
    (ADVICE r4)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            return float(stats["bytes_limit"])
    except Exception:
        pass
    try:
        import psutil
        return float(psutil.virtual_memory().available)
    except Exception:
        return float("inf")


def batch_fits(trainer, bs: int, headroom: float = 0.9) -> bool:
    """True when a train step at batch ``bs`` compiles AND its compiler-
    reported memory footprint (arguments + temporaries + outputs) fits in
    ``headroom`` x the device memory limit.  AOT only — never executes."""
    S, M = trainer.img_size, trainer.cfg.max_boxes
    sds = jax.ShapeDtypeStruct
    state_sd = jax.eval_shape(lambda s: s, trainer.state)
    args = (state_sd,
            sds((1, bs, S, S, 3), np.float32),
            sds((1, bs, M), np.int32),
            sds((1, bs, M, 4), np.float32),
            sds((1, bs, M), np.bool_))
    try:
        compiled = trainer.train_step.lower(*args).compile()
    except Exception as e:    # only resource failures mean "does not fit";
        msg = f"{type(e).__name__}: {e}"
        if ("RESOURCE_EXHAUSTED" in msg or "OOM" in msg.upper()
                or "out of memory" in msg.lower()
                or "exceeds the limit" in msg
                or "Allocat" in msg):
            return False
        raise                 # programming errors must propagate (ADVICE r4)
    try:
        mem = compiled.memory_analysis()
        need = (mem.argument_size_in_bytes + mem.temp_size_in_bytes
                + mem.output_size_in_bytes)
    except Exception:
        return True           # no analysis available: compile success is the gate
    return need <= headroom * _device_bytes_limit()


def auto_scale_batch_size(trainer, start: int = 2, max_trials: int = 6,
                          headroom: float = 0.9) -> int:
    """'power' scaling: double the batch until it no longer fits.

    Parity target: the reference's ``auto_scale_batch_size: power``
    (configs/config.yaml:66), which Lightning implements by *executing*
    steps until OOM.  Here each candidate is probed ahead-of-time —
    ``jit(train_step).lower(...).compile()`` plus the compiler's memory
    analysis against the device ``bytes_limit`` — because on this
    environment an execution failure mid-TPU-run strands the chip lease for
    ~1 h (CLAUDE.md).  Nothing is ever dispatched to the device.
    """
    good = start
    bs = start
    for _ in range(max_trials):
        if not batch_fits(trainer, bs, headroom):
            break
        good = bs
        bs *= 2
    return good
