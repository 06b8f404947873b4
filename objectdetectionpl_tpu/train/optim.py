"""Optimizer + LR-scheduler factories, parity with the reference's
``configure_optimizers`` (LightningFunc/optimizer.py:6-38).

4 optimizers (Adam, Adagrad, RMSprop, SGD — torch semantics: L2 weight decay
folded into the gradient before moment updates) x 7 epoch-stepped schedulers
(ReduceLROnPlateau mode='max' patience 3 threshold 0.9; StepLR 3/0.8;
MultiStepLR [70,140,190]/0.1; ExponentialLR 0.99; CosineAnnealingLR T_max 20;
LambdaLR constant; CyclicLR 1e-5..0.1).

The optimizer is built with ``optax.inject_hyperparams`` so the host-side
scheduler can rewrite the learning rate once per epoch (Lightning steps
schedulers per epoch and monitors ``val_loss``, run.py:88-96 +
optimizer.py:36-38) without recompiling the jitted train step.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import optax


def _scale_by_lr_decay(lr_decay: float) -> optax.GradientTransformation:
    """torch Adagrad's ``lr_decay``: effective lr = lr / (1 + t * lr_decay)
    with t = completed steps (reference passes it at optimizer.py:10)."""

    def init(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        del params
        factor = 1.0 / (1.0 + state.count.astype(jnp.float32) * lr_decay)
        updates = jax.tree.map(lambda u: u * factor, updates)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def build_optimizer(cfg) -> optax.GradientTransformation:
    """cfg needs: optimizer, lr, weight_decay, momentum, alpha, lr_decay, betas."""

    def make(learning_rate):
        wd = [optax.add_decayed_weights(cfg.weight_decay)] if cfg.weight_decay else []
        name = cfg.optimizer
        if name == "Adam":
            b1, b2 = cfg.betas
            core = optax.scale_by_adam(b1=b1, b2=b2)
        elif name == "Adagrad":
            core = optax.scale_by_rss(initial_accumulator_value=0.0)
            if cfg.lr_decay:
                core = optax.chain(core, _scale_by_lr_decay(cfg.lr_decay))
        elif name == "RMSprop":
            core = optax.scale_by_rms(decay=cfg.alpha, eps=1e-8)
        elif name == "SGD":
            core = optax.identity()
        else:
            raise ValueError(f"unknown optimizer {name!r}")
        chain = wd + [core]
        if name in ("SGD", "RMSprop") and cfg.momentum:
            chain.append(optax.trace(decay=cfg.momentum))
        chain.append(optax.scale(-learning_rate))
        return optax.chain(*chain)

    return optax.inject_hyperparams(make)(learning_rate=cfg.lr)


def set_learning_rate(opt_state, lr: float):
    """Rewrite the injected learning rate in-place (host-side scheduler)."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def current_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class Scheduler:
    """Epoch-stepped LR scheduler. ``step(metric)`` returns the new LR."""

    def __init__(self, base_lr: float):
        self.base_lr = base_lr
        self.epoch = -1

    def step(self, metric: Optional[float] = None) -> float:
        self.epoch += 1
        return self._lr(metric)

    def _lr(self, metric):
        raise NotImplementedError


class ConstantLR(Scheduler):
    """LambdaLR with constant lambda (optimizer.py:27-31)."""

    def _lr(self, metric):
        return self.base_lr


class StepLR(Scheduler):
    def __init__(self, base_lr, step_size=3, gamma=0.8):
        super().__init__(base_lr)
        self.step_size, self.gamma = step_size, gamma

    def _lr(self, metric):
        return self.base_lr * self.gamma ** (self.epoch // self.step_size)


class MultiStepLR(Scheduler):
    def __init__(self, base_lr, milestones=(70, 140, 190), gamma=0.1):
        super().__init__(base_lr)
        self.milestones, self.gamma = milestones, gamma

    def _lr(self, metric):
        k = sum(1 for m in self.milestones if self.epoch >= m)
        return self.base_lr * self.gamma ** k


class ExponentialLR(Scheduler):
    def __init__(self, base_lr, gamma=0.99):
        super().__init__(base_lr)
        self.gamma = gamma

    def _lr(self, metric):
        return self.base_lr * self.gamma ** self.epoch


class CosineAnnealingLR(Scheduler):
    def __init__(self, base_lr, t_max=20, eta_min=0.0):
        super().__init__(base_lr)
        self.t_max, self.eta_min = t_max, eta_min

    def _lr(self, metric):
        return (self.eta_min + (self.base_lr - self.eta_min)
                * (1 + math.cos(math.pi * self.epoch / self.t_max)) / 2)


class CyclicLR(Scheduler):
    """Triangular cycle 1e-5 .. 0.1 (torch defaults step_size_up=2000;
    Lightning steps it per epoch, so in practice a slow linear ramp)."""

    def __init__(self, base_lr, low=1e-5, high=0.1, step_size=2000):
        super().__init__(base_lr)
        self.low, self.high, self.step_size = low, high, step_size

    def _lr(self, metric):
        cycle = math.floor(1 + self.epoch / (2 * self.step_size))
        x = abs(self.epoch / self.step_size - 2 * cycle + 1)
        return self.low + (self.high - self.low) * max(0.0, 1 - x)


class ReduceLROnPlateau(Scheduler):
    """torch semantics with the reference's arguments: mode='max', patience 3,
    threshold 0.9 (rel), factor 0.1 — monitoring val_loss
    (optimizer.py:17, run.py:88 monitor).  Note the reference monitors a
    *loss* in 'max' mode — kept, and configurable via ``mode``."""

    def __init__(self, base_lr, mode="max", factor=0.1, patience=3,
                 threshold=0.9, min_lr=0.0):
        super().__init__(base_lr)
        self.mode, self.factor, self.patience = mode, factor, patience
        self.threshold, self.min_lr = threshold, min_lr
        self.best = None
        self.bad_epochs = 0
        self.lr = base_lr

    def _improved(self, metric):
        if self.best is None:
            return True
        if self.mode == "max":
            return metric > self.best * (1 + self.threshold)
        return metric < self.best * (1 - self.threshold)

    def _lr(self, metric):
        if metric is None:
            return self.lr
        if self._improved(metric):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr


def build_scheduler(cfg) -> Scheduler:
    name = cfg.lr_scheduler
    if name == "ReduceLROnPlateau":
        return ReduceLROnPlateau(cfg.lr, patience=cfg.patience,
                                 threshold=cfg.threshold)
    if name == "StepLR":
        return StepLR(cfg.lr)
    if name == "MultiStepLR":
        return MultiStepLR(cfg.lr)
    if name == "ExponentialLR":
        return ExponentialLR(cfg.lr)
    if name == "CosineAnnealingLR":
        return CosineAnnealingLR(cfg.lr)
    if name == "LambdaLR":
        return ConstantLR(cfg.lr)
    if name == "CyclicLR":
        return CyclicLR(cfg.lr)
    raise ValueError(f"unknown scheduler {name!r}")
