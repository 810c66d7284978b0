"""LR schedules (parity: basicsr/models/lr_scheduler.py + base_model.py).

Each builder returns an optax-style ``schedule(step) -> lr`` callable.
The reference steps its scheduler once per iteration (train.py:229), so
``step`` counts iterations.  Linear warmup multiplies on top
(base_model.py:158-180: ``init_lr * current_iter / warmup_iter``).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp

__all__ = [
    "true_cosine_annealing", "cosine_annealing_restart",
    "multi_step_restart", "linear_lr", "vibrate_lr", "with_warmup",
    "build_schedule",
]


def true_cosine_annealing(base_lr: float, t_max: int, eta_min: float = 0.0):
    """torch CosineAnnealingLR as wired by base_model.py:91-95."""
    def schedule(step):
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1 + jnp.cos(jnp.pi * step / t_max))
    return schedule


def cosine_annealing_restart(base_lr: float, periods: Sequence[int],
                             restart_weights: Sequence[float] = (1,),
                             eta_min: float = 0.0):
    """lr_scheduler.py:135-183."""
    assert len(periods) == len(restart_weights)
    cumulative = [sum(periods[: i + 1]) for i in range(len(periods))]

    def schedule(step):
        lr = jnp.asarray(base_lr, jnp.float32)
        for idx in range(len(periods)):
            lo = 0 if idx == 0 else cumulative[idx - 1]
            in_seg = (step >= lo) & (step < cumulative[idx]) if idx < len(periods) - 1 \
                else (step >= lo)
            seg_lr = eta_min + restart_weights[idx] * 0.5 * (base_lr - eta_min) * (
                1 + jnp.cos(jnp.pi * (step - lo) / periods[idx]))
            lr = jnp.where(in_seg, seg_lr, lr)
        return lr
    return schedule


def multi_step_restart(base_lr: float, milestones: Sequence[int],
                       gamma: float = 0.1,
                       restarts: Sequence[int] = (0,),
                       restart_weights: Sequence[float] = (1,)):
    """lr_scheduler.py:6-46 (piecewise-constant with restarts)."""
    def schedule(step):
        lr = jnp.asarray(base_lr, jnp.float32)
        for m in sorted(milestones):
            lr = jnp.where(step >= m, lr * gamma, lr)
        for r, w in zip(restarts, restart_weights):
            if r > 0:
                decay_after = sum(1 for m in milestones if m >= r)
                restart_lr = base_lr * w
                for m in sorted(milestones):
                    if m >= r:
                        restart_lr = jnp.where(step >= m, restart_lr * gamma,
                                               restart_lr)
                lr = jnp.where(step >= r, restart_lr, lr)
        return lr
    return schedule


def linear_lr(base_lr: float, total_iter: int):
    """lr_scheduler.py:48-69."""
    def schedule(step):
        return base_lr * (1 - step / total_iter)
    return schedule


def vibrate_lr(base_lr: float, total_iter: int):
    """lr_scheduler.py:71-112 (triangular oscillation under an envelope)."""
    T = total_iter // 80
    Th = T // 2

    def schedule(step):
        process = step / total_iter
        f = jnp.where(process < 3 / 8, 1 - process * 8 / 3,
                      jnp.where(process < 5 / 8, 0.2, 0.1))
        t = step % T
        f2 = t / Th
        f2 = jnp.where(t >= Th, 2 - f2, f2)
        weight = f * f2
        weight = jnp.where(step < Th, jnp.maximum(weight, 0.1), weight)
        return base_lr * weight
    return schedule


def with_warmup(schedule, base_lr: float, warmup_iter: int):
    """Linear warmup override for the first ``warmup_iter`` steps
    (base_model.py:170-180 multiplies init_lr by current/warmup)."""
    if warmup_iter <= 0:
        return schedule

    def warmed(step):
        return jnp.where(step < warmup_iter,
                         base_lr * step / warmup_iter, schedule(step))
    return warmed


def build_schedule(scheduler_opt: dict, base_lr: float, total_iter: int,
                   warmup_iter: int = -1):
    """Build from a reference-style ``train.scheduler`` YAML dict."""
    opt = dict(scheduler_opt)
    typ = opt.pop("type")
    if typ in ("TrueCosineAnnealingLR", "CosineAnnealingLR"):
        sched = true_cosine_annealing(base_lr, opt.get("T_max", total_iter),
                                      opt.get("eta_min", 0.0))
    elif typ == "CosineAnnealingRestartLR":
        sched = cosine_annealing_restart(base_lr, opt["periods"],
                                         opt.get("restart_weights", (1,)),
                                         opt.get("eta_min", 0.0))
    elif typ == "MultiStepLR":
        sched = multi_step_restart(base_lr, opt["milestones"],
                                   opt.get("gamma", 0.1))
    elif typ == "MultiStepRestartLR":
        sched = multi_step_restart(base_lr, opt["milestones"],
                                   opt.get("gamma", 0.1),
                                   opt.get("restarts", (0,)),
                                   opt.get("restart_weights", (1,)))
    elif typ == "LinearLR":
        sched = linear_lr(base_lr, opt.get("total_iter", total_iter))
    elif typ == "VibrateLR":
        sched = vibrate_lr(base_lr, opt.get("total_iter", total_iter))
    else:
        raise ValueError(f"unknown scheduler {typ!r}")
    return with_warmup(sched, base_lr, warmup_iter)
