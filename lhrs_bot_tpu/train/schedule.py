"""LR schedule family as optax schedules.

Parity with the reference's scheduler-hook family
(lhrs/CustomTrainer/hook/lr_scheduler_hook.py:148-735): fixed, step, exp,
poly, inv, cosine, flat-cosine, cosine-restart, linear-annealing — each with
iteration-based warmup (constant / linear / exp warmup of a base factor).
On TPU the schedule is a pure function of the step folded into the jitted
optimizer update, not a per-iter host-side hook.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import optax


def _warmup_wrap(
    schedule: Callable,
    base_lr: float,
    warmup_iters: int = 0,
    warmup_method: str = "linear",
    warmup_factor: float = 0.1,
) -> Callable:
    """Scale the schedule during warmup, matching the reference's semantics
    (lr_scheduler_hook.py: warmup 'constant'|'linear'|'exp' ramps a factor
    from warmup_factor to 1 over warmup_iters)."""
    if warmup_iters <= 0:
        return schedule

    def wrapped(step):
        step_f = jnp.asarray(step, jnp.float32)
        frac = jnp.clip(step_f / warmup_iters, 0.0, 1.0)
        if warmup_method == "constant":
            factor = jnp.asarray(warmup_factor, jnp.float32)
        elif warmup_method == "exp":
            factor = warmup_factor ** (1.0 - frac)
        else:  # linear
            factor = warmup_factor * (1.0 - frac) + frac
        in_warmup = step_f < warmup_iters
        return jnp.where(in_warmup, schedule(step) * factor, schedule(step))

    return wrapped


def cosine(base_lr: float, total_iters: int, min_lr: float = 0.0,
           **warmup) -> Callable:
    def fn(step):
        t = jnp.clip(jnp.asarray(step, jnp.float32) / max(total_iters, 1), 0, 1)
        return min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * t))
    return _warmup_wrap(fn, base_lr, **warmup)


def flat_cosine(base_lr: float, total_iters: int, start_percent: float = 0.75,
                min_lr: float = 0.0, **warmup) -> Callable:
    flat_until = int(total_iters * start_percent)

    def fn(step):
        step_f = jnp.asarray(step, jnp.float32)
        t = jnp.clip((step_f - flat_until) / max(total_iters - flat_until, 1),
                     0, 1)
        cos_val = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step_f < flat_until, base_lr, cos_val)
    return _warmup_wrap(fn, base_lr, **warmup)


def cosine_restart(base_lr: float, periods: Sequence[int],
                   restart_weights: Sequence[float] = None,
                   min_lr: float = 0.0, **warmup) -> Callable:
    restart_weights = restart_weights or [1.0] * len(periods)
    starts = [0]
    for p in periods[:-1]:
        starts.append(starts[-1] + p)

    def fn(step):
        step_f = jnp.asarray(step, jnp.float32)
        lr = jnp.asarray(min_lr, jnp.float32)
        for start, period, w in zip(starts, periods, restart_weights):
            t = jnp.clip((step_f - start) / period, 0, 1)
            seg = min_lr + 0.5 * (base_lr * w - min_lr) * (1 + jnp.cos(jnp.pi * t))
            inside = (step_f >= start) & (step_f < start + period)
            lr = jnp.where(inside, seg, lr)
        return lr
    return _warmup_wrap(fn, base_lr, **warmup)


def step_decay(base_lr: float, milestones: Sequence[int], gamma: float = 0.1,
               **warmup) -> Callable:
    def fn(step):
        step_f = jnp.asarray(step, jnp.float32)
        factor = jnp.asarray(1.0, jnp.float32)
        for m in milestones:
            factor = jnp.where(step_f >= m, factor * gamma, factor)
        return base_lr * factor
    return _warmup_wrap(fn, base_lr, **warmup)


def exp_decay(base_lr: float, gamma: float, **warmup) -> Callable:
    def fn(step):
        return base_lr * gamma ** jnp.asarray(step, jnp.float32)
    return _warmup_wrap(fn, base_lr, **warmup)


def poly_decay(base_lr: float, total_iters: int, power: float = 1.0,
               min_lr: float = 0.0, **warmup) -> Callable:
    def fn(step):
        t = jnp.clip(jnp.asarray(step, jnp.float32) / max(total_iters, 1), 0, 1)
        return (base_lr - min_lr) * (1 - t) ** power + min_lr
    return _warmup_wrap(fn, base_lr, **warmup)


def inv_decay(base_lr: float, gamma: float, power: float = 1.0,
              **warmup) -> Callable:
    def fn(step):
        return base_lr * (1 + gamma * jnp.asarray(step, jnp.float32)) ** (-power)
    return _warmup_wrap(fn, base_lr, **warmup)


def linear_annealing(base_lr: float, total_iters: int, min_lr: float = 0.0,
                     **warmup) -> Callable:
    def fn(step):
        t = jnp.clip(jnp.asarray(step, jnp.float32) / max(total_iters, 1), 0, 1)
        return base_lr + (min_lr - base_lr) * t
    return _warmup_wrap(fn, base_lr, **warmup)


def fixed(base_lr: float, **warmup) -> Callable:
    return _warmup_wrap(lambda step: jnp.asarray(base_lr, jnp.float32),
                        base_lr, **warmup)


def _anneal(strategy: str):
    """annealing_cos / annealing_linear (lr_scheduler_hook.py:690-735)."""
    if strategy == "linear":
        return lambda start, end, factor: start + (end - start) * factor
    return lambda start, end, factor: (
        end + 0.5 * (start - end) * (1 + jnp.cos(jnp.pi * factor)))


def cyclic(base_lr: float, total_iters: int,
           target_ratio: Sequence[float] = (10.0, 1e-4),
           cyclic_times: int = 1, step_ratio_up: float = 0.4,
           anneal_strategy: str = "cos", gamma: float = 1.0,
           **warmup) -> Callable:
    """CLR with cosine annealing inside each cycle and per-cycle decay
    (CyclicLrUpdaterHook, lr_scheduler_hook.py:402-517): an up phase from
    base_lr to base_lr*target_ratio[0], then down to base_lr*target_ratio[1];
    gamma<1 shrinks the peak each cycle via ratio' = 1 - γ^c + ratio·γ^c."""
    assert 0 <= step_ratio_up < 1.0 and 0 < gamma <= 1
    max_phase = max(total_iters // max(cyclic_times, 1), 1)
    iter_up = int(step_ratio_up * max_phase)
    anneal = _anneal(anneal_strategy)
    tr0, tr1 = float(target_ratio[0]), float(target_ratio[1])

    def fn(step):
        step_f = jnp.asarray(step, jnp.float32)
        curr = jnp.mod(step_f, max_phase)
        cycle = jnp.floor(step_f / max_phase)
        scale = gamma ** cycle
        peak = 1.0 - scale + tr0 * scale  # cycle-scaled peak ratio
        lr_up = anneal(base_lr, base_lr * peak,
                       curr / max(iter_up, 1))
        lr_down = anneal(base_lr * peak, base_lr * tr1,
                         (curr - iter_up) / max(max_phase - iter_up, 1))
        return jnp.where(curr < iter_up, lr_up, lr_down)

    return _warmup_wrap(fn, base_lr, **warmup)


def one_cycle(max_lr: float, total_iters: int, pct_start: float = 0.3,
              anneal_strategy: str = "cos", div_factor: float = 25.0,
              final_div_factor: float = 1e4, three_phase: bool = False,
              **warmup) -> Callable:
    """1cycle policy (OneCycleLrUpdaterHook, lr_scheduler_hook.py:520-656):
    warm up from max_lr/div_factor to max_lr over pct_start of the run, then
    anneal to initial_lr/final_div_factor (optionally via a symmetric third
    phase)."""
    if not 0.0 <= pct_start <= 1.0:
        raise ValueError(f"pct_start must be in [0, 1], got {pct_start}")
    init_lr = max_lr / div_factor
    anneal = _anneal(anneal_strategy)
    if three_phase:
        phases = [
            (float(pct_start * total_iters) - 1, 1.0, div_factor),
            (float(2 * pct_start * total_iters) - 2, div_factor, 1.0),
            (float(total_iters) - 1, 1.0, 1.0 / final_div_factor),
        ]
    else:
        phases = [
            (float(pct_start * total_iters) - 1, 1.0, div_factor),
            (float(total_iters) - 1, div_factor, 1.0 / final_div_factor),
        ]

    def fn(step):
        step_f = jnp.asarray(step, jnp.float32)
        # evaluate phases back to front; the earliest phase containing the
        # step wins (reference get_lr breaks on the first match)
        starts = [0.0] + [p[0] for p in phases[:-1]]
        end_l, sr_l, er_l = phases[-1]
        pct = jnp.clip((step_f - starts[-1]) / max(end_l - starts[-1], 1e-8),
                       0.0, 1.0)
        lr = anneal(init_lr * sr_l, init_lr * er_l, pct)
        for (end, sr, er), start in zip(reversed(phases[:-1]),
                                        reversed(starts[:-1])):
            pct = (step_f - start) / max(end - start, 1e-8)
            cand = anneal(init_lr * sr, init_lr * er, pct)
            lr = jnp.where(step_f <= end, cand, lr)
        return lr

    return _warmup_wrap(fn, max_lr, **warmup)


def build_schedule(config, total_iters: int, iters_per_epoch: int = 1):
    """From the YAML schedule block (Config/*.yaml `schedule:` + `lr`).

    The reference expresses warmup in *epochs* that IterBased trainers treat
    as iterations (Config/multi_modal_stage1.yaml:99 `warmup_epochs: 300` with
    epochs=1); we pass warmup_iters = warmup_epochs * iters_per_epoch.
    """
    sched_cfg = getattr(config, "schedule", None) or {}
    name = str(sched_cfg.get("name", "cosine")).lower()
    base_lr = float(config.lr)
    min_lr = float(sched_cfg.get("min_lr", 0.0))
    warmup = dict(
        warmup_iters=int(sched_cfg.get("warmup_epochs", 0) * iters_per_epoch),
        warmup_method=sched_cfg.get("warmup_method", "linear"),
        warmup_factor=float(sched_cfg.get("warmup_factor", 0.1)),
    )
    if name == "cosine":
        return cosine(base_lr, total_iters, min_lr, **warmup)
    if name == "flat_cosine":
        return flat_cosine(base_lr, total_iters, min_lr=min_lr, **warmup)
    if name == "step":
        return step_decay(base_lr, sched_cfg.get("multisteps", []),
                          float(sched_cfg.get("gamma", 0.1)), **warmup)
    if name == "exp":
        return exp_decay(base_lr, float(sched_cfg.get("gamma", 0.99)), **warmup)
    if name == "poly":
        return poly_decay(base_lr, total_iters,
                          float(sched_cfg.get("power", 1.0)), min_lr, **warmup)
    if name == "inv":
        return inv_decay(base_lr, float(sched_cfg.get("gamma", 0.1)),
                         float(sched_cfg.get("power", 1.0)), **warmup)
    if name == "linear":
        return linear_annealing(base_lr, total_iters, min_lr, **warmup)
    if name in ("fixed", "const", "constant"):
        return fixed(base_lr, **warmup)
    if name == "cyclic":
        return cyclic(
            base_lr, total_iters,
            target_ratio=tuple(sched_cfg.get("target_ratio", (10.0, 1e-4))),
            cyclic_times=int(sched_cfg.get("cyclic_times", 1)),
            step_ratio_up=float(sched_cfg.get("step_ratio_up", 0.4)),
            anneal_strategy=str(sched_cfg.get("anneal_strategy", "cos")),
            gamma=float(sched_cfg.get("gamma", 1.0)), **warmup)
    if name in ("one_cycle", "onecycle", "1cycle"):
        return one_cycle(
            float(sched_cfg.get("max_lr", base_lr)),
            int(sched_cfg.get("total_steps", total_iters)),
            pct_start=float(sched_cfg.get("pct_start", 0.3)),
            anneal_strategy=str(sched_cfg.get("anneal_strategy", "cos")),
            div_factor=float(sched_cfg.get("div_factor", 25.0)),
            final_div_factor=float(sched_cfg.get("final_div_factor", 1e4)),
            three_phase=bool(sched_cfg.get("three_phase", False)), **warmup)
    raise ValueError(f"unknown schedule {name!r}")
