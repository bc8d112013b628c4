"""Optimizers: AdamW and Adan (optax), with reference param-group semantics.

Parity targets:
  * build_optimizer (lhrs/optimizer/build_optimizer.py:18-86): no weight decay
    for 1-D params (norms, biases) — expressed here as an optax mask;
  * stage-1 recipe uses "adanp" (Adan without the proximal/final weight-decay
    step, from timm) and stages 2/3 use AdamW (main_pretrain_stage1.py:208-213,
    Config yamls) — both provided;
  * gradient clipping by global norm (max_grad_norm), gradient accumulation
    (optax.MultiSteps replaces the reference's GradientCumulativeOptimizerHook,
    hook/optimizer_hook.py:158-184);
  * per-stage trainability (UniBind.prepare_for_training) via a boolean mask
    pytree zeroing updates of frozen leaves.

No GradScaler/fp16 machinery: TPU trains in bf16 compute + f32 params, which
replaces the reference's Fp16OptimizerHook (hook/optimizer_hook.py:187-298).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def weight_decay_mask(params) -> Any:
    """True (decay) for tensors with ndim > 1 — matches the reference's
    skip-list of 1-D/bias params. Tolerates optax.MaskedNode placeholders
    (frozen leaves under optax.masked)."""
    return jax.tree_util.tree_map(
        lambda p: getattr(p, "ndim", 0) > 1, params)


# ---------------------------------------------------------------------------
# Adan (Adaptive Nesterov Momentum, arXiv:2208.06677)
# ---------------------------------------------------------------------------


class AdanState(NamedTuple):
    count: jnp.ndarray
    m: Any  # EMA of grads
    v: Any  # EMA of grad differences
    n: Any  # EMA of squared (g + (1-b2) * diff)
    prev_grad: Any


def adan(
    learning_rate,
    b1: float = 0.98,
    b2: float = 0.92,
    b3: float = 0.99,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    mask: Optional[Any] = None,
    no_prox: bool = True,  # "adanp": skip the proximal step (timm variant)
) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdanState(jnp.zeros([], jnp.int32), zeros(), zeros(), zeros(),
                         zeros())

    def update_fn(grads, state, params=None):
        count = state.count + 1
        is_first = count == 1
        prev = jax.tree_util.tree_map(
            lambda g, pg: jnp.where(is_first, g, pg), grads, state.prev_grad)
        diff = jax.tree_util.tree_map(lambda g, p: g - p, grads, prev)

        m = jax.tree_util.tree_map(
            lambda m_, g: b1 * m_ + (1 - b1) * g, state.m, grads)
        v = jax.tree_util.tree_map(
            lambda v_, d: b2 * v_ + (1 - b2) * d, state.v, diff)
        n = jax.tree_util.tree_map(
            lambda n_, g, d: b3 * n_ + (1 - b3) * jnp.square(g + (1 - b2) * d),
            state.n, grads, diff)

        c = count.astype(jnp.float32)
        bc1 = 1 - b1 ** c
        bc2 = 1 - b2 ** c
        bc3 = 1 - b3 ** c

        def direction(m_, v_, n_):
            denom = jnp.sqrt(n_ / bc3) + eps
            return (m_ / bc1 + (1 - b2) * v_ / bc2) / denom

        updates = jax.tree_util.tree_map(direction, m, v, n)
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        mask_tree = mask(params) if callable(mask) else mask
        if mask_tree is None and params is not None:
            mask_tree = jax.tree_util.tree_map(lambda _: True, params)

        if no_prox or not weight_decay:
            # "adanp" (timm variant): decoupled decay p ← p·(1 − lr·wd) − lr·d
            if weight_decay:
                updates = jax.tree_util.tree_map(
                    lambda use, u, p: u + weight_decay * p if use else u,
                    mask_tree, updates, params)
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        else:
            # proximal Adan (arXiv:2208.06677 Alg.1): p ← (p − lr·d)/(1+lr·wd)
            # expressed as a delta: −(lr·d + lr·wd·p)/(1 + lr·wd)
            def prox(use, u, p):
                wd = weight_decay if use else 0.0
                return -(lr * u + lr * wd * p) / (1.0 + lr * wd)

            updates = jax.tree_util.tree_map(prox, mask_tree, updates, params)
        return updates, AdanState(count, m, v, n, grads)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# Builder
# ---------------------------------------------------------------------------


def build_optimizer(
    config,
    params,
    trainable: Optional[Any] = None,
    schedule=None,
) -> optax.GradientTransformation:
    """config: merged YAML ConfigDict (keys: optimizer, lr, wd, max_grad_norm,
    accumulation_steps optional). trainable: bool pytree from
    models.trainable_mask. schedule: optax schedule (overrides constant lr).
    """
    lr = schedule if schedule is not None else float(config.lr)
    wd = float(getattr(config, "wd", 0.0))
    name = str(getattr(config, "optimizer", "adamw")).lower()
    betas = getattr(config, "betas", None)

    if name in ("adanp", "adan"):
        tx = adan(lr, weight_decay=wd, mask=weight_decay_mask,
                  no_prox=(name == "adanp"))
    elif name in ("adamw", "adam"):
        b1 = float(betas[0]) if betas else 0.9
        b2 = float(betas[1]) if betas else 0.999
        tx = optax.adamw(lr, b1=b1, b2=b2, weight_decay=wd,
                         mask=weight_decay_mask)
    elif name == "sgd":
        tx = optax.sgd(lr, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    chain = []
    max_norm = float(getattr(config, "max_grad_norm", 0.0) or 0.0)
    if max_norm > 0:
        chain.append(optax.clip_by_global_norm(max_norm))
    chain.append(tx)
    tx = optax.chain(*chain)

    if trainable is not None:
        # moments exist ONLY for trainable leaves (optax.masked keeps
        # MaskedNode placeholders for the rest) — at 7B this is the
        # difference between ~2 GB and ~84 GB of optimizer state. masked()
        # passes raw grads through for unmasked leaves, so the frozen
        # complement is explicitly zeroed (stateless).
        frozen = jax.tree_util.tree_map(lambda t: not t, trainable)
        tx = optax.chain(
            optax.masked(tx, trainable),
            optax.masked(optax.set_to_zero(), frozen),
        )

    accum = int(getattr(config, "accumulation_steps", 1) or 1)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx
