"""Trainer runtime: jitted SPMD train step + hook-driven loop.

Parity with the reference trainer stack (lhrs/CustomTrainer/trainer.py:40-506,
EpochBasedTrainer.py:19-109, IterBasedTrainer.py:17-91): hook registration and
8-phase dispatch, per-iter metric gathering, checkpoint save/load with client
state (trainer progress, metric storage, hook states), data-iterator
fast-forward on resume, epoch- and iteration-based loops.

TPU-first differences:
  * the whole optimization step (loss, grads, clip, optimizer, LR schedule)
    is ONE jitted function — there are no backward/step hooks doing work, and
    DeepSpeed's engine is replaced by pjit-propagated shardings: params are
    placed per parallel/partition.py and XLA inserts the gradient psum
    (data axis) and TP collectives (model axis);
  * batches are host→device transferred with the "data"-axis sharding, so
    each chip receives only its shard;
  * metrics come back as a small scalar dict per step (device→host transfer
    of a few floats, asynchronously fetched one step late to avoid stalls).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import checkpoint as ckpt_lib
from ..models.vlm import VLMConfig, vlm_forward_loss
from ..parallel.mesh import DATA_AXIS
from ..parallel.partition import shard_params, to_named
from .hooks import CheckpointHook, HookBase, LoggerHook, LRSchedulerHook
from .metric import MetricStorage

logger = logging.getLogger("lhrs_tpu")


def make_train_step(
    cfg: VLMConfig,
    tx: optax.GradientTransformation,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    trainable=None,
    cp_mesh=None,
) -> Callable:
    """One fused optimization step.

    `trainable` (bool pytree like the params) restricts differentiation to
    the trainable leaves — without it, scan's backward materializes
    zero-gradient accumulators for every frozen stacked weight (~11 GB of
    zeros for a frozen 7B decoder, which OOMs a single chip)."""

    def step(params, opt_state, batch):
        if trainable is None:
            def loss_fn(p):
                out = vlm_forward_loss(p, cfg, batch,
                                       compute_dtype=compute_dtype,
                                       remat=remat, cp_mesh=cp_mesh)
                return out["total_loss"], out

            (_, out), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
        else:
            leaves, treedef = jax.tree_util.tree_flatten(params)
            mask_leaves = jax.tree_util.tree_leaves(trainable)
            train_leaves = [l for l, m in zip(leaves, mask_leaves) if m]

            def loss_fn(train_leaves_):
                it = iter(train_leaves_)
                full = [next(it) if m else jax.lax.stop_gradient(l)
                        for l, m in zip(leaves, mask_leaves)]
                p = jax.tree_util.tree_unflatten(treedef, full)
                out = vlm_forward_loss(p, cfg, batch,
                                       compute_dtype=compute_dtype,
                                       remat=remat, cp_mesh=cp_mesh)
                return out["total_loss"], out

            (_, out), g_list = jax.value_and_grad(
                loss_fn, has_aux=True)(train_leaves)
            git = iter(g_list)
            # frozen slots get scalar zeros: structurally valid for the
            # masked optimizer, algebraically eliminated by XLA
            grads = jax.tree_util.tree_unflatten(treedef, [
                next(git) if m else jnp.zeros((), l.dtype)
                for l, m in zip(leaves, mask_leaves)
            ])

        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = {
            "total_loss": out["total_loss"],
            "text_loss": out["text_loss"],
            "grad_norm": optax.global_norm(grads),
        }
        return new_params, new_opt_state, metrics

    return step


class Trainer:
    """Iteration-based core loop; EpochBasedTrainer adapts it to epochs."""

    def __init__(
        self,
        model_cfg: VLMConfig,
        params: Any,
        tx: optax.GradientTransformation,
        data_loader: Iterable,
        *,
        max_iters: Optional[int] = None,
        epochs: Optional[int] = None,
        epoch_len: Optional[int] = None,
        mesh=None,
        work_dir: str = "output",
        compute_dtype=jnp.bfloat16,
        remat: bool = False,
        log_period: int = 50,
        ckpt_period: Optional[int] = None,
        max_to_keep: int = 1,
        schedule: Optional[Callable] = None,
        use_tensorboard: bool = False,
        hooks: Optional[List[HookBase]] = None,
    ):
        self.model_cfg = model_cfg
        self.mesh = mesh
        self.work_dir = work_dir
        self.data_loader = data_loader
        self._data_iter = iter(data_loader)

        if epochs is not None:
            if epoch_len is None:
                epoch_len = len(data_loader)  # type: ignore[arg-type]
            self.epoch_len = epoch_len
            self.max_epochs = epochs
            self.max_iters = epochs * epoch_len
        else:
            assert max_iters is not None
            self.epoch_len = epoch_len or max_iters
            self.max_epochs = -(-max_iters // self.epoch_len)
            self.max_iters = max_iters

        self.cur_iter = 0
        self.start_iter = 0
        self.metric_storage = MetricStorage()
        self._pending_metrics = None

        self._opt_shardings = None
        if mesh is not None:
            params = shard_params(mesh, params)
            self.params = params
            # ZeRO-style placement: moments inherit TP specs; replicated
            # params' moments shard over the data axis (parallel/zero.py)
            from ..parallel.partition import vlm_param_specs
            from ..parallel.zero import opt_state_specs

            state_shapes = jax.eval_shape(tx.init, params)
            specs = opt_state_specs(state_shapes, params,
                                    vlm_param_specs(params), mesh)
            self._opt_shardings = to_named(mesh, specs)
            self.opt_state = jax.jit(
                tx.init, out_shardings=self._opt_shardings)(params)
        else:
            self.params = params
            self.opt_state = jax.jit(tx.init)(params)
        self._batch_sharding = (
            to_named(mesh, jax.sharding.PartitionSpec(DATA_AXIS))
            if mesh is not None else None
        )
        from ..models.vlm import trainable_mask

        self._step_fn = jax.jit(
            make_train_step(model_cfg, tx, compute_dtype, remat,
                            trainable=trainable_mask(params, model_cfg)),
            donate_argnums=(0, 1),
        )

        self._hooks: List[HookBase] = []
        default_hooks: List[HookBase] = []
        if schedule is not None:
            default_hooks.append(LRSchedulerHook(schedule))
        default_hooks.append(LoggerHook(
            log_period, tb_log_dir=os.path.join(work_dir, "tb"),
            use_tensorboard=use_tensorboard))
        if ckpt_period:
            default_hooks.append(CheckpointHook(ckpt_period, max_to_keep))
        for h in (hooks or []) + default_hooks:
            self.register_hook(h)

    # -- hooks --------------------------------------------------------------

    def register_hook(self, hook: HookBase) -> None:
        hook.trainer = self
        self._hooks.append(hook)

    def _dispatch(self, phase: str) -> None:
        for h in self._hooks:
            getattr(h, phase)()

    @property
    def cur_epoch(self) -> int:
        return self.cur_iter // self.epoch_len

    @property
    def inner_iter(self) -> int:
        return self.cur_iter % self.epoch_len

    # -- data ---------------------------------------------------------------

    def _next_batch(self):
        try:
            batch = next(self._data_iter)
        except StopIteration:
            self._data_iter = iter(self.data_loader)
            batch = next(self._data_iter)
        return self._put(batch)

    def _put(self, batch):
        if self._batch_sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(np.asarray(x), self._batch_sharding),
                batch)
        return jax.tree_util.tree_map(jnp.asarray, batch)

    # -- loop ---------------------------------------------------------------

    def train_on_iter(self) -> None:
        start = time.perf_counter()
        batch = self._next_batch()
        data_time = time.perf_counter() - start

        self.params, self.opt_state, metrics = self._step_fn(
            self.params, self.opt_state, batch)
        # one-step-late async fetch: dispatch step N, then fetch step N-1's
        # metrics — that host transfer overlaps with step N's device compute
        # instead of serializing every step on a blocking float().
        self._flush_metrics()
        self._pending_metrics = (self.cur_iter, metrics, data_time, start)

    def _flush_metrics(self) -> None:
        """Fetch the previous step's device metrics to the host (blocks only
        until THAT step finished, which has already been hidden behind the
        current step's dispatch). iter_time is the wall clock from the
        previous step's start to this flush — the steady-state per-iteration
        time including data loading."""
        if self._pending_metrics is None:
            return
        it, metrics, data_time, start_t = self._pending_metrics
        self._pending_metrics = None
        host_metrics = {k: float(v) for k, v in metrics.items()}
        iter_time = time.perf_counter() - start_t
        self.metric_storage.update(it, **host_metrics)
        self.metric_storage.update(it, data_time=data_time,
                                   iter_time=iter_time)

    def train(self, resume: bool = False) -> None:
        if resume:
            self.resume()
        logger.info("start training: iters %d→%d", self.cur_iter, self.max_iters)
        self._dispatch("before_train")
        epoch = -1
        while self.cur_iter < self.max_iters:
            if self.cur_epoch != epoch:
                if epoch >= 0:
                    self._dispatch("after_epoch")
                epoch = self.cur_epoch
                self._dispatch("before_epoch")
            self._dispatch("before_iter")
            self.train_on_iter()
            self._dispatch("after_iter")
            self.cur_iter += 1
        self._flush_metrics()
        self._dispatch("after_epoch")
        self._dispatch("after_train")

    # -- checkpoint ---------------------------------------------------------

    def save(self, tag: Optional[str] = None,
             max_to_keep: Optional[int] = None) -> str:
        self._flush_metrics()  # checkpointed metric storage must be current
        client_state = {
            "cur_iter": self.cur_iter,
            "world_size": jax.process_count(),
            "mesh_shape": dict(self.mesh.shape) if self.mesh else None,
            "metric_storage": self.metric_storage.state_dict(),
            "hooks": {
                h.class_name: h.state_dict()
                for h in self._hooks if h.checkpointable
            },
        }
        sub = "checkpoints" if tag is None else f"checkpoints_{tag}"
        ckpt_dir = os.path.join(self.work_dir, sub)
        return ckpt_lib.save_checkpoint(
            ckpt_dir, self.cur_iter, self.params, self.opt_state,
            client_state, max_to_keep=max_to_keep)

    def resume(self, path: Optional[str] = None) -> bool:
        ckpt_dir = os.path.join(self.work_dir, "checkpoints")
        path = path or ckpt_lib.latest_checkpoint(ckpt_dir)
        if path is None:
            logger.info("no checkpoint found; training from scratch")
            return False
        template = {"params": self.params, "opt_state": self.opt_state}
        restored = ckpt_lib.load_checkpoint(path, template)
        # params: re-place with the partition specs; opt_state: restore
        # *uncommitted* (plain jnp) so the jitted step re-places it alongside
        # the params — committing scalar leaves to one device would conflict
        # with mesh-sharded params inside jit.
        if self.mesh is not None:
            self.params = shard_params(self.mesh, restored["params"])
            self.opt_state = jax.tree_util.tree_map(
                lambda x, s: jax.device_put(np.asarray(x), s)
                if x is not None else None,
                restored["opt_state"], self._opt_shardings)
        else:
            self.params = jax.tree_util.tree_map(
                jnp.asarray, restored["params"])
            self.opt_state = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x) if x is not None else None,
                restored["opt_state"])
        cs = restored.get("client_state", {})
        saved_ws = cs.get("world_size")
        if saved_ws is not None and saved_ws != jax.process_count():
            # reference refuses world-size changes (trainer.py:325-330);
            # our sampler slicing is stateless so a warning suffices
            logger.warning(
                "resuming with world_size %d (checkpoint written with %d); "
                "data-order reproducibility is not preserved",
                jax.process_count(), saved_ws)
        self.cur_iter = cs.get("cur_iter", restored["step"])
        self.start_iter = self.cur_iter
        self.metric_storage.load_state_dict(cs.get("metric_storage", {}))
        for h in self._hooks:
            if h.checkpointable and h.class_name in cs.get("hooks", {}):
                h.load_state_dict(cs["hooks"][h.class_name])
        # fast-forward the data iterator to the resumed position
        # (reference trainer.py:356-358)
        skip = self.cur_iter % max(len(self.data_loader), 1) if hasattr(
            self.data_loader, "__len__") else 0
        for _ in range(skip):
            try:
                next(self._data_iter)
            except StopIteration:
                self._data_iter = iter(self.data_loader)
        logger.info("resumed from %s at iter %d", path, self.cur_iter)
        return True


class EpochBasedTrainer(Trainer):
    """API parity with the reference EpochBasedTrainer (EpochBasedTrainer.py:
    19-109): `epochs` semantics with cur_iter = epoch*epoch_len+inner_iter."""

    def __init__(self, *args, epochs: int, **kwargs):
        super().__init__(*args, epochs=epochs, **kwargs)


class IterBasedTrainer(Trainer):
    """API parity with IterBasedTrainer (IterBasedTrainer.py:17-91)."""

    def __init__(self, *args, max_iters: int, **kwargs):
        super().__init__(*args, max_iters=max_iters, **kwargs)
