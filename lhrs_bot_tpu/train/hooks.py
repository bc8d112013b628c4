"""Hook protocol + standard hooks for the trainer.

Parity with the reference's hook system (lhrs/CustomTrainer/hook/hookbase.py:
1-101 and the hook zoo, SURVEY.md §2.2 rows H1-H7): 8 phases
(before/after_train, before/after_epoch, before/after_iter, after_backward,
after_step), checkpointable hooks expose state_dict.

Differences by design: the optimizer/LR/AMP hooks (H1/H2/H5) have no runtime
role here — the optimizer update, LR schedule and bf16 policy are folded into
the jitted train step — so LRSchedulerHook only *reports* the schedule value,
and there is no DeepSpeedHook at all (pjit + sharded optimizer state replace
the engine).
"""

from __future__ import annotations

import datetime
import logging
import os
import time
from typing import Callable, Dict, List, Optional

from ..core.checkpoint import save_checkpoint
from .metric import MetricStorage

logger = logging.getLogger("lhrs_tpu")


class HookBase:
    trainer = None  # set by Trainer.register_hook

    def before_train(self): ...
    def after_train(self): ...
    def before_epoch(self): ...
    def after_epoch(self): ...
    def before_iter(self): ...
    def after_iter(self): ...
    def after_backward(self): ...
    def after_step(self): ...

    @property
    def checkpointable(self) -> bool:
        return callable(getattr(self, "state_dict", None))

    @property
    def class_name(self) -> str:
        return self.__class__.__name__


class LoggerHook(HookBase):
    """Console + optional TensorBoard logging every `period` iters
    (reference logger_hook.py:16-163: losses, lr, data/iter time, ETA)."""

    def __init__(self, period: int = 50, tb_log_dir: Optional[str] = None,
                 use_tensorboard: bool = False, use_wandb: bool = False,
                 wandb_config: Optional[dict] = None):
        self.period = period
        self._writer = None
        self._wandb = None
        if use_tensorboard and tb_log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(tb_log_dir)
            except Exception:  # pragma: no cover
                logger.warning("tensorboard unavailable; console only")
        if use_wandb:
            try:  # optional sink (reference logger_hook.py:156-163)
                import wandb

                wandb.init(project="lhrs-bot-tpu", config=wandb_config)
                self._wandb = wandb
            except Exception:  # pragma: no cover
                logger.warning("wandb unavailable; skipping")
        self._start_time = None

    def before_train(self):
        self._start_time = time.perf_counter()

    def after_iter(self):
        t = self.trainer
        if (t.cur_iter + 1) % self.period and t.cur_iter + 1 != t.max_iters:
            return
        ms = t.metric_storage
        vals = ms.values_maybe_smooth()
        elapsed = time.perf_counter() - self._start_time
        done = t.cur_iter + 1 - t.start_iter
        eta = datetime.timedelta(
            seconds=int(elapsed / max(done, 1) * (t.max_iters - t.cur_iter - 1)))
        parts = [f"iter {t.cur_iter + 1}/{t.max_iters}", f"eta {eta}"]
        parts += [f"{k} {v:.4g}" for k, v in sorted(vals.items())]
        logger.info("  ".join(parts))
        if self._writer is not None:
            for k, v in vals.items():
                self._writer.add_scalar(k, v, t.cur_iter)
        if self._wandb is not None:
            self._wandb.log(vals, step=t.cur_iter)

    def after_train(self):
        if self._writer is not None:
            self._writer.close()
        if self._wandb is not None:
            self._wandb.finish()


class CheckpointHook(HookBase):
    """Periodic checkpoints with max_to_keep pruning (checkpoint_hook.py:10-71)."""

    def __init__(self, period: int, max_to_keep: Optional[int] = 1,
                 by_epoch: bool = False):
        self.period = period
        self.max_to_keep = max_to_keep
        self.by_epoch = by_epoch

    def _maybe_save(self, counter: int):
        if (counter + 1) % self.period == 0:
            self.trainer.save(max_to_keep=self.max_to_keep)

    def after_iter(self):
        if not self.by_epoch:
            self._maybe_save(self.trainer.cur_iter)

    def after_epoch(self):
        if self.by_epoch:
            self._maybe_save(self.trainer.cur_epoch)

    def after_train(self):
        self.trainer.save(max_to_keep=self.max_to_keep)


class LRSchedulerHook(HookBase):
    """Records the (jit-side) schedule value into metrics for observability."""

    def __init__(self, schedule: Callable):
        self.schedule = schedule

    def after_iter(self):
        t = self.trainer
        t.metric_storage.update(lr=float(self.schedule(t.cur_iter)),
                                smooth=False)


class EvalHook(HookBase):
    """Run an eval callable periodically; track the best metric and save a
    best checkpoint (reference eval_hook.py:21-187)."""

    def __init__(self, period: int, eval_fn: Callable[[], Dict[str, float]],
                 key: str = "accuracy", by_epoch: bool = False,
                 save_best: bool = True):
        self.period = period
        self.eval_fn = eval_fn
        self.key = key
        self.by_epoch = by_epoch
        self.save_best = save_best
        self.best = float("-inf")

    def _maybe_eval(self, counter: int):
        if (counter + 1) % self.period:
            return
        metrics = self.eval_fn()
        self.trainer.metric_storage.update(smooth=False, **metrics)
        score = metrics.get(self.key)
        if score is not None and score > self.best:
            self.best = score
            if self.save_best:
                self.trainer.save(tag="best")

    def after_iter(self):
        if not self.by_epoch:
            self._maybe_eval(self.trainer.cur_iter)

    def after_epoch(self):
        if self.by_epoch:
            self._maybe_eval(self.trainer.cur_epoch)

    def state_dict(self):
        return {"best": self.best}

    def load_state_dict(self, state):
        self.best = state.get("best", float("-inf"))


class EpochSeedHook(HookBase):
    """Re-seed the data sampler each epoch (DistributedHook parity,
    distributed_hook.py:4-13)."""

    def before_epoch(self):
        loader = self.trainer.data_loader
        if hasattr(loader, "set_epoch"):
            loader.set_epoch(self.trainer.cur_epoch)
