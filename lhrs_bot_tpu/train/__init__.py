from .hooks import (  # noqa: F401
    CheckpointHook,
    EpochSeedHook,
    EvalHook,
    HookBase,
    LoggerHook,
    LRSchedulerHook,
)
from .metric import HistoryBuffer, MetricStorage  # noqa: F401
from .optimizer import adan, build_optimizer, weight_decay_mask  # noqa: F401
from .schedule import build_schedule  # noqa: F401
from .trainer import EpochBasedTrainer, IterBasedTrainer, Trainer, make_train_step  # noqa: F401
