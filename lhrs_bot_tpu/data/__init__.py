from . import collate, conversation, datasets, preprocess, tokenizer, transforms  # noqa: F401
from .build_loader import build_loader, build_zero_shot_loader  # noqa: F401
from .loader import DataLoader, InfiniteSampler, ShardedSampler, WeightedShardedSampler  # noqa: F401
