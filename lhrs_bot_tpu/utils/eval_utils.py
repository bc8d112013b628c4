"""Generation stopping utilities + dtype name table.

Parity with lhrs/utils/eval_utils.py:4-56 (StoppingCriteriaSub /
KeywordsStoppingCriteria / type_dict): keyword-based stopping adapted to the
engine's stop_fn protocol (a callable over the emitted token list).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax.numpy as jnp
import numpy as np

type_dict = {
    "float16": jnp.bfloat16,  # fp16 configs run as bf16 on TPU
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
}


class KeywordsStopper:
    """stop_fn: stop generation once any keyword appears in the decoded
    continuation (KeywordsStoppingCriteria parity, eval_utils.py:21-56)."""

    def __init__(self, tokenizer, keywords: Sequence[str]):
        self.tokenizer = tokenizer
        self.keywords = list(keywords)

    def __call__(self, emitted_ids: List[int]) -> bool:
        # check a bounded tail so decode cost stays O(1) per step
        tail = emitted_ids[-12:]
        text = self.tokenizer.decode(tail)
        return any(kw in text for kw in self.keywords)


def make_token_stopper(stop_ids: Sequence[int]) -> Callable[[List[int]], bool]:
    """stop_fn on raw ids (StoppingCriteriaSub parity)."""
    stop_set = set(int(i) for i in stop_ids)

    def stop(emitted_ids: List[int]) -> bool:
        return bool(emitted_ids) and emitted_ids[-1] in stop_set

    return stop
