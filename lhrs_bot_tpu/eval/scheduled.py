"""Continuous-batching generation for the eval protocols.

The eval CLIs batch with `engine.generate`, which steps EVERY row for
max_new_tokens — rows that hit EOS early still burn decode dispatches,
and each batch waits for its slowest row. Routing the same items through
the ContinuousBatchingScheduler frees a slot the moment its sequence
finishes and admits the next item between ticks, so ragged generation
lengths (VQA answers span 1-50 tokens) stop costing worst-case decode.
Greedy outputs are token-identical to the engine path (same programs,
same clamps — asserted in tests/test_eval_serve.py).

Items stream lazily: only ~2 x max_batch items (and their images) are
resident at once, and a request's image is dropped as soon as its prefill
is done — eval sets of any size run in bounded host memory.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import numpy as np


def scheduler_generate(
    vlm_cfg,
    engine,
    items: Iterable[Dict],
    total: int,
    *,
    gen_cfg,
    max_batch: int = 8,
    tokens_per_tick: int = 8,
    log_every: int = 50,
    logger=None,
) -> List[List[int]]:
    """Generate for `total` items (dicts with "input_ids" and optional
    "image") through a continuous-batching scheduler; returns output token
    lists aligned with item order."""
    from ..serve.scheduler import ContinuousBatchingScheduler, Request

    sched = ContinuousBatchingScheduler(
        vlm_cfg, engine.params, engine.llama_params,
        max_batch=max_batch, max_seq_len=engine.max_seq_len,
        cache_dtype=engine.cache_dtype,
        tokens_per_tick=tokens_per_tick, gen_cfg=gen_cfg)

    it = iter(items)
    reqs: List[Request] = []
    buffer: List[Request] = []
    pulled = 0
    done = 0

    def pull():
        nonlocal pulled
        while len(buffer) < 2 * max_batch and pulled < total:
            item = next(it)
            img = item.get("image")
            buffer.append(Request(
                uid=pulled,
                input_ids=np.asarray(item["input_ids"], np.int32),
                image=None if img is None else np.asarray(img),
                max_new_tokens=gen_cfg.max_new_tokens))
            pulled += 1

    pull()
    while buffer or sched.active.any():
        if buffer:
            n = sched.admit(buffer)
            for r in buffer[:n]:
                r.image = None  # prefill copied it; release host memory
            reqs.extend(buffer[:n])
            buffer = buffer[n:]
        sched.step()
        finished = sum(1 for r in reqs if r.done)
        if logger is not None and finished // log_every > done // log_every:
            logger.info("eval %d/%d", finished, total)
        done = finished
        pull()
    assert len(reqs) == total, (len(reqs), total)
    return [r.output_ids for r in sorted(reqs, key=lambda r: r.uid)]
