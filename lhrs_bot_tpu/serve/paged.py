"""Paged continuous batching: admission limited by TOKENS, not slots.

`ContinuousBatchingScheduler` reserves max_seq_len rows per slot, so a
chip's HBM fixes the slot count at the worst case (6 bf16 / 8 int8
full-context slots at 7B). This subclass stores KV in a shared page pool
(models/llama_paged.py): a request holds ceil((spliced + budget)/page)
pages, so a mixed workload of short chats and one long document no longer
pays 2304 tokens of HBM per chat — the admission limit becomes the pool's
total token capacity, and `max_batch` can be raised well past the
contiguous slot count for short-request traffic.

Admission control is conservative (reserve the FULL prompt+budget up
front, like the contiguous scheduler's budget clamp): no preemption or
swapping is ever needed, at the cost of not overcommitting against early
EOS. Pages free the moment a request finishes or is cancelled.

The reference has no serving stack (single-user HF generate thread,
/root/reference/lhrs_webui.py:233-239); this extends the TPU rebuild's
serving beyond round-2 parity.
"""

from __future__ import annotations

import logging
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama_paged import (PagedKVCache, paged_decode_step,
                                  scatter_prefill)
from .scheduler import ContinuousBatchingScheduler

logger = logging.getLogger("lhrs_tpu")


class PageAllocator:
    """LIFO free-list over the pool; page 0 is the reserved null page."""

    def __init__(self, num_pages: int):
        if num_pages < 2:
            raise ValueError("need at least one allocatable page + null")
        self.num_pages = num_pages
        self._free = list(range(num_pages - 1, 0, -1))

    def available(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> List[int]:
        if n > len(self._free):
            raise RuntimeError(
                f"page pool exhausted: want {n}, have {len(self._free)} "
                f"(admission control must prevent this)")
        got, self._free = self._free[-n:], self._free[:-n]
        return got[::-1]

    def free(self, pages: List[int]) -> None:
        for p in pages:
            if not 0 < p < self.num_pages:
                raise ValueError(f"freeing invalid page {p}")
        self._free.extend(pages)


class PagedScheduler(ContinuousBatchingScheduler):
    """Drop-in scheduler with paged KV storage.

    `max_seq_len` (the per-sequence cap) is pages_per_seq * page_size;
    `num_pages` sizes the shared pool — the whole point is
    (num_pages * page_size) << (max_batch * max_seq_len)."""

    def __init__(self, cfg, params, llama_params, *,
                 num_pages: int, page_size: int = 64,
                 pages_per_seq: Optional[int] = None,
                 max_seq_len: Optional[int] = None,
                 prompt_bucket: int = 64, **kw):
        if max_seq_len is None and pages_per_seq is None:
            raise ValueError("pass pages_per_seq or max_seq_len")
        if pages_per_seq is None:
            pages_per_seq = -(-max_seq_len // page_size)
        self.page_size = page_size
        self.pages_per_seq = pages_per_seq
        self.num_pages = num_pages
        if prompt_bucket % page_size and page_size % prompt_bucket:
            raise ValueError(
                f"prompt_bucket {prompt_bucket} and page_size {page_size} "
                f"must nest (prefill widths are re-chunked into pages)")
        self.allocator = PageAllocator(num_pages)
        self.slot_pages: List[List[int]] = []
        super().__init__(cfg, params, llama_params,
                         max_seq_len=pages_per_seq * page_size,
                         prompt_bucket=max(prompt_bucket, page_size), **kw)
        self.slot_pages = [[] for _ in range(self.max_batch)]

    # -- cache-strategy hooks --------------------------------------------------

    def _make_cache(self):
        return PagedKVCache.create(
            self.cfg.llama, self.max_batch, self.num_pages,
            self.pages_per_seq, page_size=self.page_size,
            dtype=self.cache_dtype)

    def _install_prefill(self, cache, tmp, slot_idx, seq_lens, table_rows):
        return scatter_prefill(cache, tmp, slot_idx, table_rows, seq_lens)

    def _decode(self, llama_params, cache, embeds):
        return paged_decode_step(
            llama_params, self.cfg.llama, cache,
            inputs_embeds=embeds, compute_dtype=self.compute_dtype)

    @staticmethod
    def _freeze_lengths(new_cache, old_cache, act):
        return new_cache._replace(
            lengths=jnp.where(act, new_cache.lengths, old_cache.lengths))

    def _pages_for(self, tokens: int) -> int:
        return -(-tokens // self.page_size)

    def _worst_case_pages(self, req) -> int:
        nq = self.cfg.pooler.num_query
        spliced = min(len(req.input_ids), self.max_seq_len) + (
            nq - 1 if req.image is not None else 0)
        total = min(spliced + req.max_new_tokens, self.max_seq_len)
        return self._pages_for(total)

    def _admission_capacity(self, requests, free) -> int:
        avail = self.allocator.available()
        taken = 0
        for req in requests[:len(free)]:
            need = self._worst_case_pages(req)
            if need > avail:
                break
            avail -= need
            taken += 1
        if taken < min(len(requests), len(free)):
            logger.info(
                "paged admission: %d/%d requests deferred (pool has %d "
                "free pages)", min(len(requests), len(free)) - taken,
                min(len(requests), len(free)), self.allocator.available())
        return taken

    def _reserve_rows(self, slots, spliced, budgets):
        rows = np.zeros((len(slots), self.pages_per_seq), np.int32)
        for row, (slot, sp, bu) in enumerate(zip(slots, spliced, budgets)):
            pages = self.allocator.alloc(self._pages_for(sp + bu))
            self.slot_pages[slot] = pages
            rows[row, :len(pages)] = pages
        return jnp.asarray(rows)

    def _release_slot(self, slot: int) -> None:
        if self.slot_pages[slot]:
            self.allocator.free(self.slot_pages[slot])
            self.slot_pages[slot] = []

    def pool_stats(self):
        return {"free_pages": self.allocator.available(),
                "total_pages": self.num_pages - 1,
                "page_size": self.page_size}
