"""Paged continuous batching: admission limited by TOKENS, not slots,
with content-addressed prefix caching.

`ContinuousBatchingScheduler` reserves max_seq_len rows per slot, so a
chip's HBM fixes the slot count at the worst case (6 bf16 / 8 int8
full-context slots at 7B). This subclass stores KV in a shared page pool
(models/llama_paged.py): a request holds ceil((spliced + budget)/page)
pages, so a mixed workload of short chats and one long document no longer
pays 2304 tokens of HBM per chat — the admission limit becomes the pool's
total token capacity, and `max_batch` can be raised well past the
contiguous slot count for short-request traffic.

On top of paging, the PrefixPool (serve/prefix.py) shares pages whose
token prefix is identical across requests: every request re-sends the
conversation template's system prompt, and each chat turn re-submits the
whole history — those pages are matched by chain hash, acquired by
reference, and the prefill program runs over the UNCACHED SUFFIX only
(models/llama_paged.py paged_prefill_with_context), so repeated prefixes
cost zero transformer FLOPs after their first appearance. A request's own
full pure-text prompt pages are promoted into the pool after allocation;
refcount-0 entries stay cached until page pressure evicts them (LRU).
Sharing is across admission waves: two identical prompts admitted in the
SAME wave don't share (insertion happens at reservation time) — real
traffic trickles, so the first arrival seeds the pool for the rest.

Admission control is conservative (reserve the FULL prompt+budget up
front, like the contiguous scheduler's budget clamp): no preemption or
swapping is ever needed, at the cost of not overcommitting against early
EOS. Private pages free the moment a request finishes or is cancelled;
shared/promoted pages return to the pool's refcounting.

The reference has no serving stack (single-user HF generate thread,
/root/reference/lhrs_webui.py:233-239); this extends the TPU rebuild's
serving beyond round-2 parity.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama_paged import (PagedKVCache, paged_decode_step,
                                  paged_prefill_with_context)
from ..models.vlm import prepare_multimodal_inputs
from .engine import _sample_token_per_slot
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


@dataclasses.dataclass
class _Match:
    keys: list          # acquired PrefixPool keys (shared pages, in order)
    pages: list         # their page ids
    ctx: int            # shared tokens = len(pages) * page_size
    suffix: np.ndarray  # uncached prompt tokens (capped to cache room)


class PagedScheduler(ContinuousBatchingScheduler):
    """Drop-in scheduler with paged KV storage + prefix caching.

    `max_seq_len` (the per-sequence cap) is pages_per_seq * page_size;
    `num_pages` sizes the shared pool — the whole point is
    (num_pages * page_size) << (max_batch * max_seq_len)."""

    _supports_spec = False  # KV rows live behind the page table

    def __init__(self, cfg, params, llama_params, *,
                 num_pages: int, page_size: int = 128,
                 pages_per_seq: Optional[int] = None,
                 max_seq_len: Optional[int] = None,
                 prompt_bucket: int = 64,
                 enable_prefix_cache: bool = True,
                 prefill_chunk: Optional[int] = None, **kw):
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
        self.enable_prefix_cache = enable_prefix_cache
        from .prefix import PrefixPool

        self.prefix = PrefixPool()
        self._match: Dict[int, _Match] = {}
        self.slot_pages: List[List[int]] = []
        self.slot_shared_keys: List[list] = []
        self.slot_promoted_keys: List[list] = []
        super().__init__(cfg, params, llama_params,
                         max_seq_len=pages_per_seq * page_size,
                         prompt_bucket=max(prompt_bucket, page_size), **kw)
        self.slot_pages = [[] for _ in range(self.max_batch)]
        self.slot_shared_keys = [[] for _ in range(self.max_batch)]
        self.slot_promoted_keys = [[] for _ in range(self.max_batch)]
        # chunked prefill: decoder over fixed-width embed slices so ONE
        # compiled transformer program serves every prompt width (each 7B
        # width bucket is minutes of compile); the splice/vision program
        # still buckets by width, but it is the cheap compile
        self.prefill_chunk = prefill_chunk
        if prefill_chunk:
            if prefill_chunk % page_size:
                raise ValueError(
                    f"prefill_chunk {prefill_chunk} must be a multiple of "
                    f"page_size {page_size} (chunk boundaries must land on "
                    f"page boundaries)")
            self._splice_jit = jax.jit(self._splice)
            self._ctx_chunk_jit = jax.jit(self._ctx_chunk,
                                          donate_argnums=(1,))
            self._sample_jit = jax.jit(_sample_token_per_slot)
            self._prefill_jit = self._prefill_chunked_host

    def _splice(self, params, llama_params, input_ids, images, seq_lens):
        spliced = prepare_multimodal_inputs(
            params, self.cfg, input_ids, images,
            attention_mask=jnp.arange(input_ids.shape[1])[None, :]
            < seq_lens[:, None],
            compute_dtype=self.compute_dtype,
            llama_params=llama_params,
        )
        return spliced.inputs_embeds, spliced.seq_len

    def _ctx_chunk(self, llama_params, cache, emb_chunk, suffix_len,
                   ctx_len, slot_idx, table_rows):
        return paged_prefill_with_context(
            llama_params, self.cfg.llama, cache,
            inputs_embeds=emb_chunk, suffix_len=suffix_len,
            ctx_len=ctx_len, slot_idx=slot_idx, table_rows=table_rows,
            compute_dtype=self.compute_dtype)

    def _prefill_chunked_host(self, params, llama_params, input_ids,
                              images, cache, slot_idx, seq_lens, rng,
                              temps, top_ps, extra, *, width: int):
        """Same signature as the jitted _prefill, but loops the decoder
        over `prefill_chunk`-wide slices of the spliced embeds on the
        host. For suffix-exhausted rows a chunk's ctx_len may be
        page-UNaligned (ctx + full suffix) — harmless, they write
        nothing.

        The chunk width adapts to the admission: a prefix-HIT wave whose
        suffixes are 64 tokens runs a 64-wide program, not a full
        `prefill_chunk`-wide one padded 8x with dead rows — otherwise a
        cache hit costs as much prefill compute as a cold chunk and the
        prefix pool can never win end-to-end."""
        table_rows, ctx = extra
        emb, spl_len = self._splice_jit(params, llama_params, input_ids,
                                        images, seq_lens)
        w = min(self.prefill_chunk, emb.shape[1])
        s = emb.shape[1]
        n_chunks = -(-s // w)
        if s < n_chunks * w:
            emb = jnp.pad(emb, ((0, 0), (0, n_chunks * w - s), (0, 0)))
        spl_host = np.asarray(spl_len)
        last_chunk = np.maximum(spl_host - 1, 0) // w
        per_chunk = {}
        for c in range(n_chunks):
            logits_c, cache = self._ctx_chunk_jit(
                llama_params, cache, emb[:, c * w:(c + 1) * w],
                jnp.clip(spl_len - c * w, 0, w),
                ctx + jnp.minimum(spl_len, c * w),
                slot_idx, table_rows)
            if (last_chunk == c).any():
                per_chunk[c] = logits_c
        logits = jnp.stack([per_chunk[int(last_chunk[r])][r]
                            for r in range(len(spl_host))])
        first = self._sample_jit(logits, rng, temps, top_ps)
        return first, cache

    # -- cache-strategy hooks --------------------------------------------------

    def _make_cache(self):
        cache = PagedKVCache.create(
            self.cfg.llama, self.max_batch, self.num_pages,
            self.pages_per_seq, page_size=self.page_size,
            dtype=self.cache_dtype)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import MODEL_AXIS

            pool = P(None, None, MODEL_AXIS, None, None)  # heads on TP
            spool = P(None, None, MODEL_AXIS, None)
            spec = PagedKVCache(
                k_pages=pool, v_pages=pool, page_table=P(), lengths=P(),
                k_scale_pages=spool if cache.quantized else None,
                v_scale_pages=spool if cache.quantized else None)
            cache = jax.tree_util.tree_map(
                lambda x, s: jax.device_put(
                    x, NamedSharding(self.mesh, s)), cache, spec)
        return cache

    def _prefill(self, params, llama_params, input_ids, images, cache,
                 slot_idx, seq_lens, rng, temps, top_ps, extra,
                 *, width: int):
        """Suffix prefill against shared-page context (ctx=0 rows are a
        dense paged prefill — one program covers both)."""
        spliced = prepare_multimodal_inputs(
            params, self.cfg, input_ids, images,
            attention_mask=jnp.arange(input_ids.shape[1])[None, :]
            < seq_lens[:, None],
            compute_dtype=self.compute_dtype,
            llama_params=llama_params,
        )
        table_rows, ctx = extra
        logits, new_cache = paged_prefill_with_context(
            llama_params, self.cfg.llama, cache,
            inputs_embeds=spliced.inputs_embeds,
            suffix_len=spliced.seq_len, ctx_len=ctx,
            slot_idx=slot_idx, table_rows=table_rows,
            compute_dtype=self.compute_dtype)
        first = _sample_token_per_slot(logits, rng, temps, top_ps)
        return first, new_cache

    def _decode(self, llama_params, cache, embeds):
        return paged_decode_step(
            llama_params, self.cfg.llama, cache,
            inputs_embeds=embeds, compute_dtype=self.compute_dtype)

    @staticmethod
    def _freeze_lengths(new_cache, old_cache, act):
        return new_cache._replace(
            lengths=jnp.where(act, new_cache.lengths, old_cache.lengths))

    # -- prefix matching / page accounting -------------------------------------

    def _pages_for(self, tokens: int) -> int:
        return -(-tokens // self.page_size)

    def _img_extra(self, req) -> int:
        return self._image_count(req) * (self.cfg.pooler.num_query - 1)

    def _match_request(self, req) -> _Match:
        ids = np.asarray(req.input_ids)
        keys: list = []
        pages: list = []
        if self.enable_prefix_cache:
            # never match the FULL prompt: the prefill needs >= 1 suffix
            # token to produce next-token logits
            keys, pages = self.prefix.match(ids[:-1], self.page_size)
            if keys:
                self.prefix.acquire(keys)
        ctx = len(pages) * self.page_size
        cap = max(1, self.max_seq_len - ctx - self._img_extra(req))
        return _Match(keys=keys, pages=pages, ctx=ctx,
                      suffix=ids[ctx:ctx + cap])

    def _packed_ids(self, req):
        st = self._match.get(req.uid)
        return st.suffix if st is not None else req.input_ids

    def _room(self, slot: int, spliced: int, req=None) -> int:
        ctx = self._match[req.uid].ctx if req is not None and \
            req.uid in self._match else 0
        return self.max_seq_len - ctx - spliced

    def _fresh_pages_needed(self, req) -> int:
        st = self._match[req.uid]
        sfx_worst = len(st.suffix) + self._img_extra(req)
        total = min(st.ctx + sfx_worst + req.max_new_tokens,
                    self.max_seq_len)
        return self._pages_for(total) - len(st.pages)

    def _admission_capacity(self, requests, free) -> int:
        limit = min(len(requests), len(free))
        for req in requests[:limit]:
            self._match[req.uid] = self._match_request(req)
        avail = self.allocator.available() + self.prefix.evictable()
        taken = 0
        for req in requests[:limit]:
            need = self._fresh_pages_needed(req)
            if need > avail:
                break
            avail -= need
            taken += 1
        # un-match everything not admitted this round (they re-match on
        # the next admission attempt)
        for req in requests[taken:limit]:
            st = self._match.pop(req.uid)
            if st.keys:
                self.prefix.release(st.keys)
        if taken < limit:
            logger.info(
                "paged admission: %d/%d requests deferred (pool has %d "
                "free + %d evictable pages)", limit - taken, limit,
                self.allocator.available(), self.prefix.evictable())
        return taken

    def _alloc(self, n: int) -> List[int]:
        short = n - self.allocator.available()
        if short > 0:
            reclaimed = self.prefix.evict(short)
            if reclaimed:
                self.allocator.free(reclaimed)
        return self.allocator.alloc(n)

    def _reserve_rows(self, slots, batch, spliced, budgets, width):
        p = self.page_size
        rows = np.zeros((len(slots), self.pages_per_seq), np.int32)
        ctx_arr = np.zeros(len(slots), np.int32)
        for row, (slot, req, sp, bu) in enumerate(
                zip(slots, batch, spliced, budgets)):
            st = self._match.pop(req.uid)
            fresh = self._alloc(
                self._pages_for(st.ctx + sp + bu) - len(st.pages))
            rows[row, :len(st.pages)] = st.pages
            rows[row, len(st.pages):len(st.pages) + len(fresh)] = fresh
            ctx_arr[row] = st.ctx
            self.slot_shared_keys[slot] = list(st.keys)
            self.slot_pages[slot] = list(fresh)
            self.slot_promoted_keys[slot] = []
            if self.enable_prefix_cache:
                self._promote(slot, req, st, fresh, width)
        return jnp.asarray(rows), jnp.asarray(ctx_arr)

    def _promote(self, slot, req, st: _Match, fresh, width) -> None:
        """Offer this request's full pure-text prompt pages to the pool.
        Only pages whose tokens were actually WRITTEN by this prefill
        (within the chunk width) and precede any image token qualify."""
        p = self.page_size
        n_written = min(len(st.suffix), width)
        neg = np.flatnonzero(np.asarray(st.suffix[:n_written]) < 0)
        text_end = int(neg[0]) if neg.size else n_written
        parent = st.keys[-1] if st.keys else None
        promoted = []
        still_private = list(fresh)
        for k in range(text_end // p):
            page_id = fresh[k]
            tokens = st.suffix[k * p:(k + 1) * p]
            key, inserted = self.prefix.insert(parent, tokens, page_id)
            parent = key
            if inserted:
                promoted.append(key)
                still_private.remove(page_id)
        self.slot_promoted_keys[slot] = promoted
        self.slot_pages[slot] = still_private

    def _release_slot(self, slot: int) -> None:
        if self.slot_shared_keys[slot]:
            self.prefix.release(self.slot_shared_keys[slot])
            self.slot_shared_keys[slot] = []
        if self.slot_promoted_keys[slot]:
            self.prefix.release(self.slot_promoted_keys[slot])
            self.slot_promoted_keys[slot] = []
        if self.slot_pages[slot]:
            self.allocator.free(self.slot_pages[slot])
            self.slot_pages[slot] = []

    def fail_all(self) -> None:
        super().fail_all()
        # release matches acquired for an admission that never completed
        for st in self._match.values():
            if st.keys:
                self.prefix.release(st.keys)
        self._match.clear()

    def pool_stats(self):
        return {"free_pages": self.allocator.available(),
                "total_pages": self.num_pages - 1,
                "page_size": self.page_size,
                "prefix": self.prefix.stats()}
