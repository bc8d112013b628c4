"""Continuous-batching scheduler for multi-user serving.

The reference serves one user at a time (Gradio UI with a background
HF-generate thread, lhrs_webui.py:233-239); BASELINE.json's serving config
calls for batched multi-user serving. This scheduler provides it TPU-style:

  * requests enter a queue; the scheduler packs up to `max_batch` active
    sequences into fixed slots of a shared static KV cache (slot = row);
  * prefill runs per admission batch (one jit at bucketed prompt lengths),
    writing into the free slots; decode steps run over the WHOLE slot array
    every tick — finished/empty slots are masked, so one decode dispatch
    serves all users simultaneously;
  * finished sequences free their slot for the next queued request —
    admission happens between decode ticks (continuous batching);
  * static shapes throughout: slot count, cache length and prompt-length
    buckets are fixed, so the two jitted programs (prefill, decode-tick)
    compile once;
  * each tick is a lax.scan of `tokens_per_tick` decode steps in ONE
    dispatch — slots that hit EOS or exhaust their budget mid-chunk are
    frozen inside the scan (cache length stops growing, emissions masked),
    so correctness is per-token while host round-trips are amortized k×.
    Through a remote runtime at ~20-40 ms/dispatch this is the difference
    between ~30 and ~250 aggregate tok/s.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import KVCache, llama_decode_step, llama_prefill
from ..models.vlm import VLMConfig, prepare_multimodal_inputs
from .engine import (GenerationConfig, _sample_token,
                     _sample_token_per_slot)


@dataclasses.dataclass
class Request:
    uid: int
    input_ids: np.ndarray  # (T,) prompt token ids (may contain -200)
    image: Optional[np.ndarray] = None  # (H, W, 3) uint8, or
    # (K, H, W, 3) for a multi-image prompt (marker k <- image k)
    max_new_tokens: int = 128
    # per-request sampling (None -> the scheduler's GenerationConfig
    # defaults); temperature 0 means greedy regardless of top_p
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    # filled by the scheduler:
    output_ids: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    cancelled: bool = False
    error: Optional[str] = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class ContinuousBatchingScheduler:
    _supports_spec = True  # paged subclass overrides (rows behind a table)

    def __init__(
        self,
        cfg: VLMConfig,
        params,
        llama_params,
        *,
        max_batch: int = 8,
        max_seq_len: int = 1024,
        compute_dtype=jnp.bfloat16,
        cache_dtype=jnp.bfloat16,
        eos_token_id: int = 2,
        pad_token_id: int = 0,
        prompt_bucket: int = 64,
        tokens_per_tick: int = 8,
        gen_cfg: Optional[GenerationConfig] = None,
        rng: Optional[jax.Array] = None,
        mesh=None,  # jax.sharding.Mesh → TP-sharded decoder + KV cache
        speculative: int = 0,  # prompt-lookup window per round (greedy)
        spec_ngram: int = 2,
        adaptive_tick: bool = False,  # shrink ticks near completions
        # (default OFF until the on-chip mixed-budget measurement lands:
        # the shrink trades ~50 ms host syncs for <=(k-1) ~12 ms masked
        # steps, which can be a net loss under sustained load)
    ):
        self.cfg = cfg
        self.adaptive_tick = bool(adaptive_tick)
        self.mesh = mesh
        # vision-side subtrees only — raw llama weights must not become an
        # unused jit argument of the prefill (see engine.py)
        self.params = jax.device_put(
            {k: v for k, v in params.items()
             if k not in ("llama", "lora")}
            if isinstance(params, dict) else params)
        if mesh is not None:
            # multi-chip serving: decoder params arrive TP-sharded from
            # the engine (shard_llama_for_serving) or are sharded here;
            # a bare device_put would gather them onto one device
            from ..parallel.partition import shard_llama_for_serving

            self.llama_params = shard_llama_for_serving(mesh, llama_params)
        else:
            # pin on device once (host numpy jit args re-upload per call)
            self.llama_params = jax.device_put(llama_params)
        self.max_batch = max_batch
        self.max_seq_len = max_seq_len
        self.compute_dtype = compute_dtype
        self.gen_cfg = gen_cfg or GenerationConfig(
            eos_token_id=eos_token_id, pad_token_id=pad_token_id)
        self.eos = self.gen_cfg.eos_token_id
        self.pad = self.gen_cfg.pad_token_id
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.prompt_bucket = prompt_bucket
        self.tokens_per_tick = max(1, int(tokens_per_tick))

        self.cache_dtype = cache_dtype
        self.cache = self._make_cache()
        # per-slot host state
        self.slot_req: List[Optional[Request]] = [None] * max_batch
        self.slot_budget = np.zeros(max_batch, np.int32)
        self.last_tokens = np.full(max_batch, pad_token_id, np.int32)
        self.active = np.zeros(max_batch, bool)
        # per-slot sampling knobs (temp <= 0 -> greedy row)
        g = self.gen_cfg
        self._default_temp = float(g.temperature) if g.do_sample else 0.0
        self._default_top_p = float(g.top_p)
        self.slot_temp = np.zeros(max_batch, np.float32)
        self.slot_top_p = np.ones(max_batch, np.float32)

        self.speculative = int(speculative)
        self.spec_ngram = int(spec_ngram)
        if self.speculative and not self._supports_spec:
            raise ValueError(
                "speculative decoding needs the contiguous KV cache "
                "(the paged scheduler's rows live behind a page table)")

        # params are explicit jit ARGUMENTS, not closure captures: captured
        # constants are baked into every compiled program (7 GB shipped per
        # compile through a remote runtime)
        self._prefill_jit = jax.jit(self._prefill,
                                    static_argnames=("width",),
                                    donate_argnums=(4,))
        self._tick_jit = jax.jit(self._tick, donate_argnums=(2,),
                                 static_argnames=("k", "sample"))
        self._spec_tick_jit = jax.jit(
            self._spec_tick, donate_argnums=(2,),
            static_argnames=("width", "ngram", "rounds", "sample"))
        # the k actually dispatched by the last step() (observability +
        # tests of the adaptive shrink)
        self.last_tick_k = 0

    @staticmethod
    def _bucket_sizes(n: int):
        """Split an admission of n requests into power-of-two chunks
        (largest first): each chunk prefights a (b, width) program with
        b ∈ {1, 2, 4, ...} prefill instead of always paying the full
        max_batch compute (an 8x tax on single-request admission at 7B)."""
        out = []
        b = 1
        while b * 2 <= n:
            b *= 2
        while n:
            while b > n:
                b //= 2
            out.append(b)
            n -= b
        return out

    def set_speculative(self, width: int) -> None:
        """Toggle speculative ticks (0 = plain); no re-jit needed — the
        window width is a static argument of the spec-tick program."""
        if width and not self._supports_spec:
            raise ValueError("speculative decoding needs the contiguous "
                             "KV cache")
        self.speculative = int(width)

    def set_tokens_per_tick(self, k: int) -> None:
        """Change the decode chunk size; no re-jit needed — the scan
        length is a static argument of the tick program, so jit caches
        one compiled program per k value it actually sees."""
        self.tokens_per_tick = max(1, int(k))

    # a masked (all-frozen) scan step costs one weight read (~12 ms at 7B
    # int8) vs ~50 ms of host sync per extra dispatch — overshooting the
    # target by up to sync/step masked steps is cheaper than cascading
    # another tick (measured: docs/SERVING.md tick-amortization numbers)
    _TICK_OVERSHOOT_MAX = 4

    def _tick_k(self, waiting: bool) -> int:
        """Adaptive tick size: never scan far past the point every slot is
        frozen, and shrink to the earliest scheduled completion when
        requests are waiting for a slot (a freed slot is only admittable
        BETWEEN ticks, so a full-k tick delays backfill by up to k-1
        steps). Snapped to a power of two to bound the number of compiled
        tick programs at log2(k_max): rounded UP when the overshoot is at
        most _TICK_OVERSHOOT_MAX masked steps (one dispatch, tiny waste),
        DOWN otherwise (the remainder re-decides next tick). EOS can't be
        predicted, so this only tightens budget-limited completions."""
        k = self.tokens_per_tick
        if not self.adaptive_tick:
            return k
        budgets = self.slot_budget[self.active]
        if k <= 1 or budgets.size == 0:
            return 1
        cap = max(1, int(budgets.min() if waiting else budgets.max()))
        if cap >= k:
            return k
        up = 1 << (cap - 1).bit_length()  # pow2 >= cap
        if up - cap <= self._TICK_OVERSHOOT_MAX:
            return min(k, up)
        return up // 2

    # -- cache-strategy hooks (overridden by the paged scheduler) -------------

    def _make_cache(self):
        cache = KVCache.create(self.cfg.llama, self.max_batch,
                               self.max_seq_len, dtype=self.cache_dtype)
        if self.mesh is not None:
            from ..parallel.partition import kv_cache_spec, to_named

            cache = jax.tree_util.tree_map(
                jax.device_put, cache,
                to_named(self.mesh,
                         kv_cache_spec(quantized=cache.quantized)))
        return cache

    def _install_prefill(self, cache, tmp, slot_idx, seq_lens, table_rows):
        """Scatter a bucketed prefill's KV rows into the persistent cache."""
        return KVCache(
            k=cache.k.at[:, slot_idx].set(tmp.k),
            v=cache.v.at[:, slot_idx].set(tmp.v),
            length=cache.length.at[slot_idx].set(tmp.length),
            k_scale=(None if cache.k_scale is None
                     else cache.k_scale.at[:, slot_idx].set(tmp.k_scale)),
            v_scale=(None if cache.v_scale is None
                     else cache.v_scale.at[:, slot_idx].set(tmp.v_scale)),
        )

    def _decode(self, llama_params, cache, embeds):
        return llama_decode_step(
            llama_params, self.cfg.llama, cache,
            inputs_embeds=embeds, compute_dtype=self.compute_dtype)

    @staticmethod
    def _freeze_lengths(new_cache, old_cache, act):
        """Frozen slots must not grow their cache."""
        return new_cache._replace(
            length=jnp.where(act, new_cache.length, old_cache.length))

    def _admission_capacity(self, requests, free) -> int:
        """How many of `requests` (FIFO prefix) fit this admission."""
        return len(free)

    def _reserve_rows(self, slots, batch, spliced, budgets,
                      width):
        """Reserve per-slot cache room before prefill; returns the extra
        prefill argument (page-table rows for the paged subclass)."""
        return None

    def _room(self, slot: int, spliced: int, req=None) -> int:
        """Cache room left for new tokens after a spliced prompt."""
        return self.max_seq_len - spliced

    def _packed_ids(self, req):
        """Token ids to pack into the prefill program for this request
        (the prefix-cache scheduler packs only the uncached suffix)."""
        return req.input_ids

    def _release_slot(self, slot: int) -> None:
        """Free per-slot cache resources on completion/cancel."""

    # -- jitted programs ------------------------------------------------------

    def _prefill(self, params, llama_params, input_ids, images, cache,
                 slot_idx, seq_lens, rng, temps, top_ps, table_rows,
                 *, width: int):
        """Prefill a BUCKETED batch of `width`-wide prompts (input_ids is
        (b, width) for b = a power-of-two chunk of the admission, NOT
        max_batch) and scatter the resulting KV rows into the slots named
        by slot_idx ((b,) int32); all other slots keep their cache
        content untouched."""
        spliced = prepare_multimodal_inputs(
            params, self.cfg, input_ids, images,
            attention_mask=jnp.arange(input_ids.shape[1])[None, :]
            < seq_lens[:, None],
            compute_dtype=self.compute_dtype,
            llama_params=llama_params,
        )
        b = input_ids.shape[0]
        tmp = KVCache.create(self.cfg.llama, b, self.max_seq_len,
                             dtype=self.cache_dtype)
        logits, tmp = llama_prefill(
            llama_params, self.cfg.llama, tmp,
            inputs_embeds=spliced.inputs_embeds,
            prompt_len=spliced.seq_len,
            compute_dtype=self.compute_dtype,
        )
        new_cache = self._install_prefill(cache, tmp, slot_idx,
                                          spliced.seq_len, table_rows)
        first = _sample_token_per_slot(logits, rng, temps, top_ps)
        return first, new_cache

    def _tick(self, llama_params, tokens, cache, active, budgets, rng,
              temps, top_ps, *, k: int, sample: bool):
        """`k` decode steps over all slots in one lax.scan.

        A slot freezes the moment it emits EOS or exhausts its budget:
        its cache length stops growing and later emissions are masked to
        pad, so the k-step chunk is token-for-token identical to k
        single-step ticks for GREEDY decoding. When a slot samples the RNG
        stream differs (one split per tick here vs one per token at k=1),
        so sampled outputs are distributionally equivalent but not
        bit-identical across k. Emits (k, B) tokens plus the (k, B) mask
        of which emissions were live.

        `sample` is static: the all-greedy tick (the eval/bench workload)
        must not pay the per-slot top-p sort over the 32k vocab every
        step — step() dispatches sample=True only while some active slot
        actually has temperature > 0."""

        def body(carry, step_rng):
            toks, cache, act, budg = carry
            embeds = jnp.take(llama_params["embed_tokens"],
                              toks[:, None], axis=0)
            logits, new_cache = self._decode(llama_params, cache, embeds)
            if sample:
                nxt = _sample_token_per_slot(logits, step_rng, temps,
                                             top_ps)
            else:
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emit = jnp.where(act, nxt, self.pad)
            budg = jnp.where(act, budg - 1, budg)
            new_act = act & (nxt != self.eos) & (budg > 0)
            new_cache = self._freeze_lengths(new_cache, cache, act)
            return (emit, new_cache, new_act, budg), (emit, act)

        rngs = jax.random.split(rng, k)
        (_, cache, _, _), (toks, live) = jax.lax.scan(
            body, (tokens, cache, active, budgets), rngs)
        return toks, live, cache

    def _spec_tick(self, llama_params, tokens, cache, active, budgets,
                   hist, hist_len, rng, temps, top_ps,
                   *, width: int, ngram: int, rounds: int, sample: bool):
        """`rounds` speculative decode rounds over all slots in ONE
        dispatch (see serve/speculative.py). Per round each slot proposes
        up to `width` tokens from its own history (device-side prompt
        lookup), verifies the whole window through the continuation
        prefill, and advances by 1..width+1 tokens — one weight read per
        round either way, so greedy throughput is never below the plain
        tick's and multiplies with the acceptance rate. Emits
        (rounds, B, width+1) tokens + live mask.

        `sample` is static (plain-tick parity): when any active slot has
        temperature > 0, acceptance runs the exact deterministic-draft
        rejection rule (`accept_window_sampled`) so sampling slots keep
        speculating instead of forcing the whole batch to plain ticks;
        all-greedy batches skip the per-position top-p sort."""
        from ..models.llama import llama_prefill_continue
        from .speculative import (accept_window, accept_window_sampled,
                                  propose_from_history)

        s_max = cache.k.shape[3]
        b = tokens.shape[0]
        wp1 = width + 1
        rows = jnp.arange(b)[:, None]
        i2 = jnp.arange(wp1)[None, :]
        s_hist = hist.shape[1]

        def body(carry, round_rng):
            toks, cache, act, budg, hist, hlen = carry
            prop, n_prop = propose_from_history(
                hist, hlen, ngram=ngram, width=width)
            # the verify writes 1+n rows at cache.length; clamp proposals
            # to cache room and to the remaining budget (anything past
            # budget-1 could never be emitted)
            room = s_max - cache.length - 1
            n_prop = jnp.minimum(
                n_prop, jnp.clip(jnp.minimum(room, budg - 1), 0, width))
            window = jnp.concatenate([toks[:, None], prop], axis=1)
            suffix = jnp.where(act, 1 + n_prop, 0).astype(jnp.int32)
            embeds = jnp.take(llama_params["embed_tokens"],
                              jnp.maximum(window, 0), axis=0)
            logits_all, new_cache = llama_prefill_continue(
                llama_params, self.cfg.llama, cache,
                inputs_embeds=embeds, suffix_len=suffix,
                start=cache.length, compute_dtype=self.compute_dtype,
                return_all_logits=True)
            if sample:
                p, corr = accept_window_sampled(
                    prop, n_prop, logits_all, round_rng, temps, top_ps)
            else:
                preds = jnp.argmax(logits_all, axis=-1).astype(jnp.int32)
                p, corr = accept_window(prop, n_prop, preds)
            # emissions: accepted proposals then the correction token,
            # clamped to the budget (the token that exhausts the budget
            # is still emitted — _push_token parity)
            e = jnp.where(act, jnp.minimum(p + 1, budg), 0)
            tok_out = jnp.where(i2 < p[:, None],
                                jnp.pad(prop, ((0, 0), (0, 1))),
                                corr[:, None])
            live = (i2 < e[:, None]) & act[:, None]
            emit = jnp.where(live, tok_out, self.pad)
            new_budg = budg - e
            emitted_corr = e == p + 1
            new_act = (act & (new_budg > 0)
                       & ~(emitted_corr & (corr == self.eos)))
            # rewind: only rows for the slot's last token + accepted
            # proposals are real; rejected rows sit past the new length
            # (masked, overwritten by the next append)
            new_cache = new_cache._replace(
                length=jnp.where(act, cache.length + e,
                                 cache.length).astype(jnp.int32))
            # history gains the emitted tokens except a terminal EOS
            # (the host never appends EOS to outputs either)
            nk = e - (emitted_corr & (corr == self.eos)).astype(jnp.int32)
            dest = jnp.where((i2 < nk[:, None]) & act[:, None],
                             hlen[:, None] + i2, s_hist)
            hist = hist.at[rows, dest].set(emit, mode="drop")
            hlen = hlen + nk
            new_toks = jnp.where(new_act, corr, self.pad)
            return ((new_toks, new_cache, new_act, new_budg, hist, hlen),
                    (emit, live))

        round_rngs = jax.random.split(rng, rounds)
        (_, cache, _, _, _, _), (toks_out, live_out) = jax.lax.scan(
            body, (tokens, cache, active, budgets, hist, hist_len),
            round_rngs)
        return toks_out, live_out, cache

    # -- host-side scheduling --------------------------------------------------

    def _free_slots(self) -> List[int]:
        return [i for i in range(self.max_batch) if not self.active[i]]

    def admit(self, requests: List[Request]) -> int:
        """Pack as many requests as fit into free slots; returns #admitted.

        The admission is split into power-of-two chunks (largest first) so
        each prefill dispatch computes only the rows it admits — a trickle
        arrival of 1 request runs the (1, width) program, not the
        (max_batch, width) one."""
        free = self._free_slots()
        batch = requests[:self._admission_capacity(requests, free)]
        if not batch:
            return 0
        # FIFO decides WHO is admitted; within the admitted set, sort by
        # prompt length so each power-of-two chunk packs similar widths
        # (a 256-token prompt must not ride in a 2048-wide program)
        batch = sorted(batch, key=lambda r: len(self._packed_ids(r)),
                       reverse=True)
        done = 0
        for b in self._bucket_sizes(len(batch)):
            chunk = batch[done:done + b]
            slots = free[done:done + b]
            self._admit_chunk(chunk, slots)
            done += b
        return len(batch)

    @staticmethod
    def _image_count(req) -> int:
        """0, 1, or K (for a (K, H, W, 3) multi-image request)."""
        if req.image is None:
            return 0
        return req.image.shape[0] if req.image.ndim == 4 else 1

    def _admit_chunk(self, batch: List[Request], slots: List[int]) -> None:
        import logging

        log = logging.getLogger("lhrs_tpu")
        b = len(batch)
        t = max(len(self._packed_ids(r)) for r in batch)
        k_max = max((self._image_count(r) for r in batch), default=0)
        # each image marker expands the spliced prefill by num_query-1
        # tokens (the -200 placeholder becomes num_query pooled
        # embeddings), so the prompt budget must leave room in the cache
        nq = self.cfg.pooler.num_query
        width_cap = self.max_seq_len - k_max * (nq - 1)
        width = min(_round_up(t, self.prompt_bucket), width_cap)
        if t > width:
            log.warning(
                "prompt length %d exceeds admissible width %d "
                "(max_seq_len=%d%s) — truncating",
                t, width, self.max_seq_len,
                f", image expansion {k_max * (nq - 1)}" if k_max else "")
        ids = np.full((b, width), self.pad, np.int32)
        lens = np.zeros(b, np.int32)
        imgs = None
        if k_max:
            h = self.cfg.vit.image_size
            # (b, H, W, 3) when every request has <= 1 image (the compiled
            # single-image program); (b, K, H, W, 3) for multi-image chunks
            shape = ((b, h, h, 3) if k_max == 1 else (b, k_max, h, h, 3))
            imgs = np.zeros(shape, np.uint8)
        for row, req in enumerate(batch):
            pids = self._packed_ids(req)
            n = min(len(pids), width)
            ids[row, :n] = pids[:n]
            lens[row] = n
            # markers beyond this request's own image count must not
            # splice-expand against another row's zero-padded slots:
            # degrade them to token 0 (single-image path parity)
            neg = np.flatnonzero(ids[row, :n] < 0)
            for j in neg[self._image_count(req):]:
                ids[row, j] = 0
            if imgs is not None and req.image is not None:
                im = req.image
                if k_max == 1:
                    imgs[row] = im[0] if im.ndim == 4 else im
                elif im.ndim == 4:
                    imgs[row, :im.shape[0]] = im
                else:
                    imgs[row, 0] = im

        temps = np.asarray(
            [self._default_temp if r.temperature is None else r.temperature
             for r in batch], np.float32)
        top_ps = np.asarray(
            [self._default_top_p if r.top_p is None else r.top_p
             for r in batch], np.float32)
        for slot, t, tp in zip(slots, temps, top_ps):
            self.slot_temp[slot] = t
            self.slot_top_p[slot] = tp

        # spliced prompt lengths + budgets clamped to cache room, BEFORE
        # prefill: the paged subclass reserves pages from them and feeds
        # the table rows to the prefill scatter
        spliced_lens = []
        budgets = []
        for row, req in enumerate(batch):
            spliced = int(lens[row])
            if req.image is not None:
                n_markers = min(int((ids[row, :spliced] < 0).sum()),
                                self._image_count(req))
                spliced += n_markers * (nq - 1)
            room = max(1, self._room(slots[row], spliced, req))
            if req.max_new_tokens > room:
                log.warning(
                    "request %d: max_new_tokens %d exceeds cache room %d "
                    "after a %d-token spliced prompt — clamping",
                    req.uid, req.max_new_tokens, room, spliced)
            spliced_lens.append(spliced)
            budgets.append(min(req.max_new_tokens, room))
        table_rows = self._reserve_rows(slots, batch, spliced_lens,
                                        budgets, width)

        self._rng, step_rng = jax.random.split(self._rng)
        first, self.cache = self._prefill_jit(
            self.params, self.llama_params,
            jnp.asarray(ids), jnp.asarray(imgs) if imgs is not None else None,
            self.cache, jnp.asarray(np.asarray(slots, np.int32)),
            jnp.asarray(lens), step_rng, jnp.asarray(temps),
            jnp.asarray(top_ps), table_rows, width=width)
        first_host = np.asarray(first)

        for row, (slot, req) in enumerate(zip(slots, batch)):
            self.slot_req[slot] = req
            self.slot_budget[slot] = budgets[row]
            tok = int(first_host[row])
            self.active[slot] = True
            self._push_token(slot, tok)

    def _push_token(self, slot: int, tok: int) -> None:
        req = self.slot_req[slot]
        self.slot_budget[slot] -= 1
        if tok == self.eos or self.slot_budget[slot] <= 0:
            if tok != self.eos:
                req.output_ids.append(tok)
            req.done = True
            self.active[slot] = False
            self.slot_req[slot] = None
            self.last_tokens[slot] = self.pad
            self._release_slot(slot)
        else:
            req.output_ids.append(tok)
            self.last_tokens[slot] = tok

    def cancel(self, uid: int) -> bool:
        """Abort an in-flight request: marks it done+cancelled and frees
        its slot immediately (the tick reads the host-side active mask, so
        the slot stops consuming decode compute at the next dispatch and
        is admittable right away). Tokens already emitted stay on the
        request. Returns False if no active slot holds `uid`."""
        for slot, req in enumerate(self.slot_req):
            if req is not None and req.uid == uid:
                req.cancelled = True
                req.done = True
                self.active[slot] = False
                self.slot_req[slot] = None
                self.slot_budget[slot] = 0
                self.last_tokens[slot] = self.pad
                self._release_slot(slot)
                return True
        return False

    def fail_all(self) -> None:
        """Free every slot (and its cache resources) after a fatal batch
        error — the serving worker's recovery path."""
        for slot in range(self.max_batch):
            if self.slot_req[slot] is not None or self.active[slot]:
                self.slot_req[slot] = None
                self._release_slot(slot)
        self.active[:] = False

    def _history_arrays(self):
        """(B, S) token history (prompt + emitted) per active slot — the
        proposal source for the speculative tick. The host is canonical;
        the device copy is rebuilt every tick (~70 KB, noise next to a
        weight read) so intra-tick device updates never drift."""
        s_hist = self.max_seq_len + self.speculative + 1
        hist = np.zeros((self.max_batch, s_hist), np.int32)
        hlen = np.zeros(self.max_batch, np.int32)
        for slot, req in enumerate(self.slot_req):
            if req is None or not self.active[slot]:
                continue
            toks = np.concatenate([
                np.asarray(req.input_ids, np.int64),
                np.asarray(req.output_ids, np.int64)]).astype(np.int32)
            if len(toks) > s_hist:
                toks = toks[-s_hist:]  # recency is what matching needs
            hist[slot, :len(toks)] = toks
            hlen[slot] = len(toks)
        return hist, hlen

    def _step_speculative(self, waiting: bool = False) -> int:
        hist, hlen = self._history_arrays()
        self._rng, step_rng = jax.random.split(self._rng)
        # each round advances an active slot by >= 1 token, so the
        # budget-based cap is safe for rounds too (never under-serves)
        rounds = self._tick_k(waiting)
        self.last_tick_k = rounds
        toks, live, self.cache = self._spec_tick_jit(
            self.llama_params, jnp.asarray(self.last_tokens), self.cache,
            jnp.asarray(self.active), jnp.asarray(self.slot_budget),
            jnp.asarray(hist), jnp.asarray(hlen), step_rng,
            jnp.asarray(self.slot_temp), jnp.asarray(self.slot_top_p),
            width=self.speculative, ngram=self.spec_ngram,
            rounds=rounds,
            sample=bool(self.slot_temp[self.active].max(initial=0.0) > 0))
        toks_host = np.asarray(toks)   # (rounds, B, W+1)
        live_host = np.asarray(live)
        for r in range(toks_host.shape[0]):
            for i in range(toks_host.shape[2]):
                for slot in range(self.max_batch):
                    if live_host[r, slot, i] and self.active[slot]:
                        self._push_token(slot, int(toks_host[r, slot, i]))
        return int(self.active.sum())

    def step(self, waiting: int = 0) -> int:
        """One decode tick (up to `tokens_per_tick` tokens per active slot
        in a single dispatch) over all slots; returns #still-active.

        `waiting` = number of requests queued for a slot: the tick then
        shrinks to the earliest scheduled completion (see _tick_k) so the
        freed slot backfills at the next admission instead of idling
        through the rest of a full-length tick."""
        if not self.active.any():
            self.last_tick_k = 0  # idle must not report a stale tick size
            return 0
        if self.speculative > 0:
            # sampling slots participate via the exact rejection rule
            # (accept_window_sampled); greedy slots keep argmax acceptance
            return self._step_speculative(waiting=waiting > 0)
        self._rng, step_rng = jax.random.split(self._rng)
        k = self._tick_k(waiting > 0)
        self.last_tick_k = k
        toks, live, self.cache = self._tick_jit(
            self.llama_params, jnp.asarray(self.last_tokens), self.cache,
            jnp.asarray(self.active), jnp.asarray(self.slot_budget),
            step_rng, jnp.asarray(self.slot_temp),
            jnp.asarray(self.slot_top_p), k=k,
            sample=bool(self.slot_temp[self.active].max(initial=0.0) > 0))
        toks_host = np.asarray(toks)   # (k, B)
        live_host = np.asarray(live)   # (k, B) — which emissions were real
        for k in range(toks_host.shape[0]):
            for slot in range(self.max_batch):
                if live_host[k, slot] and self.active[slot]:
                    self._push_token(slot, int(toks_host[k, slot]))
        return int(self.active.sum())

    def run(self, requests: List[Request]) -> List[Request]:
        """Serve a request list to completion (admission interleaved with
        decode ticks — later requests join as slots free up)."""
        pending = list(requests)
        n = self.admit(pending)
        pending = pending[n:]
        while self.active.any() or pending:
            if pending and self._free_slots():
                n = self.admit(pending)
                pending = pending[n:]
            self.step(waiting=len(pending))
        return requests
