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
import queue
import threading
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import KVCache, llama_decode_step, llama_prefill
from ..models.vlm import VLMConfig, prepare_multimodal_inputs
from .engine import GenerationConfig, _sample_token


@dataclasses.dataclass
class Request:
    uid: int
    input_ids: np.ndarray  # (T,) prompt token ids (may contain -200)
    image: Optional[np.ndarray] = None  # (H, W, 3) uint8
    max_new_tokens: int = 128
    # filled by the scheduler:
    output_ids: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    error: Optional[str] = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class ContinuousBatchingScheduler:
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
    ):
        self.cfg = cfg
        # vision-side subtrees only — raw llama weights must not become an
        # unused jit argument of the prefill (see engine.py)
        self.params = jax.device_put(
            {k: v for k, v in params.items()
             if k not in ("llama", "lora")}
            if isinstance(params, dict) else params)
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

        self.cache = KVCache.create(cfg.llama, max_batch, max_seq_len,
                                    dtype=cache_dtype)
        # per-slot host state
        self.slot_req: List[Optional[Request]] = [None] * max_batch
        self.slot_budget = np.zeros(max_batch, np.int32)
        self.last_tokens = np.full(max_batch, pad_token_id, np.int32)
        self.active = np.zeros(max_batch, bool)

        # params are explicit jit ARGUMENTS, not closure captures: captured
        # constants are baked into every compiled program (7 GB shipped per
        # compile through a remote runtime)
        self._prefill_jit = jax.jit(self._prefill,
                                    static_argnames=("width",),
                                    donate_argnums=(4,))
        self._tick_jit = jax.jit(self._tick, donate_argnums=(2,))

    def set_tokens_per_tick(self, k: int) -> None:
        """Change the decode chunk size; only the tick program recompiles
        (the prefill programs are unaffected)."""
        self.tokens_per_tick = max(1, int(k))
        self._tick_jit = jax.jit(self._tick, donate_argnums=(2,))

    # -- jitted programs ------------------------------------------------------

    def _prefill(self, params, llama_params, input_ids, images, cache,
                 slot_mask, seq_lens, rng, *, width: int):
        """Prefill `width`-wide prompts into the slots marked by slot_mask
        (bool (max_batch,)); rows not selected keep their cache content."""
        spliced = prepare_multimodal_inputs(
            params, self.cfg, input_ids, images,
            attention_mask=jnp.arange(input_ids.shape[1])[None, :]
            < seq_lens[:, None],
            compute_dtype=self.compute_dtype,
            llama_params=llama_params,
        )
        tmp = KVCache.create(self.cfg.llama, self.max_batch,
                             self.max_seq_len, dtype=self.cache.k.dtype)
        logits, tmp = llama_prefill(
            llama_params, self.cfg.llama, tmp,
            inputs_embeds=spliced.inputs_embeds,
            prompt_len=spliced.seq_len,
            compute_dtype=self.compute_dtype,
        )
        sel = slot_mask[None, :, None, None, None]
        new_cache = KVCache(
            k=jnp.where(sel, tmp.k, cache.k),
            v=jnp.where(sel, tmp.v, cache.v),
            length=jnp.where(slot_mask, tmp.length, cache.length),
        )
        first = _sample_token(logits, rng, self.gen_cfg)
        return first, new_cache

    def _tick(self, llama_params, tokens, cache, active, budgets, rng):
        """`tokens_per_tick` decode steps over all slots in one lax.scan.

        A slot freezes the moment it emits EOS or exhausts its budget:
        its cache length stops growing and later emissions are masked to
        pad, so the k-step chunk is token-for-token identical to k
        single-step ticks for GREEDY decoding. When do_sample=True the RNG
        stream differs (one split per tick here vs one per token at k=1),
        so sampled outputs are distributionally equivalent but not
        bit-identical across k. Emits (k, B) tokens plus the (k, B) mask
        of which emissions were live."""

        def body(carry, step_rng):
            toks, cache, act, budg = carry
            embeds = jnp.take(llama_params["embed_tokens"],
                              toks[:, None], axis=0)
            logits, new_cache = llama_decode_step(
                llama_params, self.cfg.llama, cache,
                inputs_embeds=embeds, compute_dtype=self.compute_dtype)
            nxt = _sample_token(logits, step_rng, self.gen_cfg)
            emit = jnp.where(act, nxt, self.pad)
            budg = jnp.where(act, budg - 1, budg)
            new_act = act & (nxt != self.eos) & (budg > 0)
            # frozen slots must not grow their cache
            new_cache = KVCache(
                k=new_cache.k, v=new_cache.v,
                length=jnp.where(act, new_cache.length, cache.length))
            return (emit, new_cache, new_act, budg), (emit, act)

        rngs = jax.random.split(rng, self.tokens_per_tick)
        (_, cache, _, _), (toks, live) = jax.lax.scan(
            body, (tokens, cache, active, budgets), rngs)
        return toks, live, cache

    # -- host-side scheduling --------------------------------------------------

    def _free_slots(self) -> List[int]:
        return [i for i in range(self.max_batch) if not self.active[i]]

    def admit(self, requests: List[Request]) -> int:
        """Pack as many requests as fit into free slots; returns #admitted."""
        free = self._free_slots()
        batch = requests[:len(free)]
        if not batch:
            return 0
        slots = free[:len(batch)]

        import logging

        log = logging.getLogger("lhrs_tpu")
        t = max(len(r.input_ids) for r in batch)
        has_image = any(r.image is not None for r in batch)
        # an image expands the spliced prefill by num_query-1 tokens
        # (the -200 placeholder becomes num_query pooled embeddings), so the
        # prompt budget must leave room for the expansion in the cache
        nq = self.cfg.pooler.num_query
        width_cap = (self.max_seq_len - nq + 1 if has_image
                     else self.max_seq_len)
        width = min(_round_up(t, self.prompt_bucket), width_cap)
        if t > width:
            log.warning(
                "prompt length %d exceeds admissible width %d "
                "(max_seq_len=%d%s) — truncating",
                t, width, self.max_seq_len,
                f", image expansion {nq - 1}" if has_image else "")
        ids = np.full((self.max_batch, width), self.pad, np.int32)
        lens = np.zeros(self.max_batch, np.int32)
        imgs = None
        if has_image:
            h = self.cfg.vit.image_size
            imgs = np.zeros((self.max_batch, h, h, 3), np.uint8)
        mask = np.zeros(self.max_batch, bool)
        for slot, req in zip(slots, batch):
            n = min(len(req.input_ids), width)
            ids[slot, :n] = req.input_ids[:n]
            lens[slot] = n
            mask[slot] = True
            if imgs is not None and req.image is not None:
                imgs[slot] = req.image

        self._rng, step_rng = jax.random.split(self._rng)
        first, self.cache = self._prefill_jit(
            self.params, self.llama_params,
            jnp.asarray(ids), jnp.asarray(imgs) if imgs is not None else None,
            self.cache, jnp.asarray(mask), jnp.asarray(lens), step_rng,
            width=width)
        first_host = np.asarray(first)

        for slot, req in zip(slots, batch):
            self.slot_req[slot] = req
            # clamp the generation budget to the cache room left after the
            # spliced prompt — silently-dropped KV writes corrupt output
            spliced = int(lens[slot])
            if req.image is not None and np.any(ids[slot, :spliced] < 0):
                spliced += nq - 1
            room = max(1, self.max_seq_len - spliced)
            if req.max_new_tokens > room:
                log.warning(
                    "request %d: max_new_tokens %d exceeds cache room %d "
                    "after a %d-token spliced prompt — clamping",
                    req.uid, req.max_new_tokens, room, spliced)
            self.slot_budget[slot] = min(req.max_new_tokens, room)
            tok = int(first_host[slot])
            self.active[slot] = True
            self._push_token(slot, tok)
        return len(batch)

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
        else:
            req.output_ids.append(tok)
            self.last_tokens[slot] = tok

    def step(self) -> int:
        """One decode tick (= `tokens_per_tick` tokens per active slot in a
        single dispatch) over all slots; returns #still-active."""
        if not self.active.any():
            return 0
        self._rng, step_rng = jax.random.split(self._rng)
        toks, live, self.cache = self._tick_jit(
            self.llama_params, jnp.asarray(self.last_tokens), self.cache,
            jnp.asarray(self.active), jnp.asarray(self.slot_budget),
            step_rng)
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
            self.step()
        return requests
