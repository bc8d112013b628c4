"""Generation engine: batched prefill + decode over a static KV cache.

Capability parity with the reference generation path (UniBind.generate →
TextModal.generate → HF generate with KV cache, lhrs/models/UniBind.py:
214-242, text_modal.py:528-627): greedy and temperature/top-p sampling,
max_new_tokens, EOS / keyword stopping, and token streaming for the CLI/web
UIs (TextIteratorStreamer parity, lhrs_webui.py:233-239).

TPU-first design:
  * prompts arrive right-padded with per-row lengths; the KV cache appends at
    `length` so no left-padding or position remapping is needed;
  * the decode loop is a single jitted lax.scan over steps — one dispatch for
    the whole generation (vs per-token Python dispatch in HF);
  * a `stream()` variant steps one token per dispatch for interactive UIs;
  * the engine is mesh-aware: with a ("data","model") mesh the decoder runs
    TP-sharded (heads split over "model"), batch over "data".
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import KVCache, llama_decode_step, llama_prefill
from ..models.vlm import VLMConfig, effective_llama_params, prepare_multimodal_inputs


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 128
    do_sample: bool = False
    temperature: float = 1.0
    top_p: float = 1.0
    eos_token_id: int = 2
    pad_token_id: int = 0


def _sample_token(logits: jnp.ndarray, rng: jax.Array,
                  gen_cfg: GenerationConfig) -> jnp.ndarray:
    """logits (B, V) → token ids (B,). Greedy or temperature/top-p."""
    if not gen_cfg.do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.maximum(gen_cfg.temperature, 1e-6)
    if gen_cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(sorted_probs, axis=-1)
        # keep the smallest set with cumulative prob >= top_p
        cutoff_idx = jnp.sum(cum < gen_cfg.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -1e30, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def _sample_token_per_slot(logits: jnp.ndarray, rng: jax.Array,
                           temp: jnp.ndarray,
                           top_p: jnp.ndarray) -> jnp.ndarray:
    """Per-row sampling for shared continuous batches: logits (B, V) with
    per-slot temperature (B,) and top-p (B,). Rows with temp <= 0 decode
    greedily; others sample temperature/top-p — so one batch can mix a
    greedy eval request with a T=0.4 chat request (the engine-level
    _sample_token applies ONE GenerationConfig to the whole batch)."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temp, 1e-6)[:, None]
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    cutoff_idx = jnp.sum(cum < top_p[:, None], axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    masked = jnp.where(scaled < cutoff, -1e30, scaled)
    sampled = jax.random.categorical(rng, masked, axis=-1).astype(jnp.int32)
    return jnp.where(temp > 0, sampled, greedy)


def _is_host_tree(llama_params) -> bool:
    """True when every decoder leaf is a host (numpy) array — the
    load_pretrained / load_orbax_params output, not device-resident."""
    from ..ops.quant import QuantizedTensor

    leaves = jax.tree_util.tree_leaves(llama_params)
    return bool(leaves) and all(
        isinstance(x, np.ndarray) for x in leaves) and not any(
        isinstance(w, QuantizedTensor)
        for w in llama_params["layers"].values())


def _host_merge_quantize(params, cfg, compute_dtype, lm_head_bits=None,
                         bits=8):
    """LoRA merge + symmetric per-channel quantization, entirely in numpy.

    merge_and_unload parity (UniBind.py:110-116) followed by the bits-8
    recipe (text_modal.py:91-109) — or, with bits="4h", the halves-packed
    int4 layout the Pallas W4A8 decode matmul streams (ops/w4_matmul.py;
    numerically identical to ops.quant.quantize_int4h) — with the device
    footprint capped at the quantized result: full-precision merged
    weights never leave the host."""
    from ..ops.quant import _QUANT_TARGETS, QuantizedTensor

    llama = params["llama"]
    lora = (params.get("lora")
            if cfg.lora is not None and "lora" in params else None)
    out_layers = {}
    for name, w in llama["layers"].items():
        w = np.asarray(w)
        if lora is not None and name in lora:
            ab = lora[name]
            delta = np.einsum(
                "lir,lro->lio", np.asarray(ab["a"], np.float32),
                np.asarray(ab["b"], np.float32)) * cfg.lora.scale
            w = w.astype(np.float32) + delta
        if name in _QUANT_TARGETS:
            wf = w.astype(np.float32)
            absmax = np.abs(wf).max(axis=1, keepdims=True)
            if bits == "4h":
                scale = np.where(absmax == 0, 1.0, absmax / 7.0)
                q = np.clip(np.round(wf / scale), -7, 7).astype(np.int8)
                n = q.shape[1] // 2  # pack_int4_halves, numpy
                packed = ((q[:, :n, :] & 0x0F)
                          | ((q[:, n:, :] & 0x0F) << 4)).astype(np.int8)
                out_layers[name] = QuantizedTensor(
                    q=packed, scale=scale.astype(np.float32), bits="4h")
            else:
                scale = np.where(absmax == 0, 1.0, absmax / 127.0)
                q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
                out_layers[name] = QuantizedTensor(
                    q=q, scale=scale.astype(np.float32), bits=8)
        else:
            out_layers[name] = w.astype(compute_dtype)
    top = {
        k: (np.asarray(v).astype(compute_dtype)
            if np.issubdtype(np.asarray(v).dtype, np.floating) else v)
        for k, v in llama.items() if k != "layers"
    }
    if lm_head_bits == 8:
        wf = np.asarray(llama["lm_head"]).astype(np.float32)  # (d, V)
        absmax = np.abs(wf).max(axis=0, keepdims=True)
        scale = np.where(absmax == 0, 1.0, absmax / 127.0)
        top["lm_head"] = QuantizedTensor(
            q=np.clip(np.round(wf / scale), -127, 127).astype(np.int8),
            scale=scale.astype(np.float32), bits=8)
    return {**top, "layers": out_layers}


class GenerationEngine:
    def __init__(
        self,
        cfg: VLMConfig,
        params,
        *,
        max_seq_len: int = 2304,  # 2048 text + 144 image + headroom
        compute_dtype=jnp.bfloat16,
        cache_dtype=jnp.bfloat16,
        quantize_bits: Optional[int] = None,  # 8/4: int weights for decode
        quant_type: str = "nf4",  # bits=4 codebook (reference BitsAndBytes)
        double_quant: bool = True,  # bits=4: double-quantize the absmax
        lm_head_bits: Optional[int] = None,  # 8: int8 unembedding (decode
        # streams every weight per token; the bf16 head is 262 MB/step.
        # Off by default: the reference's bnb recipe keeps lm_head fp16)
        vision_w8a8: bool = False,  # fused W8A8 vision tower (Pallas)
        mesh=None,  # jax.sharding.Mesh → TP-shard the decoder over ICI
        prompt_bucket: int = 64,  # pad prompts up to a bucket width
        cache_bucket: int = 256,  # round cache lengths up to a bucket
        max_compiled_scans: int = 8,  # bound the decode-scan jit cache
        prefill_chunk: Optional[int] = None,  # chunked prefill width
    ):
        self.cfg = cfg
        self.mesh = mesh
        self.compute_dtype = compute_dtype
        self.cache_dtype = cache_dtype
        self.max_seq_len = max_seq_len
        # compile-churn control: every distinct (prompt width, cache length,
        # steps) tuple is a fresh XLA program — minutes of 7B compile through
        # the remote tunnel — so widths and cache lengths are bucketed
        self.prompt_bucket = prompt_bucket
        self.cache_bucket = cache_bucket
        self.max_compiled_scans = max_compiled_scans
        # chunked prefill: run the decoder over fixed-width chunks of the
        # spliced embeds (llama_prefill_continue against the growing
        # cache) so ONE compiled transformer program serves every prompt
        # length — at 7B each extra width bucket costs minutes of compile.
        # Costs one extra dispatch per chunk (~20-40 ms via a remote
        # runtime), so it is opt-in.
        self.prefill_chunk = prefill_chunk
        # merge LoRA once at load (merge_and_unload parity, UniBind.py:110-116)
        # keep only the vision-side subtrees: the raw llama weights (13.5 GB
        # bf16 at 7B) would otherwise ride along as an unused jit argument
        # of every prefill and OOM the 16 GB chip (the decoder runs from
        # self.llama_params, cast/quantized below)
        self.params = {k: v for k, v in params.items()
                       if k not in ("llama", "lora")}
        if quantize_bits in (8, "4h") and _is_host_tree(params["llama"]):
            # 7B + int weights from host checkpoints: merge LoRA and
            # quantize in NUMPY so the chip only ever receives the int8 /
            # packed-int4 result. The device-side path below peaks at
            # merged-bf16 (13.2 GB) PLUS the quantized copy — past 16 GB
            # of HBM, with the OOM surfacing lazily at first execution.
            self.llama_params = _host_merge_quantize(
                params, cfg, compute_dtype, lm_head_bits=lm_head_bits,
                bits=quantize_bits)
        else:
            self.llama_params = jax.tree_util.tree_map(
                lambda x: x.astype(compute_dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                          jnp.floating)
                else x,
                effective_llama_params(params, cfg,
                                       stop_base_gradient=False),
            )
            if quantize_bits:
                # bits 8/4 config parity (reference bitsandbytes load,
                # text_modal.py:91-109): decode is weight-bandwidth-bound,
                # so int8 weights halve HBM bytes per token
                from ..ops.quant import quantize_llama_layers

                bits, qt = ((4, "int4h") if quantize_bits == "4h"
                            else (quantize_bits, quant_type))
                self.llama_params = {
                    **self.llama_params,
                    "layers": quantize_llama_layers(
                        self.llama_params["layers"], bits=bits,
                        quant_type=qt, double_quant=double_quant),
                }
            from ..ops.quant import QuantizedTensor, quantize_int8

            if lm_head_bits == 8 and not isinstance(
                    self.llama_params["lm_head"], QuantizedTensor):

                self.llama_params = {
                    **self.llama_params,
                    "lm_head": jax.jit(
                        lambda w: quantize_int8(w, axis=0))(
                        self.llama_params["lm_head"]),
                }
        self._vision_packed = None
        if vision_w8a8:
            # fused W8A8 Pallas vision blocks (ops/vit_block.py): ~20%
            # prefill throughput over the XLA W8A8 path, ~2.7% rel-L2
            # feature deviation vs bf16 — serving fast path, opt-in
            from ..ops.quant import quantize_vision_layers
            from ..ops.vit_block import pack_vit_layers_fused

            self._vision_packed = jax.jit(pack_vit_layers_fused)(
                params["vit"]["layers"])
            # W8A8 perceiver to match the tower (and the headlined bench
            # path): quantize the pooler projections once at load
            self.params = {
                **self.params,
                "pooler": {
                    **self.params["pooler"],
                    "layers": jax.jit(quantize_vision_layers)(
                        self.params["pooler"]["layers"]),
                },
            }
        # NOTE: the hoisted perceiver K/V projection (pack_perceiver_kv) is
        # NOT applied: measured SLOWER on v5e at the B=64 prefill point
        # (2046 vs 2556 img/s perceiver-only) — the per-layer K/V matmuls
        # already run near chain rate and the hoist pays a (B, 912, 12·1024)
        # HBM materialization. See benchmarks/ROOFLINE_prefill.md.
        if mesh is not None:
            # ICI-sharded decode: Megatron TP over the "model" axis
            from ..parallel.partition import shard_llama_for_serving

            self.llama_params = shard_llama_for_serving(
                mesh, self.llama_params)
        else:
            # pin params on device ONCE: host (numpy) leaves passed as jit
            # arguments are re-uploaded on EVERY call — through the remote
            # runtime that is ~8 GB of transfer per generate (measured
            # 255 s/call at 7B) and the upload churn is what exhausted HBM
            self.llama_params = jax.device_put(self.llama_params)
        self.params = jax.device_put(self.params)
        self._prefill_jit = jax.jit(
            self._prefill, static_argnames=("batch", "cache_len"))
        import collections

        self._decode_scan_jit = collections.OrderedDict()  # LRU, bounded
        # donate the cache: decode updates alias in place, otherwise every
        # queued step holds a full cache copy (OOMs at 7B scale)
        self._decode_step_jit = jax.jit(self._decode_step,
                                        donate_argnums=(1,))
        # multi-turn session continuation (stream(session=True)): the
        # cache + raw token ids of the last stream, so the next turn's
        # rendered conversation prefills only its uncached suffix
        self._session = None
        self._prefill_continue_jit = jax.jit(self._prefill_continue,
                                             donate_argnums=(1,))
        self._splice_jit = jax.jit(self._splice)
        self._continue_embeds_jit = jax.jit(self._continue_embeds,
                                            donate_argnums=(1,))
        self._speculate_jit = jax.jit(self._speculate, donate_argnums=(1,))

    # -- jitted pieces ------------------------------------------------------

    def _prefill(self, params, llama_params, vision_packed, input_ids,
                 images, seq_lens, *, batch: int, cache_len: int):
        # vision_packed is an explicit argument (not a closure capture):
        # captured constants are baked into every compiled program and
        # shipped per-compile through a remote runtime
        spliced = prepare_multimodal_inputs(
            params, self.cfg, input_ids, images,
            attention_mask=jnp.arange(input_ids.shape[1])[None, :]
            < seq_lens[:, None],
            compute_dtype=self.compute_dtype,
            llama_params=llama_params,
            vision_packed=vision_packed,
        )
        cache = KVCache.create(self.cfg.llama, batch, cache_len,
                               dtype=self.cache_dtype)
        logits, cache = llama_prefill(
            llama_params, self.cfg.llama, cache,
            inputs_embeds=spliced.inputs_embeds,
            prompt_len=spliced.seq_len,
            compute_dtype=self.compute_dtype,
        )
        return logits, cache

    def _prefill_continue(self, llama_params, cache, suffix_ids,
                          suffix_len, start):
        embeds = jnp.take(llama_params["embed_tokens"],
                          jnp.maximum(suffix_ids, 0), axis=0)
        return self._continue_embeds(llama_params, cache, embeds,
                                     suffix_len, start)

    def _continue_embeds(self, llama_params, cache, embeds, suffix_len,
                         start):
        from ..models.llama import llama_prefill_continue

        return llama_prefill_continue(
            llama_params, self.cfg.llama, cache,
            inputs_embeds=embeds, suffix_len=suffix_len, start=start,
            compute_dtype=self.compute_dtype)

    def _splice(self, params, llama_params, vision_packed, input_ids,
                images, seq_lens):
        spliced = prepare_multimodal_inputs(
            params, self.cfg, input_ids, images,
            attention_mask=jnp.arange(input_ids.shape[1])[None, :]
            < seq_lens[:, None],
            compute_dtype=self.compute_dtype,
            llama_params=llama_params,
            vision_packed=vision_packed,
        )
        return spliced.inputs_embeds, spliced.seq_len

    def _chunked_prefill(self, input_ids, images, seq_lens, batch: int,
                         cache_len: int):
        """Width-independent prefill: splice once (vision tower + embed),
        then run the decoder over fixed `prefill_chunk`-wide slices of the
        embeds via the continuation program — one compiled transformer
        prefill for EVERY prompt length. Returns (next-token logits,
        cache), identical to the monolithic prefill."""
        emb, spl_len = self._splice_jit(
            self.params, self.llama_params, self._vision_packed,
            input_ids, images, seq_lens)
        w = self.prefill_chunk
        s = emb.shape[1]
        n_chunks = -(-s // w)
        if s < n_chunks * w:
            emb = jnp.pad(emb, ((0, 0), (0, n_chunks * w - s), (0, 0)))
        cache = KVCache.create(self.cfg.llama, batch, cache_len,
                               dtype=self.cache_dtype)
        spl_host = np.asarray(spl_len)
        last_chunk = np.maximum(spl_host - 1, 0) // w
        per_chunk_logits = {}
        for c in range(n_chunks):
            start = jnp.minimum(spl_len, c * w)
            sfx = jnp.clip(spl_len - c * w, 0, w)
            logits_c, cache = self._continue_embeds_jit(
                self.llama_params, cache, emb[:, c * w:(c + 1) * w],
                sfx, start)
            if (last_chunk == c).any():
                per_chunk_logits[c] = logits_c
        logits = jnp.stack(
            [per_chunk_logits[int(last_chunk[r])][r]
             for r in range(batch)])
        return logits, cache

    def _speculate(self, llama_params, cache, window_ids, valid, start):
        """Verify a speculative window: run `valid` proposed tokens (padded
        to the static window width) through the continuation prefill and
        return logits at EVERY window position."""
        from ..models.llama import llama_prefill_continue

        embeds = jnp.take(llama_params["embed_tokens"],
                          jnp.maximum(window_ids, 0), axis=0)
        return llama_prefill_continue(
            llama_params, self.cfg.llama, cache,
            inputs_embeds=embeds, suffix_len=valid, start=start,
            compute_dtype=self.compute_dtype, return_all_logits=True)

    @staticmethod
    def _propose(history, ngram: int, max_len: int):
        """Prompt-lookup proposal: find the most recent earlier occurrence
        of the last `ngram` tokens in `history` and return the tokens that
        followed it (pure host work)."""
        if len(history) < ngram + 1 or max_len <= 0:
            return []
        arr = np.asarray(history, np.int64)
        pat = arr[-ngram:]
        # scan candidate positions from most recent to oldest
        windows = np.lib.stride_tricks.sliding_window_view(
            arr[:-1], ngram)
        hits = np.flatnonzero((windows == pat).all(axis=1))
        for pos in hits[::-1]:
            follow = arr[pos + ngram:pos + ngram + max_len]
            if len(follow) and (follow >= 3).all():
                return [int(t) for t in follow]
        return []

    def _decode_step(self, llama_params, cache, tokens):
        embeds = jnp.take(llama_params["embed_tokens"], tokens[:, None],
                          axis=0)
        logits, cache = llama_decode_step(
            llama_params, self.cfg.llama, cache,
            inputs_embeds=embeds, compute_dtype=self.compute_dtype)
        return logits, cache

    def _decode_scan(self, steps: int, gen_cfg: GenerationConfig):
        key = (steps, gen_cfg)
        if key in self._decode_scan_jit:
            self._decode_scan_jit.move_to_end(key)  # LRU refresh
            return self._decode_scan_jit[key]

        def run(llama_params, cache, first_tokens, rng):
            def body(carry, step_rng):
                cache, tokens, done = carry
                logits, cache = self._decode_step(llama_params, cache, tokens)
                nxt = _sample_token(logits, step_rng, gen_cfg)
                nxt = jnp.where(done, gen_cfg.pad_token_id, nxt)
                done = done | (nxt == gen_cfg.eos_token_id)
                return (cache, nxt, done), nxt

            batch = first_tokens.shape[0]
            done0 = first_tokens == gen_cfg.eos_token_id
            rngs = jax.random.split(rng, steps)
            (cache, _, _), toks = jax.lax.scan(
                body, (cache, first_tokens, done0), rngs)
            return toks.T, cache  # (B, steps)

        # cache is donated: the scan's in-place appends alias the prefill
        # output buffer instead of copying the full cache on entry
        fn = jax.jit(run, donate_argnums=(1,))
        self._decode_scan_jit[key] = fn
        while len(self._decode_scan_jit) > self.max_compiled_scans:
            self._decode_scan_jit.popitem(last=False)  # evict LRU
        return fn

    # -- public API ---------------------------------------------------------

    def _bucketed(self, t: int, n_img: int, max_new: int) -> Tuple[int, int]:
        """(prompt width, cache length) rounded up to bucket multiples so
        the eval prompt-length distribution maps onto a handful of compiled
        programs instead of one per distinct length."""
        width = -(-t // self.prompt_bucket) * self.prompt_bucket
        # the splice expands one image token into n_img embeddings: the
        # spliced prompt (width + n_img - 1) must fit the cache
        width = min(width, self.max_seq_len - n_img)
        cache_len = -(-(width + n_img + max_new) //
                      self.cache_bucket) * self.cache_bucket
        return width, min(cache_len, self.max_seq_len)

    def _clamp_new_tokens(self, gen_cfg: "GenerationConfig",
                          spliced_max: int,
                          cache_len: int) -> "GenerationConfig":
        """Clamp max_new_tokens to the cache room left after the longest
        spliced prompt in the batch (scheduler parity,
        serve/scheduler.py:admit): the select-based KV write past cache_len
        drops silently and the fused append window (ops/fused_decode.py)
        lands out of range. Final cache length after max_new tokens is
        spliced_max + max_new - 1 (the first token is sampled from prefill
        logits and appended on the first decode step)."""
        room = max(1, cache_len - spliced_max + 1)
        if gen_cfg.max_new_tokens <= room:
            return gen_cfg
        import logging

        logging.getLogger("lhrs_tpu").warning(
            "max_new_tokens %d exceeds cache room %d after a %d-token "
            "spliced prompt (cache_len=%d) — clamping",
            gen_cfg.max_new_tokens, room, spliced_max, cache_len)
        return dataclasses.replace(gen_cfg, max_new_tokens=room)

    def _pad_ids(self, input_ids: np.ndarray, width: int,
                 pad_id: int) -> np.ndarray:
        t = input_ids.shape[1]
        if t == width:
            return input_ids
        if t > width:
            return input_ids[:, :width]
        out = np.full((input_ids.shape[0], width), pad_id,
                      input_ids.dtype)
        out[:, :t] = input_ids
        return out

    def warmup(
        self,
        *,
        batch_sizes: Sequence[int] = (1,),
        prompt_lens: Sequence[int] = (64, 256),
        max_new_tokens: Sequence[int] = (128,),
        with_image: bool = True,
        gen_cfg: Optional[GenerationConfig] = None,
    ) -> int:
        """Pre-compile the prefill/decode programs for the expected request
        shapes at startup (7B compiles take minutes through a remote
        runtime — they must not land on the first user request). Returns the
        number of (batch, width) prefill programs compiled."""
        gen_cfg = gen_cfg or GenerationConfig()
        n = 0
        img_hw = self.cfg.vit.image_size
        for b in batch_sizes:
            for t in prompt_lens:
                for mnt in max_new_tokens:
                    ids = np.full((b, min(t, 4)), 5, np.int32)
                    imgs = (np.zeros((b, img_hw, img_hw, 3), np.uint8)
                            if with_image else None)
                    if imgs is not None:
                        ids[:, 0] = -200
                    # route through generate() with the REAL gen_cfg:
                    # identical bucketing + scan length → the first user
                    # request hits exactly these compiled programs
                    self.generate(
                        self._pad_ids(ids, t, 0),
                        np.full((b,), ids.shape[1], np.int32),
                        images=imgs,
                        gen_cfg=dataclasses.replace(
                            gen_cfg, max_new_tokens=mnt))
                    n += 1
        return n

    def generate(
        self,
        input_ids: np.ndarray,  # (B, T) right-padded
        seq_lens: np.ndarray,  # (B,)
        images: Optional[np.ndarray] = None,  # (B, H, W, 3) uint8 or None
        gen_cfg: Optional[GenerationConfig] = None,
        rng: Optional[jax.Array] = None,
    ) -> List[List[int]]:
        """Returns newly generated token ids per row (EOS excluded)."""
        gen_cfg = gen_cfg or GenerationConfig()
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        batch, t = input_ids.shape
        k_img = (0 if images is None
                 else images.shape[1] if np.ndim(images) == 5 else 1)
        n_img = k_img * self.cfg.pooler.num_query
        width, cache_len = self._bucketed(t, n_img, gen_cfg.max_new_tokens)
        seq_lens = np.minimum(np.asarray(seq_lens), width)
        gen_cfg = self._clamp_new_tokens(
            gen_cfg,
            int(seq_lens.max()) + k_img * (self.cfg.pooler.num_query - 1),
            cache_len)
        input_ids = self._pad_ids(np.asarray(input_ids), width,
                                  gen_cfg.pad_token_id)

        if self.prefill_chunk:
            logits, cache = self._chunked_prefill(
                jnp.asarray(input_ids),
                jnp.asarray(images) if images is not None else None,
                jnp.asarray(seq_lens), batch, cache_len)
        else:
            logits, cache = self._prefill_jit(
                self.params, self.llama_params, self._vision_packed,
                jnp.asarray(input_ids),
                jnp.asarray(images) if images is not None else None,
                jnp.asarray(seq_lens), batch=batch, cache_len=cache_len)

        rng, r0, r1 = jax.random.split(rng, 3)
        first = _sample_token(logits, r0, gen_cfg)
        steps = gen_cfg.max_new_tokens - 1
        if steps > 0:
            toks, _ = self._decode_scan(steps, gen_cfg)(
                self.llama_params, cache, first, r1)
            all_toks = np.concatenate(
                [np.asarray(first)[:, None], np.asarray(toks)], axis=1)
        else:
            all_toks = np.asarray(first)[:, None]

        out: List[List[int]] = []
        for row in all_toks:
            ids = []
            for tok in row.tolist():
                if tok == gen_cfg.eos_token_id:
                    break
                ids.append(tok)
            out.append(ids)
        return out

    @staticmethod
    def _image_fp(images) -> Optional[bytes]:
        if images is None:
            return None
        import hashlib

        return hashlib.sha1(np.ascontiguousarray(images)).digest()

    def reset_session(self) -> None:
        """Drop the multi-turn continuation state (new chat / new image)."""
        self._session = None

    def _session_match(self, raw: np.ndarray, fp) -> Optional[int]:
        """Longest common prefix (in tokens) between the new prompt and
        what the session cache already holds; None when continuation
        doesn't apply."""
        st = self._session
        if st is None or st["image_fp"] != fp:
            return None
        old = st["raw_ids"]
        n = min(len(old), len(raw) - 1)  # >= 1 suffix token for logits
        if n <= 0:
            return None
        neq = np.nonzero(raw[:n] != old[:n])[0]
        common = int(neq[0]) if neq.size else n
        # the suffix must be pure text (an image splice can only sit in
        # the matched prefix) and the match must be worth a cache copy
        if common < 8 or np.any(raw[common:] < 0):
            return None
        return common

    def stream(
        self,
        input_ids: np.ndarray,  # (1, T)
        seq_len: int,
        images: Optional[np.ndarray] = None,
        gen_cfg: Optional[GenerationConfig] = None,
        rng: Optional[jax.Array] = None,
        stop_fn: Optional[Callable[[List[int]], bool]] = None,
        session: bool = False,
        speculative: int = 0,  # prompt-lookup window (greedy only)
        ngram: int = 2,
    ) -> Iterator[int]:
        """Single-sequence streaming: yields one token id per step
        (TextStreamer/TextIteratorStreamer parity for the CLI/web UI).

        session=True keeps the KV cache across calls: the next turn's
        rendered conversation is matched against the tokens already in
        the cache (prior prompt + generated answer) and only the new
        suffix is prefilled (`llama_prefill_continue`) — turn-N prefill
        cost scales with the new question, not the whole history. The
        reference regenerates from scratch every turn
        (/root/reference/lhrs/models/text_modal.py:528-627)."""
        gen_cfg = gen_cfg or GenerationConfig()
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        t = input_ids.shape[1]
        nq = self.cfg.pooler.num_query
        k_img = (0 if images is None
                 else images.shape[1] if np.ndim(images) == 5 else 1)
        n_img = k_img * nq
        raw = np.asarray(input_ids)[0, :int(seq_len)].astype(np.int32)
        fp = self._image_fp(images) if session else None
        common = self._session_match(raw, fp) if session else None

        if common is not None:
            # every image marker in the matched prefix expanded by nq-1
            start_spl = common + (nq - 1) * int((raw[:common] < 0).sum())
            if start_spl + self.prompt_bucket > self.max_seq_len:
                common = None  # cache ~full: no room for a suffix chunk

        if common is not None:
            st, self._session = self._session, None  # claim the cache
            sfx = raw[common:]
            width = min(-(-len(sfx) // self.prompt_bucket)
                        * self.prompt_bucket,
                        self.max_seq_len - start_spl)
            need = -(-(start_spl + width + gen_cfg.max_new_tokens)
                     // self.cache_bucket) * self.cache_bucket
            cache_len = min(max(need, st["cache"].k.shape[3]),
                            self.max_seq_len)
            gen_cfg = self._clamp_new_tokens(
                gen_cfg, start_spl + min(len(sfx), width), cache_len)
            ids = self._pad_ids(sfx[None, :], width, gen_cfg.pad_token_id)
            logits, cache = self._prefill_continue_jit(
                self.llama_params, st["cache"].resized(cache_len),
                jnp.asarray(ids),
                jnp.asarray([min(len(sfx), width)], np.int32),
                jnp.asarray([start_spl], np.int32))
            raw = raw[:common + min(len(sfx), width)]
        else:
            width, cache_len = self._bucketed(t, n_img,
                                              gen_cfg.max_new_tokens)
            if session:
                # pre-size the session cache to the full context: growing
                # it on a later turn pays a whole-cache copy (resized) AND
                # a fresh continuation-program compile mid-chat — measured
                # 2.7 s turn TTFT vs 0.05 s at 7B when turn 3 crossed a
                # cache bucket (benchmarks/session_ttft.py). A chat
                # session converges to full context anyway, and one cache
                # shape means one compiled continuation/decode program.
                cache_len = self.max_seq_len
            seq_len = min(int(seq_len), width)
            raw = raw[:seq_len]
            gen_cfg = self._clamp_new_tokens(
                gen_cfg, seq_len + k_img * (nq - 1), cache_len)
            input_ids = self._pad_ids(np.asarray(input_ids), width,
                                      gen_cfg.pad_token_id)
            if session:
                self._session = None  # a failed prefill must not leave
                # a stale session pointing at a donated cache
            if self.prefill_chunk:
                logits, cache = self._chunked_prefill(
                    jnp.asarray(input_ids),
                    jnp.asarray(images) if images is not None else None,
                    jnp.asarray([seq_len], np.int32), 1, cache_len)
            else:
                logits, cache = self._prefill_jit(
                    self.params, self.llama_params, self._vision_packed,
                    jnp.asarray(input_ids),
                    jnp.asarray(images) if images is not None else None,
                    jnp.asarray([seq_len], np.int32), batch=1,
                    cache_len=cache_len)

        emitted: List[int] = []
        appended = 0  # emitted tokens whose KV is in the cache
        # prompt-lookup speculation (greedy only): propose the tokens that
        # followed the last `ngram` in the prompt/output so far, verify the
        # whole window in ONE dispatch, keep the agreeing prefix — output
        # is token-identical to plain greedy, but each accepted token
        # saves a full decode dispatch + weight read
        spec = int(speculative) if not gen_cfg.do_sample else 0
        history = [int(t) for t in raw] if spec else None
        length = int(cache.length[0]) if spec else 0
        cache_room = cache.k.shape[3]
        try:
            if spec:
                tok = int(jnp.argmax(logits[0]))
                while True:
                    if tok == gen_cfg.eos_token_id:
                        return
                    emitted.append(tok)
                    history.append(tok)
                    yield tok
                    if stop_fn is not None and stop_fn(emitted):
                        return
                    if len(emitted) >= gen_cfg.max_new_tokens:
                        return
                    prop = self._propose(
                        history, ngram,
                        min(spec, gen_cfg.max_new_tokens - len(emitted) - 1,
                            cache_room - length - 1 - 1))
                    if prop and length + 1 + spec <= cache_room:
                        ids_w = np.zeros((1, spec + 1), np.int32)
                        ids_w[0, 0] = tok
                        ids_w[0, 1:1 + len(prop)] = prop
                        w = 1 + len(prop)
                        logits_all, cache = self._speculate_jit(
                            self.llama_params, cache, jnp.asarray(ids_w),
                            jnp.asarray([w], np.int32),
                            jnp.asarray([length], np.int32))
                        preds = np.asarray(
                            jnp.argmax(logits_all[0, :w], axis=-1))
                        p = 0
                        while p < len(prop) and prop[p] == int(preds[p]):
                            p += 1
                        length += 1 + p
                        appended += 1 + p
                        cache = cache._replace(length=jnp.asarray(
                            [length], jnp.int32))
                        hit_eos = False
                        for t in prop[:p]:
                            if t == gen_cfg.eos_token_id:
                                hit_eos = True
                                break
                            emitted.append(t)
                            history.append(t)
                            yield t
                            if stop_fn is not None and stop_fn(emitted):
                                return
                            if len(emitted) >= gen_cfg.max_new_tokens:
                                return
                        if hit_eos:
                            return
                        tok = int(preds[p])
                    else:
                        logits, cache = self._decode_step_jit(
                            self.llama_params, cache,
                            jnp.asarray([tok], jnp.int32))
                        length += 1
                        appended += 1
                        tok = int(jnp.argmax(logits[0]))
                return
            for i in range(gen_cfg.max_new_tokens):
                rng, step_rng = jax.random.split(rng)
                tok_arr = _sample_token(logits, step_rng, gen_cfg)
                tok = int(tok_arr[0])
                if tok == gen_cfg.eos_token_id:
                    return
                emitted.append(tok)
                yield tok
                if stop_fn is not None and stop_fn(emitted):
                    return
                if i + 1 == gen_cfg.max_new_tokens:
                    return  # no decode step after the final token: its
                    # cache append would be wasted (and, at the clamp
                    # boundary, one slot past the cache)
                logits, cache = self._decode_step_jit(
                    self.llama_params, cache, tok_arr)
                appended += 1
        finally:
            if session:
                self._session = {
                    "raw_ids": np.concatenate(
                        [raw, np.asarray(emitted[:appended], np.int32)]),
                    "image_fp": fp,
                    "cache": cache,
                }
