"""Paged KV cache: vLLM-style block storage for the decode path.

The contiguous `KVCache` reserves `max_seq_len` rows per slot, so one chip
holds exactly HBM/(S_max·bytes) concurrent sequences regardless of their
real lengths. Paging replaces the reservation with a page POOL shared by
all slots — a sequence holds ceil(len/page_size) pages, so short requests
stop paying for the 2304-token worst case and the admission limit becomes
TOTAL TOKENS, not slot count (serve/paged.py does the bookkeeping).

The reference has no serving engine at all (its only generation surface is
a single-user HF `generate` thread, /root/reference/lhrs_webui.py:233-239);
this module extends the TPU serving stack beyond it.

TPU design: decode attention + page append run as ONE fused Pallas
kernel (ops/paged_fused.py — the new token's K/V row is read-modify-
written into its page while the sequence's valid pages stream through a
deep DMA ring with online softmax), with an XLA gather-based reference
for CPU meshes and tests. JAX's bundled paged-attention kernel was
measured at ~1.8 GB/s effective on this geometry (per-(head, page) 8 KB
fragment DMAs, benchmarks/paged_probe.py) and is not used.

Layout: pools are (L, N_pages, H, page_size, d) — one PAGE is one dense
(H, page, d) block so the kernel streams it as a single async copy, and
the layer axis leads so `lax.scan` can slice it. `page_table` rows index
the pool; **page 0 is reserved as the null page**: unallocated table
entries point at it, it is never allocated to a sequence, and masked
attention (positions >= length) never reads it.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.decode_attention import decode_attention
from ..ops.rmsnorm import rms_norm
from ..ops.rope import rope_cos_sin
from .llama import (KVCache, LlamaConfig, _cast_params, _lm_head_logits,
                    _proj, _qkv, _silu_mlp)


class PagedKVCache(NamedTuple):
    k_pages: jnp.ndarray     # (L, N_pages, H, page_size, d)
    v_pages: jnp.ndarray     # (L, N_pages, H, page_size, d)
    page_table: jnp.ndarray  # (B, pages_per_seq) int32 — 0 = null page
    lengths: jnp.ndarray     # (B,) int32 valid tokens per slot
    # int8 pools: per-(head, position) vector scales, repo convention
    # x ≈ q * scale (scale = absmax/127, ops/quant.py:81)
    k_scale_pages: Optional[jnp.ndarray] = None  # (L, N, H, page) f32
    v_scale_pages: Optional[jnp.ndarray] = None

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def pages_per_seq(self) -> int:
        return self.page_table.shape[1]

    @property
    def quantized(self) -> bool:
        return self.k_scale_pages is not None

    @classmethod
    def create(cls, cfg: LlamaConfig, batch: int, num_pages: int,
               pages_per_seq: int, page_size: int = 128,
               dtype=jnp.bfloat16) -> "PagedKVCache":
        shape = (cfg.num_hidden_layers, num_pages,
                 cfg.num_attention_heads, page_size, cfg.head_dim)
        table = jnp.zeros((batch, pages_per_seq), jnp.int32)
        lengths = jnp.zeros((batch,), jnp.int32)
        if dtype == jnp.int8:
            return cls(
                k_pages=jnp.zeros(shape, jnp.int8),
                v_pages=jnp.zeros(shape, jnp.int8),
                page_table=table, lengths=lengths,
                k_scale_pages=jnp.ones(shape[:-1], jnp.float32),
                v_scale_pages=jnp.ones(shape[:-1], jnp.float32),
            )
        return cls(
            k_pages=jnp.zeros(shape, dtype),
            v_pages=jnp.zeros(shape, dtype),
            page_table=table, lengths=lengths,
        )


def scatter_prefill(
    pcache: PagedKVCache,
    tmp: KVCache,                 # (L, b, H, W, d) contiguous prefill output
    slot_idx: jnp.ndarray,        # (b,) int32 — rows of page_table to fill
    table_rows: jnp.ndarray,      # (b, pages_per_seq) int32 allocated pages
    prompt_len: jnp.ndarray,      # (b,) int32
) -> PagedKVCache:
    """Move a contiguous prefill's K/V into the paged pool.

    The prefill itself runs on a transient contiguous cache (attention over
    a fresh prompt is dense — paging only matters for the long-lived decode
    state); its rows are then re-chunked into pages in one scatter per
    tensor. `table_rows` entries beyond a prompt's allocation MUST be 0:
    padding chunks then land on the null page (order-nondeterministic,
    never read)."""
    L, b, H, W, d = tmp.k.shape
    p = pcache.page_size
    if W % p:
        raise ValueError(f"prefill width {W} not a multiple of page size {p}")
    n_chunks = W // p
    if n_chunks > pcache.pages_per_seq:
        raise ValueError(
            f"prefill width {W} needs {n_chunks} pages > pages_per_seq "
            f"{pcache.pages_per_seq}")
    ids = table_rows[:, :n_chunks].reshape(-1)           # (b·n_chunks,)

    def put(pool, rows):
        # (L, b, H, W, d) → chunks (L, b·n_chunks, H, p, d) in id order
        chunks = rows.reshape(L, b, H, n_chunks, p, d)
        chunks = chunks.transpose(0, 1, 3, 2, 4, 5).reshape(
            L, b * n_chunks, H, p, d)
        return pool.at[:, ids].set(chunks.astype(pool.dtype))

    def put_scales(pool, rows):
        # (L, b, H, W) → chunks (L, b·n_chunks, H, p)
        chunks = rows.reshape(L, b, H, n_chunks, p)
        chunks = chunks.transpose(0, 1, 3, 2, 4).reshape(
            L, b * n_chunks, H, p)
        return pool.at[:, ids].set(chunks)

    if pcache.quantized != (tmp.k_scale is not None):
        raise ValueError("paged pool and prefill cache dtype mismatch")
    return PagedKVCache(
        k_pages=put(pcache.k_pages, tmp.k),
        v_pages=put(pcache.v_pages, tmp.v),
        page_table=pcache.page_table.at[slot_idx].set(table_rows),
        lengths=pcache.lengths.at[slot_idx].set(prompt_len.astype(jnp.int32)),
        k_scale_pages=(None if not pcache.quantized
                       else put_scales(pcache.k_scale_pages, tmp.k_scale)),
        v_scale_pages=(None if not pcache.quantized
                       else put_scales(pcache.v_scale_pages, tmp.v_scale)),
    )


def paged_attention_reference(
    q: jnp.ndarray,            # (B, H, 1, d)
    k_pages: jnp.ndarray,      # (N, H, p, d) — one layer's pool
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,   # (B, P) int32
    lengths: jnp.ndarray,      # (B,) int32 — INCLUDING the appended token
    k_scales: Optional[jnp.ndarray] = None,  # (N, H, p) per-vector
    v_scales: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """XLA path: gather this batch's pages into contiguous (B, H, S, d)
    views and reuse the masked decode attention. The gather materializes
    the batch's cache bytes (fine on CPU meshes / tests; the Pallas kernel
    streams pages without the copy on TPU)."""
    k = jnp.take(k_pages, page_table, axis=0)  # (B, P, H, p, d)
    b, P, h, p, d = k.shape
    k = k.transpose(0, 2, 1, 3, 4).reshape(b, h, P * p, d)
    v = jnp.take(v_pages, page_table, axis=0)
    v = v.transpose(0, 2, 1, 3, 4).reshape(b, h, P * p, d)
    ks = vs = None
    if k_scales is not None:
        ks = jnp.take(k_scales, page_table, axis=0).transpose(
            0, 2, 1, 3).reshape(b, h, P * p)
        vs = jnp.take(v_scales, page_table, axis=0).transpose(
            0, 2, 1, 3).reshape(b, h, P * p)
    return decode_attention(q, k, v, lengths, k_scale=ks, v_scale=vs)


def paged_prefill_with_context(
    params,
    cfg: LlamaConfig,
    pcache: PagedKVCache,
    *,
    inputs_embeds: jnp.ndarray,   # (b, W, D) SUFFIX embeds, right-padded
    suffix_len: jnp.ndarray,      # (b,) int32 valid suffix tokens
    ctx_len: jnp.ndarray,         # (b,) int32 shared-prefix tokens, PAGE-
                                  # ALIGNED (full pages already in table)
    slot_idx: jnp.ndarray,        # (b,) int32 rows of the batch being filled
    table_rows: jnp.ndarray,      # (b, pages_per_seq) — shared pages first,
                                  # then this request's fresh pages, 0-padded
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, PagedKVCache]:
    """Prefill ONLY a prompt suffix against shared-page context.

    The prefix-cache path (serve/prefix.py): pages holding an identical
    token prefix are shared across requests, so the transformer runs over
    the suffix tokens only — FLOPs scale with what is NEW, which is the
    entire win for repeated system prompts and multi-turn re-submission.
    With ctx_len == 0 this degenerates to a dense paged prefill and is the
    paged scheduler's single prefill program.

    Mechanics per layer: suffix K/V are scattered into this request's
    fresh pages FIRST, then attention gathers the whole table row (shared
    context + just-written suffix) as one contiguous view and masks
    causally against GLOBAL positions (query i attends cols <= ctx+i).
    RoPE uses global positions ctx+i, so the result is bit-identical to a
    dense prefill of prefix+suffix up to f32 accumulation order."""
    x = inputs_embeds.astype(compute_dtype)
    b, w, _ = x.shape
    p = pcache.page_size
    positions = ctx_len[:, None] + jnp.arange(w)[None, :]   # (b, W) global
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    layers = _cast_params(params["layers"], compute_dtype)

    # per-token page destinations; padded suffix columns are redirected to
    # the null page (an unclamped index would overwrite the LAST allocated
    # page through take_along_axis clamping)
    n_pages = table_rows.shape[1]
    valid_tok = jnp.arange(w)[None, :] < suffix_len[:, None]
    page_idx = jnp.minimum(positions // p, n_pages - 1)
    tok_pages = jnp.where(
        valid_tok, jnp.take_along_axis(table_rows, page_idx, axis=1), 0)
    tok_offs = positions % p
    s_total = pcache.pages_per_seq * p
    quantized = pcache.quantized
    sm = 1.0 / math.sqrt(cfg.head_dim)
    new_table = pcache.page_table.at[slot_idx].set(table_rows)
    rows_batch = table_rows                                  # (b, P)

    # global column ids of the gathered view: table position j covers
    # [j*p, (j+1)*p)
    col_pos = jnp.arange(s_total)[None, :]                   # (1, S)
    q_pos = positions                                        # (b, W)
    causal = col_pos[:, None, :] <= q_pos[:, :, None]        # (b, W, S)

    def attend(q, k_view, v_view, ks_view, vs_view):
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k_view.astype(q.dtype),
                            preferred_element_type=jnp.float32) * sm
        if ks_view is not None:
            scores = scores * ks_view[:, :, None, :]
        scores = jnp.where(causal[:, None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        if vs_view is not None:
            probs = probs * vs_view[:, :, None, :]
        return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype),
                          v_view.astype(q.dtype))

    def gather(pool):
        g = jnp.take(pool, rows_batch, axis=0)               # (b,P,H,p[,d])
        perm = (0, 2, 1, 3) + tuple(range(4, g.ndim))
        g = g.transpose(*perm)                               # (b,H,P,p[,d])
        return g.reshape((b, g.shape[1], s_total) + g.shape[4:])

    def body(carry, lp):
        x_in, kp, vp, ks, vs, li = carry
        h = rms_norm(x_in, lp["input_norm"], cfg.rms_norm_eps)
        q, k, v = _qkv(h, lp, cfg, cos, sin)                 # (b, H, W, hd)
        k_rows = k.transpose(0, 2, 1, 3)                     # (b, W, H, d)
        v_rows = v.transpose(0, 2, 1, 3)
        if quantized:
            from ..ops.quant import quantize_activation

            k_q, k_s = quantize_activation(k_rows)
            v_q, v_s = quantize_activation(v_rows)
            kp = kp.at[li, tok_pages, :, tok_offs].set(k_q.astype(kp.dtype))
            vp = vp.at[li, tok_pages, :, tok_offs].set(v_q.astype(vp.dtype))
            ks = ks.at[li, tok_pages, :, tok_offs].set(k_s[..., 0])
            vs = vs.at[li, tok_pages, :, tok_offs].set(v_s[..., 0])
            attn = attend(q, gather(kp[li]), gather(vp[li]),
                          gather(ks[li]), gather(vs[li]))
        else:
            kp = kp.at[li, tok_pages, :, tok_offs].set(
                k_rows.astype(kp.dtype))
            vp = vp.at[li, tok_pages, :, tok_offs].set(
                v_rows.astype(vp.dtype))
            attn = attend(q, gather(kp[li]), gather(vp[li]), None, None)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, w, cfg.hidden_size)
        x_mid = x_in + _proj(lp, "wo", attn)
        h2 = rms_norm(x_mid, lp["post_attn_norm"], cfg.rms_norm_eps)
        x_out = x_mid + _silu_mlp(h2, lp)
        return (x_out, kp, vp, ks, vs, li + 1), None

    init = (x, pcache.k_pages, pcache.v_pages,
            pcache.k_scale_pages, pcache.v_scale_pages,
            jnp.zeros((), jnp.int32))
    (x, kp, vp, ks, vs, _), _ = jax.lax.scan(body, init, layers)
    x = rms_norm(x, params["final_norm"].astype(compute_dtype),
                 cfg.rms_norm_eps)
    last = jnp.maximum(suffix_len - 1, 0)
    x_last = jnp.take_along_axis(
        x, last[:, None, None].astype(jnp.int32), axis=1).squeeze(1)
    logits = _lm_head_logits(x_last, params["lm_head"], compute_dtype)
    new_len = (ctx_len + suffix_len).astype(jnp.int32)
    return logits, PagedKVCache(
        kp, vp, new_table,
        pcache.lengths.at[slot_idx].set(new_len), ks, vs)


def _append_rows(pool, li, page_ids, offs, rows):
    """Scatter one new token's (B, H, d) rows into layer li of the pool."""
    return pool.at[li, page_ids, :, offs].set(rows.astype(pool.dtype))


def paged_decode_step(
    params,
    cfg: LlamaConfig,
    pcache: PagedKVCache,
    *,
    inputs_embeds: jnp.ndarray,   # (B, 1, D)
    compute_dtype=jnp.bfloat16,
    use_kernel: Optional[bool] = None,
) -> Tuple[jnp.ndarray, PagedKVCache]:
    """One decode step over the paged cache: returns (logits (B, V),
    updated cache). Mirrors `llama_decode_step` (llama.py:393) with the
    page pool threaded as the scan carry; on TPU the per-layer append +
    attention is ONE fused Pallas program (ops/paged_fused.py) that RMWs
    the appended row into its page in place, so the XLA scatters (which
    copy the pool inside the scan) vanish from the kernel path."""
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    x = inputs_embeds.astype(compute_dtype)
    b = x.shape[0]
    positions = pcache.lengths[:, None]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    layers = _cast_params(params["layers"], compute_dtype)

    p = pcache.page_size
    page_ids = jnp.take_along_axis(
        pcache.page_table, (pcache.lengths // p)[:, None], axis=1)[:, 0]
    offs = pcache.lengths % p
    new_len = pcache.lengths + 1

    quantized = pcache.quantized

    def body(carry, lp):
        x_in, kp, vp, ks, vs, li = carry
        h = rms_norm(x_in, lp["input_norm"], cfg.rms_norm_eps)
        q, k, v = _qkv(h, lp, cfg, cos, sin)       # (B, H, 1, hd)
        if quantized:
            from ..ops.quant import quantize_activation

            k_q, k_s = quantize_activation(k)      # int8 + (B, H, 1, 1)
            v_q, v_s = quantize_activation(v)
            if use_kernel:
                from ..ops.paged_fused import paged_fused_decode_q

                attn, kp, vp, ks, vs = paged_fused_decode_q(
                    q.astype(jnp.bfloat16), k_q, k_s[..., 0],
                    v_q, v_s[..., 0], kp, vp, ks, vs,
                    pcache.page_table, pcache.lengths, li)
            else:
                kp = _append_rows(kp, li, page_ids, offs, k_q[:, :, 0])
                vp = _append_rows(vp, li, page_ids, offs, v_q[:, :, 0])
                ks = ks.at[li, page_ids, :, offs].set(k_s[:, :, 0, 0])
                vs = vs.at[li, page_ids, :, offs].set(v_s[:, :, 0, 0])
                attn = paged_attention_reference(
                    q, kp[li], vp[li], pcache.page_table, new_len,
                    k_scales=ks[li], v_scales=vs[li])
        else:
            if use_kernel:
                from ..ops.paged_fused import paged_fused_decode

                attn, kp, vp = paged_fused_decode(
                    q.astype(kp.dtype), k, v, kp, vp,
                    pcache.page_table, pcache.lengths, li)
            else:
                kp = _append_rows(kp, li, page_ids, offs, k[:, :, 0])
                vp = _append_rows(vp, li, page_ids, offs, v[:, :, 0])
                attn = paged_attention_reference(
                    q, kp[li], vp[li], pcache.page_table, new_len)
        attn = attn.astype(compute_dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, cfg.hidden_size)
        x_mid = x_in + _proj(lp, "wo", attn)
        h2 = rms_norm(x_mid, lp["post_attn_norm"], cfg.rms_norm_eps)
        x_out = x_mid + _silu_mlp(h2, lp)
        return (x_out, kp, vp, ks, vs, li + 1), None

    init = (x, pcache.k_pages, pcache.v_pages,
            pcache.k_scale_pages, pcache.v_scale_pages,
            jnp.zeros((), jnp.int32))
    (x, kp, vp, ks, vs, _), _ = jax.lax.scan(body, init, layers)
    x = rms_norm(x, params["final_norm"].astype(compute_dtype),
                 cfg.rms_norm_eps)
    logits = _lm_head_logits(x[:, 0, :], params["lm_head"], compute_dtype)
    return logits, PagedKVCache(kp, vp, pcache.page_table, new_len, ks, vs)
