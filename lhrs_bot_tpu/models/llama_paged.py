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

TPU design: attention over the paged pool dispatches to JAX's bundled
Pallas paged-attention kernel (jax.experimental.pallas.ops.tpu.
paged_attention — per-page async DMA from HBM, online softmax), a library
dependency, with an XLA gather-based reference for CPU meshes and tests.
Page appends are tiny scatters ((B, H, d) per layer) into the pool, which
stays a scan carry exactly like the contiguous cache (llama.py:393-405 —
xs/ys formulations force per-layer pool copies).

Layout: pools are (L, H, N_pages, page_size, d) — the kernel wants
(H, pages, p, d) per layer, and the layer axis leads so `lax.scan` can
slice it. `page_table` rows index the pool; **page 0 is reserved as the
null page**: unallocated table entries point at it, it is never allocated
to a sequence, and masked attention (positions >= length) never reads it.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.decode_attention import decode_attention
from ..ops.rmsnorm import rms_norm
from ..ops.rope import rope_cos_sin
from .llama import (KVCache, LlamaConfig, _cast_params, _proj, _qkv,
                    _silu_mlp)


class PagedKVCache(NamedTuple):
    k_pages: jnp.ndarray     # (L, H, N_pages, page_size, d)
    v_pages: jnp.ndarray     # (L, H, N_pages, page_size, d)
    page_table: jnp.ndarray  # (B, pages_per_seq) int32 — 0 = null page
    lengths: jnp.ndarray     # (B,) int32 valid tokens per slot

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def pages_per_seq(self) -> int:
        return self.page_table.shape[1]

    @classmethod
    def create(cls, cfg: LlamaConfig, batch: int, num_pages: int,
               pages_per_seq: int, page_size: int = 64,
               dtype=jnp.bfloat16) -> "PagedKVCache":
        shape = (cfg.num_hidden_layers, cfg.num_attention_heads,
                 num_pages, page_size, cfg.head_dim)
        return cls(
            k_pages=jnp.zeros(shape, dtype),
            v_pages=jnp.zeros(shape, dtype),
            page_table=jnp.zeros((batch, pages_per_seq), jnp.int32),
            lengths=jnp.zeros((batch,), jnp.int32),
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
        # (L, b, H, W, d) → chunks (L, H, b·n_chunks, p, d) in id order
        chunks = rows.reshape(L, b, H, n_chunks, p, d)
        chunks = chunks.transpose(0, 2, 1, 3, 4, 5).reshape(
            L, H, b * n_chunks, p, d)
        return pool.at[:, :, ids].set(chunks.astype(pool.dtype))

    return PagedKVCache(
        k_pages=put(pcache.k_pages, tmp.k),
        v_pages=put(pcache.v_pages, tmp.v),
        page_table=pcache.page_table.at[slot_idx].set(table_rows),
        lengths=pcache.lengths.at[slot_idx].set(prompt_len.astype(jnp.int32)),
    )


def paged_attention_reference(
    q: jnp.ndarray,            # (B, H, 1, d)
    k_pages: jnp.ndarray,      # (H, N, p, d) — one layer's pool
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,   # (B, P) int32
    lengths: jnp.ndarray,      # (B,) int32 — INCLUDING the appended token
) -> jnp.ndarray:
    """XLA path: gather this batch's pages into contiguous (B, H, S, d)
    views and reuse the masked decode attention. The gather materializes
    the batch's cache bytes (fine on CPU meshes / tests; the Pallas kernel
    streams pages without the copy on TPU)."""
    k = jnp.take(k_pages, page_table, axis=1)  # (H, B, P, p, d)
    h, b, P, p, d = k.shape
    k = k.transpose(1, 0, 2, 3, 4).reshape(b, h, P * p, d)
    v = jnp.take(v_pages, page_table, axis=1)
    v = v.transpose(1, 0, 2, 3, 4).reshape(b, h, P * p, d)
    return decode_attention(q, k, v, lengths)


def _append_rows(pool, li, page_ids, offs, rows):
    """Scatter one new token's (B, H, d) rows into layer li of the pool."""
    return pool.at[li, :, page_ids, offs].set(rows.astype(pool.dtype))


def paged_decode_step(
    params,
    cfg: LlamaConfig,
    pcache: PagedKVCache,
    *,
    inputs_embeds: jnp.ndarray,   # (B, 1, D)
    compute_dtype=jnp.bfloat16,
    use_kernel: Optional[bool] = None,
    pages_per_compute_block: int = 4,
) -> Tuple[jnp.ndarray, PagedKVCache]:
    """One decode step over the paged cache: returns (logits (B, V),
    updated cache). Mirrors `llama_decode_step` (llama.py:393) with the
    page pool threaded as the scan carry."""
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
    sm = 1.0 / math.sqrt(cfg.head_dim)

    ppcb = math.gcd(pages_per_compute_block, pcache.pages_per_seq)

    def body(carry, lp):
        x_in, kp, vp, li = carry
        h = rms_norm(x_in, lp["input_norm"], cfg.rms_norm_eps)
        q, k, v = _qkv(h, lp, cfg, cos, sin)       # (B, H, 1, hd)
        kp = _append_rows(kp, li, page_ids, offs, k[:, :, 0])
        vp = _append_rows(vp, li, page_ids, offs, v[:, :, 0])
        if use_kernel:
            from jax.experimental.pallas.ops.tpu.paged_attention import (
                paged_attention)

            attn = paged_attention(
                (q[:, :, 0] * sm).astype(kp.dtype), kp[li], vp[li],
                new_len, pcache.page_table,
                pages_per_compute_block=ppcb)[:, :, None, :]
        else:
            attn = paged_attention_reference(
                q, kp[li], vp[li], pcache.page_table, new_len)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, cfg.hidden_size)
        x_mid = x_in + _proj(lp, "wo", attn)
        h2 = rms_norm(x_mid, lp["post_attn_norm"], cfg.rms_norm_eps)
        x_out = x_mid + _silu_mlp(h2, lp)
        return (x_out, kp, vp, li + 1), None

    init = (x, pcache.k_pages, pcache.v_pages, jnp.zeros((), jnp.int32))
    (x, kp, vp, _), _ = jax.lax.scan(body, init, layers)
    x = rms_norm(x, params["final_norm"].astype(compute_dtype),
                 cfg.rms_norm_eps)
    logits = jnp.dot(x[:, 0, :], params["lm_head"].astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    return logits, PagedKVCache(kp, vp, pcache.page_table, new_len)
