"""Single-token decode attention over a static-shape KV cache.

The reference's decode hot loop is HF `generate` with torch KV caching
(lhrs/models/text_modal.py:36-60, :600-612). Here decode runs inside a jitted
lax.while_loop with a preallocated (B, H, S_max, D) cache; this op computes
attention of one new query against the cache with a per-sequence valid length.

This op is HBM-bandwidth-bound (reads the whole cache once); XLA's fused
einsum+mask+softmax is already near speed-of-light for it, so the XLA path is
the default. A Pallas variant exists to fuse the cache *update* with the
attention read (one HBM pass saved on the K/V append).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def decode_attention(
    q: jnp.ndarray,  # (B, H, 1, D) — current step's query
    k_cache: jnp.ndarray,  # (B, H, S_max, D) bf16, or int8 with k_scale
    v_cache: jnp.ndarray,  # (B, H, S_max, D)
    cache_len: jnp.ndarray,  # (B,) int32 — valid entries per sequence
    *,
    sm_scale: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,  # (B, H, S_max) f32
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """With k_scale/v_scale the cache is per-vector int8 and dequantization
    folds into the attention math exactly: scores ·= k_scale per key
    position, probs ·= v_scale per value position — no bf16 copy of the
    cache is ever materialized, so HBM reads stay at 1 byte/element."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    s_max = k_cache.shape[2]
    kd = k_cache if k_scale is None else k_cache.astype(q.dtype)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, kd, preferred_element_type=jnp.float32
    ) * sm_scale  # (B, H, 1, S_max)
    if k_scale is not None:
        scores = scores * k_scale[:, :, None, :]  # (B, H, 1, S)
    positions = jnp.arange(s_max)[None, None, None, :]
    valid = positions < cache_len[:, None, None, None]
    scores = jnp.where(valid, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale[:, :, None, :]
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(q.dtype),
            v_cache.astype(q.dtype), preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(v_cache.dtype), v_cache,
            preferred_element_type=jnp.float32,
        )
    return out.astype(q.dtype)
