"""Ring attention: exact attention over a sequence-sharded mesh axis.

Context parallelism for sequences that exceed one chip's HBM/compute
budget. The reference has no long-context mechanism at all (SURVEY.md
§5.7 — its stand-in is the AttnPooler's 5.3x token compression,
/root/reference/lhrs/models/common_arch.py:134-173); this is the
TPU-native layer-on-top: shard the sequence over a mesh axis, keep Q
local, and rotate K/V shards around the ring with `jax.lax.ppermute`
while accumulating the exact softmax with the online (m, l) recurrence —
the same math as flash attention, blocked across chips instead of across
VMEM tiles. Collectives ride the ICI ring; each step's ppermute overlaps
with the previous block's matmuls under XLA's async scheduling.

Call `ring_attention` INSIDE `shard_map` (q/k/v already carrying the
local sequence shard); `ring_self_attention` is the packaged
shard_map wrapper for (B, H, S, D) tensors sharded on S.

Semantics: bit-for-bit the same attention as `mha_reference` up to f32
accumulation order — causal masking uses GLOBAL row/col positions, so
contiguous chunking (shard i holds rows [i*S_loc, (i+1)*S_loc)) gives
standard causal attention on the full sequence. A (B, S_local) kv_mask
shard (True = attend) travels the ring with its K/V shard, so padded
batches work unchanged.

Backward: pure jnp + ppermute, so autodiff derives the ring backward
(ppermute's transpose is the reverse-direction ppermute); no custom_vjp
needed. Causal blocks that are fully out of range are still computed and
masked — the zigzag/striped load-balancing optimization is future work.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG_INF = -1e30


def _block_attn(
    q: jnp.ndarray,          # (B, H, Sq, D)
    k: jnp.ndarray,          # (B, H, Sk, D)
    v: jnp.ndarray,          # (B, H, Sk, D)
    bias: Optional[jnp.ndarray],  # broadcastable to (B, H, Sq, Sk), 0/-inf
    sm_scale: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One KV block's unnormalized contribution: returns (o, m, l) where
    o = exp(S - m) @ v, m = rowmax(S), l = rowsum(exp(S - m)); all f32.
    Fully-masked rows yield o = 0, l = 0 (not NaN)."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * sm_scale
    if bias is not None:
        scores = scores + bias
    m = jnp.max(scores, axis=-1)                       # (B, H, Sq)
    # exp(-1e30 - (-1e30)) would be 1 on fully-masked rows; zero them
    p = jnp.where(scores <= _NEG_INF / 2, 0.0,
                  jnp.exp(scores - m[..., None]))
    l = jnp.sum(p, axis=-1)                            # (B, H, Sq)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return o, m, l


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,   # (B, S_local) bool, local shard
    *,
    axis_name: str,
    causal: bool = False,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact attention with K/V ring-rotated over `axis_name`.

    q/k/v: (B, H, S_local, D) — this device's contiguous sequence chunk
    (chunk index = `lax.axis_index(axis_name)`). Returns (B, H, S_local, D)
    in q.dtype: the rows of full-sequence attention this shard owns.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, h, s_loc, d = q.shape
    qf = q.astype(jnp.float32)

    q_pos = idx * s_loc + jnp.arange(s_loc)            # global row ids

    o = jnp.zeros((b, h, s_loc, d), jnp.float32)
    m = jnp.full((b, h, s_loc), _NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, s_loc), jnp.float32)

    kb, vb = k.astype(jnp.float32), v.astype(jnp.float32)
    maskb = kv_mask
    owner = idx                                        # whose chunk we hold
    perm = [(i, (i + 1) % n) for i in range(n)]

    for step in range(n):
        kv_pos = owner * s_loc + jnp.arange(s_loc)     # global col ids
        bias = None
        if causal:
            bias = jnp.where(q_pos[:, None] >= kv_pos[None, :],
                             0.0, _NEG_INF)            # (Sq, Sk)
        if maskb is not None:
            mb = jnp.where(maskb, 0.0, _NEG_INF)[:, None, None, :]
            bias = mb if bias is None else bias[None, None] + mb
        o_b, m_b, l_b = _block_attn(qf, kb, vb, bias, sm_scale)

        m_new = jnp.maximum(m, m_b)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_b - m_new)
        o = o * alpha[..., None] + o_b * beta[..., None]
        l = l * alpha + l_b * beta
        m = m_new

        if step + 1 < n:                               # rotate K/V shards
            kb = jax.lax.ppermute(kb, axis_name, perm)
            vb = jax.lax.ppermute(vb, axis_name, perm)
            if maskb is not None:
                maskb = jax.lax.ppermute(maskb, axis_name, perm)
            owner = (owner - 1) % n

    out = o / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(q.dtype)


def ring_self_attention(
    mesh: Mesh,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    *,
    seq_axis: str,
    causal: bool = False,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """shard_map wrapper: q/k/v (B, H, S, D) with S sharded on `seq_axis`
    (other dims replicated or already sharded elsewhere is the caller's
    concern — this wrapper shards S only). Returns (B, H, S, D) sharded
    the same way."""
    spec = P(None, None, seq_axis, None)
    mspec = P(None, seq_axis)
    fn = functools.partial(ring_attention, axis_name=seq_axis,
                           causal=causal, sm_scale=sm_scale)
    if kv_mask is None:
        shard = jax.shard_map(
            lambda a, b, c: fn(a, b, c, None),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False)
        return shard(q, k, v)
    shard = jax.shard_map(
        fn, mesh=mesh, in_specs=(spec, spec, spec, mspec), out_specs=spec,
        check_vma=False)
    return shard(q, k, v, kv_mask)
