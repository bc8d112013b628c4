"""Context parallelism: sequence-sharded decoder forward over a mesh axis.

The reference caps context at 2048 text tokens and has no sequence
parallelism (SURVEY.md §5.7); the KV-head-sharded cache and this module
are the TPU-native long-context layer on top. The full causal forward is
run under `shard_map` with the SEQUENCE dim sharded on `seq_axis`:

  * every chip holds the full (replicated or tensor-sharded) weights but
    only S/cp of the activations — activation memory, the long-context
    binding constraint, scales down with the ring size;
  * attention is exact via the K/V ring (ops/ring_attention.py), whose
    per-step ppermute rides the ICI neighbour links;
  * RoPE positions are GLOBAL (shard i covers rows [i*S_loc, (i+1)*S_loc)),
    so logits match the single-device forward bit-for-bit up to f32
    accumulation order.

Layout contract: right-padded batches with contiguous chunking. The
attention_mask shard travels the ring with its K/V shard, so padding is
handled exactly; cross-entropy over the sharded logits needs no special
casing (the padded labels are IGNORE_INDEX-masked by causal_lm_loss).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.llama import LlamaConfig, llama_apply

SEQ_AXIS = "seq"


def make_cp_mesh(cp: Optional[int] = None, dp: int = 1,
                 devices=None) -> Mesh:
    """("data", "seq") mesh: batch on "data", sequence ring on "seq"."""
    import numpy as np

    devs = list(devices) if devices is not None else jax.devices()
    if cp is None:
        cp = len(devs) // dp
    arr = np.asarray(devs[:dp * cp]).reshape(dp, cp)
    return Mesh(arr, ("data", SEQ_AXIS))


def context_parallel_apply(
    params,
    cfg: LlamaConfig,
    mesh: Mesh,
    *,
    input_ids: Optional[jnp.ndarray] = None,       # (B, S) int32
    inputs_embeds: Optional[jnp.ndarray] = None,   # (B, S, D)
    attention_mask: Optional[jnp.ndarray] = None,  # (B, S) bool
    seq_axis: str = SEQ_AXIS,
    batch_axis: Optional[str] = "data",
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
) -> jnp.ndarray:
    """Sequence-sharded `llama_apply` → logits (B, S, V) f32, sharded
    (batch_axis, seq_axis, None). S must divide by the ring size.

    Call under jit; weights enter replicated over the seq axis (in_specs
    P() — combine with tensor parallelism by putting "model" in a 3-axis
    mesh and sharding params with llama_param_specs first; the seq axis
    only ever shards activations).
    """
    if (input_ids is None) == (inputs_embeds is None):
        raise ValueError("exactly one of input_ids/inputs_embeds")
    x = inputs_embeds
    if x is None:
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
    b, s = x.shape[:2]
    cp = mesh.shape[seq_axis]
    if s % cp:
        raise ValueError(f"sequence length {s} not divisible by the "
                         f"{seq_axis}-axis size {cp}")
    bspec = batch_axis if batch_axis in mesh.shape else None
    xspec = P(bspec, seq_axis, None)
    mspec = P(bspec, seq_axis)

    def fwd(params, x_loc, mask_loc):
        s_loc = x_loc.shape[1]
        start = jax.lax.axis_index(seq_axis) * s_loc
        pos = jnp.broadcast_to(start + jnp.arange(s_loc)[None],
                               x_loc.shape[:2])
        return llama_apply(
            params, cfg, inputs_embeds=x_loc,
            attention_mask=mask_loc, positions=pos,
            compute_dtype=compute_dtype, remat=remat,
            cp_axis_name=seq_axis)

    if attention_mask is None:
        shard = jax.shard_map(
            lambda p, xx: fwd(p, xx, None), mesh=mesh,
            in_specs=(P(), xspec), out_specs=xspec, check_vma=False)
        return shard(params, x)
    shard = jax.shard_map(
        fwd, mesh=mesh, in_specs=(P(), xspec, mspec), out_specs=xspec,
        check_vma=False)
    return shard(params, x, attention_mask)
