"""LLaMA-2 decoder (functional JAX, TPU-first).

Capability parity with the reference's CustomLlamaForCausalLM (HF
LlamaForCausalLM wrapper, lhrs/models/text_modal.py:30-60) and its training
loss path (text_modal.py:258-294): RoPE attention (MHA, 32 heads), RMSNorm,
SiLU-gated MLP, tied-nothing lm_head, causal LM cross-entropy with
IGNORE_INDEX(-100) masking and mean-over-valid-tokens reduction.

TPU-first design:
  * per-layer params stacked on a leading axis, depth iterated with lax.scan
    (single trace, fast compile, scan-friendly rematerialization);
  * generation uses a preallocated static-shape KV cache (B, H, S_max, D)
    threaded functionally through a jitted decode loop — prompts are
    right-padded and per-row valid lengths drive both the attention mask and
    the cache write position (replaces HF's dynamic KV cache + left-padding,
    text_modal.py:36-60);
  * attention = Pallas flash kernel for prefill, masked decode-attention for
    single-token steps;
  * TP sharding is applied externally via PartitionSpecs on the stacked
    parameter pytree (parallel/partition.py) — functions stay mesh-agnostic.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .constants import IGNORE_INDEX
from ..ops.attention import flash_attention
from ..ops.ring_attention import ring_attention
from ..ops.decode_attention import decode_attention
from ..ops.quant import QuantizedTensor, quantized_matmul
from ..ops.rmsnorm import rms_norm
from ..ops.rope import apply_rope, rope_cos_sin


class _W4Stacked:
    """A stacked halves-packed int4 weight plus a traced layer index.

    Built inside the decode scan body so `_dense` can route the projection
    to the Pallas W4A8 kernel with the FULL (L, K/2, N) array + the layer
    as a scalar-prefetch operand — a per-layer lax.scan slice of a packed
    tensor would materialize a copy, re-paying the HBM traffic the packed
    layout exists to halve (measured: XLA-unpacked int4 decode runs at
    4.6 tok/s vs int8's 86.4, benchmarks/int4_decode_probe.py)."""

    __slots__ = ("qt", "li", "interpret")

    def __init__(self, qt, li, interpret=None):
        self.qt = qt
        self.li = li
        self.interpret = interpret


def _dense(x: jnp.ndarray, w) -> jnp.ndarray:
    """Matmul that accepts bf16/f32 weights or QuantizedTensors (int8/int4
    weights with the dequant scale folded into the epilogue)."""
    if isinstance(w, _W4Stacked):
        from ..ops.w4_matmul import w4a8_project
        return w4a8_project(x, w.qt, w.li, interpret=w.interpret)
    if isinstance(w, QuantizedTensor):
        return quantized_matmul(x, w, out_dtype=x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def _lm_head_logits(x: jnp.ndarray, lm_head, compute_dtype) -> jnp.ndarray:
    """Unembedding → f32 logits. Accepts a bf16/f32 matrix or an int8
    QuantizedTensor: decode is weight-bandwidth-bound and the bf16 lm_head
    is 262 MB of the ~6.7 GB/step stream — int8 halves it. bf16 activations
    x int8 weights (not W8A8): logits keep full activation precision and
    the weight dequant folds into the f32 epilogue."""
    if isinstance(lm_head, QuantizedTensor):
        return quantized_matmul(x, lm_head, out_dtype=jnp.float32)
    return jnp.dot(x, lm_head.astype(compute_dtype),
                   preferred_element_type=jnp.float32)


def _proj(lp, name: str, x: jnp.ndarray) -> jnp.ndarray:
    """Projection with an optional runtime LoRA side path (QLoRA-style,
    used when the base weight is quantized and cannot be merged into):
    y = x W + (x A) B, with the lora scale pre-folded into B."""
    y = _dense(x, lp[name])
    a = lp.get(name + "__lora_a") if hasattr(lp, "get") else None
    if a is not None:
        b = lp[name + "__lora_b"]
        y = y + jnp.dot(
            jnp.dot(x, a.astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype),
            b.astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype)
    return y


def _silu_mlp(x, lp):
    gate = _proj(lp, "w_gate", x)
    up = _proj(lp, "w_up", x)
    return _proj(lp, "w_down",
                 jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up)


def _cast_params(tree, compute_dtype):
    """Cast float leaves to compute dtype; QuantizedTensors pass through
    untouched (their scales stay f32)."""
    def cast(x):
        if isinstance(x, QuantizedTensor):
            return x
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(compute_dtype)
        return x

    return jax.tree_util.tree_map(
        cast, tree, is_leaf=lambda x: isinstance(x, QuantizedTensor))


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    pad_token_id: int = 0
    bos_token_id: int = 1
    eos_token_id: int = 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def llama2_7b(cls) -> "LlamaConfig":
        return cls()

    @classmethod
    def tiny_test(cls) -> "LlamaConfig":
        return cls(vocab_size=256, hidden_size=64, intermediate_size=128,
                   num_hidden_layers=2, num_attention_heads=4,
                   max_position_embeddings=128)

    @classmethod
    def from_config_dict(cls, text_cfg) -> "LlamaConfig":
        return cls(
            vocab_size=text_cfg.vocab_size,
            hidden_size=text_cfg.hidden_size,
            intermediate_size=text_cfg.intermediate_size,
            num_hidden_layers=text_cfg.num_hidden_layers,
            num_attention_heads=text_cfg.num_attention_heads,
            max_position_embeddings=text_cfg.max_position_embeddings,
            rms_norm_eps=float(text_cfg.rms_norm_eps),
            pad_token_id=text_cfg.pad_token_id,
            bos_token_id=text_cfg.bos_token_id,
            eos_token_id=text_cfg.eos_token_id,
        )


def init_llama_params(rng: jax.Array, cfg: LlamaConfig, dtype=jnp.float32):
    keys = jax.random.split(rng, 10)
    d, ffn, L, V = (cfg.hidden_size, cfg.intermediate_size,
                    cfg.num_hidden_layers, cfg.vocab_size)

    def stacked(k, shape, scale=0.02):
        return (jax.random.normal(k, (L,) + shape) * scale).astype(dtype)

    return {
        "embed_tokens": (jax.random.normal(keys[0], (V, d)) * 0.02).astype(dtype),
        "layers": {
            "input_norm": jnp.ones((L, d), dtype),
            "wq": stacked(keys[1], (d, d)),
            "wk": stacked(keys[2], (d, d)),
            "wv": stacked(keys[3], (d, d)),
            "wo": stacked(keys[4], (d, d)),
            "post_attn_norm": jnp.ones((L, d), dtype),
            "w_gate": stacked(keys[5], (d, ffn)),
            "w_up": stacked(keys[6], (d, ffn)),
            "w_down": stacked(keys[7], (ffn, d)),
        },
        "final_norm": jnp.ones((d,), dtype),
        "lm_head": (jax.random.normal(keys[8], (d, V)) * 0.02).astype(dtype),
    }


class KVCache(NamedTuple):
    """Static-shape KV cache: (L, B, H, S_max, D) + per-row valid length.

    dtype=jnp.int8 stores K/V quantized per (position, head) vector with
    f32 scales (L, B, H, S_max): decode is HBM-bandwidth-bound and a
    full-context (2304) bf16 slot is 1.2 GB — int8 halves both the
    footprint (8 full-context slots fit one chip, bf16 tops out at ~6)
    and the per-token cache read. Dequantization folds into attention
    (scores·k_scale, probs·v_scale — exact, never materializes a bf16
    copy); accuracy is bounded by tests/test_models.py and the full-scale
    parity oracle."""

    k: jnp.ndarray
    v: jnp.ndarray
    length: jnp.ndarray  # (B,) int32
    k_scale: Optional[jnp.ndarray] = None  # (L, B, H, S_max) f32
    v_scale: Optional[jnp.ndarray] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @classmethod
    def create(cls, cfg: LlamaConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.num_hidden_layers, batch, cfg.num_attention_heads,
                 max_len, cfg.head_dim)
        if dtype == jnp.int8:
            sshape = shape[:-1]
            return cls(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                length=jnp.zeros((batch,), jnp.int32),
                k_scale=jnp.ones(sshape, jnp.float32),
                v_scale=jnp.ones(sshape, jnp.float32),
            )
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            length=jnp.zeros((batch,), jnp.int32),
        )

    def resized(self, new_len: int) -> "KVCache":
        """Grow the position axis to `new_len` (zero-padded). A cache copy
        is HBM-bandwidth-cheap next to re-prefilling the tokens it holds —
        the session-continuation path (serve/engine.py stream) grows the
        cache across chat turns instead of re-bucketing from scratch."""
        cur = self.k.shape[3]
        if new_len == cur:
            return self
        if new_len < cur:
            raise ValueError(f"cannot shrink cache {cur} -> {new_len}")
        pad = [(0, 0), (0, 0), (0, 0), (0, new_len - cur), (0, 0)]
        return KVCache(
            k=jnp.pad(self.k, pad), v=jnp.pad(self.v, pad),
            length=self.length,
            k_scale=(None if self.k_scale is None
                     else jnp.pad(self.k_scale, pad[:-1],
                                  constant_values=1.0)),
            v_scale=(None if self.v_scale is None
                     else jnp.pad(self.v_scale, pad[:-1],
                                  constant_values=1.0)),
        )


def _qkv(x, lp, cfg: LlamaConfig, cos, sin):
    """Project + RoPE. x: (B, S, D) → q/k/v (B, H, S, hd)."""
    b, s, _ = x.shape

    def proj(name):
        return _proj(lp, name, x).reshape(
            b, s, cfg.num_attention_heads, cfg.head_dim)

    q = apply_rope(proj("wq"), cos, sin).transpose(0, 2, 1, 3)
    k = apply_rope(proj("wk"), cos, sin).transpose(0, 2, 1, 3)
    v = proj("wv").transpose(0, 2, 1, 3)
    return q, k, v


def _block_full(x, lp, cfg: LlamaConfig, cos, sin, kv_mask,
                cp_axis_name=None, segment_ids=None):
    """Full-sequence causal block (training / cacheless forward).

    With `cp_axis_name` the block runs under shard_map with the sequence
    sharded on that mesh axis: attention goes through the K/V ring
    (ops/ring_attention.py) and `cos`/`sin`/`kv_mask` carry this shard's
    GLOBAL positions/mask rows (parallel/context.py builds them).

    With `segment_ids` (B, S) int32 — sequence PACKING — attention is
    block-diagonal: position i attends j iff seg[i] == seg[j] != 0 and
    j <= i (padding is segment 0)."""
    b, s, d = x.shape
    h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
    q, k, v = _qkv(h, lp, cfg, cos, sin)
    if segment_ids is not None:
        # flash kernel with in-kernel segment masking on TPU; XLA
        # pairwise-mask reference elsewhere
        attn = flash_attention(q, k, v, causal=True,
                               segment_ids=segment_ids)
    elif cp_axis_name is not None:
        attn = ring_attention(q, k, v, kv_mask, axis_name=cp_axis_name,
                              causal=True)
    else:
        attn = flash_attention(q, k, v, kv_mask, causal=True)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
    x = x + _proj(lp, "wo", attn)
    h2 = rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps)
    x = x + _silu_mlp(h2, lp)
    return x


def llama_apply(
    params,
    cfg: LlamaConfig,
    *,
    input_ids: Optional[jnp.ndarray] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,  # (B, S) bool
    positions: Optional[jnp.ndarray] = None,  # (B, S) int32
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    cp_axis_name: Optional[str] = None,
    segment_ids: Optional[jnp.ndarray] = None,  # (B, S) int32, 0 = pad
) -> jnp.ndarray:
    """Cacheless forward → logits (B, S, V) float32.

    `cp_axis_name`: run context-parallel — the caller invokes this inside
    shard_map with the sequence dim sharded on that axis and MUST pass
    global `positions` (the local default arange would restart RoPE at
    every shard boundary); see parallel/context.py.

    `segment_ids`: SEQUENCE PACKING — multiple samples share a row with
    block-diagonal attention; RoPE positions restart at every segment
    start. Mutually exclusive with cp_axis_name.
    """
    if inputs_embeds is None:
        inputs_embeds = jnp.take(params["embed_tokens"], input_ids, axis=0)
    x = inputs_embeds.astype(compute_dtype)
    b, s, _ = x.shape

    if segment_ids is not None and positions is None:
        # per-segment positions: index minus the index of the segment's
        # first token (running max over segment-change boundaries)
        idx = jnp.arange(s)[None, :]
        boundary = jnp.concatenate(
            [jnp.ones((b, 1), bool),
             segment_ids[:, 1:] != segment_ids[:, :-1]], axis=1)
        start = jax.lax.cummax(jnp.where(boundary, idx, 0), axis=1)
        positions = idx - start
    if positions is None:
        if attention_mask is not None:
            positions = jnp.maximum(
                jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) - 1, 0)
        else:
            positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    layers = _cast_params(params["layers"], compute_dtype)

    def body(carry, lp):
        fn = _block_full
        if remat:
            fn = jax.checkpoint(_block_full, static_argnums=(2, 6))
        return fn(carry, lp, cfg, cos, sin, attention_mask,
                  cp_axis_name, segment_ids), None

    x, _ = jax.lax.scan(body, x, layers)
    x = rms_norm(x, params["final_norm"].astype(compute_dtype),
                 cfg.rms_norm_eps)
    logits = _lm_head_logits(x, params["lm_head"], compute_dtype)
    return logits


def causal_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Shifted cross-entropy, IGNORE_INDEX masked, mean over valid tokens
    (matches HF LlamaForCausalLM loss semantics used at text_modal.py:281-294).
    """
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logz = jax.nn.logsumexp(shift_logits, axis=-1)
    gold = jnp.take_along_axis(
        shift_logits, safe_labels[..., None], axis=-1).squeeze(-1)
    nll = (logz - gold) * valid
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


# ---------------------------------------------------------------------------
# Cached generation path
# ---------------------------------------------------------------------------


def _block_prefill(x, lp, kc, vc, cfg: LlamaConfig, cos, sin, prompt_len,
                   ks=None, vs=None):
    """Causal block that also returns K/V to store. Right-padded prompts:
    causal masking alone is correct (pads sit after valid tokens).
    Attention always runs on the fresh bf16 K/V; only the cache WRITE is
    quantized when ks/vs scale planes are present (int8 cache)."""
    b, s, d = x.shape
    h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
    q, k, v = _qkv(h, lp, cfg, cos, sin)
    attn = flash_attention(q, k, v, causal=True)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
    x = x + _proj(lp, "wo", attn)
    h2 = rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps)
    x = x + _silu_mlp(h2, lp)
    # write into the first s slots of the cache
    if ks is not None:
        from ..ops.quant import quantize_activation

        k_q, k_s = quantize_activation(k)
        v_q, v_s = quantize_activation(v)
        kc = jax.lax.dynamic_update_slice(kc, k_q, (0, 0, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, v_q, (0, 0, 0, 0))
        ks = jax.lax.dynamic_update_slice(ks, k_s[..., 0], (0, 0, 0))
        vs = jax.lax.dynamic_update_slice(vs, v_s[..., 0], (0, 0, 0))
        return x, kc, vc, ks, vs
    kc = jax.lax.dynamic_update_slice(kc, k.astype(kc.dtype), (0, 0, 0, 0))
    vc = jax.lax.dynamic_update_slice(vc, v.astype(vc.dtype), (0, 0, 0, 0))
    return x, kc, vc, None, None


def llama_prefill(
    params,
    cfg: LlamaConfig,
    cache: KVCache,
    *,
    inputs_embeds: jnp.ndarray,  # (B, S, D) right-padded
    prompt_len: jnp.ndarray,  # (B,) int32 valid lengths
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, KVCache]:
    """Prefill the cache; returns (next-token logits (B, V), cache)."""
    x = inputs_embeds.astype(compute_dtype)
    b, s, _ = x.shape
    positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    layers = _cast_params(params["layers"], compute_dtype)

    def body(carry, xs):
        lp, kc, vc, ks, vs = xs
        x_new, kc, vc, ks, vs = _block_prefill(
            carry, lp, kc, vc, cfg, cos, sin, prompt_len, ks, vs)
        return x_new, (kc, vc, ks, vs)

    x, (new_k, new_v, new_ks, new_vs) = jax.lax.scan(
        body, x, (layers, cache.k, cache.v, cache.k_scale, cache.v_scale))
    x = rms_norm(x, params["final_norm"].astype(compute_dtype),
                 cfg.rms_norm_eps)
    # next-token logits come from the last *valid* position of each row
    last_idx = jnp.maximum(prompt_len - 1, 0)
    x_last = jnp.take_along_axis(
        x, last_idx[:, None, None].astype(jnp.int32), axis=1).squeeze(1)
    logits = _lm_head_logits(x_last, params["lm_head"], compute_dtype)
    return logits, KVCache(new_k, new_v, prompt_len.astype(jnp.int32),
                           new_ks, new_vs)


def llama_prefill_continue(
    params,
    cfg: LlamaConfig,
    cache: KVCache,
    *,
    inputs_embeds: jnp.ndarray,  # (B, W, D) SUFFIX embeds, right-padded
    suffix_len: jnp.ndarray,     # (B,) int32 valid suffix tokens
    start: jnp.ndarray,          # (B,) int32 tokens already in the cache
    compute_dtype=jnp.bfloat16,
    return_all_logits: bool = False,  # (B, W, V) instead of last-position
) -> Tuple[jnp.ndarray, KVCache]:
    """Incremental prefill: extend an already-filled cache by a suffix.

    The multi-turn chat surfaces re-submit the whole rendered conversation
    every turn (reference behavior, /root/reference/lhrs/models/
    text_modal.py:528-627 regenerates from scratch); with the first
    `start` tokens' KV already in the cache (prior turns' prompt +
    generated answer), only the NEW tokens run through the transformer.
    RoPE uses global positions start+i; each layer writes the suffix K/V
    at those rows, then attends over the whole cache row masked to
    columns <= start+i — bit-identical to a dense prefill of the full
    sequence up to f32 accumulation order. Works for bf16 and int8
    caches; padded suffix columns are dropped (out-of-range scatter)."""
    x = inputs_embeds.astype(compute_dtype)
    b, w, _ = x.shape
    s_max = cache.k.shape[3]
    positions = start[:, None] + jnp.arange(w)[None, :]      # (B, W) global
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    layers = _cast_params(params["layers"], compute_dtype)

    valid_tok = jnp.arange(w)[None, :] < suffix_len[:, None]
    wpos = jnp.where(valid_tok, positions, s_max)            # drop garbage
    rows_b = jnp.arange(b)[:, None]
    col = jnp.arange(s_max)
    causal = col[None, None, :] <= positions[:, :, None]     # (B, W, S)
    sm = 1.0 / math.sqrt(cfg.head_dim)
    quantized = cache.quantized

    def attend(q, kcl, vcl, kscl, vscl):
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, kcl.astype(q.dtype),
                            preferred_element_type=jnp.float32) * sm
        if kscl is not None:
            scores = scores * kscl[:, :, None, :]
        scores = jnp.where(causal[:, None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        if vscl is not None:
            probs = probs * vscl[:, :, None, :]
        return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype),
                          vcl.astype(q.dtype))

    def body(carry, lp):
        x_in, kc, vc, ks, vs, li = carry
        h = rms_norm(x_in, lp["input_norm"], cfg.rms_norm_eps)
        q, k, v = _qkv(h, lp, cfg, cos, sin)                 # (B, H, W, hd)
        k_rows = k.transpose(0, 2, 1, 3)                     # (B, W, H, d)
        v_rows = v.transpose(0, 2, 1, 3)
        kcl, vcl = kc[li], vc[li]
        if quantized:
            from ..ops.quant import quantize_activation

            k_q, k_s = quantize_activation(k_rows)
            v_q, v_s = quantize_activation(v_rows)
            kcl = kcl.at[rows_b, :, wpos].set(
                k_q.astype(kcl.dtype), mode="drop")
            vcl = vcl.at[rows_b, :, wpos].set(
                v_q.astype(vcl.dtype), mode="drop")
            kscl = ks[li].at[rows_b, :, wpos].set(k_s[..., 0], mode="drop")
            vscl = vs[li].at[rows_b, :, wpos].set(v_s[..., 0], mode="drop")
            attn = attend(q, kcl, vcl, kscl, vscl)
            ks = jax.lax.dynamic_update_index_in_dim(ks, kscl, li, 0)
            vs = jax.lax.dynamic_update_index_in_dim(vs, vscl, li, 0)
        else:
            kcl = kcl.at[rows_b, :, wpos].set(
                k_rows.astype(kcl.dtype), mode="drop")
            vcl = vcl.at[rows_b, :, wpos].set(
                v_rows.astype(vcl.dtype), mode="drop")
            attn = attend(q, kcl, vcl, None, None)
        kc = jax.lax.dynamic_update_index_in_dim(kc, kcl, li, 0)
        vc = jax.lax.dynamic_update_index_in_dim(vc, vcl, li, 0)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, w, cfg.hidden_size)
        x_mid = x_in + _proj(lp, "wo", attn)
        h2 = rms_norm(x_mid, lp["post_attn_norm"], cfg.rms_norm_eps)
        x_out = x_mid + _silu_mlp(h2, lp)
        return (x_out, kc, vc, ks, vs, li + 1), None

    init = (x, cache.k, cache.v, cache.k_scale, cache.v_scale,
            jnp.zeros((), jnp.int32))
    (x, kc, vc, ks, vs, _), _ = jax.lax.scan(body, init, layers)
    x = rms_norm(x, params["final_norm"].astype(compute_dtype),
                 cfg.rms_norm_eps)
    if return_all_logits:
        # speculative verify: logits at EVERY suffix position (W small)
        logits = _lm_head_logits(x, params["lm_head"], compute_dtype)
    else:
        last = jnp.maximum(suffix_len - 1, 0)
        x_last = jnp.take_along_axis(
            x, last[:, None, None].astype(jnp.int32), axis=1).squeeze(1)
        logits = _lm_head_logits(x_last, params["lm_head"], compute_dtype)
    return logits, KVCache(kc, vc, (start + suffix_len).astype(jnp.int32),
                           ks, vs)


def _write_scale_at(scale_arr, new_vals, lengths):
    """Scatter (B, H, 1) new scales into (B, H, S) at per-row lengths
    (same select-based write as _write_at)."""
    s = scale_arr.shape[-1]
    pos = jnp.arange(s)[None, None, :]
    sel = pos == lengths[:, None, None]
    return jnp.where(sel, new_vals, scale_arr)


def _write_at(cache_arr, new_vals, lengths):
    """Scatter (B, H, 1, D) new_vals into (B, H, S, D) at per-row lengths.

    Select-based write: measured FASTER than a vmapped dynamic_update_slice
    on v5e (92.9 vs 86.7 tok/s 7B int8 decode) — XLA fuses the select into
    the cache's consumer instead of emitting a scatter."""
    b, h, s, d = cache_arr.shape
    pos = jnp.arange(s)[None, None, :, None]
    sel = pos == lengths[:, None, None, None]
    return jnp.where(sel, new_vals.astype(cache_arr.dtype), cache_arr)


def llama_decode_step(
    params,
    cfg: LlamaConfig,
    cache: KVCache,
    *,
    inputs_embeds: jnp.ndarray,  # (B, 1, D) — embedding of the new token
    compute_dtype=jnp.bfloat16,
    use_fused: Optional[bool] = None,
    use_w4: Optional[bool] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step: returns (logits (B, V), updated cache).

    The stacked (L, B, H, S, D) cache is threaded as a scan CARRY (not
    xs/ys): with the fused Pallas append+attention kernel the cache buffer
    aliases in place through the whole loop — the xs/ys formulation forced
    XLA to copy every layer's full cache slice per step, which dominated
    decode at long context (decode is HBM-bandwidth-bound)."""
    if use_fused is None:
        # the fused kernel's layouts need a lane-multiple head_dim and a
        # sublane-aligned cache; tiny/test shapes (head_dim 16) fail Mosaic
        # layout inference — dispatch those to the select-based XLA path.
        # int8 caches additionally need a 128-multiple S for the scale
        # planes' lane tiling (fused_decode_attention_q).
        use_fused = (jax.default_backend() == "tpu"
                     and cfg.head_dim % 128 == 0
                     and cache.k.shape[3] % (128 if cache.quantized
                                             else 16) == 0)
    x = inputs_embeds.astype(compute_dtype)
    b = x.shape[0]
    positions = cache.length[:, None]  # (B, 1)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    layers = _cast_params(params["layers"], compute_dtype)
    new_len = cache.length + 1

    def body(carry, lp):
        x_in, kc, vc, ks, vs, li = carry
        h = rms_norm(x_in, lp["input_norm"], cfg.rms_norm_eps)
        q, k, v = _qkv(h, lp, cfg, cos, sin)  # (B, H, 1, hd)
        if use_fused and ks is not None:
            from ..ops.fused_decode import fused_decode_attention_q
            from ..ops.quant import quantize_activation

            k_q, k_s = quantize_activation(k)
            v_q, v_s = quantize_activation(v)
            attn, kc, vc, ks, vs = fused_decode_attention_q(
                q, k_q, k_s[..., 0], v_q, v_s[..., 0], kc, vc, ks, vs,
                cache.length, li)
        elif use_fused:
            from ..ops.fused_decode import fused_decode_attention

            attn, kc, vc = fused_decode_attention(
                q, k, v, kc, vc, cache.length, li)
        elif ks is not None:
            from ..ops.quant import quantize_activation

            k_q, k_s = quantize_activation(k)
            v_q, v_s = quantize_activation(v)
            kcl = _write_at(kc[li], k_q, cache.length)
            vcl = _write_at(vc[li], v_q, cache.length)
            kscl = _write_scale_at(ks[li], k_s[:, :, :, 0], cache.length)
            vscl = _write_scale_at(vs[li], v_s[:, :, :, 0], cache.length)
            attn = decode_attention(q, kcl, vcl, new_len,
                                    k_scale=kscl, v_scale=vscl)
            kc = jax.lax.dynamic_update_index_in_dim(kc, kcl, li, 0)
            vc = jax.lax.dynamic_update_index_in_dim(vc, vcl, li, 0)
            ks = jax.lax.dynamic_update_index_in_dim(ks, kscl, li, 0)
            vs = jax.lax.dynamic_update_index_in_dim(vs, vscl, li, 0)
        else:
            kcl = _write_at(kc[li], k, cache.length)
            vcl = _write_at(vc[li], v, cache.length)
            attn = decode_attention(q, kcl, vcl, new_len)
            kc = jax.lax.dynamic_update_index_in_dim(
                kc, kcl.astype(kc.dtype), li, 0)
            vc = jax.lax.dynamic_update_index_in_dim(
                vc, vcl.astype(vc.dtype), li, 0)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, cfg.hidden_size)
        x_mid = x_in + _proj(lp, "wo", attn)
        h2 = rms_norm(x_mid, lp["post_attn_norm"], cfg.rms_norm_eps)
        x_out = x_mid + _silu_mlp(h2, lp)
        return (x_out, kc, vc, ks, vs, li + 1), None

    if use_w4 is None:
        # halves-packed int4 weights take the Pallas W4A8 kernel: the
        # stacked weight streams packed from HBM with the layer index
        # scalar-prefetched (ops/w4_matmul.py). Lane tiling needs
        # 128-multiple projection widths.
        use_w4 = (jax.default_backend() == "tpu"
                  and isinstance(layers.get("wq"), QuantizedTensor)
                  and layers["wq"].bits == "4h"
                  and cfg.hidden_size % 256 == 0
                  and cfg.intermediate_size % 128 == 0)

    init = (x, cache.k, cache.v, cache.k_scale, cache.v_scale,
            jnp.zeros((), jnp.int32))
    if use_w4:
        w4_interp = jax.default_backend() != "tpu"

        def _lp_at(li):
            lp = {}
            for name, w in layers.items():
                if isinstance(w, QuantizedTensor) and w.bits == "4h":
                    lp[name] = _W4Stacked(w, li, interpret=w4_interp)
                elif isinstance(w, QuantizedTensor):
                    lp[name] = QuantizedTensor(
                        w.q[li], w.scale[li], bits=w.bits)
                else:
                    lp[name] = jax.lax.dynamic_index_in_dim(
                        w, li, 0, keepdims=False)
            return lp

        def body_w4(carry, _):
            return body(carry, _lp_at(carry[5]))

        (x, new_k, new_v, new_ks, new_vs, _), _ = jax.lax.scan(
            body_w4, init, None, length=cfg.num_hidden_layers)
    else:
        (x, new_k, new_v, new_ks, new_vs, _), _ = jax.lax.scan(
            body, init, layers)
    x = rms_norm(x, params["final_norm"].astype(compute_dtype),
                 cfg.rms_norm_eps)
    logits = _lm_head_logits(x[:, 0, :], params["lm_head"], compute_dtype)
    return logits, KVCache(new_k, new_v, new_len, new_ks, new_vs)
