"""Multi-level perceiver resampler ("attention pooler").

Behavioral parity with the reference AttnPooler (lhrs/models/common_arch.py:
93-173): 144 learned queries split [64, 48, 32] across the three vision
feature levels (each level 256 tokens); for each level group, the *same* 6
pre-LN cross-attention blocks (ResidualAttentionBlock, common_arch.py:262-333)
run with q = evolving group queries and k/v = the *fixed* concat of the
initial group queries and that level's tokens; outputs are concatenated and
projected 1024 → 4096 into LLM space.

TPU-first notes: the three level groups are independent, so they run as one
batched attention call by padding groups to a common query/kv length — but
group sizes (64/48/32 q, 320/304/288 kv) are small enough that simple
concatenation along the token axis with a block-diagonal mask would waste
MXU cycles; instead we loop the 3 groups (static Python loop, fused by XLA)
and stack the 6 shared layers under lax.scan... layers are *shared across
groups but sequential in depth*, so depth is the scan axis.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import flash_attention
from ..ops.mlp import dense_any, gelu_mlp
from ..ops.rmsnorm import layer_norm


@dataclasses.dataclass(frozen=True)
class PerceiverConfig:
    num_query: int = 144
    num_layers: int = 6
    heads: int = 16
    hidden_size: int = 1024  # == vision width (no in_proj needed)
    encoder_hidden_size: int = 1024
    output_size: int = 4096  # LLM hidden size
    mlp_ratio: int = 4
    ln_eps: float = 1e-5
    stage_num: Tuple[int, ...] = (64, 48, 32)
    split_part: Tuple[int, ...] = (256, 256, 256)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.heads

    @classmethod
    def tiny_test(cls) -> "PerceiverConfig":
        return cls(num_query=12, num_layers=2, heads=2, hidden_size=32,
                   encoder_hidden_size=32, output_size=64,
                   stage_num=(6, 4, 2), split_part=(4, 4, 4))


def init_perceiver_params(rng: jax.Array, cfg: PerceiverConfig,
                          dtype=jnp.float32):
    keys = jax.random.split(rng, 8)
    h, L, ffn = cfg.hidden_size, cfg.num_layers, cfg.hidden_size * cfg.mlp_ratio

    def stacked(k, shape, scale=0.02):
        return (jax.random.normal(k, (L,) + shape) * scale).astype(dtype)

    params = {
        "query": (jax.random.truncated_normal(keys[0], -2, 2,
                                              (cfg.num_query, h)) * 0.02
                  ).astype(dtype),
        "layers": {
            "ln1_scale": jnp.ones((L, h), dtype),
            "ln1_bias": jnp.zeros((L, h), dtype),
            "ln_kv_scale": jnp.ones((L, h), dtype),
            "ln_kv_bias": jnp.zeros((L, h), dtype),
            "wq": stacked(keys[1], (h, h)),
            "bq": jnp.zeros((L, h), dtype),
            "wk": stacked(keys[2], (h, h)),
            "bk": jnp.zeros((L, h), dtype),
            "wv": stacked(keys[3], (h, h)),
            "bv": jnp.zeros((L, h), dtype),
            "wo": stacked(keys[4], (h, h)),
            "bo": jnp.zeros((L, h), dtype),
            "ln2_scale": jnp.ones((L, h), dtype),
            "ln2_bias": jnp.zeros((L, h), dtype),
            "w_fc": stacked(keys[5], (h, ffn)),
            "b_fc": jnp.zeros((L, ffn), dtype),
            "w_proj": stacked(keys[6], (ffn, h)),
            "b_proj": jnp.zeros((L, h), dtype),
        },
        "out_proj_w": (jax.random.normal(keys[7],
                                         (h, cfg.output_size)) * 0.02
                       ).astype(dtype),
        "out_proj_b": jnp.zeros((cfg.output_size,), dtype),
    }
    if cfg.encoder_hidden_size != cfg.hidden_size:
        params["in_proj_w"] = (
            jax.random.normal(keys[0], (cfg.encoder_hidden_size, h)) * 0.02
        ).astype(dtype)
        params["in_proj_b"] = jnp.zeros((h,), dtype)
    return params


def _normalize_rows(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """LayerNorm without the affine (fp32 stats, cast back)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))).astype(x.dtype)


def pack_perceiver_kv(params):
    """Precompute the hoisted K/V projection for perceiver_resample.

    The perceiver's kv tokens (initial group queries + level tokens) are
    FIXED across the 6 layers — only the per-layer kv-LayerNorm affine and
    the per-layer wk/wv differ. Both fold into the weights:
        ln(x)@w + b = x_hat @ (diag(ln_scale) w) + (ln_bias @ w + b)
    so all 2*L projections become ONE (h, 2*L*h) matmul over the normalized
    kv rows, hoisted out of the layer scan (int8-quantized once, directly
    from the folded f32 weights).

    MEASURED NEGATIVE on v5e at the B=64 prefill point: 2046 img/s
    perceiver-only (unrolled static slices) / 1803 (scan layout) vs 2556
    for the per-layer path — the per-layer K/V matmuls (M≈20k rows) already
    run near chain rate, and the hoist pays a (B, R, 2·L·h) HBM
    materialization that outweighs the launch savings. Kept as an opt-in
    for small-batch regimes; the serving engine does NOT apply it.

    Returns params with extra entries {"kv_big_w", "kv_big_b"};
    perceiver_resample uses them automatically.
    """
    from ..ops.quant import QuantizedTensor, dequantize, quantize_int8

    layers = params["layers"]
    quantized = isinstance(layers["wk"], QuantizedTensor)

    def dense(w):
        return (dequantize(w) if isinstance(w, QuantizedTensor)
                else w.astype(jnp.float32))

    wk, wv = dense(layers["wk"]), dense(layers["wv"])  # (L, h, h)
    s = layers["ln_kv_scale"].astype(jnp.float32)  # (L, h)
    t = layers["ln_kv_bias"].astype(jnp.float32)
    bk = jnp.einsum("li,lio->lo", t, wk) + layers["bk"].astype(jnp.float32)
    bv = jnp.einsum("li,lio->lo", t, wv) + layers["bv"].astype(jnp.float32)
    big = jnp.stack([s[:, :, None] * wk, s[:, :, None] * wv])  # (2, L, h, h)
    L, h = wk.shape[0], wk.shape[1]
    w_big = big.transpose(2, 0, 1, 3).reshape(h, 2 * L * h)
    b_big = jnp.stack([bk, bv]).reshape(2 * L * h)
    if quantized:
        w_big = quantize_int8(w_big, axis=-2)
    else:
        w_big = w_big.astype(layers["wk"].dtype)
    return {**params, "kv_big_w": w_big, "kv_big_b": b_big}


def pack_perceiver_kv_folded(params):
    """Per-layer folded kv-LN + fused K|V projection (the lever between the
    default path and the measured-negative full hoist of pack_perceiver_kv).

    The kv rows are fixed across the perceiver's 6 layers, so their
    LayerNorm STATS are layer-invariant — only the per-layer affine
    (ln_kv_scale/bias) differs, and that folds into the projection weights:
        ln(x) @ w + b = x_hat @ (diag(s) w) + (t @ w + b).
    This variant normalizes the kv rows ONCE per group and keeps the
    per-layer matmuls inside the scan, but with K and V fused into one
    (h, 2h) weight per layer, so each layer runs ONE (B·Skv, h)x(h, 2h)
    matmul instead of two matmuls plus a full kv-LayerNorm. Unlike the
    full hoist there is no (B, Skv, 2·L·h) materialization — the folded
    projection is consumed immediately by attention.

    Returns params with `layers` rewritten: wk/bk/wv/bv/ln_kv_* are
    replaced by stacked `w_kv` (L, h, 2h) (+ int8 if the input was
    quantized) and `b_kv` (L, 2h) f32. perceiver_resample dispatches on
    the presence of `w_kv`. Parity target: reference AttnPooler kv path,
    /root/reference/lhrs/models/common_arch.py:311-333.
    """
    from ..ops.quant import QuantizedTensor, dequantize, quantize_int8

    layers = params["layers"]
    quantized = isinstance(layers["wk"], QuantizedTensor)
    orig_dtype = None if quantized else layers["wk"].dtype

    def dense(w):
        return (dequantize(w) if isinstance(w, QuantizedTensor)
                else w.astype(jnp.float32))

    wk, wv = dense(layers["wk"]), dense(layers["wv"])  # (L, h, h)
    s = layers["ln_kv_scale"].astype(jnp.float32)      # (L, h)
    t = layers["ln_kv_bias"].astype(jnp.float32)
    bk = jnp.einsum("li,lio->lo", t, wk) + layers["bk"].astype(jnp.float32)
    bv = jnp.einsum("li,lio->lo", t, wv) + layers["bv"].astype(jnp.float32)
    w_kv = jnp.concatenate([s[:, :, None] * wk, s[:, :, None] * wv],
                           axis=-1)                    # (L, h, 2h)
    b_kv = jnp.concatenate([bk, bv], axis=-1)          # (L, 2h)
    if quantized:
        w_kv = quantize_int8(w_kv, axis=1)
    else:
        w_kv = w_kv.astype(orig_dtype)
    new_layers = {k: v for k, v in layers.items()
                  if k not in ("wk", "bk", "wv", "bv",
                               "ln_kv_scale", "ln_kv_bias")}
    new_layers["w_kv"] = w_kv
    new_layers["b_kv"] = b_kv
    return {**params, "layers": new_layers}


def _cross_block_kv(q_tokens, k, v, lp, cfg: PerceiverConfig):
    """_cross_block with K/V precomputed (hoisted out of the layer scan).
    k, v: (B, Skv, h) in compute dtype."""
    b, sq, h = q_tokens.shape
    skv = k.shape[1]
    qn = layer_norm(q_tokens, lp["ln1_scale"], lp["ln1_bias"], cfg.ln_eps)
    q = dense_any(qn, lp["wq"], lp["bq"]).astype(q_tokens.dtype)
    q = q.reshape(b, sq, cfg.heads, cfg.head_dim).transpose(0, 2, 1, 3)
    kh = k.reshape(b, skv, cfg.heads, cfg.head_dim).transpose(0, 2, 1, 3)
    vh = v.reshape(b, skv, cfg.heads, cfg.head_dim).transpose(0, 2, 1, 3)
    attn = flash_attention(q, kh, vh, None, causal=False)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, sq, h)
    x = q_tokens + dense_any(attn, lp["wo"], lp["bo"]).astype(q_tokens.dtype)
    h2 = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], cfg.ln_eps)
    return x + gelu_mlp(h2, lp["w_fc"], lp["b_fc"], lp["w_proj"],
                        lp["b_proj"], quick_gelu=False)


def _cross_block(q_tokens, kv_tokens, lp, cfg: PerceiverConfig, kv_mask=None):
    """One pre-LN cross-attention block; kv_tokens already fixed per group."""
    b, sq, h = q_tokens.shape
    skv = kv_tokens.shape[1]

    qn = layer_norm(q_tokens, lp["ln1_scale"], lp["ln1_bias"], cfg.ln_eps)
    kvn = layer_norm(kv_tokens, lp["ln_kv_scale"], lp["ln_kv_bias"], cfg.ln_eps)

    def proj(x, wm, bm, s):
        out = dense_any(x, wm, bm)
        return out.astype(x.dtype).reshape(b, s, cfg.heads, cfg.head_dim)

    q = proj(qn, lp["wq"], lp["bq"], sq).transpose(0, 2, 1, 3)
    k = proj(kvn, lp["wk"], lp["bk"], skv).transpose(0, 2, 1, 3)
    v = proj(kvn, lp["wv"], lp["bv"], skv).transpose(0, 2, 1, 3)
    attn = flash_attention(q, k, v, kv_mask, causal=False)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, sq, h)
    attn = dense_any(attn, lp["wo"], lp["bo"]).astype(q_tokens.dtype)
    x = q_tokens + attn

    h2 = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], cfg.ln_eps)
    x = x + gelu_mlp(h2, lp["w_fc"], lp["b_fc"], lp["w_proj"], lp["b_proj"],
                     quick_gelu=False)
    return x


def perceiver_resample_fused(
    params,
    packed_layers,
    image_embs: jnp.ndarray,  # (B, sum(split_part), encoder_hidden)
    cfg: PerceiverConfig,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """perceiver_resample through the fused W8A8 Pallas block
    (ops/perceiver_block.py). `packed_layers` from
    pack_perceiver_layers_fused. Groups are padded to common (q_pad,
    kv_pad) shapes with static masks inside the kernel."""
    from ..ops.perceiver_block import fused_perceiver_block

    image_embs = image_embs.astype(jnp.bfloat16)
    if "in_proj_w" in params:
        image_embs = (
            jnp.dot(image_embs, params["in_proj_w"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            + params["in_proj_b"].astype(jnp.float32)
        ).astype(jnp.bfloat16)

    b = image_embs.shape[0]
    h = cfg.hidden_size
    q_pad = -(-max(cfg.stage_num) // 16) * 16
    kv_img = max(cfg.split_part)
    kv_pad = q_pad + (-(-kv_img // 16) * 16)

    queries = params["query"].astype(jnp.bfloat16)
    q_groups, kv_groups, kv_valid = [], [], []
    q_off = img_off = 0
    for nq, nkv in zip(cfg.stage_num, cfg.split_part):
        q0 = queries[q_off:q_off + nq]
        q0p = jnp.pad(q0, ((0, q_pad - nq), (0, 0)))
        img = image_embs[:, img_off:img_off + nkv]
        imgp = jnp.pad(img, ((0, 0), (0, kv_pad - q_pad - nkv), (0, 0)))
        q_groups.append(jnp.broadcast_to(q0p[None], (b, q_pad, h)))
        kv_groups.append(jnp.concatenate(
            [jnp.broadcast_to(q0p[None], (b, q_pad, h)), imgp], axis=1))
        kv_valid.append(nq + nkv)
        q_off += nq
        img_off += nkv
    q_state = jnp.stack(q_groups, axis=1)  # (B, G, q_pad, W)
    kv_fixed = jnp.stack(kv_groups, axis=1)  # (B, G, kv_pad, W)

    def body(carry, lp):
        out = fused_perceiver_block(
            carry, kv_fixed, lp, heads=cfg.heads,
            group_nq=tuple(cfg.stage_num), kv_valid=tuple(kv_valid),
            ln_eps=cfg.ln_eps, interpret=interpret)
        return out, None

    q_state, _ = jax.lax.scan(body, q_state, packed_layers)
    pooled = jnp.concatenate(
        [q_state[:, g, :nq] for g, nq in enumerate(cfg.stage_num)], axis=1)
    return (
        jnp.dot(pooled, params["out_proj_w"].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        + params["out_proj_b"].astype(jnp.float32)
    ).astype(jnp.bfloat16)


def perceiver_resample(
    params,
    image_embs: jnp.ndarray,  # (B, sum(split_part), encoder_hidden)
    cfg: PerceiverConfig,
    compute_dtype=jnp.bfloat16,
    batch_groups: bool = False,
) -> jnp.ndarray:
    """(B, 3*256, 1024) vision features → (B, num_query, output_size).

    batch_groups folds the 3 level groups into the batch axis (fewer, larger
    launches); measured slower than the unrolled group loop on v5e (XLA fuses
    the independent groups well), so the loop is the default.
    """
    from .llama import _cast_params

    layers = _cast_params(params["layers"], compute_dtype)
    image_embs = image_embs.astype(compute_dtype)

    if "in_proj_w" in params:
        image_embs = (
            jnp.dot(image_embs, params["in_proj_w"].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
            + params["in_proj_b"].astype(compute_dtype)
        ).astype(compute_dtype)

    b = image_embs.shape[0]
    queries = jnp.broadcast_to(
        params["query"].astype(compute_dtype)[None], (b,) + params["query"].shape
    )

    n_groups = len(cfg.stage_num)
    equal_splits = len(set(cfg.split_part)) == 1 and batch_groups

    if equal_splits:
        # TPU fast path: fold the level groups into the batch axis so all
        # groups share each attention/MLP launch (3x larger ops, 1/3 the
        # launches). Queries are zero-padded to the largest group and the
        # pad slots are excluded from kv via the mask, so numerics match
        # the per-group loop exactly.
        s_img = cfg.split_part[0]
        max_nq = max(cfg.stage_num)
        q_pad, q_valid = [], []
        q_off = 0
        for nq in cfg.stage_num:
            grp = queries[:, q_off:q_off + nq]
            q_pad.append(jnp.pad(grp, ((0, 0), (0, max_nq - nq), (0, 0))))
            q_valid.append(
                (jnp.arange(max_nq) < nq))
            q_off += nq
        # (B, G, max_nq, D) → (B*G, max_nq, D)
        q0 = jnp.stack(q_pad, axis=1).reshape(b * n_groups, max_nq, -1)
        img = image_embs.reshape(b, n_groups, s_img, -1).reshape(
            b * n_groups, s_img, -1)
        kv_fixed = jnp.concatenate([q0, img], axis=1)
        valid = jnp.stack(q_valid, axis=0)  # (G, max_nq)
        kv_mask = jnp.concatenate(
            [jnp.tile(valid, (b, 1)),
             jnp.ones((b * n_groups, s_img), bool)], axis=1)

        def body(carry, lp):
            return _cross_block(carry, kv_fixed, lp, cfg, kv_mask), None

        out, _ = jax.lax.scan(body, q0, layers)
        out = out.reshape(b, n_groups, max_nq, -1)
        pooled = jnp.concatenate(
            [out[:, g, :nq] for g, nq in enumerate(cfg.stage_num)], axis=1)
    else:
        # general path: per-group loop (matches the reference structure)
        q_groups, img_groups = [], []
        q_off = img_off = 0
        for nq, nkv in zip(cfg.stage_num, cfg.split_part):
            q_groups.append(queries[:, q_off:q_off + nq])
            img_groups.append(image_embs[:, img_off:img_off + nkv])
            q_off += nq
            img_off += nkv

        kvp = None
        if "kv_big_w" in params:
            # hoisted K/V (pack_perceiver_kv): one chain-rate matmul over
            # the normalized kv rows of all groups, all layers at once
            kv_all = jnp.concatenate(
                [jnp.concatenate([q0, img], axis=1)
                 for q0, img in zip(q_groups, img_groups)], axis=1)
            xhat = _normalize_rows(kv_all, cfg.ln_eps)
            kv_proj = dense_any(
                xhat, params["kv_big_w"],
                params["kv_big_b"].astype(jnp.float32)
            ).astype(compute_dtype)  # (B, R, 2*L*h)
            n_rows = kv_all.shape[1]
            L = cfg.num_layers
            h = cfg.hidden_size
            # keep the matmul's natural layout; layers are consumed with
            # STATIC slices in an unrolled loop (L is small) — a scan would
            # force a (L, 2, B, R, h) transpose materialization, which
            # measured slower than the un-hoisted path
            kvp = kv_proj.reshape(b, n_rows, 2, L, h)

        outs = []
        row_off = 0
        folded = "w_kv" in layers
        h = cfg.hidden_size
        for q0, img in zip(q_groups, img_groups):
            if folded:
                # folded kv-LN: normalize the fixed kv rows ONCE per group;
                # each layer is one fused K|V matmul inside the scan
                xhat = _normalize_rows(
                    jnp.concatenate([q0, img], axis=1), cfg.ln_eps)

                def body_folded(carry, lp):
                    kv = dense_any(xhat, lp["w_kv"],
                                   lp["b_kv"].astype(jnp.float32)
                                   ).astype(carry.dtype)
                    return _cross_block_kv(carry, kv[..., :h], kv[..., h:],
                                           lp, cfg), None

                out, _ = jax.lax.scan(body_folded, q0, layers)
            elif kvp is not None:
                rows = q0.shape[1] + img.shape[1]
                from ..ops.quant import QuantizedTensor

                def layer_slice(x, l):
                    if isinstance(x, QuantizedTensor):
                        return QuantizedTensor(x.q[l], x.scale[l],
                                               bits=x.bits)
                    return x[l]

                out = q0
                for l in range(cfg.num_layers):
                    lp = jax.tree_util.tree_map(
                        lambda x, l=l: layer_slice(x, l), layers,
                        is_leaf=lambda x: isinstance(x, QuantizedTensor))
                    k_l = kvp[:, row_off:row_off + rows, 0, l]
                    v_l = kvp[:, row_off:row_off + rows, 1, l]
                    out = _cross_block_kv(out, k_l, v_l, lp, cfg)
                row_off += rows
            else:
                kv_fixed = jnp.concatenate([q0, img], axis=1)

                def body(carry, lp):
                    return _cross_block(carry, kv_fixed, lp, cfg), None

                out, _ = jax.lax.scan(body, q0, layers)
            outs.append(out)
        pooled = jnp.concatenate(outs, axis=1)  # (B, num_query, hidden)
    return (
        jnp.dot(pooled, params["out_proj_w"].astype(compute_dtype),
                preferred_element_type=jnp.float32)
        + params["out_proj_b"].astype(compute_dtype)
    ).astype(compute_dtype)
