"""CLIP ViT-L/14 vision tower with multi-level feature taps (functional JAX).

Behavioral parity with the reference's VisionModal wrapping HF CLIPVisionModel
(lhrs/models/rgb_vision_modal.py:124-188): hidden states are tapped after
layers [L/3, 2L/3, L-2] applied (extract_stage [7,15,22] for ViT-L-24,
matching `outputs.hidden_states[stage]` where index k = k layers applied),
the CLS token is dropped from each tap, and the three taps are concatenated
to (B, 3*256, 1024).

TPU-first design choices:
  * layers are parameter-stacked and run under lax.scan (one trace, 3 segment
    scans so only the tapped states are materialized);
  * layers past the last tap (23, 24) are never computed — the reference
    computes them and throws the result away;
  * the patch embedding is the fused uint8 kernel (ops/patch_embed.py) so raw
    pixels stream H2D and normalization folds into the projection matmul;
  * attention uses the Pallas flash kernel on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import flash_attention
from ..ops.mlp import dense_any, gelu_mlp
from ..ops.patch_embed import CLIP_MEAN, CLIP_STD, patch_embed, patchify
from ..ops.rmsnorm import layer_norm


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    mlp_ratio: int = 4
    ln_eps: float = 1e-5
    quick_gelu: bool = True  # CLIP uses QuickGELU
    # taps: number of layers applied before each extraction (HF hidden_states
    # index semantics); CLS dropped, taps concatenated along tokens.
    extract_stages: Tuple[int, ...] = (7, 15, 22)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + CLS

    @property
    def head_dim(self) -> int:
        return self.width // self.heads

    @classmethod
    def vit_large(cls) -> "ViTConfig":
        return cls()

    @classmethod
    def vit_base(cls) -> "ViTConfig":
        return cls(width=768, layers=12, heads=12, patch_size=16,
                   extract_stages=(3, 7, 10))

    @classmethod
    def tiny_test(cls) -> "ViTConfig":
        return cls(image_size=28, patch_size=14, width=32, layers=4, heads=2,
                   extract_stages=(1, 2, 3))


def init_vit_params(rng: jax.Array, cfg: ViTConfig, dtype=jnp.float32):
    """Parameter pytree. Per-layer tensors are stacked on a leading axis for
    lax.scan."""
    keys = jax.random.split(rng, 8)
    w, L = cfg.width, cfg.layers
    d_patch = cfg.patch_size * cfg.patch_size * 3
    ffn = w * cfg.mlp_ratio

    def norm(k, shape, scale=0.02):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    def stacked(k, shape, scale=0.02):
        return (jax.random.normal(k, (L,) + shape) * scale).astype(dtype)

    return {
        "patch_proj": norm(keys[0], (d_patch, w)),
        "class_emb": norm(keys[1], (w,)),
        "pos_emb": norm(keys[2], (cfg.seq_len, w)),
        "pre_ln": {"scale": jnp.ones((w,), dtype), "bias": jnp.zeros((w,), dtype)},
        "post_ln": {"scale": jnp.ones((w,), dtype), "bias": jnp.zeros((w,), dtype)},
        "layers": {
            "ln1_scale": jnp.ones((L, w), dtype),
            "ln1_bias": jnp.zeros((L, w), dtype),
            "wq": stacked(keys[3], (w, w)),
            "bq": jnp.zeros((L, w), dtype),
            "wk": stacked(keys[4], (w, w)),
            "bk": jnp.zeros((L, w), dtype),
            "wv": stacked(keys[5], (w, w)),
            "bv": jnp.zeros((L, w), dtype),
            "wo": stacked(keys[6], (w, w)),
            "bo": jnp.zeros((L, w), dtype),
            "ln2_scale": jnp.ones((L, w), dtype),
            "ln2_bias": jnp.zeros((L, w), dtype),
            "w_fc": stacked(keys[7], (w, ffn)),
            "b_fc": jnp.zeros((L, ffn), dtype),
            "w_proj": stacked(keys[0], (ffn, w)),
            "b_proj": jnp.zeros((L, w), dtype),
        },
    }


def _encoder_layer(x: jnp.ndarray, lp, cfg: ViTConfig) -> jnp.ndarray:
    """One pre-LN transformer block. x: (B, S, W). Projections go through
    dense_any, so int8-quantized weights take the W8A8 MXU path."""
    b, s, w = x.shape
    h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], cfg.ln_eps)

    def proj(h_, wm, bm):
        out = dense_any(h_, wm, bm)
        return out.astype(x.dtype).reshape(b, s, cfg.heads, cfg.head_dim)

    q = proj(h, lp["wq"], lp["bq"]).transpose(0, 2, 1, 3)
    k = proj(h, lp["wk"], lp["bk"]).transpose(0, 2, 1, 3)
    v = proj(h, lp["wv"], lp["bv"]).transpose(0, 2, 1, 3)
    attn = flash_attention(q, k, v, causal=False)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, w)
    attn = dense_any(attn, lp["wo"], lp["bo"]).astype(x.dtype)
    x = x + attn

    h2 = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], cfg.ln_eps)
    x = x + gelu_mlp(
        h2, lp["w_fc"], lp["b_fc"], lp["w_proj"], lp["b_proj"],
        quick_gelu=cfg.quick_gelu,
    )
    return x


def _scan_layers(x, stacked_params, start: int, stop: int, cfg: ViTConfig,
                 remat: bool = False):
    sliced = jax.tree_util.tree_map(lambda p: p[start:stop], stacked_params)

    def body(carry, lp):
        fn = _encoder_layer
        if remat:
            fn = jax.checkpoint(_encoder_layer, static_argnums=(2,))
        return fn(carry, lp, cfg), None

    out, _ = jax.lax.scan(body, x, sliced)
    return out


def vit_embed(params, images, cfg: ViTConfig, compute_dtype=jnp.bfloat16):
    """Images → (B, S, W) embedded tokens (CLS + patches + positions).

    Accepts either raw uint8 (B, H, W, 3) — fused normalize+patchify+project —
    or pre-normalized float pixel_values (B, 3, H, W) for parity with the
    reference's CLIPImageProcessor pipeline.
    """
    w_patch = params["patch_proj"]
    if images.dtype == jnp.uint8:
        patches = patch_embed(images, w_patch, patch=cfg.patch_size,
                              compute_dtype=compute_dtype)
    else:
        if images.shape[1] == 3:  # NCHW → NHWC
            images = images.transpose(0, 2, 3, 1)
        flat = patchify(images.astype(compute_dtype), cfg.patch_size)
        patches = jnp.dot(
            flat, w_patch.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        ).astype(compute_dtype)

    b = patches.shape[0]
    cls = jnp.broadcast_to(
        params["class_emb"].astype(compute_dtype)[None, None, :],
        (b, 1, cfg.width),
    )
    x = jnp.concatenate([cls, patches], axis=1)
    x = x + params["pos_emb"].astype(compute_dtype)[None]
    return x


def vit_encode_fused(
    params,
    packed_layers,
    images: jnp.ndarray,
    cfg: ViTConfig,
    *,
    interpret: bool = False,
    group: int = 8,  # images per kernel token-group (hardware-tuned: 1061
                     # vs 1008 img/s tower at g=1 on v5e, B=64)
    attn_pair: int = 2,  # images per block-diagonal attention matmul
    split_attention: bool = False,  # NEGATIVE result: 612 vs 1061 img/s
                                    # tower (see ops/vit_block.py docstring)
    vmem_limit: Optional[int] = None,  # raise for attn_pair>=4 retries
                                       # (r3 crash class; see w4_matmul)
) -> jnp.ndarray:
    """Multi-level encode through the fused W8A8 Pallas block kernel
    (ops/vit_block.py). `packed_layers` comes from pack_vit_layers_fused.
    Same tap semantics as vit_encode; the token axis is padded to a sublane
    multiple for the kernel and padded rows are masked/dropped.

    split_attention=True runs each block as two Pallas kernels (LN+QKV,
    then O-proj+MLP) with XLA's batched attention between them: the
    round-2 ablation showed in-kernel unrolled head matmuls cost 33% of
    layer time for 4% of FLOPs, while XLA attention + one HBM round-trip
    of QKV is cheaper at CLIP shapes."""
    from ..ops.vit_block import (fused_vit_block, fused_vit_post,
                                 fused_vit_qkv)

    x = vit_embed(params, images, cfg, jnp.bfloat16)
    x = layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"],
                   cfg.ln_eps)
    s = cfg.seq_len
    s_pad = -(-s // 16) * 16  # bf16 sublane tile
    if s_pad != s:
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
    b = x.shape[0]
    g = group
    while b % g:
        g //= 2

    h_, d_ = cfg.heads, cfg.head_dim
    sm = d_ ** -0.5
    kv_ok = (jnp.arange(s_pad) < s)[None, None, None, :]  # (1,1,1,S_k)

    def body_split(carry, lp):
        xg = carry.reshape(b // g, g * s_pad, cfg.width)
        qkv_t = fused_vit_qkv(xg, lp, ln_eps=cfg.ln_eps,
                              interpret=interpret)  # (b/g, 3W, gS)
        qkv = qkv_t.reshape(b // g, 3, h_, d_, g, s_pad)
        qkv = qkv.transpose(1, 0, 4, 2, 5, 3)  # (3, b/g, g, H, S, d)
        q, k, v = (t.reshape(b, h_, s_pad, d_) for t in qkv)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q * sm, k,
            preferred_element_type=jnp.float32)
        scores = jnp.where(kv_ok, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                          preferred_element_type=jnp.float32)
        attn = attn.astype(jnp.bfloat16).transpose(0, 2, 1, 3).reshape(
            b // g, g * s_pad, cfg.width)
        out = fused_vit_post(xg, attn, lp, ln_eps=cfg.ln_eps,
                             quick_gelu=cfg.quick_gelu, interpret=interpret)
        return out.reshape(b, s_pad, cfg.width), None

    def body_block(carry, lp):
        kw = {} if vmem_limit is None else {"vmem_limit": vmem_limit}
        out = fused_vit_block(
            carry, lp, heads=cfg.heads, s_valid=s, ln_eps=cfg.ln_eps,
            quick_gelu=cfg.quick_gelu, interpret=interpret, group=group,
            attn_pair=attn_pair, **kw)
        return out, None

    body = body_split if split_attention else body_block

    taps = []
    prev = 0
    for stage in cfg.extract_stages:
        sliced = jax.tree_util.tree_map(lambda p: p[prev:stage],
                                        packed_layers)
        x, _ = jax.lax.scan(body, x, sliced)
        taps.append(x[:, 1:s, :])  # drop CLS and padding
        prev = stage
    return jnp.concatenate(taps, axis=1)


def vit_encode(
    params,
    images: jnp.ndarray,
    cfg: ViTConfig,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
) -> jnp.ndarray:
    """Multi-level encode: returns (B, 3*num_patches, width).

    Matches VisionModal.encode (rgb_vision_modal.py:166-184): tap after
    extract_stages[i] layers, drop CLS, concat along the token axis. Layers
    beyond the last tap are skipped entirely.
    """
    from .llama import _cast_params

    layers = _cast_params(params["layers"], compute_dtype)

    x = vit_embed(params, images, cfg, compute_dtype)
    x = layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"],
                   cfg.ln_eps)

    taps = []
    prev = 0
    for stage in cfg.extract_stages:
        x = _scan_layers(x, layers, prev, stage, cfg, remat=remat)
        taps.append(x[:, 1:, :])  # drop CLS
        prev = stage
    return jnp.concatenate(taps, axis=1)
