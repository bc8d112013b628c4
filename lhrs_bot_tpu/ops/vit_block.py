"""Fused W8A8 vision transformer block (Pallas, weight-resident).

The reference runs CLIP ViT-L through cuDNN kernels inside HF
CLIPVisionModel (lhrs/models/rgb_vision_modal.py:166-184). The XLA W8A8
path here (models/vit.py `_encoder_layer` + ops/quant.py) reaches ~850
img/s for the tower because the work BETWEEN the int8 matmuls — f32
LayerNorm, dynamic activation quantization, head split/merge — runs as
separate HBM-roundtripping ops.

This kernel executes one whole pre-LN encoder block per (image) grid step
with every weight resident in VMEM (~12 MB int8 per ViT-L layer; v5e
scoped VMEM raised via CompilerParams):

    LN1 (f32, VPU) → per-token int8 quant → QKV int8 matmul emitted
    TRANSPOSED (3W, S) → per-head attention on SUBLANE slices → int8 O
    matmul (lhsT form) → residual → LN2 → int8 FC → QuickGELU → int8
    proj → residual

Head-layout notes (hardware-measured):
  * lane-dim head reshapes ((S, W) → (S, H, d)) are unsupported /
    pathological in Mosaic, and d=64 LANE slicing was measured 15x slower
    in round 1 — so Q/K/V are produced transposed, where each head is a
    64-row SUBLANE slice (tile-aligned, free);
  * the 3D sublane-split reshape (3W, S) → (3H, d, S) compiles but lowers
    to a ~4 s gather — heads are therefore processed as an unrolled loop
    of 2D matmuls on static sublane slices, and merged back with a
    sublane concatenate;
  * both attention matmuls contract over sublanes (native MXU lhsT form),
    so the kernel contains zero explicit transposes of big tensors.

Round-2 hardware results (v5e, B=64):
  * grouped mode (images concatenated along tokens, `group=8`): tower
    1061 img/s vs 1008 ungrouped — bigger MXU N + one dependency chain
    per layer; block-diagonal image-paired attention (attn_pair=2) on
    top: tower 1096, combined 764 img/s;
  * NEGATIVE: an all-bf16 variant of this kernel (no quantization)
    measured 715 img/s at its best;
  * round-3 probe correction (benchmarks/int8_probe.py): the int8 dots in
    this kernel's exact alternating forms run at ~304 TOPS (native int8
    engages; a requant chain in standard form hits 356) — the round-2
    "~150 T for both" claim divided total layer time by matmul FLOPs and
    misattributed attention + VPU epilogue time to the MXU;
  * ablation: attention accounts for 14.2 of the 42.9 us/layer/img
    (33% of time for 4% of FLOPs — per-op overhead of 128 unrolled
    (image, head) matmuls at K=64), no-attention tower = 1585 img/s.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import quantize_int8

_NEG_INF = -1e30
_LOG2E = 1.4426950408889634  # scores feed exp2 (cheaper than exp on VPU)

# softmax strategy inside the fused kernels (tuning knob):
#   jnn       — jax.nn.softmax (scores must NOT carry the log2e fold)
#   exp2_post — unnormalized exp2, 1/denom applied to the (d, S) PV output
#   exp2_pre  — exp2, reciprocal multiply on the (S, S) probs
# Measured on v5e (B=64, g=8, p=2 tower img/s): jnn 1077, exp2_post 1051,
# exp2_pre ~same — the exp→exp2 rewrite is a wash (Mosaic already lowers
# jax.nn.softmax's exp efficiently); jnn kept as the default.
import os as _os

_SOFTMAX_MODE = _os.environ.get("LHRS_VIT_SOFTMAX", "jnn")


def _attn_probs_and_norm(scores):
    """scores (Sq, Sk) f32 (already masked; exp2-scaled unless mode=jnn) →
    (probs bf16, post_recip or None). post_recip (1, Sq) multiplies the PV
    output when normalization is deferred."""
    if _SOFTMAX_MODE == "jnn":
        return jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16), None
    m = jnp.max(scores, axis=-1, keepdims=True)
    p_f = jnp.exp2(scores - m)
    recip = 1.0 / jnp.sum(p_f, axis=-1, keepdims=True)  # (Sq, 1)
    if _SOFTMAX_MODE == "exp2_pre":
        return (p_f * recip).astype(jnp.bfloat16), None
    return p_f.astype(jnp.bfloat16), jnp.transpose(recip)


def _q_fold(sm_scale: float) -> float:
    """Softmax-scale factor folded into the Q dequant rows; carries log2e
    when the kernel softmax uses exp2."""
    return sm_scale * (1.0 if _SOFTMAX_MODE == "jnn" else _LOG2E)


def _ln_f32(xf, scale_ref, bias_ref, eps):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    normed = (xf - mu) * jax.lax.rsqrt(var + eps)
    return normed * scale_ref[0][None] + bias_ref[0][None]


def _quant_act(hf):
    """Per-token symmetric int8 over the minor axis: (S, W) f32 →
    (int8 (S, W), f32 scale (S, 1))."""
    amax = jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
    s = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(hf / s), -127, 127).astype(jnp.int8)
    return q, s


def _vit_block_kernel(
    x_ref,
    ln1s_ref, ln1b_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
    ln2s_ref, ln2b_ref, wfc_ref, sfc_ref, bfc_ref, wpj_ref, spj_ref, bpj_ref,
    o_ref,
    *, heads: int, s_valid: int, ln_eps: float, quick_gelu: bool,
    sm_scale: float,
):
    # the block may carry several images (independent dependency chains —
    # gives the static scheduler VPU work of one image to overlap with MXU
    # work of another)
    for img in range(x_ref.shape[0]):
        _vit_block_one(
            x_ref, img,
            ln1s_ref, ln1b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
            wo_ref, so_ref, bo_ref, ln2s_ref, ln2b_ref,
            wfc_ref, sfc_ref, bfc_ref, wpj_ref, spj_ref, bpj_ref,
            o_ref, heads=heads, s_valid=s_valid, ln_eps=ln_eps,
            quick_gelu=quick_gelu, sm_scale=sm_scale)


def _vit_block_grouped_kernel(
    x_ref,
    ln1s_ref, ln1b_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
    ln2s_ref, ln2b_ref, wfc_ref, sfc_ref, bfc_ref, wpj_ref, spj_ref, bpj_ref,
    o_ref,
    *, heads: int, s_img: int, s_valid: int, ln_eps: float, quick_gelu: bool,
    sm_scale: float, attn_pair: int = 2,
):
    """Like _vit_block_one, but the block carries `group` images
    CONCATENATED along the token axis ((g·S_pad, W)): every matmul, LN and
    quantization runs once over all g·S tokens (bigger MXU N, one
    dependency chain per LAYER instead of per image), while attention stays
    per-(image, head) on static column slices of the transposed QKV.

    `attn_pair` images share one attention matmul with a BLOCK-DIAGONAL
    mask: cross-image score blocks are computed and masked to -inf (softmax
    zeroes them, so the wasted blocks cannot leak between images). The
    round-2 ablation measured ~0.4 us fixed overhead per attention matmul
    (33% of layer time at 128 ops/layer/8-img group); pairing trades
    attn_pair× redundant MXU FLOPs (attention is 4% of the total) for
    1/attn_pair as many ops."""
    x = x_ref[0]  # (g*S_pad, W) bf16
    gs, w = x.shape
    d = w // heads
    group = gs // s_img

    # ---- attention half -----------------------------------------------------
    h = _ln_f32(x.astype(jnp.float32), ln1s_ref, ln1b_ref, ln_eps)
    hq, hs = _quant_act(h)  # (gS, W) int8, (gS, 1)
    acc = jax.lax.dot_general(
        wqkv_ref[...], hq,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)  # (3W, gS)
    hs_t = jnp.transpose(hs)  # (1, gS)
    # softmax scale (x log2 e: scores feed exp2, not exp) folded into the
    # Q rows of the dequant epilogue (one (3W,1) VPU op) instead of
    # per-head scaling inside the unrolled attention loop (64-128
    # ops/layer); bf16 is enough for attention inputs (heads cast to bf16
    # anyway) and halves the VMEM/VPU footprint of the (3W, gS) tensor
    rows = jax.lax.broadcasted_iota(jnp.int32, (3 * w, 1), 0)
    qrow = jnp.where(rows < w, jnp.float32(_q_fold(sm_scale)),
                     jnp.float32(1.0))
    qkv_t = ((acc.astype(jnp.float32) * (sqkv_ref[...] * qrow)) * hs_t
             + bqkv_ref[...] * qrow).astype(jnp.bfloat16)

    pair = attn_pair
    while group % pair:
        pair //= 2
    ps = pair * s_img
    # block-diagonal kv mask over a `pair`-image window: query row i may
    # only see keys of its own image, and only the valid (non-pad) ones
    row = jax.lax.broadcasted_iota(jnp.int32, (ps, ps), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ps, ps), 1)
    kv_mask = (row // s_img == col // s_img) & (col % s_img < s_valid)
    img_outs = []
    for blk in range(group // pair):
        lo = blk * ps
        head_outs = []
        for hd in range(heads):
            q_h = qkv_t[hd * d:(hd + 1) * d, lo:lo + ps]  # sm pre-folded
            k_h = qkv_t[w + hd * d:w + (hd + 1) * d, lo:lo + ps]
            v_h = qkv_t[2 * w + hd * d:2 * w + (hd + 1) * d, lo:lo + ps]
            scores = jax.lax.dot_general(
                q_h, k_h, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (pS_q, pS_k)
            scores = jnp.where(kv_mask, scores, _NEG_INF)
            probs, post = _attn_probs_and_norm(scores)
            out_h = jax.lax.dot_general(
                v_h, probs, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (d, pS_q)
            head_outs.append(out_h if post is None else out_h * post)
        img_outs.append(jnp.concatenate(head_outs, axis=0))  # (W, pS)
    attn_t = jnp.concatenate(img_outs, axis=1)  # (W, gS) f32

    # O projection from the transposed layout (contract sublanes, native)
    amax = jnp.max(jnp.abs(attn_t), axis=0, keepdims=True)  # (1, gS)
    a_s = jnp.where(amax == 0, 1.0, amax / 127.0)
    a_q = jnp.clip(jnp.round(attn_t / a_s), -127, 127).astype(jnp.int8)
    acc_o = jax.lax.dot_general(
        a_q, wo_ref[...], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)  # (gS, W)
    o = (acc_o.astype(jnp.float32) * jnp.transpose(a_s)
         * so_ref[0][None] + bo_ref[0][None])
    x1 = x.astype(jnp.float32) + o

    # ---- MLP half (normal orientation) --------------------------------------
    h2 = _ln_f32(x1, ln2s_ref, ln2b_ref, ln_eps)
    h2q, h2s = _quant_act(h2)
    acc_fc = jax.lax.dot_general(
        h2q, wfc_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    fc = acc_fc.astype(jnp.float32) * h2s * sfc_ref[0][None] + bfc_ref[0][None]
    if quick_gelu:
        fc = fc * jax.nn.sigmoid(1.702 * fc)
    else:
        fc = jax.nn.gelu(fc, approximate=False)
    fq, fs = _quant_act(fc)
    acc_pj = jax.lax.dot_general(
        fq, wpj_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    x2 = x1 + (acc_pj.astype(jnp.float32) * fs * spj_ref[0][None]
               + bpj_ref[0][None])

    o_ref[0] = x2.astype(o_ref.dtype)


def _vit_block_one(
    x_ref, img,
    ln1s_ref, ln1b_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
    ln2s_ref, ln2b_ref, wfc_ref, sfc_ref, bfc_ref, wpj_ref, spj_ref, bpj_ref,
    o_ref,
    *, heads: int, s_valid: int, ln_eps: float, quick_gelu: bool,
    sm_scale: float,
):
    x = x_ref[img]  # (S_pad, W) bf16
    s_pad, w = x.shape
    d = w // heads

    # ---- attention half ---------------------------------------------------
    h = _ln_f32(x.astype(jnp.float32), ln1s_ref, ln1b_ref, ln_eps)
    hq, hs = _quant_act(h)  # (S, W) int8, (S, 1)
    # QKV emitted transposed: (3W, S) = wqkv(W,3W)ᵀ · hq(S,W)ᵀ — heads are
    # then tile-aligned sublane slices
    acc = jax.lax.dot_general(
        wqkv_ref[...], hq,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)  # (3W, S)
    hs_t = jnp.transpose(hs)  # (1, S)
    # softmax scale x log2e folded into the Q rows of the dequant epilogue
    # (see grouped kernel); one bf16 cast for the whole tensor instead of
    # per-head casts in the unrolled loop
    rows = jax.lax.broadcasted_iota(jnp.int32, (3 * w, 1), 0)
    qrow = jnp.where(rows < w, jnp.float32(_q_fold(sm_scale)),
                     jnp.float32(1.0))
    qkv_t = (acc.astype(jnp.float32) * (sqkv_ref[...] * qrow) * hs_t
             + bqkv_ref[...] * qrow).astype(jnp.bfloat16)

    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    kv_mask = col < s_valid
    head_outs = []
    for hd in range(heads):
        q_h = qkv_t[hd * d:(hd + 1) * d, :]              # (d, S)
        k_h = qkv_t[w + hd * d:w + (hd + 1) * d, :]
        v_h = qkv_t[2 * w + hd * d:2 * w + (hd + 1) * d, :]
        scores = jax.lax.dot_general(
            q_h, k_h, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (S_q, S_k)
        scores = jnp.where(kv_mask, scores, _NEG_INF)
        probs, post = _attn_probs_and_norm(scores)
        out_h = jax.lax.dot_general(
            v_h, probs, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (d, S_q)
        head_outs.append(out_h if post is None else out_h * post)
    attn_t = jnp.concatenate(head_outs, axis=0)  # (W, S) f32

    # O projection from the transposed layout (contract sublanes, native)
    amax = jnp.max(jnp.abs(attn_t), axis=0, keepdims=True)  # (1, S)
    a_s = jnp.where(amax == 0, 1.0, amax / 127.0)
    a_q = jnp.clip(jnp.round(attn_t / a_s), -127, 127).astype(jnp.int8)
    acc_o = jax.lax.dot_general(
        a_q, wo_ref[...], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)  # (S, W)
    o = (acc_o.astype(jnp.float32) * jnp.transpose(a_s)
         * so_ref[0][None] + bo_ref[0][None])
    x1 = x.astype(jnp.float32) + o

    # ---- MLP half (normal orientation) -------------------------------------
    h2 = _ln_f32(x1, ln2s_ref, ln2b_ref, ln_eps)
    h2q, h2s = _quant_act(h2)
    acc_fc = jax.lax.dot_general(
        h2q, wfc_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    fc = acc_fc.astype(jnp.float32) * h2s * sfc_ref[0][None] + bfc_ref[0][None]
    if quick_gelu:
        fc = fc * jax.nn.sigmoid(1.702 * fc)
    else:
        fc = jax.nn.gelu(fc, approximate=False)
    fq, fs = _quant_act(fc)
    acc_pj = jax.lax.dot_general(
        fq, wpj_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    x2 = x1 + (acc_pj.astype(jnp.float32) * fs * spj_ref[0][None]
               + bpj_ref[0][None])

    o_ref[img] = x2.astype(o_ref.dtype)


def _vit_qkv_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, sqkv_ref,
                    bqkv_ref, o_ref, *, ln_eps: float):
    """Split-attention front half: LN1 + per-token int8 quant + QKV int8
    matmul, emitting transposed bf16 (3W, gS). Attention itself runs in
    XLA between the two kernels (see vit.py vit_encode_fused split mode):
    the round-2 ablation showed the 128 unrolled in-kernel head matmuls
    cost 33% of layer time for 4% of FLOPs — XLA's batched attention
    plus one HBM round-trip is cheaper."""
    x = x_ref[0]
    h = _ln_f32(x.astype(jnp.float32), ln1s_ref, ln1b_ref, ln_eps)
    hq, hs = _quant_act(h)
    acc = jax.lax.dot_general(
        wqkv_ref[...], hq, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)  # (3W, gS)
    qkv = ((acc.astype(jnp.float32) * sqkv_ref[...]) * jnp.transpose(hs)
           + bqkv_ref[...])
    o_ref[0] = qkv.astype(o_ref.dtype)


def _vit_post_kernel(x_ref, attn_ref, wo_ref, so_ref, bo_ref,
                     ln2s_ref, ln2b_ref, wfc_ref, sfc_ref, bfc_ref,
                     wpj_ref, spj_ref, bpj_ref, o_ref,
                     *, ln_eps: float, quick_gelu: bool):
    """Split-attention back half: quantize the XLA attention output,
    int8 O projection, residual, LN2, int8 FC + GELU + int8 proj,
    residual."""
    x = x_ref[0]          # (gS, W) bf16
    attn = attn_ref[0]    # (gS, W) bf16
    aq, a_s = _quant_act(attn.astype(jnp.float32))
    acc_o = jax.lax.dot_general(
        aq, wo_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)  # (gS, W)
    o = (acc_o.astype(jnp.float32) * a_s * so_ref[0][None] + bo_ref[0][None])
    x1 = x.astype(jnp.float32) + o

    h2 = _ln_f32(x1, ln2s_ref, ln2b_ref, ln_eps)
    h2q, h2s = _quant_act(h2)
    acc_fc = jax.lax.dot_general(
        h2q, wfc_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    fc = acc_fc.astype(jnp.float32) * h2s * sfc_ref[0][None] + bfc_ref[0][None]
    if quick_gelu:
        fc = fc * jax.nn.sigmoid(1.702 * fc)
    else:
        fc = jax.nn.gelu(fc, approximate=False)
    fq, fs = _quant_act(fc)
    acc_pj = jax.lax.dot_general(
        fq, wpj_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    x2 = x1 + (acc_pj.astype(jnp.float32) * fs * spj_ref[0][None]
               + bpj_ref[0][None])
    o_ref[0] = x2.astype(o_ref.dtype)


def fused_vit_qkv(x, lp, *, ln_eps=1e-5, interpret=False,
                  vmem_limit=110 * 1024 * 1024):
    """(B/g, gS, W) bf16 → transposed QKV (B/g, 3W, gS) bf16."""
    n, gs, w = x.shape
    kernel = functools.partial(_vit_qkv_kernel, ln_eps=ln_eps)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, gs, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec((1, 3 * w, gs), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 3 * w, gs), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(x, lp["ln1_scale"], lp["ln1_bias"], lp["wqkv"], lp["sqkv"],
      lp["bqkv"])


def fused_vit_post(x, attn, lp, *, ln_eps=1e-5, quick_gelu=True,
                   interpret=False, vmem_limit=110 * 1024 * 1024):
    """(B/g, gS, W) x + attention output → block output, same shape."""
    n, gs, w = x.shape
    kernel = functools.partial(_vit_post_kernel, ln_eps=ln_eps,
                               quick_gelu=quick_gelu)
    blk = pl.BlockSpec((1, gs, w), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[blk, blk] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(x, attn, lp["wo"], lp["so"], lp["bo"], lp["ln2_scale"],
      lp["ln2_bias"], lp["w_fc"], lp["s_fc"], lp["b_fc"],
      lp["w_proj"], lp["s_proj"], lp["b_proj"])


def _full_vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def fused_vit_block(
    x: jnp.ndarray,  # (B, S_pad, W) bf16, padded rows zeroed
    lp: Dict[str, jnp.ndarray],  # packed single-layer params (see pack_*)
    *,
    heads: int,
    s_valid: int,
    ln_eps: float = 1e-5,
    quick_gelu: bool = True,
    interpret: bool = False,
    vmem_limit: int = 110 * 1024 * 1024,
    img_tile: int = 1,  # >1 measured slower on v5e (919 vs 1007 img/s)
    group: int = 1,  # >1: images concatenated along tokens (one matmul
                     # chain over g*S rows; attention stays per-image)
    attn_pair: int = 2,  # images per block-diagonal attention matmul
) -> jnp.ndarray:
    b, s_pad, w = x.shape
    sm_scale = (w // heads) ** -0.5
    while b % img_tile:
        img_tile //= 2
    if group > 1:
        # concatenate `group` images along the token axis: one LN/quant/
        # matmul chain per layer covers g·S tokens (a free reshape — the
        # (B, S, W) buffer layout is unchanged)
        while b % group:
            group //= 2
        x = x.reshape(b // group, group * s_pad, w)
        kernel = functools.partial(
            _vit_block_grouped_kernel, heads=heads, s_img=s_pad,
            s_valid=s_valid, ln_eps=ln_eps, quick_gelu=quick_gelu,
            sm_scale=sm_scale, attn_pair=attn_pair)
        out = pl.pallas_call(
            kernel,
            grid=(b // group,),
            in_specs=[
                pl.BlockSpec((1, group * s_pad, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                _full_vmem(), _full_vmem(),
                _full_vmem(), _full_vmem(), _full_vmem(),
                _full_vmem(), _full_vmem(), _full_vmem(),
                _full_vmem(), _full_vmem(),
                _full_vmem(), _full_vmem(), _full_vmem(),
                _full_vmem(), _full_vmem(), _full_vmem(),
            ],
            out_specs=pl.BlockSpec((1, group * s_pad, w),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit),
            interpret=interpret,
        )(x,
          lp["ln1_scale"], lp["ln1_bias"],
          lp["wqkv"], lp["sqkv"], lp["bqkv"],
          lp["wo"], lp["so"], lp["bo"],
          lp["ln2_scale"], lp["ln2_bias"],
          lp["w_fc"], lp["s_fc"], lp["b_fc"],
          lp["w_proj"], lp["s_proj"], lp["b_proj"])
        return out.reshape(b, s_pad, w)
    kernel = functools.partial(
        _vit_block_kernel, heads=heads, s_valid=s_valid, ln_eps=ln_eps,
        quick_gelu=quick_gelu, sm_scale=sm_scale)
    row = _full_vmem
    return pl.pallas_call(
        kernel,
        grid=(b // img_tile,),
        in_specs=[
            pl.BlockSpec((img_tile, s_pad, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            row(), row(),                      # ln1 scale/bias
            _full_vmem(), row(), row(),        # wqkv/sqkv/bqkv
            _full_vmem(), row(), row(),        # wo/so/bo
            row(), row(),                      # ln2 scale/bias
            _full_vmem(), row(), row(),        # wfc/sfc/bfc
            _full_vmem(), row(), row(),        # wproj/sproj/bproj
        ],
        out_specs=pl.BlockSpec((img_tile, s_pad, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(x,
      lp["ln1_scale"], lp["ln1_bias"],
      lp["wqkv"], lp["sqkv"], lp["bqkv"],
      lp["wo"], lp["so"], lp["bo"],
      lp["ln2_scale"], lp["ln2_bias"],
      lp["w_fc"], lp["s_fc"], lp["b_fc"],
      lp["w_proj"], lp["s_proj"], lp["b_proj"])


# ---------------------------------------------------------------------------
# Packing: stacked float ViT layers → stacked fused-kernel layout
# ---------------------------------------------------------------------------


def pack_vit_layers_fused(layers: Dict[str, jnp.ndarray]) -> Dict:
    """Stacked (L, ...) float layer params (models/vit.py layout) →
    stacked int8 weights + f32 scales/biases shaped for fused_vit_block.
    QKV is concatenated into one (W, 3W) matmul whose scales/bias are
    stored column-shaped (3W, 1) because its output is transposed."""
    def qpack(w):  # (L, in, out) → int8 (L, in, out), scales (L, 1, out)
        qt = quantize_int8(w, axis=1)
        return qt.q, qt.scale.astype(jnp.float32)

    wqkv = jnp.concatenate([layers["wq"], layers["wk"], layers["wv"]],
                           axis=-1)
    bqkv = jnp.concatenate([layers["bq"], layers["bk"], layers["bv"]],
                           axis=-1)
    q_qkv, s_qkv = qpack(wqkv)
    q_o, s_o = qpack(layers["wo"])
    q_fc, s_fc = qpack(layers["w_fc"])
    q_pj, s_pj = qpack(layers["w_proj"])
    f32 = lambda t: jnp.asarray(t, jnp.float32)
    L = q_o.shape[0]
    as_row = lambda t: f32(t).reshape(L, 1, -1)
    as_col = lambda t: f32(t).reshape(L, -1, 1)
    return {
        "ln1_scale": as_row(layers["ln1_scale"]),
        "ln1_bias": as_row(layers["ln1_bias"]),
        # transposed-output epilogue: column vectors
        "wqkv": q_qkv, "sqkv": as_col(s_qkv), "bqkv": as_col(bqkv),
        "wo": q_o, "so": as_row(s_o), "bo": as_row(layers["bo"]),
        "ln2_scale": as_row(layers["ln2_scale"]),
        "ln2_bias": as_row(layers["ln2_bias"]),
        "w_fc": q_fc, "s_fc": as_row(s_fc), "b_fc": as_row(layers["b_fc"]),
        "w_proj": q_pj, "s_proj": as_row(s_pj),
        "b_proj": as_row(layers["b_proj"]),
    }
