"""Weight quantization: int8 (and packed int4) matmuls.

Replaces the bitsandbytes int8/NF4 path of the reference
(lhrs/models/text_modal.py:91-109, `bits: 8` in the stage-2 recipe). On TPU
the win is HBM bandwidth: decode is weight-bandwidth-bound, so int8 weights
halve the bytes per token (v5e also doubles peak MACs at int8).

Scheme: symmetric per-output-channel scales. q = round(w / s),
s = max|w_col| / 127. Matmul computes x_bf16 · q_int8 with f32 accumulation
and folds the scale into the output epilogue — XLA fuses the dequant, so no
Pallas needed for correctness; a Pallas fused kernel can be layered later.

Packed int4: two nibbles per int8 byte along the input dim, unpacked in the
epilogue-free path.

NF4: the reference's published `bits: 4` recipe is bitsandbytes NF4 with
double quantization (`quant_type: nf4`, `double_quant: True` in every
Config/multi_modal_*.yaml:77-78; BitsAndBytesConfig built at
lhrs/models/text_modal.py:91-109). Implemented here natively: the 16-value
NF4 codebook (the QLoRA paper's normal-distribution quantiles), per-64-block
absmax scales grouped along the contraction axis — element-for-element the
same blocks as bitsandbytes' row-major 64-blocking of (out, in) torch
weights — and double quantization of the absmax plane (mean offset +
blockwise-256 int8). Deviation (documented in ROADMAP.md): bitsandbytes
double-quantizes absmax with its nonlinear "dynamic map" 8-bit code; we use
linear symmetric int8 per block, a comparable-precision scale quantizer.
The double-quant round-trip is applied at quantize time and the resulting
absmax stored as f32, so compute numerics carry the double-quant error while
the storage layout stays the simple (q, scale) pair.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class QuantizedTensor:
    """Quantized weight: int8 values (possibly nibble-packed for int4) +
    per-output-channel f32 scales. `bits` is pytree aux data (static), so
    QuantizedTensors thread through jit/scan like ordinary params."""

    __slots__ = ("q", "scale", "bits")

    def __init__(self, q, scale, bits: int = 8):
        self.q = q
        self.scale = scale
        self.bits = bits

    def tree_flatten(self):
        return (self.q, self.scale), self.bits

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], bits=aux)

    def __repr__(self):  # pragma: no cover
        return (f"QuantizedTensor(q={getattr(self.q, 'shape', None)}, "
                f"scale={getattr(self.scale, 'shape', None)}, "
                f"bits={self.bits})")


def quantize_int8(w: jnp.ndarray, axis: int = -2) -> QuantizedTensor:
    """Per-output-channel symmetric int8. axis: the *contraction* axis of w
    (reduced when computing scales); for (in, out) weights that is -2."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = absmax / 127.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QuantizedTensor(q=q, scale=scale, bits=8)


def dequantize(qt: QuantizedTensor) -> jnp.ndarray:
    if qt.bits == "nf4":
        return _dequantize_nf4(qt.q, qt.scale)
    if qt.bits == 4:
        q = unpack_int4(qt.q)
    elif qt.bits == "4h":
        q = unpack_int4_halves(qt.q)
    else:
        q = qt.q
    return q.astype(jnp.float32) * qt.scale


def quantized_matmul(x: jnp.ndarray, qt: QuantizedTensor,
                     out_dtype=None) -> jnp.ndarray:
    """x (…, in) @ quantized (in, out) with scale folded into the epilogue."""
    out_dtype = out_dtype or x.dtype
    if qt.bits == "nf4":
        # codebook dequant cannot fold into the epilogue (scales are
        # per-block along the contraction dim); dequant to bf16, then dot
        w = _dequantize_nf4(qt.q, qt.scale).astype(jnp.bfloat16)
        acc = jnp.dot(x.astype(jnp.bfloat16), w,
                      preferred_element_type=jnp.float32)
        return acc.astype(out_dtype)
    if qt.bits == 4:
        q = unpack_int4(qt.q)
    elif qt.bits == "4h":
        q = unpack_int4_halves(qt.q)
    else:
        q = qt.q
    acc = jnp.dot(x.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    return (acc * qt.scale.astype(jnp.float32)).astype(out_dtype)


def quantize_activation(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-token symmetric int8: (..., d) → (int8 values,
    (..., 1) f32 scales)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


def w8a8_matmul(x: jnp.ndarray, qt: "QuantizedTensor",
                out_dtype=None) -> jnp.ndarray:
    """Full-int8 matmul: dynamic activation quant + int8 weights on the int8
    MXU path (measured 318 TOPS vs 187 bf16 on v5e), scales folded into the
    f32 epilogue. x (..., in) · (in, out) → (..., out)."""
    out_dtype = out_dtype or x.dtype
    xq, xs = quantize_activation(x)
    acc = jnp.dot(xq, qt.q, preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs
            * qt.scale.astype(jnp.float32)).astype(out_dtype)


# ---------------------------------------------------------------------------
# int4 packing (two values per byte along the leading/contraction dim)
# ---------------------------------------------------------------------------


def quantize_int4(w: jnp.ndarray, axis: int = -2) -> QuantizedTensor:
    # nibbles pack along the contraction axis, which must be axis -2
    assert axis % w.ndim == w.ndim - 2, (axis, w.shape)
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = absmax / 7.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    return QuantizedTensor(q=pack_int4(q), scale=scale, bits=4)


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """(…, 2n, out) int8 in [-8, 7] → (…, n, out) with two nibbles.

    Packs along axis -2 — the contraction axis of both unstacked (in, out)
    and stacked (L, in, out) weights — so per-layer lax.scan slicing of a
    stacked QuantizedTensor keeps q and its (L, 1, out) scales aligned."""
    assert q.shape[-2] % 2 == 0
    lo = q[..., 0::2, :] & 0x0F
    hi = (q[..., 1::2, :] & 0x0F) << 4
    return (lo | hi).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_int4: (…, n, out) → (…, 2n, out), interleaved
    lo0, hi0, lo1, hi1, … along axis -2. Stack+reshape (not a strided
    scatter) so XLA can fuse the unpack into the consuming matmul."""
    lo = (packed << 4).astype(jnp.int8) >> 4  # sign-extend low nibble
    hi = packed.astype(jnp.int8) >> 4
    inter = jnp.stack([lo, hi], axis=-2)  # (…, n, 2, out)
    out_shape = packed.shape[:-2] + (2 * packed.shape[-2],) + packed.shape[-1:]
    return inter.reshape(out_shape)


def pack_int4_halves(q: jnp.ndarray) -> jnp.ndarray:
    """(…, 2n, out) int8 in [-8, 7] → (…, n, out): contraction row r goes
    to the LOW nibble of packed row r, row n + r to the HIGH nibble.

    This "halves" layout is what the Pallas W4A8 decode kernel
    (ops/w4_matmul.py) consumes: the matching activation split is two
    contiguous (B, n) slices (no stride-2 gather), and the in-kernel unpack
    is two whole-block int8 shifts with no interleave relayout."""
    assert q.shape[-2] % 2 == 0
    n = q.shape[-2] // 2
    lo = q[..., :n, :] & 0x0F
    hi = (q[..., n:, :] & 0x0F) << 4
    return (lo | hi).astype(jnp.int8)


def unpack_int4_halves(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_int4_halves: (…, n, out) → (…, 2n, out)."""
    lo = (packed << 4).astype(jnp.int8) >> 4
    hi = packed.astype(jnp.int8) >> 4
    return jnp.concatenate([lo, hi], axis=-2)


def quantize_int4h(w: jnp.ndarray, axis: int = -2) -> QuantizedTensor:
    """Symmetric per-output-channel int4 in the halves-packed layout
    (bits="4h") — the layout the fused TPU decode matmul streams."""
    assert axis % w.ndim == w.ndim - 2, (axis, w.shape)
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = absmax / 7.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    return QuantizedTensor(q=pack_int4_halves(q), scale=scale, bits="4h")


# ---------------------------------------------------------------------------
# NF4 (QLoRA 4-bit NormalFloat) — the reference's `quant_type: nf4` recipe
# ---------------------------------------------------------------------------

# The 16 NormalFloat4 levels from the QLoRA paper (quantiles of N(0,1)
# renormalized to [-1, 1]); identical constants ship in bitsandbytes.
NF4_CODE = (
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
)

NF4_BLOCK = 64        # weights per absmax block (bitsandbytes default)
NF4_DQ_BLOCK = 256    # absmax values per double-quant block


def _double_quant_roundtrip(absmax: jnp.ndarray,
                            block: int = NF4_DQ_BLOCK) -> jnp.ndarray:
    """bnb `double_quant=True` semantics as a quantize→dequantize round
    trip: subtract the mean offset, int8-quantize per 256-block, add the
    offset back. The returned f32 absmax carries the double-quant error so
    downstream compute matches a double-quantized load."""
    flat = absmax.astype(jnp.float32).reshape(-1)
    offset = jnp.mean(flat)
    c = flat - offset
    n = flat.size
    pad = (-n) % block
    cp = jnp.pad(c, (0, pad)).reshape(-1, block)
    s = jnp.max(jnp.abs(cp), axis=-1, keepdims=True) / 127.0
    s = jnp.where(s == 0, 1.0, s)
    q = jnp.clip(jnp.round(cp / s), -127, 127)
    out = (q * s).reshape(-1)[:n] + offset
    return out.reshape(absmax.shape)


def quantize_nf4(w: jnp.ndarray, axis: int = -2, *,
                 double_quant: bool = True) -> QuantizedTensor:
    """NF4-quantize a (…, in, out) weight: per-64-block absmax along the
    contraction axis (the same element grouping as bitsandbytes' row-major
    blocking of torch (out, in) weights), nearest-codebook assignment with
    bnb's tie-goes-lower midpoint rule, nibble-packed codes.

    scale: (…, in/64, out) f32 absmax (double-quant round-tripped when
    double_quant=True). q: (…, in/2, out) int8, two codes per byte."""
    assert axis % w.ndim == w.ndim - 2, (axis, w.shape)
    in_dim = w.shape[-2]
    assert in_dim % NF4_BLOCK == 0, (
        f"NF4 needs the contraction dim divisible by {NF4_BLOCK}, "
        f"got {w.shape}")
    wf = w.astype(jnp.float32)
    nb = in_dim // NF4_BLOCK
    blocks = wf.reshape(wf.shape[:-2] + (nb, NF4_BLOCK) + wf.shape[-1:])
    absmax = jnp.max(jnp.abs(blocks), axis=-2)          # (…, nb, out)
    absmax = jnp.where(absmax == 0, 1.0, absmax)
    if double_quant:
        absmax = _double_quant_roundtrip(absmax)
        # double-quant can shrink a block's absmax below its true max or
        # send it ≤0 for tiny blocks; keep it positive (bnb clamps by
        # construction of the dynamic map's strictly-positive magnitudes)
        absmax = jnp.maximum(absmax, 1e-12)
    xn = blocks / absmax[..., None, :]                  # normalized [-1, 1]+
    code = jnp.asarray(NF4_CODE, jnp.float32)
    mid = (code[1:] + code[:-1]) / 2.0
    # searchsorted side='left': value exactly on a midpoint takes the lower
    # code, matching bnb's `x > pivot ? upper : lower` comparison tree
    idx = jnp.searchsorted(mid, jnp.clip(xn, -1.0, 1.0), side="left")
    idx = idx.reshape(wf.shape).astype(jnp.int8)        # 0..15
    return QuantizedTensor(q=pack_int4(idx), scale=absmax, bits="nf4")


def unpack_uint4(packed: jnp.ndarray) -> jnp.ndarray:
    """pack_int4 inverse without sign extension: codes 0..15."""
    lo = packed & 0x0F
    hi = (packed >> 4) & 0x0F
    inter = jnp.stack([lo, hi], axis=-2)
    out_shape = packed.shape[:-2] + (2 * packed.shape[-2],) + packed.shape[-1:]
    return inter.reshape(out_shape)


def _dequantize_nf4(q_packed: jnp.ndarray, absmax: jnp.ndarray) -> jnp.ndarray:
    code = jnp.asarray(NF4_CODE, jnp.float32)
    idx = unpack_uint4(q_packed)
    vals = jnp.take(code, idx, axis=0)                  # (…, in, out) f32
    in_dim = vals.shape[-2]
    nb = absmax.shape[-2]
    blocks = vals.reshape(vals.shape[:-2] + (nb, in_dim // nb)
                          + vals.shape[-1:])
    out = blocks * absmax[..., None, :].astype(jnp.float32)
    return out.reshape(vals.shape)


# ---------------------------------------------------------------------------
# Model-level helpers
# ---------------------------------------------------------------------------

_QUANT_TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_llama_layers(layers: Dict[str, jnp.ndarray],
                          bits: int = 8, *,
                          quant_type: str = "nf4",
                          double_quant: bool = True) -> Dict[str, Any]:
    """Replace the big stacked projection weights with QuantizedTensors
    (norms stay bf16/f32). Contraction axis of stacked (L, in, out) is 1.

    bits=4 honors the reference's BitsAndBytesConfig surface
    (text_modal.py:96-103): quant_type "nf4" (the published recipe,
    Config/multi_modal_*.yaml `quant_type: nf4`) uses the NormalFloat
    codebook with blockwise-64 absmax and optional double quantization;
    any other value falls back to symmetric linear int4."""
    if bits == 8:
        fn = quantize_int8
    elif quant_type == "nf4":
        fn = lambda w, axis: quantize_nf4(w, axis, double_quant=double_quant)
    elif quant_type == "int4h":
        # halves-packed linear int4: the layout the Pallas W4A8 decode
        # matmul (ops/w4_matmul.py) streams packed from HBM
        fn = quantize_int4h
    else:
        fn = quantize_int4
    out: Dict[str, Any] = {}
    for name, w in layers.items():
        if name in _QUANT_TARGETS and not isinstance(w, QuantizedTensor):
            out[name] = fn(w, axis=1)
        else:
            out[name] = w
    return out


def dequantize_llama_layers(layers: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    return {
        name: dequantize(w) if isinstance(w, QuantizedTensor) else w
        for name, w in layers.items()
    }


_VISION_QUANT_TARGETS = ("wq", "wk", "wv", "wo", "w_fc", "w_proj")


def quantize_vision_layers(layers: Dict[str, jnp.ndarray],
                           bits: int = 8) -> Dict[str, Any]:
    """int8-quantize the ViT/perceiver projection weights (stacked
    (L, in, out)); LayerNorms and biases stay float. With int8 weights the
    vision blocks take the W8A8 MXU path (dynamic activation quant)."""
    fn = quantize_int8 if bits == 8 else quantize_int4
    return {
        name: fn(w, axis=1) if name in _VISION_QUANT_TARGETS else w
        for name, w in layers.items()
    }
