"""Pallas W4A8 matmul for weight-bandwidth-bound decode (packed int4).

The reference serves its `bits: 4` recipe through bitsandbytes' CUDA
dequant kernels (/root/reference/lhrs/models/text_modal.py:91-109). On TPU,
B=1 full-context decode is weight-HBM-bound: int8 weights cost ~6.7 GB of
reads per token. Packed int4 halves that — but only if the nibble unpack
happens in VMEM. The XLA formulation (unpack_int4 + dot) materializes the
unpacked tensor per step and measured 4.6 tok/s vs int8's 86.4
(benchmarks/int4_decode_probe.py): a 19x regression, not a 1.5x win.

This kernel streams the packed bytes from HBM exactly once:

  * weights are packed in the "halves" layout (quantize_int4h): byte row r
    of (K/2, N) holds weight row r in the low nibble and row K/2 + r in the
    high nibble, so the activation splits into two CONTIGUOUS (B, K/2)
    slices — no strided gather of x, and the unpack inside the kernel is
    two whole-block int8 shifts (no interleave relayout, which Mosaic
    cannot lane-split);
  * the FULL stacked (L, K/2, N) weight lives in HBM; the layer index is
    scalar-prefetched into the BlockSpec index maps, so a lax.scan decode
    body calls the kernel with a traced layer and XLA never materializes a
    per-layer slice (the same trick fused_decode.py uses for the KV cache);
  * activations are dynamically per-token int8 (quantize_activation), and
    the two dots run int8 x int8 -> int32 on the MXU's native-int8 path
    (measured 304-356 TOPS in-kernel, benchmarks/int8_probe.py) — at M=1
    the MXU is weight-streaming-bound, and int8 operands stream 2x faster
    than bf16;
  * per-output-channel weight scales and the per-token activation scale
    fold into one f32 epilogue.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(layer_ref, xlo_ref, xhi_ref, xs_ref, w_ref, ws_ref, out_ref,
            *, unpack: str = "i32"):
    del layer_ref  # consumed by the BlockSpec index maps
    w = w_ref[0]  # (K2, NB) int8, two nibbles per byte
    if unpack == "i32":
        # Mosaic cannot legalize i8-vector shifts (arith.shli on vector<i8>
        # fails); widen to i32, shift, and narrow back.
        w32 = w.astype(jnp.int32)
        lo = ((w32 << 28) >> 28).astype(jnp.int8)  # sign-ext rows [0, K/2)
        hi = (w32 >> 4).astype(jnp.int8)           # arithmetic: [K/2, K)
        acc = jax.lax.dot_general(
            xlo_ref[...], lo, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc += jax.lax.dot_general(
            xhi_ref[...], hi, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    else:
        # i8-native unpack: no widening — 4x fewer vregs touched. Shifts
        # are illegal on vector<i8>, but and/compare/select/sub are not:
        #   lo_u = w & 15;  lo_s = lo_u - 16*[lo_u >= 8]
        #   w - lo_u == 16*hi_s EXACTLY in int8 (no wrap: 16*hi_s in
        #   [-128, 112], + lo_u in [0, 15] stays in [-128, 127])
        # so the high-nibble dot runs on (w - lo_u) and the exact /16
        # moves to the int32 accumulator (arithmetic shift).
        lo_u = w & jnp.int8(15)
        lo_s = jnp.where(lo_u >= jnp.int8(8), lo_u - jnp.int8(16), lo_u)
        hi16 = w - lo_u
        acc = jax.lax.dot_general(
            xlo_ref[...], lo_s, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc += jax.lax.dot_general(
            xhi_ref[...], hi16,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32) >> 4
    out_ref[...] = (acc.astype(jnp.float32) * ws_ref[0] * xs_ref[...]
                    ).astype(out_ref.dtype)


def _block_n(n: int) -> int:
    # Prefer the widest block even when it does not divide N: Pallas
    # pads the ragged edge block (garbage lanes never stored), and the
    # wider DMA + halved grid-step count is what the stream rate wants —
    # N=11008 (w_up/w_gate, 62% of the 7B weight stream) measured 489
    # GB/s effective with the old divide-exactly fallback to 256.
    if n >= 512:
        return 512
    return n  # tiny/test shapes: one whole-N block (interpret mode)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "interpret", "unpack"))
def w4a8_matmul_stacked(
    xq_lo: jnp.ndarray,    # (B, K/2) int8 — even half of the activation
    xq_hi: jnp.ndarray,    # (B, K/2) int8 — odd half
    x_scale: jnp.ndarray,  # (B, 1) f32 per-token activation scale
    w_packed: jnp.ndarray,  # (L, K/2, N) int8, halves-packed nibbles
    w_scale: jnp.ndarray,  # (L, 1, N) f32 per-output-channel scales
    layer: jnp.ndarray,    # () int32
    *,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    unpack: str = "i32",
) -> jnp.ndarray:
    """(B, N) = dequant(x) @ dequant(W[layer]) with W streamed packed."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nl, k2, n = w_packed.shape
    b = xq_lo.shape[0]
    nb = _block_n(n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # layer
        grid=(pl.cdiv(n, nb),),
        in_specs=[
            pl.BlockSpec((b, k2), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),   # xq_lo
            pl.BlockSpec((b, k2), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),   # xq_hi
            pl.BlockSpec((b, 1), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),   # x_scale
            pl.BlockSpec((1, k2, nb), lambda i, l: (l[0], 0, i),
                         memory_space=pltpu.VMEM),   # w_packed[layer]
            pl.BlockSpec((1, 1, nb), lambda i, l: (l[0], 0, i),
                         memory_space=pltpu.VMEM),   # w_scale[layer]
        ],
        out_specs=pl.BlockSpec((b, nb), lambda i, l: (0, i),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, unpack=unpack),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        # the i32-widened unpack intermediates exceed the default 16 MB
        # scoped-vmem limit at (5504, 512) blocks — raise it (the kernel
        # peaks at ~20 MB live)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      xq_lo, xq_hi, x_scale.astype(jnp.float32),
      w_packed, w_scale.astype(jnp.float32))


def w4a8_project(x: jnp.ndarray, qt, layer: jnp.ndarray, *,
                 interpret: Optional[bool] = None,
                 unpack: str = "i32") -> jnp.ndarray:
    """x (B, S, K) @ stacked halves-packed QuantizedTensor → (B, S, N).

    Quantizes the activation per token (symmetric int8), splits it into the
    two contiguous nibble halves, and runs the fused kernel on W[layer]."""
    from .quant import quantize_activation

    b, s, k = x.shape
    x2 = x.reshape(b * s, k)
    xq, xs = quantize_activation(x2)
    k2 = k // 2
    out = w4a8_matmul_stacked(
        xq[:, :k2], xq[:, k2:], xs, qt.q, qt.scale, layer,
        out_dtype=x.dtype, interpret=interpret, unpack=unpack)
    return out.reshape(b, s, -1)
