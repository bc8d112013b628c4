"""Fused decode attention + KV-cache append (Pallas, in-place HBM cache).

One decode step must (a) append the new token's K/V row into the cache and
(b) attend the new query over the valid cache prefix. The reference does this
through HF's dynamic KV cache (lhrs/models/text_modal.py:36-60); the XLA
formulation here (models/llama.py `_write_at` + ops/decode_attention.py)
reads the whole cache for attention AND rewrites the whole cache for the
append — the append's full-size output copy dominates at long context
because decode is HBM-bandwidth-bound.

This kernel makes the cache traversal one pass and the append O(window):

  * the FULL stacked cache (L, B, H, S, D) lives in HBM and aliases the
    output (input_output_aliases) — nothing is copied;
  * per (layer, seq) program: the new K/V row is read-modify-written into
    its 8-row aligned window (~H*8*D elements, not H*S*D), then attention
    runs block-by-block over ONLY the valid prefix (ceil((len+1)/BS) blocks
    instead of S_max) with double-buffered HBM→VMEM DMA and an online
    softmax; scores/PV ride the MXU as H-batched matmuls — heads stay
    batched (the recorded 15x regression for per-head lane layouts).

The layer index is a traced scalar (scalar-prefetch), so the kernel is
called once per scan step with the cache as a loop CARRY: XLA aliases
while-loop carries in place, which keeps the whole decode loop zero-copy
end-to-end when the caller donates the cache.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(layer_ref, len_ref, q_ref, kn_ref, vn_ref, kc_ref, vc_ref,
            out_ref, ko_ref, vo_ref,
            kbuf, vbuf, kwin, vwin, sem_k, sem_v, sem_w,
            *, block_s: int, windows: int, sm_scale: float):
    del kc_ref, vc_ref  # aliased with ko_ref/vo_ref; all access via outputs
    b = pl.program_id(0)
    layer = layer_ref[0]
    length = len_ref[b]  # valid entries BEFORE this step's append
    win = windows  # aligned RMW window (sublane-tile multiple)

    # ---- append: RMW the aligned window around `length` ------------------
    aligned = pl.multiple_of((length // win) * win, win)
    kwin_hbm = ko_ref.at[pl.ds(layer, 1), pl.ds(b, 1), :,
                         pl.ds(aligned, win), :]
    vwin_hbm = vo_ref.at[pl.ds(layer, 1), pl.ds(b, 1), :,
                         pl.ds(aligned, win), :]
    cp = pltpu.make_async_copy(kwin_hbm, kwin, sem_w.at[0])
    cp.start()
    cp2 = pltpu.make_async_copy(vwin_hbm, vwin, sem_w.at[1])
    cp2.start()
    cp.wait()
    cp2.wait()
    row = length - aligned
    row_ids = jax.lax.broadcasted_iota(jnp.int32, kwin.shape, 3)
    kwin[:] = jnp.where(row_ids == row, kn_ref[:][None], kwin[:])
    vwin[:] = jnp.where(row_ids == row, vn_ref[:][None], vwin[:])
    cp = pltpu.make_async_copy(kwin, kwin_hbm, sem_w.at[0])
    cp.start()
    cp2 = pltpu.make_async_copy(vwin, vwin_hbm, sem_w.at[1])
    cp2.start()
    cp.wait()
    cp2.wait()

    # ---- attention over the valid prefix (now length+1 entries) ----------
    h, _, d = q_ref.shape[1:]
    q = (q_ref[0, :, 0, :].astype(jnp.float32) * sm_scale).astype(
        q_ref.dtype)  # (H, D)
    n_valid = length + 1
    nb = pl.cdiv(n_valid, block_s)

    def dma(slot, blk, buf, src, sem):
        return pltpu.make_async_copy(
            src.at[pl.ds(layer, 1), pl.ds(b, 1), :,
                   pl.ds(blk * block_s, block_s), :],
            buf.at[pl.ds(slot, 1)], sem.at[slot])

    dma(0, 0, kbuf, ko_ref, sem_k).start()
    dma(0, 0, vbuf, vo_ref, sem_v).start()

    m0 = jnp.full((h, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((h, 1), jnp.float32)
    acc0 = jnp.zeros((h, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nb)
        def _():
            nxt = jax.lax.rem(i + 1, 2)
            dma(nxt, i + 1, kbuf, ko_ref, sem_k).start()
            dma(nxt, i + 1, vbuf, vo_ref, sem_v).start()

        pltpu.make_async_copy(kbuf.at[pl.ds(slot, 1)],
                              kbuf.at[pl.ds(slot, 1)],
                              sem_k.at[slot]).wait()
        k = kbuf[slot, 0]  # (H, BS, D)
        # scores: H-batched (1, D) x (D, BS) on the MXU
        s = jax.lax.dot_general(
            q[:, None, :], k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]  # (H, BS)
        col = i * block_s + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, _NEG_INF)

        new_m = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - new_m)
        p = jnp.exp(s - new_m)  # (H, BS)

        pltpu.make_async_copy(vbuf.at[pl.ds(slot, 1)],
                              vbuf.at[pl.ds(slot, 1)],
                              sem_v.at[slot]).wait()
        v = vbuf[slot, 0]  # (H, BS, D)
        pv = jax.lax.dot_general(
            p.astype(v.dtype)[:, None, :], v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]  # (H, D)
        acc = acc * alpha + pv
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        return new_m, l, acc

    m, l, acc = jax.lax.fori_loop(0, nb, body, (m0, l0, acc0))
    out_ref[0, :, 0, :] = (acc / l).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "block_s", "interpret", "vmem_limit"))
def fused_decode_attention(
    q: jnp.ndarray,       # (B, H, 1, D) current query
    k_new: jnp.ndarray,   # (B, H, 1, D) this step's key
    v_new: jnp.ndarray,   # (B, H, 1, D) this step's value
    k_cache: jnp.ndarray,  # (L, B, H, S, D) stacked cache — DONATE upstream
    v_cache: jnp.ndarray,  # (L, B, H, S, D)
    lengths: jnp.ndarray,  # (B,) int32 valid entries before the append
    layer: jnp.ndarray,    # () int32 layer index
    *,
    sm_scale: Optional[float] = None,
    block_s: int = 256,
    interpret: bool = False,
    vmem_limit: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (attn_out (B,H,1,D), k_cache, v_cache) with k_new/v_new
    appended at lengths[b] of `layer` and attention taken over the
    lengths[b]+1 valid entries. The caches alias in/out (in-place)."""
    nl, bsz, h, s, d = k_cache.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    block_s = min(block_s, s)
    while block_s > 8 and s % block_s:
        block_s //= 2
    assert s % block_s == 0, (s, block_s)
    # aligned append window: sublane tile is 8 (f32) / 16 (bf16/f16)
    windows = 8 if k_cache.dtype == jnp.float32 else 16
    assert s % windows == 0, (s, windows)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # layer, lengths
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, 1, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # q
            pl.BlockSpec((1, h, 1, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # k_new
            pl.BlockSpec((1, h, 1, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # v_new
            pl.BlockSpec(memory_space=pltpu.ANY),   # k_cache (aliased)
            pl.BlockSpec(memory_space=pltpu.ANY),   # v_cache (aliased)
        ],
        out_specs=[
            pl.BlockSpec((1, h, 1, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # attn out
            pl.BlockSpec(memory_space=pltpu.ANY),   # k_cache out
            pl.BlockSpec(memory_space=pltpu.ANY),   # v_cache out
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 1, h, block_s, d), k_cache.dtype),  # kbuf
            pltpu.VMEM((2, 1, h, block_s, d), v_cache.dtype),  # vbuf
            pltpu.VMEM((1, 1, h, windows, d), k_cache.dtype),  # kwin
            pltpu.VMEM((1, 1, h, windows, d), v_cache.dtype),  # vwin
            pltpu.SemaphoreType.DMA((2,)),  # sem_k
            pltpu.SemaphoreType.DMA((2,)),  # sem_v
            pltpu.SemaphoreType.DMA((2,)),  # sem_w
        ],
    )
    kernel = functools.partial(_kernel, block_s=block_s, windows=windows,
                               sm_scale=float(sm_scale))
    out, k_out, v_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # inputs counted including the two scalar-prefetch args
        input_output_aliases={5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=vmem_limit or (96 * 1024 * 1024)),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      lengths.astype(jnp.int32),
      q, k_new.astype(k_cache.dtype), v_new.astype(v_cache.dtype),
      k_cache, v_cache)
    return out, k_out, v_out


def _kernel_q(layer_ref, len_ref, q_ref, kn_ref, kns_ref, vn_ref, vns_ref,
              kc_ref, vc_ref, ksc_ref, vsc_ref,
              out_ref, ko_ref, vo_ref, kso_ref, vso_ref,
              kbuf, vbuf, ksbuf, vsbuf, kwin, vwin, kswin, vswin,
              sem_k, sem_v, sem_ks, sem_vs, sem_w,
              *, block_s: int, windows: int, swin: int, sm_scale: float,
              int8_dots: bool = False):
    """int8-cache variant: K/V rows are per-vector int8 with f32 scale
    planes (L, B, H, S). Dequantization folds into the online softmax —
    scores ·= k_scale, probs ·= v_scale — so cache HBM reads stay at
    1 byte/element (decode's dominant traffic at long context).

    Overlap design (r4): nothing serializes behind the append RMW. The
    RMW window loads AND the first attention block DMAs are all issued
    at kernel entry; the appended row/scales are patched INTO THE VMEM
    BLOCKS (so attention never orders against the HBM writeback), and
    the writeback drains while attention streams. Blocks whose tail
    would exceed S_max slide back (clamped start) with an
    exact-coverage mask, so block_s need not divide S_max and
    large-block DMAs (2.1 MB at block_s=512) keep the stream near the
    measured DMA peak (benchmarks/hbm_peak_probe.py). Scale blocks stay
    per-block double-buffered DMAs: Mosaic cannot vector.load a VMEM
    plane at a dynamic LANE offset, so a hoisted full-plane copy is
    unreadable in the loop (measured failure, r4)."""
    del kc_ref, vc_ref, ksc_ref, vsc_ref  # all access via aliased outputs
    b = pl.program_id(0)
    layer = layer_ref[0]
    length = len_ref[b]
    h, _, d = q_ref.shape[1:]
    s_max = ko_ref.shape[3]
    n_valid = length + 1
    nb = pl.cdiv(n_valid, block_s)

    # Mosaic must PROVE slice-offset tile alignment: i*block_s and
    # s_max-block_s are both multiples of gcd(block_s, s_max), which is
    # ≥128 for the real path (s_max is a 128-multiple by assertion,
    # block_s defaults to 512) — enough for the f32 scale plane's lane
    # tiling and the int8 rows' sublane tiling.
    g = math.gcd(block_s, s_max)

    def blk_start(i):
        # clamp so the last block stays in bounds; re-read rows are
        # excluded by the exact-coverage mask in the loop body
        return pl.multiple_of(
            jnp.minimum(i * block_s, s_max - block_s), g)

    def dma(slot, blk, buf, src, sem):
        return pltpu.make_async_copy(
            src.at[pl.ds(layer, 1), pl.ds(b, 1), :,
                   pl.ds(blk_start(blk), block_s), :],
            buf.at[pl.ds(slot, 1)], sem.at[slot])

    def dma_s(slot, blk, buf, src, sem):
        return pltpu.make_async_copy(
            src.at[pl.ds(layer, 1), pl.ds(b, 1), :,
                   pl.ds(blk_start(blk), block_s)],
            buf.at[pl.ds(slot, 1)], sem.at[slot])

    # ---- phase 1: issue every independent DMA up front -------------------
    aligned = pl.multiple_of((length // windows) * windows, windows)
    s_aligned = pl.multiple_of((length // swin) * swin, swin)
    kwin_hbm = ko_ref.at[pl.ds(layer, 1), pl.ds(b, 1), :,
                         pl.ds(aligned, windows), :]
    vwin_hbm = vo_ref.at[pl.ds(layer, 1), pl.ds(b, 1), :,
                         pl.ds(aligned, windows), :]
    kswin_hbm = kso_ref.at[pl.ds(layer, 1), pl.ds(b, 1), :,
                           pl.ds(s_aligned, swin)]
    vswin_hbm = vso_ref.at[pl.ds(layer, 1), pl.ds(b, 1), :,
                           pl.ds(s_aligned, swin)]
    loads = [pltpu.make_async_copy(kwin_hbm, kwin, sem_w.at[0]),
             pltpu.make_async_copy(vwin_hbm, vwin, sem_w.at[1]),
             pltpu.make_async_copy(kswin_hbm, kswin, sem_w.at[2]),
             pltpu.make_async_copy(vswin_hbm, vswin, sem_w.at[3])]
    for cp in loads:
        cp.start()

    dma(0, 0, kbuf, ko_ref, sem_k).start()
    dma(0, 0, vbuf, vo_ref, sem_v).start()
    dma_s(0, 0, ksbuf, kso_ref, sem_ks).start()
    dma_s(0, 0, vsbuf, vso_ref, sem_vs).start()

    # ---- phase 2: append RMW (windows persist the new row to HBM) --------
    for cp in loads:
        cp.wait()
    row = length - aligned
    row_ids = jax.lax.broadcasted_iota(jnp.int32, kwin.shape, 3)
    kwin[:] = jnp.where(row_ids == row, kn_ref[:][None], kwin[:])
    vwin[:] = jnp.where(row_ids == row, vn_ref[:][None], vwin[:])
    s_row = length - s_aligned
    s_ids = jax.lax.broadcasted_iota(jnp.int32, kswin.shape, 3)
    kswin[:] = jnp.where(s_ids == s_row,
                         kns_ref[0, :, 0][None, None, :, None], kswin[:])
    vswin[:] = jnp.where(s_ids == s_row,
                         vns_ref[0, :, 0][None, None, :, None], vswin[:])
    stores = [pltpu.make_async_copy(kwin, kwin_hbm, sem_w.at[0]),
              pltpu.make_async_copy(vwin, vwin_hbm, sem_w.at[1]),
              pltpu.make_async_copy(kswin, kswin_hbm, sem_w.at[2]),
              pltpu.make_async_copy(vswin, vswin_hbm, sem_w.at[3])]
    for cp in stores:
        cp.start()

    # ---- attention over the valid prefix ----------------------------------
    # int8_dots: the decode attention loop is VMEM->MXU-stream and
    # VPU-cast bound, not HBM bound (decode_breakdown r5: 1.96 ms vs the
    # 0.89 ms HBM ideal; rate invariant to block_s). Casting the int8
    # K/V blocks to bf16 doubles the MXU row-stream bytes AND costs ~4 us
    # of VPU per block. Instead quantize the tiny operands: q per-head to
    # int8 once, and the probability row p (with the per-position V
    # scales folded in) per block — both dots then run the MXU's native
    # int8 path directly on the cache bytes.
    qf = q_ref[0, :, 0, :].astype(jnp.float32) * sm_scale  # (H, D)
    if int8_dots:
        q_absmax = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
        q_qscale = q_absmax / 127.0 + 1e-12
        q_i8 = jnp.round(qf / q_qscale).astype(jnp.int8)
    else:
        q = qf.astype(jnp.bfloat16)
    pb = length // block_s  # block whose DMA may hold the stale row

    m0 = jnp.full((h, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((h, 1), jnp.float32)
    acc0 = jnp.zeros((h, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)
        start = blk_start(i)

        @pl.when(i + 1 < nb)
        def _():
            nxt = jax.lax.rem(i + 1, 2)
            dma(nxt, i + 1, kbuf, ko_ref, sem_k).start()
            dma(nxt, i + 1, vbuf, vo_ref, sem_v).start()
            dma_s(nxt, i + 1, ksbuf, kso_ref, sem_ks).start()
            dma_s(nxt, i + 1, vsbuf, vso_ref, sem_vs).start()

        pltpu.make_async_copy(kbuf.at[pl.ds(slot, 1)],
                              kbuf.at[pl.ds(slot, 1)],
                              sem_k.at[slot]).wait()
        pltpu.make_async_copy(ksbuf.at[pl.ds(slot, 1)],
                              ksbuf.at[pl.ds(slot, 1)],
                              sem_ks.at[slot]).wait()

        for sl in (0, 1):
            @pl.when((i == pb) & (slot == sl))
            def _(sl=sl):
                # the appended row may predate the writeback in this
                # block's DMA — patch it from the kernel input
                rid = jax.lax.broadcasted_iota(
                    jnp.int32, kbuf.shape[1:], 2) + start
                kbuf[sl] = jnp.where(rid == length, kn_ref[:], kbuf[sl])

        if int8_dots:
            s = jax.lax.dot_general(
                q_i8[:, None, :], kbuf[slot, 0],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32
            )[:, 0, :].astype(jnp.float32) * q_qscale  # (H, BS)
        else:
            k = kbuf[slot, 0].astype(jnp.bfloat16)  # (H, BS, D)
            s = jax.lax.dot_general(
                q[:, None, :], k,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0, :]  # (H, BS)
        col = start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        # per-position K scales; col==length only in block pb — the
        # branch-free where doubles as the appended-scale patch (the
        # block's DMA may have raced the scale-window writeback)
        ks_blk = jnp.where(col == length, kns_ref[0, :, 0][:, None],
                           ksbuf[slot, 0])
        s = s * ks_blk
        # exact coverage: clamped blocks re-read rows the previous block
        # already processed — mask them out along with the invalid tail
        s = jnp.where((col >= i * block_s) & (col < n_valid), s, _NEG_INF)

        new_m = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - new_m)
        p = jnp.exp(s - new_m)  # (H, BS)

        pltpu.make_async_copy(vbuf.at[pl.ds(slot, 1)],
                              vbuf.at[pl.ds(slot, 1)],
                              sem_v.at[slot]).wait()
        pltpu.make_async_copy(vsbuf.at[pl.ds(slot, 1)],
                              vsbuf.at[pl.ds(slot, 1)],
                              sem_vs.at[slot]).wait()

        for sl in (0, 1):
            @pl.when((i == pb) & (slot == sl))
            def _(sl=sl):
                rid = jax.lax.broadcasted_iota(
                    jnp.int32, vbuf.shape[1:], 2) + start
                vbuf[sl] = jnp.where(rid == length, vn_ref[:], vbuf[sl])

        vs_blk = jnp.where(col == length, vns_ref[0, :, 0][:, None],
                           vsbuf[slot, 0])
        if int8_dots:
            ps = p * vs_blk  # (H, BS) f32, V scales folded in
            p_absmax = jnp.max(jnp.abs(ps), axis=-1, keepdims=True)
            p_qscale = p_absmax / 127.0 + 1e-12
            p_i8 = jnp.round(ps / p_qscale).astype(jnp.int8)
            pv = jax.lax.dot_general(
                p_i8[:, None, :], vbuf[slot, 0],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32
            )[:, 0, :].astype(jnp.float32) * p_qscale  # (H, D)
        else:
            v = vbuf[slot, 0].astype(jnp.bfloat16)  # (H, BS, D)
            p_scaled = (p * vs_blk).astype(jnp.bfloat16)
            pv = jax.lax.dot_general(
                p_scaled[:, None, :], v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0, :]  # (H, D)
        acc = acc * alpha + pv
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        return new_m, l, acc

    m, l, acc = jax.lax.fori_loop(0, nb, body, (m0, l0, acc0))
    for cp in stores:  # drain the append writeback
        cp.wait()
    out_ref[0, :, 0, :] = (acc / l).astype(out_ref.dtype)


def fused_decode_attention_q(*args, int8_dots: Optional[bool] = None,
                             **kwargs):
    """int8-cache fused append+attention (jitted core below).

    int8_dots (default: env LHRS_DECODE_INT8_DOTS=1, else off) runs the
    two attention dots on the int8 cache bytes directly (q and the
    probability row quantized per-head/per-block to int8) instead of
    casting K/V blocks to bf16 — see the _kernel_q comment for why. The
    env default resolves HERE, outside jit, so flipping the env var
    reaches a distinct compiled program."""
    if int8_dots is None:
        int8_dots = os.environ.get("LHRS_DECODE_INT8_DOTS", "0") == "1"
    return _fused_decode_attention_q(*args, int8_dots=bool(int8_dots),
                                     **kwargs)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "block_s", "interpret", "vmem_limit",
                     "int8_dots"))
def _fused_decode_attention_q(
    q: jnp.ndarray,        # (B, H, 1, D) current query (bf16/f32)
    k_new: jnp.ndarray,    # (B, H, 1, D) int8 quantized new key
    k_new_scale: jnp.ndarray,  # (B, H, 1) f32
    v_new: jnp.ndarray,    # (B, H, 1, D) int8
    v_new_scale: jnp.ndarray,  # (B, H, 1) f32
    k_cache: jnp.ndarray,  # (L, B, H, S, D) int8 — DONATE upstream
    v_cache: jnp.ndarray,
    k_scale: jnp.ndarray,  # (L, B, H, S) f32
    v_scale: jnp.ndarray,
    lengths: jnp.ndarray,  # (B,) int32
    layer: jnp.ndarray,    # () int32
    *,
    sm_scale: Optional[float] = None,
    block_s: int = 512,
    interpret: bool = False,
    vmem_limit: Optional[int] = None,
    int8_dots: bool = False,
):
    """int8-cache fused append+attention; returns (attn_out, k_cache,
    v_cache, k_scale, v_scale) with the caches aliased in place.

    block_s need not divide S: out-of-range tails slide the block start
    back (exact-coverage mask in the kernel), so the DMA granularity
    stays at the measured-efficient ~2 MB regardless of cache length."""
    nl, bsz, h, s, d = k_cache.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    block_s = min(block_s, s)
    windows = 32  # int8 sublane tile
    swin = 128   # scale-plane lane tile
    assert s % windows == 0 and s % swin == 0, (s,)
    assert block_s % windows == 0, (block_s, windows)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # layer, lengths
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, 1, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # q
            pl.BlockSpec((1, h, 1, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # k_new
            pl.BlockSpec((1, h, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # k_new_scale
            pl.BlockSpec((1, h, 1, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # v_new
            pl.BlockSpec((1, h, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # v_new_scale
            pl.BlockSpec(memory_space=pltpu.ANY),   # k_cache (aliased)
            pl.BlockSpec(memory_space=pltpu.ANY),   # v_cache
            pl.BlockSpec(memory_space=pltpu.ANY),   # k_scale
            pl.BlockSpec(memory_space=pltpu.ANY),   # v_scale
        ],
        out_specs=[
            pl.BlockSpec((1, h, 1, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # attn out
            pl.BlockSpec(memory_space=pltpu.ANY),   # k_cache out
            pl.BlockSpec(memory_space=pltpu.ANY),   # v_cache out
            pl.BlockSpec(memory_space=pltpu.ANY),   # k_scale out
            pl.BlockSpec(memory_space=pltpu.ANY),   # v_scale out
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 1, h, block_s, d), jnp.int8),    # kbuf
            pltpu.VMEM((2, 1, h, block_s, d), jnp.int8),    # vbuf
            pltpu.VMEM((2, 1, h, block_s), jnp.float32),    # ksbuf
            pltpu.VMEM((2, 1, h, block_s), jnp.float32),    # vsbuf
            pltpu.VMEM((1, 1, h, 32, d), jnp.int8),         # kwin
            pltpu.VMEM((1, 1, h, 32, d), jnp.int8),         # vwin
            pltpu.VMEM((1, 1, h, 128), jnp.float32),        # kswin
            pltpu.VMEM((1, 1, h, 128), jnp.float32),        # vswin
            pltpu.SemaphoreType.DMA((2,)),  # sem_k
            pltpu.SemaphoreType.DMA((2,)),  # sem_v
            pltpu.SemaphoreType.DMA((2,)),  # sem_ks
            pltpu.SemaphoreType.DMA((2,)),  # sem_vs
            pltpu.SemaphoreType.DMA((4,)),  # sem_w
        ],
    )
    kernel = functools.partial(_kernel_q, block_s=block_s, windows=windows,
                               swin=swin, sm_scale=float(sm_scale),
                               int8_dots=bool(int8_dots))
    out, k_out, v_out, ks_out, vs_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, jnp.int8),
            jax.ShapeDtypeStruct(v_cache.shape, jnp.int8),
            jax.ShapeDtypeStruct(k_scale.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_scale.shape, jnp.float32),
        ],
        # inputs counted including the two scalar-prefetch args
        input_output_aliases={7: 1, 8: 2, 9: 3, 10: 4},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=vmem_limit or (96 * 1024 * 1024)),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      lengths.astype(jnp.int32),
      q, k_new, k_new_scale, v_new, v_new_scale,
      k_cache, v_cache, k_scale, v_scale)
    return out, k_out, v_out, ks_out, vs_out
