"""Fused paged decode attention + page append (Pallas, in-place HBM pool).

The paged serving path stored KV in a shared page pool and ran decode
attention through JAX's bundled paged-attention kernel; measured at the
7B serving geometry (7 slots, int8, 2304 ctx) that kernel costs ~83 ms
of a 93 ms step — ~1.8 GB/s effective on ~150 MB of reads
(benchmarks/paged_probe.py), 3.5x slower end-to-end than the contiguous
scheduler. This kernel ports the fused contiguous decode design
(ops/fused_decode.py) to page-table indirection:

  * pools live in HBM with layout (L, N_pages, H, page, D) — one PAGE is
    one dense (H, page, D) block, so a single async copy streams a whole
    page (512 KB at 7B/int8/page=128) instead of the bundled kernel's
    per-(head, page) fragments; pages are >= 128 tokens so every in-kernel
    block keeps a full 128-lane register (Mosaic cannot reshape or
    batch-dot (H, page) blocks below that — measured at page=64);
  * per (layer, seq) program: the new token's K/V row is read-modify-
    written into a sublane-aligned window of its page (the page id comes
    from the scalar-prefetched page table), overlapped with attention;
  * attention streams the sequence's VALID pages j = 0..ceil(len+1/page)
    through a deep DMA ring (NBUF pages in flight), online softmax per
    page, heads batched on the MXU — no null-page reads, no gather, no
    pool copy;
  * int8 pools carry per-vector f32 scale pages; dequantization folds
    into the online softmax (scores *= k_scale, probs *= v_scale) so
    pool reads stay at 1 byte/element.

The layer index is a traced scalar (scalar-prefetch) and the pools alias
in/out, so the decode scan keeps the pool as a zero-copy loop carry
exactly like the contiguous cache (models/llama.py:393-405).

Replaces the decode half of the reference's HF dynamic cache
(/root/reference/lhrs/models/text_modal.py:36-60) for the paged serving
backend; the reference has no serving stack at all.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_NBUF = 8  # pages in flight per tensor


def _kernel_pq(layer_ref, len_ref, table_ref,
               q_ref, kn_ref, kns_ref, vn_ref, vns_ref,
               kc_ref, vc_ref, ksc_ref, vsc_ref,
               out_ref, ko_ref, vo_ref, kso_ref, vso_ref,
               kbuf, vbuf, ksbuf, vsbuf, kwin, vwin, kswin, vswin,
               sem_k, sem_v, sem_ks, sem_vs, sem_w,
               *, page: int, win: int, sm_scale: float):
    """int8 pools. Refs: pools (L, N, H, page, D) int8 + scale pools
    (L, N, H, page) f32, all aliased with their outputs."""
    del kc_ref, vc_ref, ksc_ref, vsc_ref  # access via aliased outputs
    b = pl.program_id(0)
    layer = layer_ref[0]
    length = len_ref[b]
    n_valid = length + 1
    pps = table_ref.shape[1]
    np_valid = pl.cdiv(n_valid, page)  # pages to stream (>= 1)

    # ---- append target ----------------------------------------------------
    ap_j = jnp.minimum(length // page, pps - 1)
    ap_pg = table_ref[b, ap_j]
    off = length - ap_j * page
    aligned = pl.multiple_of((off // win) * win, win)

    kwin_hbm = ko_ref.at[pl.ds(layer, 1), pl.ds(ap_pg, 1), :,
                         pl.ds(aligned, win), :]
    vwin_hbm = vo_ref.at[pl.ds(layer, 1), pl.ds(ap_pg, 1), :,
                         pl.ds(aligned, win), :]
    kswin_hbm = kso_ref.at[pl.ds(layer, 1), pl.ds(ap_pg, 1), :, :]
    vswin_hbm = vso_ref.at[pl.ds(layer, 1), pl.ds(ap_pg, 1), :, :]
    loads = [pltpu.make_async_copy(kwin_hbm, kwin, sem_w.at[0]),
             pltpu.make_async_copy(vwin_hbm, vwin, sem_w.at[1]),
             pltpu.make_async_copy(kswin_hbm, kswin, sem_w.at[2]),
             pltpu.make_async_copy(vswin_hbm, vswin, sem_w.at[3])]
    for cp in loads:
        cp.start()

    # ---- prime the page ring ----------------------------------------------
    def dma(slot, j, buf, src, sem):
        pg = table_ref[b, jnp.minimum(j, pps - 1)]
        return pltpu.make_async_copy(
            src.at[pl.ds(layer, 1), pl.ds(pg, 1), :, :, :],
            buf.at[pl.ds(slot, 1)], sem.at[slot])

    def dma_s(slot, j, buf, src, sem):
        pg = table_ref[b, jnp.minimum(j, pps - 1)]
        return pltpu.make_async_copy(
            src.at[pl.ds(layer, 1), pl.ds(pg, 1), :, :],
            buf.at[pl.ds(slot, 1)], sem.at[slot])

    for j in range(_NBUF):  # static unroll; only valid pages are issued
        @pl.when(j < np_valid)
        def _(j=j):
            dma(j, j, kbuf, ko_ref, sem_k).start()
            dma(j, j, vbuf, vo_ref, sem_v).start()
            dma_s(j, j, ksbuf, kso_ref, sem_ks).start()
            dma_s(j, j, vsbuf, vso_ref, sem_vs).start()

    # ---- append RMW (overlapped with the stream) ---------------------------
    for cp in loads:
        cp.wait()
    row = off - aligned
    row_ids = jax.lax.broadcasted_iota(jnp.int32, kwin.shape, 3)
    kwin[:] = jnp.where(row_ids == row, kn_ref[:][None], kwin[:])
    vwin[:] = jnp.where(row_ids == row, vn_ref[:][None], vwin[:])
    s_ids = jax.lax.broadcasted_iota(jnp.int32, kswin.shape, 3)
    kswin[:] = jnp.where(s_ids == off,
                         kns_ref[0, :, 0][None, None, :, None], kswin[:])
    vswin[:] = jnp.where(s_ids == off,
                         vns_ref[0, :, 0][None, None, :, None], vswin[:])
    stores = [pltpu.make_async_copy(kwin, kwin_hbm, sem_w.at[0]),
              pltpu.make_async_copy(vwin, vwin_hbm, sem_w.at[1]),
              pltpu.make_async_copy(kswin, kswin_hbm, sem_w.at[2]),
              pltpu.make_async_copy(vswin, vswin_hbm, sem_w.at[3])]
    for cp in stores:
        cp.start()

    # ---- stream valid pages, online softmax per page ----------------------
    h, _, d = q_ref.shape[1:]
    q = (q_ref[0, :, 0, :].astype(jnp.float32) * sm_scale).astype(
        jnp.bfloat16)  # (H, D)

    m0 = jnp.full((h, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((h, 1), jnp.float32)
    acc0 = jnp.zeros((h, d), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        slot = jax.lax.rem(j, _NBUF)

        @pl.when(j + _NBUF < np_valid)
        def _():
            dma(slot, j + _NBUF, kbuf, ko_ref, sem_k).start()
            dma(slot, j + _NBUF, vbuf, vo_ref, sem_v).start()
            dma_s(slot, j + _NBUF, ksbuf, kso_ref, sem_ks).start()
            dma_s(slot, j + _NBUF, vsbuf, vso_ref, sem_vs).start()

        pltpu.make_async_copy(kbuf.at[pl.ds(slot, 1)],
                              kbuf.at[pl.ds(slot, 1)],
                              sem_k.at[slot]).wait()
        pltpu.make_async_copy(ksbuf.at[pl.ds(slot, 1)],
                              ksbuf.at[pl.ds(slot, 1)],
                              sem_ks.at[slot]).wait()

        # the append page's DMA may have raced the window writeback —
        # patch the appended row/scale from the kernel inputs
        @pl.when(j == ap_j)
        def _():
            rid = jax.lax.broadcasted_iota(jnp.int32, kbuf.shape[1:], 2)
            kbuf[slot] = jnp.where(rid == off, kn_ref[:], kbuf[slot])
            sid = jax.lax.broadcasted_iota(jnp.int32, ksbuf.shape[1:], 2)
            ksbuf[slot] = jnp.where(sid == off, kns_ref[0, :, 0][:, None],
                                    ksbuf[slot])

        k = kbuf[slot, 0].astype(jnp.bfloat16)  # (H, page, D)
        # scores: H-batched (1, D) x (D, page) on the MXU — the exact
        # formulation of the contiguous kernel (fused_decode.py:110-113).
        # Mosaic can only lane-reshape (H, page) <-> (H, 1, page) when
        # page >= 128, hence the page-size floor in the wrapper.
        s = jax.lax.dot_general(
            q[:, None, :], k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]  # (H, page)
        s = s * ksbuf[slot, 0]
        col = j * page + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, _NEG_INF)

        new_m = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - new_m)
        p = jnp.exp(s - new_m)  # (H, page)

        pltpu.make_async_copy(vbuf.at[pl.ds(slot, 1)],
                              vbuf.at[pl.ds(slot, 1)],
                              sem_v.at[slot]).wait()
        pltpu.make_async_copy(vsbuf.at[pl.ds(slot, 1)],
                              vsbuf.at[pl.ds(slot, 1)],
                              sem_vs.at[slot]).wait()

        @pl.when(j == ap_j)
        def _():
            rid = jax.lax.broadcasted_iota(jnp.int32, vbuf.shape[1:], 2)
            vbuf[slot] = jnp.where(rid == off, vn_ref[:], vbuf[slot])
            sid = jax.lax.broadcasted_iota(jnp.int32, vsbuf.shape[1:], 2)
            vsbuf[slot] = jnp.where(sid == off, vns_ref[0, :, 0][:, None],
                                    vsbuf[slot])

        v = vbuf[slot, 0].astype(jnp.bfloat16)  # (H, page, D)
        p_scaled = (p * vsbuf[slot, 0]).astype(jnp.bfloat16)
        pv = jax.lax.dot_general(
            p_scaled[:, None, :], v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]  # (H, D)
        acc = acc * alpha + pv
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        return new_m, l, acc

    m, l, acc = jax.lax.fori_loop(0, np_valid, body, (m0, l0, acc0))
    for cp in stores:  # drain the append writeback
        cp.wait()
    out_ref[0, :, 0, :] = (acc / l).astype(out_ref.dtype)


def _kernel_p(layer_ref, len_ref, table_ref,
              q_ref, kn_ref, vn_ref,
              kc_ref, vc_ref,
              out_ref, ko_ref, vo_ref,
              kbuf, vbuf, kwin, vwin,
              sem_k, sem_v, sem_w,
              *, page: int, win: int, sm_scale: float):
    """bf16/f32 pools — same ring, no scale planes."""
    del kc_ref, vc_ref
    b = pl.program_id(0)
    layer = layer_ref[0]
    length = len_ref[b]
    n_valid = length + 1
    pps = table_ref.shape[1]
    np_valid = pl.cdiv(n_valid, page)

    ap_j = jnp.minimum(length // page, pps - 1)
    ap_pg = table_ref[b, ap_j]
    off = length - ap_j * page
    aligned = pl.multiple_of((off // win) * win, win)

    kwin_hbm = ko_ref.at[pl.ds(layer, 1), pl.ds(ap_pg, 1), :,
                         pl.ds(aligned, win), :]
    vwin_hbm = vo_ref.at[pl.ds(layer, 1), pl.ds(ap_pg, 1), :,
                         pl.ds(aligned, win), :]
    loads = [pltpu.make_async_copy(kwin_hbm, kwin, sem_w.at[0]),
             pltpu.make_async_copy(vwin_hbm, vwin, sem_w.at[1])]
    for cp in loads:
        cp.start()

    def dma(slot, j, buf, src, sem):
        pg = table_ref[b, jnp.minimum(j, pps - 1)]
        return pltpu.make_async_copy(
            src.at[pl.ds(layer, 1), pl.ds(pg, 1), :, :, :],
            buf.at[pl.ds(slot, 1)], sem.at[slot])

    for j in range(_NBUF):
        @pl.when(j < np_valid)
        def _(j=j):
            dma(j, j, kbuf, ko_ref, sem_k).start()
            dma(j, j, vbuf, vo_ref, sem_v).start()

    for cp in loads:
        cp.wait()
    row = off - aligned
    row_ids = jax.lax.broadcasted_iota(jnp.int32, kwin.shape, 3)
    kwin[:] = jnp.where(row_ids == row, kn_ref[:][None], kwin[:])
    vwin[:] = jnp.where(row_ids == row, vn_ref[:][None], vwin[:])
    stores = [pltpu.make_async_copy(kwin, kwin_hbm, sem_w.at[0]),
              pltpu.make_async_copy(vwin, vwin_hbm, sem_w.at[1])]
    for cp in stores:
        cp.start()

    h, _, d = q_ref.shape[1:]
    compute_t = jnp.float32 if q_ref.dtype == jnp.float32 else jnp.bfloat16
    q = (q_ref[0, :, 0, :].astype(jnp.float32) * sm_scale).astype(compute_t)

    m0 = jnp.full((h, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((h, 1), jnp.float32)
    acc0 = jnp.zeros((h, d), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        slot = jax.lax.rem(j, _NBUF)

        @pl.when(j + _NBUF < np_valid)
        def _():
            dma(slot, j + _NBUF, kbuf, ko_ref, sem_k).start()
            dma(slot, j + _NBUF, vbuf, vo_ref, sem_v).start()

        pltpu.make_async_copy(kbuf.at[pl.ds(slot, 1)],
                              kbuf.at[pl.ds(slot, 1)],
                              sem_k.at[slot]).wait()

        @pl.when(j == ap_j)
        def _():
            rid = jax.lax.broadcasted_iota(jnp.int32, kbuf.shape[1:], 2)
            kbuf[slot] = jnp.where(rid == off, kn_ref[:], kbuf[slot])

        k = kbuf[slot, 0].astype(compute_t)  # (H, page, D)
        s = jax.lax.dot_general(
            q[:, None, :], k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]  # (H, page)
        col = j * page + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, _NEG_INF)

        new_m = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - new_m)
        p = jnp.exp(s - new_m)

        pltpu.make_async_copy(vbuf.at[pl.ds(slot, 1)],
                              vbuf.at[pl.ds(slot, 1)],
                              sem_v.at[slot]).wait()

        @pl.when(j == ap_j)
        def _():
            rid = jax.lax.broadcasted_iota(jnp.int32, vbuf.shape[1:], 2)
            vbuf[slot] = jnp.where(rid == off, vn_ref[:], vbuf[slot])

        v = vbuf[slot, 0].astype(compute_t)
        pv = jax.lax.dot_general(
            p.astype(compute_t)[:, None, :], v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]
        acc = acc * alpha + pv
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        return new_m, l, acc

    m, l, acc = jax.lax.fori_loop(0, np_valid, body, (m0, l0, acc0))
    for cp in stores:
        cp.wait()
    out_ref[0, :, 0, :] = (acc / l).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "interpret", "vmem_limit"))
def paged_fused_decode_q(
    q: jnp.ndarray,            # (B, H, 1, D) query (bf16/f32)
    k_new: jnp.ndarray,        # (B, H, 1, D) int8 new key row
    k_new_scale: jnp.ndarray,  # (B, H, 1) f32
    v_new: jnp.ndarray,        # (B, H, 1, D) int8
    v_new_scale: jnp.ndarray,  # (B, H, 1) f32
    k_pages: jnp.ndarray,      # (L, N, H, page, D) int8 — DONATE upstream
    v_pages: jnp.ndarray,
    k_scale_pages: jnp.ndarray,  # (L, N, H, page) f32
    v_scale_pages: jnp.ndarray,
    page_table: jnp.ndarray,   # (B, pages_per_seq) int32
    lengths: jnp.ndarray,      # (B,) int32 valid entries BEFORE the append
    layer: jnp.ndarray,        # () int32
    *,
    sm_scale: Optional[float] = None,
    interpret: bool = False,
    vmem_limit: Optional[int] = None,
) -> Tuple[jnp.ndarray, ...]:
    """Fused append+attention over the int8 page pool. Returns
    (attn_out (B,H,1,D), k_pages, v_pages, k_scale_pages, v_scale_pages)
    with the pools aliased in place."""
    nl, n, h, page, d = k_pages.shape
    bsz = q.shape[0]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    win = 32  # int8 sublane tile
    if page % win:
        raise ValueError(f"page_size {page} must be a multiple of {win}")
    if not interpret and page < 128:
        # Mosaic cannot lane-reshape (H, page) <-> (H, 1, page) below one
        # full 128-lane register (measured: "unsupported shape cast" /
        # dot-attr parse failures at page=64); serve/paged.py defaults to
        # page_size=128 and the XLA reference path covers smaller pages.
        raise ValueError(
            f"page_size {page} < 128 unsupported by the fused TPU kernel")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # layer, lengths, page_table
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
            pl.BlockSpec(memory_space=pltpu.ANY),   # k_pages (aliased)
            pl.BlockSpec(memory_space=pltpu.ANY),   # v_pages
            pl.BlockSpec(memory_space=pltpu.ANY),   # k_scale_pages
            pl.BlockSpec(memory_space=pltpu.ANY),   # v_scale_pages
        ],
        out_specs=[
            pl.BlockSpec((1, h, 1, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # attn out
            pl.BlockSpec(memory_space=pltpu.ANY),   # k_pages out
            pl.BlockSpec(memory_space=pltpu.ANY),   # v_pages out
            pl.BlockSpec(memory_space=pltpu.ANY),   # k_scale out
            pl.BlockSpec(memory_space=pltpu.ANY),   # v_scale out
        ],
        scratch_shapes=[
            pltpu.VMEM((_NBUF, 1, h, page, d), jnp.int8),   # kbuf
            pltpu.VMEM((_NBUF, 1, h, page, d), jnp.int8),   # vbuf
            pltpu.VMEM((_NBUF, 1, h, page), jnp.float32),   # ksbuf
            pltpu.VMEM((_NBUF, 1, h, page), jnp.float32),   # vsbuf
            pltpu.VMEM((1, 1, h, win, d), jnp.int8),        # kwin
            pltpu.VMEM((1, 1, h, win, d), jnp.int8),        # vwin
            pltpu.VMEM((1, 1, h, page), jnp.float32),       # kswin
            pltpu.VMEM((1, 1, h, page), jnp.float32),       # vswin
            pltpu.SemaphoreType.DMA((_NBUF,)),  # sem_k
            pltpu.SemaphoreType.DMA((_NBUF,)),  # sem_v
            pltpu.SemaphoreType.DMA((_NBUF,)),  # sem_ks
            pltpu.SemaphoreType.DMA((_NBUF,)),  # sem_vs
            pltpu.SemaphoreType.DMA((4,)),      # sem_w
        ],
    )
    kernel = functools.partial(_kernel_pq, page=page, win=win,
                               sm_scale=float(sm_scale))
    out, k_out, v_out, ks_out, vs_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k_pages.shape, jnp.int8),
            jax.ShapeDtypeStruct(v_pages.shape, jnp.int8),
            jax.ShapeDtypeStruct(k_scale_pages.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_scale_pages.shape, jnp.float32),
        ],
        # inputs counted including the three scalar-prefetch args
        input_output_aliases={8: 1, 9: 2, 10: 3, 11: 4},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=vmem_limit or (100 * 1024 * 1024)),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      lengths.astype(jnp.int32), page_table.astype(jnp.int32),
      q, k_new, k_new_scale, v_new, v_new_scale,
      k_pages, v_pages, k_scale_pages, v_scale_pages)
    return out, k_out, v_out, ks_out, vs_out


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "interpret", "vmem_limit"))
def paged_fused_decode(
    q: jnp.ndarray,        # (B, H, 1, D)
    k_new: jnp.ndarray,    # (B, H, 1, D) pool dtype
    v_new: jnp.ndarray,
    k_pages: jnp.ndarray,  # (L, N, H, page, D) bf16/f32 — DONATE upstream
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,  # (B, pages_per_seq) int32
    lengths: jnp.ndarray,     # (B,) int32
    layer: jnp.ndarray,       # () int32
    *,
    sm_scale: Optional[float] = None,
    interpret: bool = False,
    vmem_limit: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """bf16/f32-pool fused append+attention; returns (attn_out, k_pages,
    v_pages) with the pools aliased in place."""
    nl, n, h, page, d = k_pages.shape
    bsz = q.shape[0]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    win = 8 if k_pages.dtype == jnp.float32 else 16
    if page % win:
        raise ValueError(f"page_size {page} must be a multiple of {win}")
    if not interpret and page < 128:
        raise ValueError(
            f"page_size {page} < 128 unsupported by the fused TPU kernel")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, 1, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # q
            pl.BlockSpec((1, h, 1, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # k_new
            pl.BlockSpec((1, h, 1, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # v_new
            pl.BlockSpec(memory_space=pltpu.ANY),   # k_pages (aliased)
            pl.BlockSpec(memory_space=pltpu.ANY),   # v_pages
        ],
        out_specs=[
            pl.BlockSpec((1, h, 1, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((_NBUF, 1, h, page, d), k_pages.dtype),  # kbuf
            pltpu.VMEM((_NBUF, 1, h, page, d), v_pages.dtype),  # vbuf
            pltpu.VMEM((1, 1, h, win, d), k_pages.dtype),       # kwin
            pltpu.VMEM((1, 1, h, win, d), v_pages.dtype),       # vwin
            pltpu.SemaphoreType.DMA((_NBUF,)),  # sem_k
            pltpu.SemaphoreType.DMA((_NBUF,)),  # sem_v
            pltpu.SemaphoreType.DMA((2,)),      # sem_w
        ],
    )
    kernel = functools.partial(_kernel_p, page=page, win=win,
                               sm_scale=float(sm_scale))
    out, k_out, v_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
        ],
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=vmem_limit or (100 * 1024 * 1024)),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      lengths.astype(jnp.int32), page_table.astype(jnp.int32),
      q, k_new.astype(k_pages.dtype), v_new.astype(v_pages.dtype),
      k_pages, v_pages)
    return out, k_out, v_out
