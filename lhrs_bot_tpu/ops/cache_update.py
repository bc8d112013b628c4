"""In-place KV-cache row write (Pallas, aliased output).

The decode step appends one (H, D) row per sequence into the (B, H, S, D)
cache at a per-row position. The XLA formulation (`jnp.where` over a
broadcast position mask) reads and rewrites the whole cache every step —
~16 MB/layer/step at S=512 and growing linearly with context. This kernel
writes only the touched row: the cache aliases the output buffer
(input_output_aliases) and each program DMAs its (H, 1, D) slab from VMEM
into the HBM-resident cache at a scalar-prefetched offset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _write_kernel(pos_ref, new_ref, cache_ref, out_ref, scratch, sem):
    # grid: (B,) — one program per sequence. The cache stays in ANY/HBM as
    # the full array (TPU lowering requires trivial blocking there). HBM
    # slices along the sublane-tiled S dim must be 8-aligned, so the write
    # is a read-modify-write of the aligned 8-row window around `pos`
    # (~64 KB/seq/layer instead of the full cache).
    del cache_ref  # aliased with out_ref
    i = pl.program_id(0)
    pos = pos_ref[i]
    aligned = pl.multiple_of((pos // 8) * 8, 8)

    window = out_ref.at[pl.ds(i, 1), :, pl.ds(aligned, 8), :]
    dma_in = pltpu.make_async_copy(window, scratch, sem)
    dma_in.start()
    dma_in.wait()

    off = pos - aligned
    row_ids = jax.lax.broadcasted_iota(jnp.int32, scratch.shape, 2)
    scratch[:] = jnp.where(row_ids == off, new_ref[:], scratch[:])

    dma_out = pltpu.make_async_copy(scratch, window, sem)
    dma_out.start()
    dma_out.wait()


def cache_row_update(cache: jnp.ndarray, new_vals: jnp.ndarray,
                     lengths: jnp.ndarray, *,
                     interpret: bool = False) -> jnp.ndarray:
    """cache (B, H, S, D); new_vals (B, H, 1, D); lengths (B,) int32 →
    cache with new_vals[b] written at [b, :, lengths[b], :], in place
    (the input cache buffer is donated via aliasing)."""
    b, h, s, d = cache.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, 1, d), lambda i, pos: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # new row
            pl.BlockSpec(memory_space=pltpu.ANY),  # cache (aliased, HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((1, h, 8, d), cache.dtype),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _write_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={2: 0},  # cache input (after scalars) → output
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lengths.astype(jnp.int32), new_vals.astype(cache.dtype), cache)
