"""What read bandwidth is actually achievable on this chip?

The r2/r3 roofline used ~820 GB/s — the v5e SPEC number. Decode weight
streaming measures ~620-630 GB/s in every formulation (benchmarks/
matvec_probe.py: qmm == w8a8 == fused to within 2%), so either the
matvec path leaves bandwidth on the table or ~630 IS the practical wall.

Probes (16 reps each over a 1.44 GB int8 buffer + a bf16 twin):
  xla_sum     : jnp.sum reduction (XLA codegen read)
  pallas_read : double-buffered HBM->VMEM DMA + cheap running max
                (pure DMA read rate, 2 MB blocks)
  xla_copy    : y = x + 1 (read+write, counts 2x bytes)
Timing ends with a host fetch.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GB = 1024 ** 3
REPS = 8


def timed(fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS


def pallas_reader(x, block_rows, slots=2):
    n, cols = x.shape
    nb = n // block_rows

    def kern(x_ref, o_ref, buf, sem):
        def dma(slot, blk):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(blk * block_rows, block_rows)],
                buf.at[slot], sem.at[slot])

        for s in range(min(slots, nb)):
            dma(s, s).start()

        def body(i, acc):
            slot = jax.lax.rem(i, slots)

            @pl.when(i + slots < nb)
            def _():
                dma(slot, i + slots).start()

            pltpu.make_async_copy(buf.at[slot], buf.at[slot],
                                  sem.at[slot]).wait()
            return jnp.maximum(acc, jnp.max(
                buf[slot, :1, :].astype(jnp.float32)))

        o_ref[0] = jax.lax.fori_loop(0, nb, body, jnp.float32(-1e30))

    return pl.pallas_call(
        kern,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((slots, block_rows, cols), x.dtype),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def pallas_dual_reader(x, y, block_rows, slots=2):
    """Two interleaved streams (k+v style), separate semaphores."""
    n, cols = x.shape
    nb = n // block_rows

    def kern(x_ref, y_ref, o_ref, bufx, bufy, semx, semy):
        def dma(ref, buf, sem, slot, blk):
            return pltpu.make_async_copy(
                ref.at[pl.ds(blk * block_rows, block_rows)],
                buf.at[slot], sem.at[slot])

        for s in range(min(slots, nb)):
            dma(x_ref, bufx, semx, s, s).start()
            dma(y_ref, bufy, semy, s, s).start()

        def body(i, acc):
            slot = jax.lax.rem(i, slots)

            @pl.when(i + slots < nb)
            def _():
                dma(x_ref, bufx, semx, slot, i + slots).start()
                dma(y_ref, bufy, semy, slot, i + slots).start()

            pltpu.make_async_copy(bufx.at[slot], bufx.at[slot],
                                  semx.at[slot]).wait()
            pltpu.make_async_copy(bufy.at[slot], bufy.at[slot],
                                  semy.at[slot]).wait()
            return jnp.maximum(acc, jnp.max(
                bufx[slot, :1, :].astype(jnp.float32)) + jnp.max(
                bufy[slot, :1, :].astype(jnp.float32)))

        o_ref[0] = jax.lax.fori_loop(0, nb, body, jnp.float32(-1e30))

    return pl.pallas_call(
        kern,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((slots, block_rows, cols), x.dtype),
            pltpu.VMEM((slots, block_rows, cols), y.dtype),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(x, y)


def main():
    cols = 512
    rows8 = int(1.4 * GB) // cols
    rows8 -= rows8 % 2048
    x8 = jnp.ones((rows8, cols), jnp.int8)
    xb = jnp.ones((rows8 // 2, cols), jnp.bfloat16)
    out = {}

    def rep(fn, x):
        def f(x):
            def body(i, acc):
                return acc + fn(x, i)
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))
        return jax.jit(f), x

    # xla reduction read
    for name, x in (("int8", x8), ("bf16", xb)):
        f, xx = rep(lambda x, i: jnp.max(
            x + (i % 3).astype(x.dtype)).astype(jnp.float32), x)
        # i-dependent bias defeats CSE across reps
        dt = timed(f, xx)
        gbs = x.size * x.dtype.itemsize / dt / 1e9
        out[f"xla_max_{name}_gbs"] = round(gbs, 1)
        print(f"xla_max_{name}: {gbs:.0f} GB/s", flush=True)

    # pallas DMA read: block size x pipeline depth sweep (int8)
    for br, slots in ((4096, 2), (4096, 4), (8192, 2), (8192, 4),
                      (16384, 2), (16384, 4), (2048, 8)):
        f = jax.jit(lambda x, br=br, s=slots: jax.lax.fori_loop(
            0, REPS, lambda i, a: a + pallas_reader(x, br, s)[0], 0.0))
        dt = timed(f, x8)
        gbs = x8.size / dt / 1e9
        mb = br * 512 / 1e6
        out[f"pallas_read_b{mb:.0f}MB_s{slots}_gbs"] = round(gbs, 1)
        print(f"pallas_read block={mb:.1f}MB slots={slots}: "
              f"{gbs:.0f} GB/s", flush=True)

    # dual-stream (k+v style): two arrays, interleaved DMAs
    half = x8[:rows8 // 2]
    half2 = x8[rows8 // 2:]
    jax.block_until_ready((half, half2))
    for br, slots in ((4096, 2), (8192, 2), (4096, 4)):
        f = jax.jit(lambda a_, b_, br=br, s=slots: jax.lax.fori_loop(
            0, REPS, lambda i, a: a + pallas_dual_reader(a_, b_, br, s)[0],
            0.0))
        dt = timed(f, half, half2)
        gbs = x8.size / dt / 1e9
        mb = br * 512 / 1e6
        out[f"pallas_dual_b{mb:.0f}MB_s{slots}_gbs"] = round(gbs, 1)
        print(f"pallas_dual block={mb:.1f}MB slots={slots}: "
              f"{gbs:.0f} GB/s", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
