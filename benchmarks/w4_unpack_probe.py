"""A/B the W4A8 kernel's nibble-unpack strategies at 7B decode shapes.

The i32 unpack widens every packed byte to int32 (4x the vreg traffic)
and runs 3 shifts + 2 narrows; the i8 unpack stays in int8 vregs
(and/compare/select/sub are Mosaic-legal on vector<i8>, shifts are not)
and moves the exact /16 of the high-nibble dot into the int32
accumulator. If the kernel is VPU-unpack-bound rather than DMA-bound,
i8 should push the effective weight stream toward the ~670 GB/s wall.

Times a lax.scan over all 32 layers of one 7B-shaped projection family
per mode (host fetch at the end — block_until_ready lies through the
tunnel).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from lhrs_bot_tpu.ops.quant import quantize_int4h
from lhrs_bot_tpu.ops.w4_matmul import w4a8_matmul_stacked

L, K, N = 32, 4096, 11008  # w_up/w_gate shape: the biggest stream
B = 1
STEPS = 8  # scan repetitions of the full 32-layer sweep


def main():
    qt = jax.block_until_ready(jax.jit(
        lambda k: quantize_int4h(
            jax.random.normal(k, (L, K, N), jnp.bfloat16) * 0.02, axis=1)
    )(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    xlo = jnp.asarray(rng.integers(-127, 128, (B, K // 2)), jnp.int8)
    xhi = jnp.asarray(rng.integers(-127, 128, (B, K // 2)), jnp.int8)
    xs = jnp.ones((B, 1), jnp.float32)
    wbytes = qt.q.size  # packed int8 bytes moved per full-layer sweep

    report = {}
    for unpack in ("i32", "i8"):
        @jax.jit
        def run(xlo, xhi, xs, w, ws, unpack=unpack):
            def layers(carry, li):
                out = w4a8_matmul_stacked(xlo, xhi, xs, w, ws, li,
                                          unpack=unpack)
                return carry + jnp.sum(out.astype(jnp.float32)), None

            def step(carry, _):
                acc, _ = jax.lax.scan(layers, carry, jnp.arange(L))
                return acc, None

            acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=STEPS)
            return acc

        float(run(xlo, xhi, xs, qt.q, qt.scale))  # compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(xlo, xhi, xs, qt.q, qt.scale))
            times.append(time.perf_counter() - t0)
        dt = min(times) / STEPS  # per 32-layer sweep
        report[f"{unpack}_ms"] = round(dt * 1e3, 3)
        report[f"{unpack}_eff_gbs"] = round(wbytes / dt / 1e9, 1)
        print(f"unpack={unpack}: {dt*1e3:.3f} ms / 32-layer sweep "
              f"({wbytes/dt/1e9:.0f} GB/s packed stream)", flush=True)

    import json
    print(json.dumps(report))


if __name__ == "__main__":
    main()
