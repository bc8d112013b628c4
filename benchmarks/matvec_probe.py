"""Decode weight-stream probe: which matvec formulation streams int8
weights fastest? (VERDICT r3 #1 — weights-only decode is 10.45 ms/step,
670 GB/s eff of ~820 measured peak.)

Hypothesis: `quantized_matmul` (bf16 activations x int8 weights) pays a
VPU int8->bf16 convert on EVERY weight byte (~6.5 GB/step -> ~1.5-2 ms),
while `w8a8_matmul` feeds the MXU int8 natively (no big-operand convert).

Variants, each a lax.scan over L=32 stacked decode layers (7 matmuls with
residual chaining so nothing DCEs), repeated STEPS times:
  a) qmm      : quantized_matmul (production today)
  b) w8a8     : dynamic per-token activation int8 + int8x int8 dot
  c) w8a8_fused: same but QKV fused to (d,3d) and gate+up to (d,2f)
                 (4 dispatches/layer instead of 7)
Timing ends with a host fetch (tunnel block_until_ready returns early).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from lhrs_bot_tpu.ops.quant import (
    quantize_int8, quantized_matmul, w8a8_matmul)

d, ffn, L = 4096, 11008, 32
STEPS = 16


def qinit(key, shape):
    f = jax.jit(lambda k: quantize_int8(
        jax.random.normal(k, shape, jnp.bfloat16) * 0.02, axis=1))
    out = f(key)
    jax.block_until_ready(out.q)
    return out


def time_it(fn, *args, reps=3):
    float(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / STEPS


def layer_chain(matmul):
    def layer(x, w):
        a = matmul(x, w["wq"]) + matmul(x, w["wk"]) + matmul(x, w["wv"])
        x = x + matmul(a, w["wo"])
        h = matmul(x, w["w_gate"]) * jax.nn.sigmoid(matmul(x, w["w_up"]))
        return x + matmul(h, w["w_down"]), None

    def run(ws, x0):
        def step(x, _):
            x, _ = jax.lax.scan(layer, x, ws)
            return x * (0.5 / jnp.maximum(jnp.max(jnp.abs(x)), 1e-3)), None
        x, _ = jax.lax.scan(step, x0, None, length=STEPS)
        return jnp.sum(x.astype(jnp.float32))
    return run


def fused_chain(matmul):
    def layer(x, w):
        a = matmul(x, w["wqkv"])[:, :d]
        x = x + matmul(a, w["wo"])
        gu = matmul(x, w["w_gateup"])
        h = gu[:, :ffn] * jax.nn.sigmoid(gu[:, ffn:])
        return x + matmul(h, w["w_down"]), None

    def run(ws, x0):
        def step(x, _):
            x, _ = jax.lax.scan(layer, x, ws)
            return x * (0.5 / jnp.maximum(jnp.max(jnp.abs(x)), 1e-3)), None
        x, _ = jax.lax.scan(step, x0, None, length=STEPS)
        return jnp.sum(x.astype(jnp.float32))
    return run


def main():
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    ws = {
        "wq": qinit(keys[0], (L, d, d)),
        "wk": qinit(keys[1], (L, d, d)),
        "wv": qinit(keys[2], (L, d, d)),
        "wo": qinit(keys[3], (L, d, d)),
        "w_gate": qinit(keys[4], (L, d, ffn)),
        "w_up": qinit(keys[5], (L, d, ffn)),
        "w_down": qinit(keys[6], (L, ffn, d)),
    }
    x0 = jnp.ones((1, d), jnp.bfloat16) * 0.01
    bytes_step = L * (4 * d * d + 3 * d * ffn)

    out = {}
    for name, mk in (("qmm", layer_chain(quantized_matmul)),
                     ("w8a8", layer_chain(w8a8_matmul))):
        dt = time_it(jax.jit(mk), ws, x0)
        out[f"{name}_ms"] = round(dt * 1e3, 3)
        out[f"{name}_gbs"] = round(bytes_step / dt / 1e9, 1)
        print(f"{name}: {dt*1e3:.2f} ms/pass ({bytes_step/dt/1e9:.0f} GB/s)",
              flush=True)

    wsf = {
        "wqkv": qinit(keys[0], (L, d, 3 * d)),
        "wo": ws["wo"],
        "w_gateup": qinit(keys[4], (L, d, 2 * ffn)),
        "w_down": ws["w_down"],
    }
    dt = time_it(jax.jit(fused_chain(w8a8_matmul)), wsf, x0)
    out["w8a8_fused_ms"] = round(dt * 1e3, 3)
    out["w8a8_fused_gbs"] = round(bytes_step / dt / 1e9, 1)
    print(f"w8a8_fused: {dt*1e3:.2f} ms/pass "
          f"({bytes_step/dt/1e9:.0f} GB/s)", flush=True)
    dt = time_it(jax.jit(fused_chain(quantized_matmul)), wsf, x0)
    out["qmm_fused_ms"] = round(dt * 1e3, 3)
    out["qmm_fused_gbs"] = round(bytes_step / dt / 1e9, 1)
    print(f"qmm_fused: {dt*1e3:.2f} ms/pass "
          f"({bytes_step/dt/1e9:.0f} GB/s)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
