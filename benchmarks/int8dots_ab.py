"""A/B the fused decode attention int8_dots variant on chip (r5).

The r5 decomposition showed the decode attention loop is VMEM->MXU-stream
and VPU-cast bound (1.96 ms vs the 0.89 ms HBM ideal, invariant to
block_s): casting the int8 K/V blocks to bf16 doubles the MXU row-stream
bytes and burns VPU. int8_dots quantizes q (per-head) and the probability
row (per-block) to int8 so both dots run natively on the cache bytes.

Measures, at the B=1 S=2304 parity geometry:
  1. attention-only kernel scan, int8_dots off vs on;
  2. the full W4A8+lm8 decode step, off vs on (the BENCH headline config);
  3. a one-step numerical sanity fetch (off vs on outputs).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo/benchmarks")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from decode_breakdown import (  # noqa: E402
    attn_scan, decode_scan, int8_cache, make_params, time_step,
    H, D, L, STEPS, d, ffn, V)

B, SMAX, L0 = 1, 2304, 2192
kv_bytes = L * B * H * (L0 + STEPS // 2) * D * 2
sc_bytes = L * B * H * (L0 + STEPS // 2) * 4 * 2
report = {}

q = jnp.ones((B, H, 1, D), jnp.bfloat16)
for flag in (False, True):
    run_a = jax.jit(
        lambda c, q, flag=flag: attn_scan(
            c, q, L0, B, kernel_kwargs={"int8_dots": flag}),
        donate_argnums=(0,))
    dt = time_step(run_a, int8_cache(B, SMAX), q)
    tag = "attn_int8dots" if flag else "attn_bf16dots"
    report[f"{tag}_ms"] = round(dt * 1e3, 3)
    report[f"{tag}_eff_gbs"] = round((kv_bytes + sc_bytes) / dt / 1e9, 1)
    print(f"{tag}: {dt*1e3:.3f} ms/step "
          f"({(kv_bytes+sc_bytes)/dt/1e9:.0f} GB/s eff)", flush=True)

# numerical sanity: one fused call off vs on, real random cache
from lhrs_bot_tpu.ops.fused_decode import fused_decode_attention_q  # noqa
from lhrs_bot_tpu.ops.quant import quantize_activation  # noqa

rng = np.random.default_rng(0)
kc_f = jnp.asarray(rng.normal(size=(1, B, H, 512, D)), jnp.bfloat16)
vc_f = jnp.asarray(rng.normal(size=(1, B, H, 512, D)), jnp.bfloat16)
kc, ks4 = quantize_activation(kc_f)
vc, vs4 = quantize_activation(vc_f)
qq = jnp.asarray(rng.normal(size=(B, H, 1, D)), jnp.bfloat16)
kn, kns = quantize_activation(jnp.asarray(
    rng.normal(size=(B, H, 1, D)), jnp.bfloat16))
vn, vns = quantize_activation(jnp.asarray(
    rng.normal(size=(B, H, 1, D)), jnp.bfloat16))
lens = jnp.asarray([384], jnp.int32)
outs = {}
for flag in (False, True):
    o, *_ = fused_decode_attention_q(
        qq, kn, kns[..., 0], vn, vns[..., 0], kc, vc,
        ks4[..., 0], vs4[..., 0], lens, jnp.int32(0), int8_dots=flag)
    outs[flag] = np.asarray(o, np.float32)
err = float(np.max(np.abs(outs[True] - outs[False])))
report["onechip_max_abs_diff"] = round(err, 5)
print(f"on-chip one-call max|diff| int8_dots on-vs-off: {err:.5f}",
      flush=True)

# full W4A8 decode step, the BENCH headline config
params = make_params(bits="4h", lm8=True)
mat_elems = sum(int(np.prod(s)) for s in
                [(L, d, d)] * 4 + [(L, d, ffn)] * 2 + [(L, ffn, d)])
wb = mat_elems // 2 + V * d * 3
import lhrs_bot_tpu.ops.fused_decode as fd  # noqa: E402
import os  # noqa: E402

for flag in (False, True):
    os.environ["LHRS_DECODE_INT8_DOTS"] = "1" if flag else "0"
    run = jax.jit(lambda p, c, t: decode_scan(p, c, t, L0, B),
                  donate_argnums=(1,))
    tok0 = jnp.zeros((B,), jnp.int32)
    dt = time_step(run, params, int8_cache(B, SMAX), tok0)
    tag = "total_w4h_int8dots" if flag else "total_w4h_bf16dots"
    report[f"{tag}_ms"] = round(dt * 1e3, 3)
    report[f"{tag}_tok_s"] = round(1 / dt, 1)
    report[f"{tag}_eff_gbs"] = round(
        (wb + kv_bytes + sc_bytes) / dt / 1e9, 1)
    print(f"{tag}: {dt*1e3:.2f} ms/step ({1/dt:.1f} tok/s)", flush=True)

print(json.dumps(report))
