"""Where does the 7B int8 decode step spend its time? (VERDICT r3 #1)

Per-step cost decomposition at the 2304 parity context:
  total      : the production fused decode step (weights + attention)
  weights    : the same step on a tiny cache (attention traffic ~0) —
               isolates the XLA int8 matvec weight streaming
  attention  : a scan of ONLY the fused append+attention kernel over the
               full cache — isolates the Pallas kernel
Effective GB/s = bytes that MUST move / measured time; the gap to the
~820 GB/s measured-peak is the optimization budget.

All timings end with a host fetch (block_until_ready returns early
through the tunnel).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from lhrs_bot_tpu.models.llama import (
    KVCache, LlamaConfig, llama_decode_step)
from lhrs_bot_tpu.ops.quant import quantize_int8

cfg = LlamaConfig.llama2_7b()
d, ffn, L, V = (cfg.hidden_size, cfg.intermediate_size,
                cfg.num_hidden_layers, cfg.vocab_size)
H, D = cfg.num_attention_heads, cfg.head_dim
STEPS = 32


def qinit(key, shape, bits=8):
    from lhrs_bot_tpu.ops.quant import quantize_int4h

    qfn = quantize_int8 if bits == 8 else quantize_int4h
    f = jax.jit(lambda k: qfn(
        jax.random.normal(k, shape, jnp.bfloat16) * 0.02, axis=1))
    out = f(key)
    jax.block_until_ready(out.q)
    return out


def make_params(bits=8, lm8=False):
    keys = jax.random.split(jax.random.PRNGKey(0), 10)
    lm_head = jax.random.normal(keys[8], (d, V), jnp.bfloat16) * 0.02
    if lm8:
        lm_head = jax.block_until_ready(
            jax.jit(lambda w: quantize_int8(w, axis=0))(lm_head))
    return {
        "embed_tokens": jax.random.normal(keys[0], (V, d),
                                          jnp.bfloat16) * 0.02,
        "layers": {
            "input_norm": jnp.ones((L, d), jnp.bfloat16),
            "wq": qinit(keys[1], (L, d, d), bits),
            "wk": qinit(keys[2], (L, d, d), bits),
            "wv": qinit(keys[3], (L, d, d), bits),
            "wo": qinit(keys[4], (L, d, d), bits),
            "post_attn_norm": jnp.ones((L, d), jnp.bfloat16),
            "w_gate": qinit(keys[5], (L, d, ffn), bits),
            "w_up": qinit(keys[6], (L, d, ffn), bits),
            "w_down": qinit(keys[7], (L, ffn, d), bits),
        },
        "final_norm": jnp.ones((d,), jnp.bfloat16),
        "lm_head": lm_head,
    }


def int8_cache(B, SMAX):
    shape = (L, B, H, SMAX, D)
    mk8 = jax.jit(lambda k: jax.random.randint(k, shape, -127, 127,
                                               jnp.int8))
    mks = jax.jit(lambda k: jax.random.uniform(
        k, shape[:-1], jnp.float32, 0.01, 0.03))
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    zlen = jnp.zeros((B,), jnp.int32)
    return KVCache(mk8(ks[0]), mk8(ks[1]), zlen, mks(ks[2]), mks(ks[3]))


def time_step(fn, *args, reps=3):
    float(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / STEPS


def decode_scan(params, cache0, tok0, L0, B):
    cache = cache0._replace(length=jnp.full((B,), L0, jnp.int32))

    def body(carry, _):
        cache, tok = carry
        emb = jnp.take(params["embed_tokens"], tok[:, None], axis=0)
        logits, cache = llama_decode_step(params, cfg, cache,
                                          inputs_embeds=emb)
        return (cache, jnp.argmax(logits, -1).astype(jnp.int32)), tok

    (_, last), toks = jax.lax.scan(body, (cache, tok0), None, length=STEPS)
    return jnp.sum(toks) + jnp.sum(last)


def attn_scan(cache0, q, L0, B, kernel_kwargs=None):
    """STEPS x L calls of only the fused int8 append+attention kernel."""
    from lhrs_bot_tpu.ops.fused_decode import fused_decode_attention_q

    kw = kernel_kwargs or {}
    cache = cache0._replace(length=jnp.full((B,), L0, jnp.int32))
    kn = jnp.ones((B, H, 1, D), jnp.int8)
    kns = jnp.ones((B, H, 1), jnp.float32) * 0.02

    def step(carry, _):
        cache, acc = carry

        def layer_body(lcarry, layer_idx):
            k, v, ks, vs, acc = lcarry
            out, k, v, ks, vs = fused_decode_attention_q(
                q, kn, kns, kn, kns, k, v, ks, vs, cache.length,
                layer_idx, **kw)
            return (k, v, ks, vs, acc + jnp.sum(out)), None

        (k, v, ks, vs, acc), _ = jax.lax.scan(
            layer_body, (cache.k, cache.v, cache.k_scale, cache.v_scale,
                         acc), jnp.arange(L))
        cache = cache._replace(k=k, v=v, k_scale=ks, v_scale=vs,
                               length=cache.length + 1)
        return (cache, acc), None

    (cache, acc), _ = jax.lax.scan(step, (cache, jnp.float32(0)), None,
                                   length=STEPS)
    return acc


def main():
    B, SMAX, L0 = 1, 2304, 2192
    mat_elems = sum(int(np.prod(s)) for s in
                    [(L, d, d)] * 4 + [(L, d, ffn)] * 2 + [(L, ffn, d)])
    kv_bytes = L * B * H * (L0 + STEPS // 2) * D * 2  # int8 k+v
    sc_bytes = L * B * H * (L0 + STEPS // 2) * 4 * 2

    report = {}
    tok0 = jnp.zeros((B,), jnp.int32)

    def wbytes(bits, lm8):
        return (mat_elems // (1 if bits == 8 else 2)
                + V * d * (2 + (1 if lm8 else 2)))  # embed bf16 + head

    def run_total(tag, params, bits, lm8):
        wb = wbytes(bits, lm8)
        run = jax.jit(lambda p, c, t: decode_scan(p, c, t, L0, B),
                      donate_argnums=(1,))
        dt = time_step(run, params, int8_cache(B, SMAX), tok0)
        report[f"{tag}_ms"] = dt * 1e3
        report[f"{tag}_tok_s"] = 1 / dt
        report[f"{tag}_eff_gbs"] = (wb + kv_bytes + sc_bytes) / dt / 1e9
        print(f"{tag}: {dt*1e3:.2f} ms/step "
              f"({(wb+kv_bytes+sc_bytes)/dt/1e9:.0f} GB/s eff, "
              f"{1/dt:.1f} tok/s)", flush=True)
        return run

    # -- config 1: int8 weights, bf16 lm_head (r3 comparable) --------------
    params = make_params()
    run_total("total_w8", params, 8, False)

    # weights-only: tiny cache (attention+append traffic ~2 MB/step)
    run_w = jax.jit(lambda p, c, t: decode_scan(p, c, t, 8, B),
                    donate_argnums=(1,))
    dt_w = time_step(run_w, params, int8_cache(B, 64), tok0)
    report["weights_ms"] = dt_w * 1e3
    report["weights_eff_gbs"] = wbytes(8, False) / dt_w / 1e9
    print(f"weights-only (S=64): {dt_w*1e3:.2f} ms/step "
          f"({wbytes(8, False)/dt_w/1e9:.0f} GB/s eff)", flush=True)

    # attention-only at full context (the r4 overlap kernel)
    q = jnp.ones((B, H, 1, D), jnp.bfloat16)
    run_a = jax.jit(lambda c, q: attn_scan(c, q, L0, B),
                    donate_argnums=(0,))
    dt_a = time_step(run_a, int8_cache(B, SMAX), q)
    report["attn_ms"] = dt_a * 1e3
    report["attn_eff_gbs"] = (kv_bytes + sc_bytes) / dt_a / 1e9
    print(f"attention-only: {dt_a*1e3:.2f} ms/step "
          f"({(kv_bytes+sc_bytes)/dt_a/1e9:.0f} GB/s eff)", flush=True)
    del params

    # -- config 2: int8 weights + int8 lm_head ------------------------------
    params = make_params(lm8=True)
    run_total("total_w8_lm8", params, 8, True)
    del params

    # -- config 3: W4A8 halves-packed weights + int8 lm_head ----------------
    params = make_params(bits="4h", lm8=True)
    run_total("total_w4h_lm8", params, "4h", True)

    # weights-only at the int4 stream: does the Pallas W4A8 matvec itself
    # sustain the measured wall, or is the packed-halves stream slower?
    run_w4 = jax.jit(lambda p, c, t: decode_scan(p, c, t, 8, B),
                     donate_argnums=(1,))
    dt_w4 = time_step(run_w4, params, int8_cache(B, 64), tok0)
    report["weights_w4h_ms"] = dt_w4 * 1e3
    report["weights_w4h_eff_gbs"] = wbytes("4h", True) / dt_w4 / 1e9
    print(f"weights-only w4h+lm8 (S=64): {dt_w4*1e3:.2f} ms/step "
          f"({wbytes('4h', True)/dt_w4/1e9:.0f} GB/s eff)", flush=True)
    del params

    # -- attention kernel block_s sweep (the 1.71 ms vs 0.89 ms ideal gap:
    # is it DMA granularity / loop overhead?) -------------------------------
    for bs in (512, 1024, 2048):
        run_bs = jax.jit(
            lambda c, q, bs=bs: attn_scan(c, q, L0, B,
                                          kernel_kwargs={"block_s": bs}),
            donate_argnums=(0,))
        dt_bs = time_step(run_bs, int8_cache(B, SMAX), q)
        report[f"attn_bs{bs}_ms"] = dt_bs * 1e3
        report[f"attn_bs{bs}_eff_gbs"] = (kv_bytes + sc_bytes) / dt_bs / 1e9
        print(f"attention-only block_s={bs}: {dt_bs*1e3:.2f} ms/step "
              f"({(kv_bytes+sc_bytes)/dt_bs/1e9:.0f} GB/s eff)", flush=True)

    print("ideal @670GB/s measured wall (int8):",
          f"weights {wbytes(8, True)/670e9*1e3:.2f} ms,",
          f"attn {(kv_bytes+sc_bytes)/670e9*1e3:.2f} ms", flush=True)
    import json
    print(json.dumps({k: round(v, 2) for k, v in report.items()}))


if __name__ == "__main__":
    main()
