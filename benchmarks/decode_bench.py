"""7B decode tok/s: int8 weights (fits one chip), production scan path."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from lhrs_bot_tpu.models.llama import (
    KVCache, LlamaConfig, init_llama_params, llama_decode_step, llama_prefill)
from lhrs_bot_tpu.ops.quant import quantize_llama_layers

cfg = LlamaConfig.llama2_7b()
print("initializing 7B params directly as int8...", flush=True)
t0 = time.perf_counter()
from lhrs_bot_tpu.ops.quant import quantize_int8

def qinit(key, shape):
    # init + quantize one tensor at a time so the bf16 copy never
    # accumulates (13.5 GB bf16 + 6.7 GB int8 would not fit)
    f = jax.jit(lambda k: quantize_int8(
        jax.random.normal(k, shape, jnp.bfloat16) * 0.02, axis=1))
    return jax.block_until_ready(f(key))

d, ffn, L, V = (cfg.hidden_size, cfg.intermediate_size,
                cfg.num_hidden_layers, cfg.vocab_size)
keys = jax.random.split(jax.random.PRNGKey(0), 10)
params = {
    "embed_tokens": jax.random.normal(keys[0], (V, d), jnp.bfloat16) * 0.02,
    "layers": {
        "input_norm": jnp.ones((L, d), jnp.bfloat16),
        "wq": qinit(keys[1], (L, d, d)),
        "wk": qinit(keys[2], (L, d, d)),
        "wv": qinit(keys[3], (L, d, d)),
        "wo": qinit(keys[4], (L, d, d)),
        "post_attn_norm": jnp.ones((L, d), jnp.bfloat16),
        "w_gate": qinit(keys[5], (L, d, ffn)),
        "w_up": qinit(keys[6], (L, d, ffn)),
        "w_down": qinit(keys[7], (L, ffn, d)),
    },
    "final_norm": jnp.ones((d,), jnp.bfloat16),
    "lm_head": jax.random.normal(keys[8], (d, V), jnp.bfloat16) * 0.02,
}
params = jax.block_until_ready(params)
print(f"init+quant {time.perf_counter()-t0:.1f}s", flush=True)

T, SMAX, STEPS = 256, 512, 64

def make_run(B):
    def run(params, embeds):
        cache = KVCache.create(cfg, B, SMAX, dtype=jnp.bfloat16)
        logits, cache = llama_prefill(
            params, cfg, cache, inputs_embeds=embeds,
            prompt_len=jnp.full((B,), T, jnp.int32))
        tok0 = jnp.argmax(logits, -1).astype(jnp.int32)
        def body(carry, _):
            cache, tok = carry
            emb = jnp.take(params["embed_tokens"], tok[:, None], axis=0)
            logits, cache = llama_decode_step(params, cfg, cache, inputs_embeds=emb)
            return (cache, jnp.argmax(logits, -1).astype(jnp.int32)), tok
        (_, last), toks = jax.lax.scan(body, (cache, tok0), None, length=STEPS)
        return jnp.sum(toks) + jnp.sum(last)
    return jax.jit(run)

for B in (1, 8, 16, 32):
    embeds = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.hidden_size), jnp.bfloat16)
    run = make_run(B)
    t0 = time.perf_counter()
    s = float(run(params, embeds))
    print(f"B={B} compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    pre = jax.jit(lambda p, e: jnp.sum(llama_prefill(
        p, cfg, KVCache.create(cfg, B, SMAX, dtype=jnp.bfloat16),
        inputs_embeds=e, prompt_len=jnp.full((B,), T, jnp.int32))[0]))
    _ = float(pre(params, embeds))
    t0 = time.perf_counter()
    for _ in range(3): sp = float(pre(params, embeds))
    pre_dt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(3): s = float(run(params, embeds))
    dt = (time.perf_counter() - t0) / 3
    per_tok = (dt - pre_dt) / STEPS
    print(f"B={B}: prefill {pre_dt*1000:.0f} ms, decode {per_tok*1000:.2f} ms/tok"
          f" -> {1/per_tok:.1f} tok/s/seq, {B/per_tok:.0f} tok/s total", flush=True)
