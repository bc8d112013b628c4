"""7B decode tok/s via the production path: one jitted lax.scan decode loop."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from lhrs_bot_tpu.models.llama import (
    KVCache, LlamaConfig, init_llama_params, llama_decode_step, llama_prefill)

cfg = LlamaConfig(num_hidden_layers=16)  # half-depth: fits single-chip HBM; scales linearly
print("initializing 7B params in bf16...", flush=True)
t0 = time.perf_counter()
params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
params = jax.block_until_ready(params)
print(f"init {time.perf_counter()-t0:.1f}s", flush=True)

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
            logits, cache = llama_decode_step(
                params, cfg, cache, inputs_embeds=emb)
            return (cache, jnp.argmax(logits, -1).astype(jnp.int32)), tok

        (_, last), toks = jax.lax.scan(body, (cache, tok0), None,
                                       length=STEPS)
        return jnp.sum(toks) + jnp.sum(last)

    return jax.jit(run)


for B in (1, 8):
    embeds = jax.random.normal(jax.random.PRNGKey(1),
                               (B, T, cfg.hidden_size), jnp.bfloat16)
    run = make_run(B)
    t0 = time.perf_counter()
    s = float(run(params, embeds))
    print(f"B={B} compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    # prefill-only timing to subtract
    pre = jax.jit(lambda p, e: jnp.sum(llama_prefill(
        p, cfg, KVCache.create(cfg, B, SMAX, dtype=jnp.bfloat16),
        inputs_embeds=e, prompt_len=jnp.full((B,), T, jnp.int32))[0]))
    _ = float(pre(params, embeds))
    t0 = time.perf_counter()
    for _ in range(3):
        sp = float(pre(params, embeds))
    pre_dt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(3):
        s = float(run(params, embeds))
    dt = (time.perf_counter() - t0) / 3
    per_tok = (dt - pre_dt) / STEPS
    print(f"B={B}: prefill {pre_dt*1000:.0f} ms, full {dt*1000:.0f} ms, "
          f"decode {per_tok*1000:.2f} ms/tok -> {1/per_tok:.1f} tok/s/seq, "
          f"{B/per_tok:.0f} tok/s total", flush=True)
