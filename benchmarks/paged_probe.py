"""Paged decode step cost at the serving geometry (VERDICT r3 #4).

History: SERVING_r03 measured the paged+prefix scheduler at 84 tok/s
aggregate vs 297 contiguous (7 slots, int8 KV, S_max 2304). The r4
decomposition of one paged decode step at that geometry found:

  full (bundled kernel) : 93.0 ms/step   — 75 tok/s total
  no_attn               :  8.6 ms/step   — weights + XLA page scatters
  no_append             : 91.2 ms/step   — bundled kernel dominates

i.e. JAX's bundled paged_attention kernel cost ~83 ms (~1.8 GB/s
effective on ~150 MB of page reads — its DMAs are per-(head, page) 8 KB
fragments). That motivated ops/paged_fused.py: pools re-laid to
(L, N, H, page, d) so one page is one dense async copy, append RMW +
attention fused into one program per (layer, sequence).

This probe times the CURRENT production paged_decode_step (fused kernel)
plus an append-only variant, against the contiguous fused step at the
same geometry. All timings end with a host fetch (tunnel
block_until_ready lies). Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from lhrs_bot_tpu.models.llama import KVCache, LlamaConfig, llama_decode_step
from lhrs_bot_tpu.models.llama_paged import PagedKVCache, paged_decode_step
from lhrs_bot_tpu.ops.quant import quantize_int8

cfg = LlamaConfig.llama2_7b()
d, ffn, L, V = (cfg.hidden_size, cfg.intermediate_size,
                cfg.num_hidden_layers, cfg.vocab_size)
H, D = cfg.num_attention_heads, cfg.head_dim
STEPS = 16
B, PAGE, PPS = 7, 64, 36          # serving geometry: 7 slots, 2304 ctx
NPAGES = B * PPS + 1
L0 = 2192                          # parity context


def qinit(key, shape):
    f = jax.jit(lambda k: quantize_int8(
        jax.random.normal(k, shape, jnp.bfloat16) * 0.02, axis=1))
    out = f(key)
    jax.block_until_ready(out.q)
    return out


def make_params():
    keys = jax.random.split(jax.random.PRNGKey(0), 10)
    return {
        "embed_tokens": jax.random.normal(keys[0], (V, d),
                                          jnp.bfloat16) * 0.02,
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


def paged_cache():
    shape = (L, NPAGES, H, PAGE, D)
    mk8 = jax.jit(lambda k: jax.random.randint(k, shape, -127, 127,
                                               jnp.int8))
    mks = jax.jit(lambda k: jax.random.uniform(
        k, shape[:-1], jnp.float32, 0.01, 0.03))
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    # each slot owns pages [1 + s*PPS, 1 + (s+1)*PPS)
    table = (1 + np.arange(B)[:, None] * PPS +
             np.arange(PPS)[None, :]).astype(np.int32)
    return PagedKVCache(
        k_pages=mk8(ks[0]), v_pages=mk8(ks[1]),
        page_table=jnp.asarray(table),
        lengths=jnp.full((B,), L0, jnp.int32),
        k_scale_pages=mks(ks[2]), v_scale_pages=mks(ks[3]))


def contiguous_cache():
    S = PPS * PAGE
    shape = (L, B, H, S, D)
    mk8 = jax.jit(lambda k: jax.random.randint(k, shape, -127, 127,
                                               jnp.int8))
    mks = jax.jit(lambda k: jax.random.uniform(
        k, shape[:-1], jnp.float32, 0.01, 0.03))
    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    return KVCache(k=mk8(ks[0]), v=mk8(ks[1]),
                   length=jnp.full((B,), L0, jnp.int32),
                   k_scale=mks(ks[0]), v_scale=mks(ks[1]))


def scan_paged(step_fn):
    def run(params, pcache, tok0):
        def body(carry, _):
            pc, tok = carry
            emb = jnp.take(params["embed_tokens"], tok[:, None], axis=0)
            logits, pc = step_fn(params, pc, emb)
            # keep lengths in-bounds across STEPS appends
            pc = pc._replace(lengths=jnp.minimum(pc.lengths,
                                                 PPS * PAGE - 2))
            return (pc, jnp.argmax(logits, -1).astype(jnp.int32)), tok
        (_, last), toks = jax.lax.scan(body, (pcache, tok0), None,
                                       length=STEPS)
        return jnp.sum(toks) + jnp.sum(last)
    return jax.jit(run, donate_argnums=(1,))


def scan_contig():
    def run(params, cache, tok0):
        def body(carry, _):
            c, tok = carry
            emb = jnp.take(params["embed_tokens"], tok[:, None], axis=0)
            logits, c = llama_decode_step(params, cfg, c,
                                          inputs_embeds=emb)
            c = c._replace(length=jnp.minimum(c.length, PPS * PAGE - 2))
            return (c, jnp.argmax(logits, -1).astype(jnp.int32)), tok
        (_, last), toks = jax.lax.scan(body, (cache, tok0), None,
                                       length=STEPS)
        return jnp.sum(toks) + jnp.sum(last)
    return jax.jit(run, donate_argnums=(1,))


def time_it(fn, params, mk_cache, reps=3):
    tok0 = jnp.zeros((B,), jnp.int32)
    float(fn(params, mk_cache(), tok0))        # compile
    times = []
    for _ in range(reps):
        c = mk_cache()
        jax.block_until_ready(jax.tree_util.tree_leaves(c)[0])
        t0 = time.perf_counter()
        float(fn(params, c, tok0))
        times.append(time.perf_counter() - t0)
    return min(times) / STEPS


def main():
    params = make_params()
    out = {}

    fn = scan_paged(lambda p, c, e: paged_decode_step(
        p, cfg, c, inputs_embeds=e))
    ms = time_it(fn, params, paged_cache) * 1e3
    out["paged_fused_ms"] = round(ms, 2)
    out["paged_fused_tok_s_total"] = round(B / (ms / 1e3), 1)
    print(f"paged fused: {ms:.2f} ms/step "
          f"({B / (ms / 1e3):.1f} tok/s total)", file=sys.stderr)

    fn = scan_contig()
    ms = time_it(fn, params, contiguous_cache) * 1e3
    out["contiguous_ms"] = round(ms, 2)
    out["contiguous_tok_s_total"] = round(B / (ms / 1e3), 1)
    print(f"contiguous : {ms:.2f} ms/step", file=sys.stderr)

    out["paged_over_contiguous"] = round(
        out["paged_fused_ms"] / out["contiguous_ms"], 3)
    print(json.dumps({"metric": "paged_decode_probe",
                      "geometry": f"B{B} page{PAGE} pps{PPS} int8 L0={L0}",
                      "bundled_kernel_full_ms_r4probe": 93.0,
                      **out}))


if __name__ == "__main__":
    main()
