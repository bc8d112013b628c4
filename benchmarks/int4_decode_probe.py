"""7B decode with packed int4 weights (W4A16): is the unpack fused?

The reference supports `bits: 4` (bitsandbytes NF4,
/root/reference/lhrs/models/text_modal.py:91-109); ours is symmetric int4
packed two-nibbles-per-byte along the contraction axis (ops/quant.py).
B=1 full-context decode is weight-bandwidth-bound: int8 weights are
~6.7 GB/step of HBM reads, int4 ~3.4 GB — IF XLA fuses the nibble unpack
into the matmul's operand read. If it instead materializes the unpacked
int8 tensor per layer, the traffic matches int8 and the probe reports no
gain (a recordable negative).

Measures the same scan-decode harness as bench.py at B=1, S_max=2304,
2192 filled, for weight bits in {8, 4}, bf16 KV cache. Prints one JSON
line. Run on the chip: python benchmarks/int4_decode_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from lhrs_bot_tpu.core.bootstrap import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from lhrs_bot_tpu.models.llama import (
        KVCache, LlamaConfig, llama_decode_step)
    from lhrs_bot_tpu.ops.quant import (
        quantize_int4, quantize_int4h, quantize_int8)

    cfg = LlamaConfig.llama2_7b()
    d, ffn, L, V = (cfg.hidden_size, cfg.intermediate_size,
                    cfg.num_hidden_layers, cfg.vocab_size)

    def build(bits):
        qfn = {8: quantize_int8, 4: quantize_int4,
               "4h": quantize_int4h}[bits]

        def qinit(key, shape):
            f = jax.jit(lambda k: qfn(
                jax.random.normal(k, shape, jnp.bfloat16) * 0.02, axis=1))
            out = f(key)
            jax.block_until_ready(out.q)
            return out

        keys = jax.random.split(jax.random.PRNGKey(0), 10)
        return {
            "embed_tokens": jax.random.normal(
                keys[0], (V, d), jnp.bfloat16) * 0.02,
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
            "lm_head": jax.random.normal(keys[8], (d, V),
                                         jnp.bfloat16) * 0.02,
        }

    B, SMAX, L0, steps = 1, 2304, 2192, 64

    def measure(params, reps=3):
        def run(params, cache0, tok0):
            cache = cache0._replace(length=jnp.full((B,), L0, jnp.int32))

            def body(carry, _):
                cache, tok = carry
                emb = jnp.take(params["embed_tokens"], tok[:, None], axis=0)
                logits, cache = llama_decode_step(
                    params, cfg, cache, inputs_embeds=emb)
                return (cache,
                        jnp.argmax(logits, -1).astype(jnp.int32)), tok

            (_, last), toks = jax.lax.scan(body, (cache, tok0), None,
                                           length=steps)
            return jnp.sum(toks) + jnp.sum(last)

        run_jit = jax.jit(run, donate_argnums=(1,))
        shape = (L, B, cfg.num_attention_heads, SMAX, cfg.head_dim)
        tok0 = jnp.zeros((B,), jnp.int32)

        def fresh():
            return KVCache(
                jax.random.normal(jax.random.PRNGKey(2), shape,
                                  jnp.bfloat16),
                jax.random.normal(jax.random.PRNGKey(3), shape,
                                  jnp.bfloat16),
                jnp.zeros((B,), jnp.int32))

        c0 = fresh()
        float(run_jit(params, c0, tok0))  # compile
        times = []
        for _ in range(reps):
            c0 = fresh()
            jax.block_until_ready(c0.k)
            t0 = time.perf_counter()
            float(run_jit(params, c0, tok0))
            times.append(time.perf_counter() - t0)
        return steps * B / min(times)

    out = {}
    which = ("4h", 8) if "--kernel" in sys.argv else (4, 8)
    for bits in which:  # int4 first: both param sets never coreside
        params = build(bits)
        out[f"decode_b1_s2304_w{bits}_tok_s"] = round(measure(params), 2)
        del params
    w4_key = ("decode_b1_s2304_w4h_tok_s" if "4h" in which
              else "decode_b1_s2304_w4_tok_s")
    out["fused_unpack"] = out[w4_key] > (
        out["decode_b1_s2304_w8_tok_s"] * 1.15)
    print(json.dumps({"metric": "int4_decode_probe", **out}))


if __name__ == "__main__":
    main()
