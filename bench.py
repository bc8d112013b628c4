"""Benchmark (one JSON line): 7B decode tok/s/seq + ViT+perceiver prefill.

Headline metric: LLaMA-2-7B single-sequence decode throughput at the
deployed serving recipe — halves-packed W4A8 weights (the reference's
`bits: 4` quantized-serving surface, text_modal.py:96-103, rebuilt as a
Pallas A8 kernel) + int8 lm_head + int8 KV — on one chip at the FULL
parity context: S_max=2304 (2048 text + 144 image + headroom,
Config/multi_modal_eval.yaml:33 semantics) with a 2,192-token cache
already filled, i.e. the hardest honest decode workload. The int8-weight
and bf16-cache points ride in `extra` for round-over-round continuity.
The decode path is the fused Pallas append+attention kernel
(ops/fused_decode.py) with the cache threaded in place through the scan.
`extra` carries the B=2 aggregate at the same context, the short-context
(S=512) point for round-over-round continuity, and ViT-L+perceiver prefill
images/sec/chip against its 2,000 target.

Synchronization note: through the remote-execution tunnel,
block_until_ready returns before compute completes — a host scalar fetch is
the only reliable sync, so all timings end with float(...).
"""

import json
import time

import numpy as np

DECODE_TARGET = 30.0  # tok/s/seq (BASELINE.md)
# The 2,000 img/s figure is per-A100 (624 int8 TOPS peak); the
# silicon-adjusted single-v5e bar is 2000*(394/624) ≈ 1260
# (BASELINE.md "Prefill target vs silicon", benchmarks/ROOFLINE_prefill.md).
PREFILL_TARGET = 1260.0  # images/sec/chip, v5e silicon-adjusted
PREFILL_TARGET_A100 = 2000.0  # raw per-A100 north-star figure


def bench_decode():
    import jax
    import jax.numpy as jnp

    from lhrs_bot_tpu.models.llama import (
        KVCache, LlamaConfig, llama_decode_step, llama_prefill)
    from lhrs_bot_tpu.ops.quant import quantize_int8

    cfg = LlamaConfig.llama2_7b()

    def qinit(key, shape, bits=8):
        from lhrs_bot_tpu.ops.quant import quantize_int4h

        qfn = quantize_int8 if bits == 8 else quantize_int4h
        f = jax.jit(lambda k: qfn(
            jax.random.normal(k, shape, jnp.bfloat16) * 0.02, axis=1))
        out = f(key)
        jax.block_until_ready(out.q)
        return out

    d, ffn, L, V = (cfg.hidden_size, cfg.intermediate_size,
                    cfg.num_hidden_layers, cfg.vocab_size)

    def make_params(bits=8, lm8=False):
        keys = jax.random.split(jax.random.PRNGKey(0), 10)
        lm_head = jax.random.normal(keys[8], (d, V), jnp.bfloat16) * 0.02
        if lm8:  # int8 unembedding (lm_head_bits: 8)
            lm_head = jax.block_until_ready(
                jax.jit(lambda w: quantize_int8(w, axis=0))(lm_head))
        return {
            "embed_tokens": jax.random.normal(
                keys[0], (V, d), jnp.bfloat16) * 0.02,
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

    params = make_params()

    def measure(B, SMAX, L0, steps=64, reps=3, cache_dtype=jnp.bfloat16,
                params=None):
        """Pure decode: pre-filled cache of L0 valid tokens, `steps` fused
        decode steps in one lax.scan dispatch, donated cache (in-place).
        cache_dtype=int8 exercises the quantized cache (halved HBM reads;
        the only configuration where 8 full-context slots fit one chip)."""
        quant = cache_dtype == jnp.int8

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
            zlen = jnp.zeros((B,), jnp.int32)
            if quant:
                mk8 = jax.jit(lambda k: jax.random.randint(
                    k, shape, -127, 127, jnp.int8))
                mks = jax.jit(lambda k: jax.random.uniform(
                    k, shape[:-1], jnp.float32, 0.01, 0.03))
                keys = jax.random.split(jax.random.PRNGKey(2), 4)
                return KVCache(mk8(keys[0]), mk8(keys[1]), zlen,
                               mks(keys[2]), mks(keys[3]))
            return KVCache(
                jax.random.normal(jax.random.PRNGKey(2), shape,
                                  jnp.bfloat16),
                jax.random.normal(jax.random.PRNGKey(3), shape,
                                  jnp.bfloat16), zlen)

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

    # headline: full parity context (2048 text + 144 image tokens filled)
    full_ctx = measure(B=1, SMAX=2304, L0=2192, params=params)
    extra = {}
    for key, kwargs in (
        ("decode_b2_s2304_total_tok_s", dict(B=2, SMAX=2304, L0=2192)),
        # b4 bf16 cache (9.7 GB KV + int8 weights) and any (8, 2304)
        # program exceed the axon remote-compile helper's limits
        # (subprocess exit 1, measured 2026-08-18); b3/b7 are the largest
        # compilable points at parity context
        ("decode_b3_s2304_total_tok_s", dict(B=3, SMAX=2304, L0=2192)),
        ("decode_b1_s512_tok_s", dict(B=1, SMAX=512, L0=256)),
        ("decode_b1_s2304_int8cache_tok_s",
         dict(B=1, SMAX=2304, L0=2192, cache_dtype=jnp.int8)),
        ("decode_b7_s2304_int8cache_total_tok_s",
         dict(B=7, SMAX=2304, L0=2192, cache_dtype=jnp.int8)),
    ):
        try:
            extra[key] = round(measure(params=params, **kwargs), 2)
        except Exception as exc:  # noqa: BLE001 — keep earlier numbers
            extra[key] = f"error: {str(exc)[:120]}"

    # Weight-variant points: one 7B weight set on chip at a time (the base
    # int8 set + a variant + a full-context cache would crowd 16 GB HBM).
    del params
    for key, maker in (
        # lm_head_bits: 8 — int8 unembedding on top of the headline config
        ("decode_b1_s2304_int8cache_lm8_tok_s",
         lambda: make_params(lm8=True)),
        # bits: 4 int4h serving recipe (Pallas W4A8 matmul): weights halve
        # again — past the int8 HBM read-wall cap (~88 tok/s at 670 GB/s)
        ("decode_b1_s2304_w4a8_lm8_tok_s",
         lambda: make_params(bits="4h", lm8=True)),
    ):
        try:
            p = maker()
            extra[key] = round(measure(B=1, SMAX=2304, L0=2192,
                                       cache_dtype=jnp.int8, params=p), 2)
            del p
        except Exception as exc:  # noqa: BLE001 — keep earlier numbers
            extra[key] = f"error: {str(exc)[:120]}"
    return full_ctx, extra


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

    batch = 64  # measured best throughput point on v5e (grouped kernel g=8)
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

    # fused W8A8 Pallas block kernel for the tower (ops/vit_block.py)
    from lhrs_bot_tpu.models.vit import vit_encode_fused
    from lhrs_bot_tpu.ops.vit_block import pack_vit_layers_fused

    packed = jax.jit(pack_vit_layers_fused)(vp["layers"])
    jax.block_until_ready(packed)

    @jax.jit
    def prefill_fused(vparams, packed_, pparams, imgs):
        feats = vit_encode_fused(vparams, packed_, imgs, vit_cfg)
        return jnp.sum(perceiver_resample(pparams, feats, pool_cfg,
                                          compute_dtype=jnp.bfloat16))

    def measure_fused(pparams, iters=10):
        float(prefill_fused(vp, packed, pparams, images))
        t0 = time.perf_counter()
        for _ in range(iters - 1):
            prefill_fused(vp, packed, pparams, images)
        float(prefill_fused(vp, packed, pparams, images))
        return batch * iters / (time.perf_counter() - t0)

    fused = measure_fused(pq)
    return bf16, w8a8, fused


def main():
    # persistent compilation cache: repeat runs skip the ~minutes of 7B
    # compiles (verified working through the axon runtime)
    try:
        from lhrs_bot_tpu.core.bootstrap import enable_compilation_cache

        enable_compilation_cache()
    except Exception:  # noqa: BLE001 — never block the bench on cache setup
        pass
    # failsafe: always emit one JSON line, even if a sub-benchmark dies
    tok_s = img_s = None
    err = None
    decode_extra = {}
    try:
        tok_s, decode_extra = bench_decode()
    except Exception as exc:  # noqa: BLE001
        err = f"decode: {exc}"
    img_w8a8 = img_fused = None
    try:
        img_s, img_w8a8, img_fused = bench_prefill()
    except Exception as exc:  # noqa: BLE001
        err = (err + "; " if err else "") + f"prefill: {exc}"

    extra = dict(decode_extra)
    if img_fused is not None:
        # serving fast path: fused W8A8 Pallas vision blocks
        extra["vit_perceiver_prefill_img_per_s"] = round(img_fused, 2)
        extra["prefill_vs_target"] = round(img_fused / PREFILL_TARGET, 4)
        extra["prefill_vs_a100_raw_target"] = round(
            img_fused / PREFILL_TARGET_A100, 4)
        extra["prefill_bf16_img_per_s"] = round(img_s, 2)
    elif img_s is not None:
        extra["vit_perceiver_prefill_img_per_s"] = round(img_s, 2)
        extra["prefill_vs_target"] = round(img_s / PREFILL_TARGET, 4)
        extra["prefill_vs_a100_raw_target"] = round(
            img_s / PREFILL_TARGET_A100, 4)
    if img_w8a8 is not None:
        extra["prefill_w8a8_img_per_s"] = round(img_w8a8, 2)
    if err:
        extra["error"] = err[:300]

    if tok_s is not None:
        # Headline = the deployed serving recipe (bits:4 halves-packed
        # W4A8 weights + int8 lm_head + int8 KV — run_serving_r04.sh's
        # headline config, parity-characterized by the w4a8 config of
        # tools/parity_full_scale.py --statistical). Falls back to the
        # int8-weight point if the W4A8 measurement errored.
        w4 = extra.get("decode_b1_s2304_w4a8_lm8_tok_s")
        if isinstance(w4, (int, float)):
            metric = "llama2_7b_decode_w4a8_full_context_single_chip"
            value = w4
            extra["decode_b1_s2304_int8w_bf16cache_tok_s"] = round(tok_s, 2)
        else:
            metric = "llama2_7b_decode_int8_full_context_single_chip"
            value = round(tok_s, 2)
        print(json.dumps({
            "metric": metric,
            "value": value,
            "unit": "tok/s/seq",
            "vs_baseline": round(value / DECODE_TARGET, 4),
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
