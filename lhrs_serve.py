"""Production HTTP serving entry point (continuous batching, one chip).

The reference's only serving surface is the single-user Gradio UI
(/root/reference/lhrs_webui.py:233-239, one HF-generate thread per click);
this CLI exposes the same model through the continuous-batching scheduler
(serve/scheduler.py) as a stdlib JSON API:

  python lhrs_serve.py -c Config/multi_modal_eval.yaml \
      --model-path <FINAL.pt> --port 8000 --slots 8

Config knobs honored (Config/multi_modal_eval.yaml): `bits: 8` int8 decoder
weights, `kv_bits: 8` int8 KV cache — together they are what fits 8
full-context (2304) slots on one 16 GB chip. Endpoints: POST /generate,
GET /health (serve/api.py).

--paged switches to the paged-KV scheduler (serve/paged.py): KV lives in
a shared page pool sized by --pool-tokens instead of slots × S_max, so
short requests stop paying the full-context reservation and repeated
prompt prefixes (the conversation template, chat history) are served from
the prefix cache without re-prefilling. --slots then bounds CONCURRENCY,
not memory — raise it for short-chat traffic.
"""

from __future__ import annotations


def main():
    import sys

    # must win before ANY backend use: the axon plugin beats JAX_PLATFORMS
    # env selection, and a dead TPU tunnel hangs backend init forever
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from lhrs_bot_tpu.core.bootstrap import (
        build_engine, build_model_and_tokenizer, parse_config, setup)
    from lhrs_bot_tpu.serve.api import ServingFrontend, serve
    from lhrs_bot_tpu.serve.engine import GenerationConfig
    from lhrs_bot_tpu.serve.scheduler import ContinuousBatchingScheduler

    config = parse_config(
        "LHRS-Bot TPU serving API",
        extra=lambda p: (
            p.add_argument("--port", type=int, default=8000),
            p.add_argument("--slots", type=int, default=8),
            p.add_argument("--tokens-per-tick", type=int, default=16),
            p.add_argument("--adaptive-tick", action="store_true",
                           help="shrink ticks near scheduled completions "
                                "and while requests queue (off by default "
                                "pending the on-chip mixed-budget win)"),
            p.add_argument("--no-adaptive-tick", action="store_true",
                           help="(compat) explicit off — the default"),
            p.add_argument("--temperature", type=float, default=0.0,
                           help="0 → greedy (the eval protocol default)"),
            p.add_argument("--paged", action="store_true",
                           help="paged KV pool + prefix cache"),
            p.add_argument("--pool-tokens", type=int, default=0,
                           help="paged pool capacity in tokens (default: "
                                "slots × S_max, i.e. same memory as the "
                                "contiguous cache)"),
            p.add_argument("--page-size", type=int, default=128),
            p.add_argument("--prefill-chunk", type=int, default=0,
                           help="paged mode: run the prefill decoder over "
                                "fixed-width embed chunks so one compiled "
                                "program serves all prompt widths"),
            p.add_argument("--speculative", type=int, default=0,
                           help="contiguous scheduler: prompt-lookup "
                                "window per speculative round (greedy "
                                "ticks advance up to N+1 tokens per "
                                "weight read; 0 = off)"),
            p.add_argument("--cpu", action="store_true",
                           help="force the CPU backend (smoke runs / "
                                "debugging without a reachable TPU)"),
            p.add_argument("--warmup", action="store_true",
                           help="pre-compile the serving programs before "
                                "binding the port (one-time with the "
                                "persistent compilation cache)"),
        ))
    logger = setup(config)

    cfg, params, tokenizer = build_model_and_tokenizer(config, eval_mode=True)
    # --tp N (common arg): multi-chip serving — decoder weights and KV
    # heads shard over the ICI mesh
    mesh = None
    tp = getattr(config, "tp", None)
    if tp and int(tp) > 1:
        from lhrs_bot_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=1, tp=int(tp))
    # engine prep does the heavy lifting once: LoRA merge + optional int8
    # quantization on the host, params pinned on device
    engine = build_engine(cfg, params, config, mesh=mesh)
    del params

    t = float(config.temperature)
    gen_cfg = GenerationConfig(
        do_sample=t > 0, temperature=max(t, 1e-6),
        eos_token_id=int(tokenizer.eos_token_id),
        pad_token_id=int(tokenizer.pad_token_id or 0))
    if getattr(config, "paged", False):
        from lhrs_bot_tpu.serve.paged import PagedScheduler

        page = int(config.page_size)
        pool_tokens = (int(config.pool_tokens)
                       or int(config.slots) * engine.max_seq_len)
        sched = PagedScheduler(
            cfg, engine.params, engine.llama_params,
            mesh=mesh,
            max_batch=int(config.slots),
            num_pages=pool_tokens // page + 1,  # +1: reserved null page
            page_size=page,
            max_seq_len=engine.max_seq_len,
            cache_dtype=engine.cache_dtype,
            tokens_per_tick=int(config.tokens_per_tick),
            adaptive_tick=(getattr(config, "adaptive_tick", False)
                           and not getattr(config, "no_adaptive_tick",
                                           False)),
            gen_cfg=gen_cfg,
            prefill_chunk=int(config.prefill_chunk) or None,
            # raises with a clear message if --speculative was also given
            speculative=int(getattr(config, "speculative", 0)),
        )
    else:
        sched = ContinuousBatchingScheduler(
            cfg, engine.params, engine.llama_params,
            mesh=mesh,
            max_batch=int(config.slots),
            max_seq_len=engine.max_seq_len,
            cache_dtype=engine.cache_dtype,
            tokens_per_tick=int(config.tokens_per_tick),
            adaptive_tick=(getattr(config, "adaptive_tick", False)
                           and not getattr(config, "no_adaptive_tick",
                                           False)),
            gen_cfg=gen_cfg,
            speculative=int(getattr(config, "speculative", 0)),
        )
    frontend = ServingFrontend(
        sched, tokenizer,
        image_size=int(config.rgb_vision.input_size[0]),
        prompt_template=getattr(config, "prompt_template", "llava_llama_2"))
    if getattr(config, "warmup", False):
        frontend.warmup()
    logger.info("serving on port %d (%d slots, S_max=%d, cache=%s)",
                config.port, config.slots, engine.max_seq_len,
                jnp.dtype(engine.cache_dtype).name)
    serve(frontend, port=int(config.port))


if __name__ == "__main__":
    main()
