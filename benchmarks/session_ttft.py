"""Multi-turn session-continuation TTFT benchmark (engine-level, one chip).

The chat surfaces (cli_qa, lhrs_webui) keep the KV cache across turns via
GenerationEngine.stream(session=True): turn N's re-rendered conversation is
matched against the tokens already in the cache and only the new suffix is
prefilled (engine.py `_session_match` / `llama_prefill_continue`). The
reference re-prefills the WHOLE history every turn
(/root/reference/lhrs/models/text_modal.py:528-627 regenerates from the full
rendered conversation), so continuation's win grows with history length.

This bench measures, at 7B int8 on one chip:
  * ttft_s_continue — admission-to-first-token for a turn whose history
    (prompt + prior answer) is already cached: prefills ONE prompt-bucket
    (64-token) suffix chunk;
  * ttft_s_fresh    — the same rendered conversation with the session
    dropped: full-width prefill (the reference's per-turn cost);
  * both after a compile pass (the persistent compilation cache makes the
    cold numbers process-local anyway).

Run: python benchmarks/session_ttft.py [--prompt-len 1024] [--tiny]
`--tiny` smoke-runs the same flow on the CPU backend at toy shapes.
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def first_token_time(engine, ids, gen_cfg, session):
    """Returns (ttft_s, emitted_ids); drains the stream so session state
    lands. TTFT ends at the first yielded token — a host int, i.e. a real
    device fetch (the only reliable sync through the remote tunnel)."""
    t0 = time.perf_counter()
    it = engine.stream(ids, ids.shape[1], gen_cfg=gen_cfg, session=session)
    first = next(it)
    ttft = time.perf_counter() - t0
    return ttft, [first] + list(it)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke run at toy shapes")
    ap.add_argument("--prompt-len", type=int, default=1024)
    ap.add_argument("--turn-tokens", type=int, default=16,
                    help="tokens generated per turn (TTFT needs only the "
                         "first; the rest populate the session history)")
    args = ap.parse_args()

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.prompt_len = min(args.prompt_len, 16)
        args.turn_tokens = min(args.turn_tokens, 4)
    else:
        from lhrs_bot_tpu.core.bootstrap import enable_compilation_cache

        enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from lhrs_bot_tpu.models.vlm import VLMConfig
    from lhrs_bot_tpu.serve.engine import GenerationConfig, GenerationEngine

    if args.tiny:
        from lhrs_bot_tpu.models import init_vlm_params

        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        engine = GenerationEngine(cfg, params, max_seq_len=96,
                                  compute_dtype=jnp.float32,
                                  cache_dtype=jnp.float32,
                                  prompt_bucket=16, cache_bucket=32)
        vocab = 200
    else:
        from serving_bench import build_llama_params

        _, llama_params = build_llama_params()  # 7B int8, built on device
        cfg = VLMConfig(stage=0)
        engine = GenerationEngine(cfg, {"llama": llama_params},
                                  max_seq_len=2304)
        vocab = 30000

    gen_cfg = GenerationConfig(max_new_tokens=args.turn_tokens,
                               eos_token_id=-1, pad_token_id=0)
    rng = np.random.default_rng(0)
    tail_n = 4 if args.tiny else 48  # next turn's new question length

    def tail(n=None):
        return rng.integers(3, vocab,
                            size=(n or tail_n,)).astype(np.int32)

    report = {"prompt_len": args.prompt_len,
              "turn_tokens": args.turn_tokens,
              "backend": jax.default_backend()}

    # turn 1: seed the session (full prefill, compiles the bucket program)
    convo = tail(args.prompt_len)
    t0 = time.perf_counter()
    _, out = first_token_time(engine, convo[None, :], gen_cfg, session=True)
    report["turn1_s"] = round(time.perf_counter() - t0, 2)
    convo = np.concatenate([convo, np.asarray(out, np.int32), tail()])

    # turn 2: continuation compile pass (the suffix-prefill program)
    ttft, out = first_token_time(engine, convo[None, :], gen_cfg,
                                 session=True)
    report["ttft_s_continue_cold"] = round(ttft, 3)
    convo = np.concatenate([convo, np.asarray(out, np.int32), tail()])

    # turn 3: WARM continuation TTFT — the headline
    ttft, out = first_token_time(engine, convo[None, :], gen_cfg,
                                 session=True)
    report["ttft_s_continue"] = round(ttft, 3)
    report["history_tokens"] = int(convo.shape[0])

    # fresh prefill of the same conversation (reference per-turn cost):
    # compile pass at this width bucket, then the warm number
    engine.reset_session()
    ttft, _ = first_token_time(engine, convo[None, :], gen_cfg,
                               session=False)
    report["ttft_s_fresh_cold"] = round(ttft, 3)
    engine.reset_session()
    ttft, _ = first_token_time(engine, convo[None, :], gen_cfg,
                               session=False)
    report["ttft_s_fresh"] = round(ttft, 3)

    speedup = report["ttft_s_fresh"] / max(report["ttft_s_continue"], 1e-9)
    print(json.dumps({
        "metric": "session_continuation_ttft_s",
        "value": report["ttft_s_continue"],
        "unit": f"s (turn-3 TTFT, {report['history_tokens']}-token history)",
        "fresh_prefill_ttft_s": report["ttft_s_fresh"],
        "speedup_vs_fresh": round(speedup, 2),
        "extra": report,
    }))


if __name__ == "__main__":
    main()
