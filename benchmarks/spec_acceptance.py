"""Speculative-decoding acceptance on realistic RS text (VERDICT r3 #6).

The round-3 artifact proved the spec tick costs nothing at its
zero-acceptance floor (188 tok/s aggregate vs 86-88 plain k=1,
SERVING_r03.json); what it never showed is the UPSIDE: how often
prompt-lookup proposals are ACCEPTED on the text this model actually
emits (remote-sensing captions / VQA answers — highly templated,
repetitive vocabulary), and the net tok/s that follows.

Without trained weights in this environment the model cannot emit real
RS text, so this bench separates the two measurable quantities:

  1. ACCEPTANCE is a property of the emitted TEXT, not the weights: if
     the model's sampled/greedy continuation is a given transcript, the
     per-round advance is fully determined by replaying prompt-lookup
     (the same ngram/width policy as serve/speculative.py, verified
     equivalent in tests/test_scheduler.py::TestProposeFromHistory)
     against that transcript, teacher-forced. We replay it over a corpus
     of RSVQA/RSITMD/UCM-style caption+QA transcripts (the phrasing the
     reference's instruction data drills, lhrs/Dataset/*.py prompts) and
     report the advance distribution.

  2. ROUND RATE is a property of the chip: one speculative round = one
     verify through the (B, width+1) continuation prefill = one weight
     read. Measured directly (serving_bench --speculative floor, or the
     --chip flag here).

  net tok/s = round_rate × mean_tokens_per_round. Both factors are
  measured; nothing is extrapolated past the tick's own mechanics (the
  tick emits accepted+1 tokens per round exactly — scheduler.py
  _spec_tick).

Run:  python benchmarks/spec_acceptance.py [--width 4] [--ngram 2]
      [--chip]  # also measure the round rate on the TPU
Prints one JSON line.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------------------
# Corpus: templated RS caption + VQA transcripts. Vocabulary and phrasing
# mirror the reference's instruction-tuning text (LHRS-Instruct /
# RSVQA-style: repeated scene nouns, fixed answer scaffolds) — the
# regime prompt-lookup exploits. ~60 transcripts, 80-200 words each.
# ---------------------------------------------------------------------------

_SCENES = ["an airport", "a dense residential area", "a commercial area",
           "farmland", "a forest", "a harbor", "an industrial area",
           "a meadow", "a parking lot", "a railway station", "a resort",
           "a river", "a school", "a sparse residential area",
           "a storage tank area"]
_OBJECTS = ["buildings", "trees", "roads", "vehicles", "airplanes",
            "ships", "storage tanks", "houses", "a playground",
            "a swimming pool", "bare land", "grass", "a bridge"]
_COLORS = ["gray", "white", "green", "brown", "blue", "dark"]

_CAPTION_TMPL = (
    "The image shows {scene} . In the image , there are many {o1} and "
    "some {o2} . The {o1} are {c1} and the {o2} are {c2} . There are "
    "also several {o3} near the {o1} . The {o3} are arranged in rows "
    "beside the {o2} . Overall , the image shows {scene} with many "
    "{o1} , some {o2} and several {o3} .")

_VQA_TMPL = (
    "Question : what is the main land use in the image ? Answer : the "
    "main land use is {scene} . Question : are there any {o1} in the "
    "image ? Answer : yes , there are many {o1} in the image . "
    "Question : are there any {o2} in the image ? Answer : yes , there "
    "are some {o2} in the image . Question : what color are the {o1} ? "
    "Answer : the {o1} are {c1} . Question : how many {o3} are there ? "
    "Answer : there are several {o3} in the image .")


def build_corpus(n=60, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        scene = _SCENES[int(rng.integers(len(_SCENES)))]
        o = rng.choice(len(_OBJECTS), size=3, replace=False)
        c = rng.choice(len(_COLORS), size=2, replace=False)
        tmpl = _CAPTION_TMPL if i % 2 == 0 else _VQA_TMPL
        out.append(tmpl.format(
            scene=scene, o1=_OBJECTS[o[0]], o2=_OBJECTS[o[1]],
            o3=_OBJECTS[o[2]], c1=_COLORS[c[0]], c2=_COLORS[c[1]]))
    return out


def tokenize_wordlevel(texts):
    """Word-level ids (>=3; 0-2 reserved specials like the real vocab).
    Word-level is the CONSERVATIVE choice for acceptance: BPE splits
    rare words into repeated subwords, which only raises n-gram hit
    rates."""
    vocab = {}
    seqs = []
    for t in texts:
        ids = []
        for w in t.split():
            if w not in vocab:
                vocab[w] = len(vocab) + 3
            ids.append(vocab[w])
        seqs.append(np.asarray(ids, np.int32))
    return seqs, vocab


def replay_acceptance(seq, *, prompt_frac=0.4, ngram=2, width=4):
    """Teacher-forced prompt-lookup replay over one transcript.

    The first prompt_frac of the transcript is the prompt (history
    pre-fill: the conversation so far); the rest is what the model
    emits. Per speculative round: propose from the history (most recent
    n-gram match policy — the device kernel's semantics), count the
    agreeing prefix against the true continuation, advance accepted+1
    (the correction token is the model's own next token — always
    right under teacher forcing, exactly like the real tick where the
    correction is by construction the model's next token).
    Returns the list of per-round advances (each in 1..width+1)."""
    n0 = max(int(len(seq) * prompt_frac), ngram + 1)
    hist = list(seq[:n0])
    advances = []
    i = n0
    while i < len(seq):
        # most recent occurrence of the trailing ngram, ending before end
        pat = hist[-ngram:]
        best = -1
        for j in range(len(hist) - ngram):
            if hist[j:j + ngram] == pat:
                best = j
        prop = []
        if best >= 0:
            for t in hist[best + ngram:best + ngram + width]:
                if t < 3:
                    break
                prop.append(t)
        # agreement with the true continuation
        p = 0
        while (p < len(prop) and i + p < len(seq)
               and prop[p] == seq[i + p]):
            p += 1
        adv = min(p + 1, len(seq) - i)  # accepted + correction
        hist.extend(seq[i:i + adv])
        advances.append(adv)
        i += adv
    return advances


def measure_round_rate_on_chip(width, rounds=8, slots=7):
    """Measured speculative round rate at the parity context (B slots,
    7B int8 weights): one round = one verify = one weight read. Uses the
    real scheduler spec tick with random weights (acceptance ~0 — the
    floor), so round_rate is the honest per-round cost including the
    (B, width+1) verify and proposal machinery."""
    import time

    import jax.numpy as jnp

    from lhrs_bot_tpu.core.bootstrap import enable_compilation_cache
    from lhrs_bot_tpu.models.vlm import VLMConfig
    from lhrs_bot_tpu.serve.engine import GenerationConfig
    from lhrs_bot_tpu.serve.scheduler import (ContinuousBatchingScheduler,
                                              Request)
    from serving_bench import build_llama_params  # noqa: the sibling bench

    enable_compilation_cache()
    llama_cfg, llama_params = build_llama_params()
    cfg = VLMConfig(stage=0)
    gen_cfg = GenerationConfig(eos_token_id=-1, pad_token_id=0)
    sched = ContinuousBatchingScheduler(
        cfg, {}, llama_params, max_batch=slots, max_seq_len=2304,
        tokens_per_tick=rounds, cache_dtype=jnp.int8, gen_cfg=gen_cfg,
        prompt_bucket=64, speculative=width)
    rng = np.random.default_rng(0)

    # warm/compile pass
    sched.run([Request(uid=i, input_ids=rng.integers(
        3, 30000, size=(2048,)).astype(np.int32),
        max_new_tokens=96) for i in range(slots)])
    reqs = [Request(uid=100 + i, input_ids=rng.integers(
        3, 30000, size=(2048,)).astype(np.int32),
        max_new_tokens=96) for i in range(slots)]
    n = sched.admit(reqs)
    assert n == slots
    t0 = time.perf_counter()
    ticks = 0
    while sched.step():
        ticks += 1
    dt = time.perf_counter() - t0
    # random weights: ~every round advances each live slot by exactly 1
    # token, so tokens emitted ≈ rounds × live slots
    toks = sum(len(r.output_ids) for r in reqs) - slots
    return (ticks * rounds) / dt, toks / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=4)
    ap.add_argument("--ngram", type=int, default=2)
    ap.add_argument("--prompt-frac", type=float, default=0.4)
    ap.add_argument("--chip", action="store_true",
                    help="also measure the per-round cost on the TPU")
    args = ap.parse_args()

    seqs, vocab = tokenize_wordlevel(build_corpus())
    all_adv = []
    per_seq = []
    for s in seqs:
        adv = replay_acceptance(s, prompt_frac=args.prompt_frac,
                                ngram=args.ngram, width=args.width)
        all_adv.extend(adv)
        per_seq.append(float(np.mean(adv)))
    adv = np.asarray(all_adv, np.float64)
    report = {
        "corpus_transcripts": len(seqs),
        "vocab_words": len(vocab),
        "width": args.width, "ngram": args.ngram,
        "rounds": int(adv.size),
        "mean_tokens_per_round": round(float(adv.mean()), 3),
        "accept_rate": round(float((adv - 1).mean() / args.width), 3),
        "p50_advance": float(np.percentile(adv, 50)),
        "p90_advance": float(np.percentile(adv, 90)),
        "frac_rounds_full_window": round(
            float((adv >= args.width + 1).mean()), 3),
        "seq_mean_advance_min": round(min(per_seq), 2),
        "seq_mean_advance_max": round(max(per_seq), 2),
    }
    if args.chip:
        round_rate, floor_tok_s = measure_round_rate_on_chip(args.width)
        report["chip_rounds_per_s_total"] = round(round_rate, 1)
        report["chip_floor_tok_s"] = round(floor_tok_s, 1)
        report["projected_net_tok_s"] = round(
            floor_tok_s * float(adv.mean()), 1)
    print(json.dumps({
        "metric": "speculative_acceptance_rs_text",
        "value": report["mean_tokens_per_round"],
        "unit": f"tokens/round (width={args.width}, teacher-forced "
                "RS caption/VQA corpus)",
        "extra": report,
    }))


if __name__ == "__main__":
    main()
