"""Full-7B-shape end-to-end rehearsal on one chip (SURVEY §7.2 oracle shape).

Loads the full-scale random reference-format artifacts written by
tools/make_fake_reference_ckpt.py through the REAL serving load path —
load_pretrained (HF llama + HF clip + FINAL.pt with resized embed_tokens +
TextLoRA merge at stage 0), int8 quantization, GenerationEngine — and
generates tokens from an image prompt on the chip. Validates that:

  * torch_import handles genuine 7B/ViT-L shapes and the nested FINAL.pt
    (vocab-resize rows tolerated via model_io.fit);
  * host-side loading never places the 27 GB f32 init on the 16 GB chip;
  * the engine serves a multimodal request end-to-end at full scale.

Usage:
    python tools/make_fake_reference_ckpt.py --output /tmp/fake7b
    python tools/rehearse_full_scale.py --ckpt /tmp/fake7b [--orbax]

Prints one JSON line with load/prefill/decode timings.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--orbax", action="store_true",
                    help="also convert to orbax and reload from it")
    ap.add_argument("--max-new-tokens", type=int, default=16)
    args = ap.parse_args()

    import numpy as np

    import jax.numpy as jnp

    from lhrs_bot_tpu.core.model_io import load_pretrained
    from lhrs_bot_tpu.data.preprocess import tokenizer_image_token
    from lhrs_bot_tpu.data.tokenizer import make_fallback_tokenizer
    from lhrs_bot_tpu.models.lora import LoraConfig
    from lhrs_bot_tpu.models.vlm import VLMConfig
    from lhrs_bot_tpu.serve.engine import GenerationConfig, GenerationEngine

    cfg = VLMConfig(stage=0, lora=LoraConfig(r=128, alpha=256))
    report = {}

    t0 = time.time()
    params = load_pretrained(
        cfg,
        model_path=os.path.join(args.ckpt, "FINAL.pt"),
        vit_path=os.path.join(args.ckpt, "clip"),
        llama_path=os.path.join(args.ckpt, "llama"),
    )
    report["load_s"] = round(time.time() - t0, 1)
    assert "lora" not in params, "stage 0 must merge LoRA"
    n_params = sum(int(np.prod(x.shape))
                   for x in __import__("jax").tree_util.tree_leaves(params))
    report["n_params"] = n_params
    assert n_params > 6.9e9, n_params

    if args.orbax:
        from lhrs_bot_tpu.core.model_io import (load_orbax_params,
                                                save_orbax_params)

        t0 = time.time()
        opath = os.path.join(args.ckpt, "orbax")
        save_orbax_params(opath, params)
        report["orbax_save_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        params = load_orbax_params(opath, cfg)
        report["orbax_load_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    engine = GenerationEngine(cfg, params, max_seq_len=2304,
                              quantize_bits=8, vision_w8a8=True)
    report["engine_init_s"] = round(time.time() - t0, 1)

    import jax

    stats = jax.devices()[0].memory_stats() or {}
    report["hbm_in_use_gb"] = round(
        stats.get("bytes_in_use", 0) / 2**30, 2)

    tok = make_fallback_tokenizer()
    prompt = "<image>\nDescribe the scene."
    ids = np.asarray([tokenizer_image_token(prompt, tok)], np.int32)
    img = np.random.default_rng(0).integers(
        0, 255, (1, 224, 224, 3)).astype(np.uint8)
    gen = GenerationConfig(max_new_tokens=args.max_new_tokens,
                           eos_token_id=tok.eos_token_id,
                           pad_token_id=tok.pad_token_id)
    t0 = time.time()
    out = engine.generate(ids, np.asarray([ids.shape[1]], np.int32),
                          images=img, gen_cfg=gen)
    report["first_generate_s"] = round(time.time() - t0, 1)  # incl compile
    t0 = time.time()
    out = engine.generate(ids, np.asarray([ids.shape[1]], np.int32),
                          images=img, gen_cfg=gen)
    dt = time.time() - t0
    report["steady_generate_s"] = round(dt, 2)
    report["tokens"] = len(out[0])
    report["tok_s"] = round(len(out[0]) / max(dt, 1e-6), 1)
    report["ok"] = True
    print(json.dumps(report))


if __name__ == "__main__":
    main()
