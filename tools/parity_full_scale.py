"""Full-shape numerical parity oracle: our TPU stack vs a torch/HF CPU
pipeline assembled like the reference, on the SAME fake checkpoint.

The reference has no test suite; its de facto oracle is the eval-script
accuracy table, which needs real weights. What IS checkable in this
environment is cross-framework numerics at the real 7B shapes: the same
random checkpoint (tools/make_fake_reference_ckpt.py) is run through

  (a) a torch/HF f32 pipeline assembled exactly like the reference loads
      itself — CLIPVisionModel + hidden_states taps, the
      MultiheadAttention pooler from FINAL.pt's other_ckpt, TextLoRA
      merged into LlamaForCausalLM (UniBind.py:83-117, merge_and_unload
      semantics), embedding splice + generate with inputs_embeds
      (text_modal.py:528-627);
  (b) our serving path — model_io.load_pretrained (stage-0 merge) →
      GenerationEngine prefill/greedy-decode — in bf16 and, optionally,
      the int8 + fused-W8A8-vision serving configuration,

at a FULL spliced context (default 2288 ≈ the 2304-token parity window
minus decode headroom), and compares last-position prefill logits
(rel-L2, top-1/top-5) and the first-N greedy tokens.

Usage (full scale, on the chip; torch side takes several minutes on CPU):
    python tools/make_fake_reference_ckpt.py --output /tmp/fake7b \
        --resized-vocab 32000   # no resize: resized rows are untrained
                                # noise on both sides and would only add
                                # un-comparable logit rows
    python tools/parity_full_scale.py --ckpt /tmp/fake7b --out parity.json

CI subset (reduced shapes, CPU backend — tests/test_parity_tool.py):
    python tools/make_fake_reference_ckpt.py --output /tmp/fake_small \
        --llama-layers 2 ... (see the test)
    python tools/parity_full_scale.py --ckpt /tmp/fake_small --cpu --ctx 64
"""

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_vlm_config(ckpt):
    """VLMConfig derived from the checkpoint's own config.json files +
    FINAL.pt pooler shapes — shape-driven so the reduced-scale CI subset
    and the full 7B artifact take the same code path."""
    import dataclasses

    import torch

    from lhrs_bot_tpu.models.llama import LlamaConfig
    from lhrs_bot_tpu.models.lora import LoraConfig
    from lhrs_bot_tpu.models.perceiver import PerceiverConfig
    from lhrs_bot_tpu.models.vit import ViTConfig
    from lhrs_bot_tpu.models.vlm import VLMConfig

    with open(os.path.join(ckpt, "llama", "config.json")) as fh:
        lc = json.load(fh)
    with open(os.path.join(ckpt, "clip", "config.json")) as fh:
        vc = json.load(fh)
    llama = LlamaConfig(
        vocab_size=lc["vocab_size"], hidden_size=lc["hidden_size"],
        intermediate_size=lc["intermediate_size"],
        num_hidden_layers=lc["num_hidden_layers"],
        num_attention_heads=lc["num_attention_heads"],
        max_position_embeddings=lc["max_position_embeddings"],
        rms_norm_eps=lc.get("rms_norm_eps", 1e-5))
    L = vc["num_hidden_layers"]
    # reference taps (7, 15, 22) at L=24, scaled proportionally otherwise
    taps = tuple(max(1, (s * L) // 24) for s in (7, 15, 22))
    vit = ViTConfig(
        image_size=vc["image_size"], patch_size=vc["patch_size"],
        width=vc["hidden_size"], layers=L,
        heads=vc["num_attention_heads"],
        mlp_ratio=vc["intermediate_size"] // vc["hidden_size"],
        extract_stages=taps)
    final = torch.load(os.path.join(ckpt, "FINAL.pt"), map_location="cpu",
                       weights_only=False)
    pool_sd = final["other_ckpt"]["rgb_pooler"]
    nq = pool_sd["query"].shape[1]
    n_pool_layers = 1 + max(int(k.split(".")[1]) for k in pool_sd
                            if k.startswith("layers."))
    stage_num = ((64, 48, 32) if nq == 144
                 else (nq - 2 * (nq // 3), nq // 3, nq // 3))
    pooler = PerceiverConfig(
        num_query=nq, num_layers=n_pool_layers,
        heads=max(1, vit.width // 64), hidden_size=vit.width,
        encoder_hidden_size=vit.width,
        output_size=pool_sd["out_proj.weight"].shape[0],
        stage_num=stage_num, split_part=(vit.num_patches,) * 3)
    lora = None
    lora_cfg_path = os.path.join(ckpt, "TextLoRA", "adapter_config.json")
    if os.path.exists(lora_cfg_path):
        with open(lora_cfg_path) as fh:
            ac = json.load(fh)
        lora = LoraConfig(r=ac["r"], alpha=ac["lora_alpha"])
    del final
    return VLMConfig(vit=vit, pooler=pooler, llama=llama, lora=lora,
                     stage=0)


class TorchPooler:
    """Reference-architecture perceiver (common_arch.py:93-173 semantics;
    same assembly as the tiny-scale oracle in tests/test_golden_e2e.py)."""

    def __new__(cls, cfg):
        import torch
        import torch.nn as nn
        import torch.nn.functional as tF

        class _Pooler(nn.Module):
            def __init__(self):
                super().__init__()
                h = cfg.hidden_size
                self.query = nn.Parameter(torch.zeros(1, cfg.num_query, h))
                self.layers = nn.ModuleList()
                for _ in range(cfg.num_layers):
                    blk = nn.Module()
                    blk.ln_1 = nn.LayerNorm(h)
                    blk.ln_1_kv = nn.LayerNorm(h)
                    blk.attn = nn.MultiheadAttention(h, cfg.heads)
                    blk.ln_2 = nn.LayerNorm(h)
                    blk.mlp = nn.Sequential()
                    blk.mlp.c_fc = nn.Linear(h, h * cfg.mlp_ratio)
                    blk.mlp.c_proj = nn.Linear(h * cfg.mlp_ratio, h)
                    self.layers.append(blk)
                self.out_proj = nn.Linear(h, cfg.output_size)

            def forward(self, image_embs):
                b = image_embs.shape[0]
                queries = self.query.expand(b, -1, -1)
                q_groups = torch.split(queries, list(cfg.stage_num), dim=1)
                img_groups = torch.split(image_embs, list(cfg.split_part),
                                         dim=1)
                outs = []
                for q0, img in zip(q_groups, img_groups):
                    kv = torch.cat([q0, img], dim=1).permute(1, 0, 2)
                    x = q0.permute(1, 0, 2)
                    for blk in self.layers:
                        kvn = blk.ln_1_kv(kv)
                        attn, _ = blk.attn(blk.ln_1(x), kvn, kvn,
                                           need_weights=False)
                        x = x + attn
                        h2 = blk.ln_2(x)
                        x = x + blk.mlp.c_proj(tF.gelu(blk.mlp.c_fc(h2)))
                    outs.append(x.permute(1, 0, 2))
                return self.out_proj(torch.cat(outs, dim=1))

        return _Pooler()


def run_torch_reference(ckpt, cfg, ids, pixels, n_new):
    """The reference pipeline in torch f32 on CPU: returns (last-position
    prefill logits (V,), greedy tokens). Results are cached on disk next
    to the checkpoint — the 7B f32 single-core forward costs ~50 min and
    must never be recomputed for the same inputs."""
    import numpy as np
    import torch

    cache_path = os.path.join(
        ckpt, f"torch_ref_ctx{ids.shape[1]}_n{n_new}.npz")
    if os.path.exists(cache_path):
        blob = np.load(cache_path)
        return (blob["logits"], [int(x) for x in blob["tokens"]],
                {"torch_cached": True})

    from lhrs_bot_tpu.models.constants import IMAGE_TOKEN_INDEX

    t0 = time.time()
    from transformers import CLIPVisionModel, LlamaForCausalLM

    sd = None
    final = torch.load(os.path.join(ckpt, "FINAL.pt"), map_location="cpu",
                       weights_only=False)

    # vision: HF CLIP dir, then the FINAL.pt rgb_ckpt overlay
    # (UniBind.py load order)
    hf_vit = CLIPVisionModel.from_pretrained(
        os.path.join(ckpt, "clip"), torch_dtype=torch.float32).eval()
    rgb_sd = {k[len("encoder."):]: v.to(torch.float32)
              for k, v in final["rgb_ckpt"].items()}
    missing, _ = hf_vit.load_state_dict(rgb_sd, strict=False)
    assert not [m for m in missing if "position_ids" not in m], missing

    pooler = TorchPooler(cfg.pooler).eval()
    pool_sd = {k: v.to(torch.float32)
               for k, v in final["other_ckpt"]["rgb_pooler"].items()}
    missing, _ = pooler.load_state_dict(pool_sd, strict=False)
    assert not missing, missing

    llama = LlamaForCausalLM.from_pretrained(
        os.path.join(ckpt, "llama"), torch_dtype=torch.float32).eval()
    # embed_tokens overlay (+resize when the checkpoint carries more rows)
    emb = final["other_ckpt"]["embed_tokens"].get("weight")
    if emb is not None:
        if emb.shape[0] != llama.get_input_embeddings().weight.shape[0]:
            llama.resize_token_embeddings(emb.shape[0])
        with torch.no_grad():
            llama.get_input_embeddings().weight.copy_(emb.to(torch.float32))
    # TextLoRA merge (merge_and_unload parity): W += (alpha/r)·B·A
    lora_dir = os.path.join(ckpt, "TextLoRA")
    if os.path.isdir(lora_dir):
        with open(os.path.join(lora_dir, "adapter_config.json")) as fh:
            ac = json.load(fh)
        scale = ac["lora_alpha"] / ac["r"]
        sd = torch.load(os.path.join(lora_dir, "adapter_model.bin"),
                        map_location="cpu", weights_only=False)
        with torch.no_grad():
            for key, a in sd.items():
                if not key.endswith("lora_A.weight"):
                    continue
                b = sd[key.replace("lora_A", "lora_B")]
                mod_path = key[len("base_model.model."):
                               -len(".lora_A.weight")]
                mod = llama.get_submodule(mod_path)
                mod.weight += scale * (b.to(torch.float32)
                                       @ a.to(torch.float32))
    del final, sd
    gc.collect()
    load_s = time.time() - t0

    t0 = time.time()
    with torch.no_grad():
        out = hf_vit(torch.from_numpy(pixels), output_hidden_states=True)
        feats = torch.cat(
            [out.hidden_states[s][:, 1:, :]
             for s in cfg.vit.extract_stages], dim=1)
        img_embs = pooler(feats)

        ids_row = torch.from_numpy(ids[0].astype(np.int64))
        pos = int((ids_row == IMAGE_TOKEN_INDEX).nonzero()[0])
        emb_layer = llama.get_input_embeddings()
        spliced = torch.cat([emb_layer(ids_row[:pos]), img_embs[0],
                             emb_layer(ids_row[pos + 1:])], dim=0)[None]
        # ONE prefill (llama.generate(inputs_embeds=...) would redo the
        # full-context prefill a second time — ~30 min of CPU at 7B);
        # greedy steps reuse its KV cache, which is exactly what
        # HF generate does internally after its own prefill
        out = llama(inputs_embeds=spliced, use_cache=True)
        logits = out.logits[0, -1].clone()
        past = out.past_key_values
        step_logits = out.logits[:, -1]
        tokens = []
        eos = int(cfg.llama.eos_token_id)
        for _ in range(n_new):
            nxt = int(step_logits.argmax(-1))
            if nxt == eos:
                break
            tokens.append(nxt)
            out = llama(input_ids=torch.tensor([[nxt]]),
                        past_key_values=past, use_cache=True)
            past = out.past_key_values
            step_logits = out.logits[:, -1]
    fwd_s = time.time() - t0
    np.savez(cache_path, logits=logits.float().numpy(),
             tokens=np.asarray(tokens, np.int64))
    result = (logits.float().numpy(), tokens,
              {"torch_load_s": round(load_s, 1),
               "torch_fwd_s": round(fwd_s, 1)})
    del hf_vit, pooler, llama
    gc.collect()
    return result


def run_ours(ckpt, cfg, ids, pixels, n_new, *, quantize, compute_dtype,
             max_seq_len, cache_dtype=None):
    """Our serving path: load_pretrained → GenerationEngine; returns
    (last-position prefill logits (V,), greedy tokens, timings)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from lhrs_bot_tpu.core.model_io import load_pretrained
    from lhrs_bot_tpu.serve.engine import GenerationConfig, GenerationEngine

    t0 = time.time()
    params = load_pretrained(
        cfg,
        model_path=os.path.join(ckpt, "FINAL.pt"),
        vit_path=os.path.join(ckpt, "clip"),
        llama_path=os.path.join(ckpt, "llama"))
    load_s = time.time() - t0
    t0 = time.time()
    engine = GenerationEngine(
        cfg, params, max_seq_len=max_seq_len,
        compute_dtype=compute_dtype,
        cache_dtype=cache_dtype or compute_dtype,
        quantize_bits=8 if quantize else None,
        # the fused Pallas vision path only compiles on TPU; the CPU CI
        # subset still covers the int8 decoder weights
        vision_w8a8=bool(quantize) and jax.default_backend() == "tpu")
    del params
    gc.collect()

    # prefill logits exactly as engine.generate computes them
    gen_cfg = GenerationConfig(max_new_tokens=n_new, do_sample=False,
                               eos_token_id=int(cfg.llama.eos_token_id))
    nq = cfg.pooler.num_query
    width, cache_len = engine._bucketed(ids.shape[1], nq, n_new)
    ids_p = engine._pad_ids(ids, width, gen_cfg.pad_token_id)
    logits, _ = engine._prefill_jit(
        engine.params, engine.llama_params, engine._vision_packed,
        jnp.asarray(ids_p), jnp.asarray(pixels),
        jnp.asarray([ids.shape[1]], np.int32),
        batch=1, cache_len=cache_len)
    logits = np.asarray(logits[0], np.float32)
    tokens = engine.generate(ids, np.asarray([ids.shape[1]], np.int32),
                             images=pixels, gen_cfg=gen_cfg)[0]
    fwd_s = time.time() - t0
    del engine
    gc.collect()
    return logits, tokens, {"load_s": round(load_s, 1),
                            "fwd_s": round(fwd_s, 1)}


def compare(ref_logits, ref_tokens, logits, tokens, n_new):
    import numpy as np

    v = min(ref_logits.shape[0], logits.shape[0])
    a, b = logits[:v], ref_logits[:v]
    rel_l2 = float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9))
    top5_ref = set(np.argsort(b)[-5:].tolist())
    top5 = set(np.argsort(a)[-5:].tolist())
    agree = 0
    for x, y in zip(tokens, ref_tokens):
        if x != y:
            break
        agree += 1
    return {
        "logit_rel_l2": round(rel_l2, 5),
        "top1_match": bool(int(np.argmax(a)) == int(np.argmax(b))),
        "top5_overlap": len(top5 & top5_ref),
        "greedy_agree_prefix": agree,
        "greedy_total": min(len(tokens), len(ref_tokens), n_new),
        "tokens_ours": tokens[:n_new],
        "tokens_ref": ref_tokens[:n_new],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--ctx", type=int, default=2288,
                    help="target spliced context length (prompt+image)")
    ap.add_argument("--new-tokens", type=int, default=16)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (CI subset / f32 config)")
    ap.add_argument("--skip-int8", action="store_true")
    ap.add_argument(
        "--configs", default="bf16,int8",
        help="comma list of {bf16,int8,f32}. f32 runs OUR pipeline in "
        "float32 (CPU backend: 27 GB of weights do not fit 16 GB HBM) — "
        "an f32-vs-f32 cross-implementation check whose accumulation "
        "noise is near zero, so greedy tokens must agree exactly even on "
        "a random checkpoint whose logit margins are flat; the bf16/int8 "
        "configs then quantify precision loss separately.")
    ap.add_argument("--out", default=None,
                    help="write/merge the JSON here too")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import jax.numpy as jnp

    from lhrs_bot_tpu.models.constants import IMAGE_TOKEN_INDEX

    cfg = build_vlm_config(args.ckpt)
    nq = cfg.pooler.num_query
    t_prompt = max(4, args.ctx - nq + 1)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, cfg.llama.vocab_size - 4,
                       size=(1, t_prompt)).astype(np.int32)
    ids[0, 1] = IMAGE_TOKEN_INDEX
    # float CHW pixel_values on both sides: preprocessing parity is covered
    # separately (tests/test_native.py); this oracle isolates model numerics
    pixels = rng.normal(size=(
        1, 3, cfg.vit.image_size, cfg.vit.image_size)).astype(np.float32)
    spliced_len = t_prompt - 1 + nq
    max_seq_len = spliced_len + args.new_tokens

    report = {"ctx": spliced_len, "n_new": args.new_tokens,
              "shapes": {"llama_layers": cfg.llama.num_hidden_layers,
                         "hidden": cfg.llama.hidden_size,
                         "vit_layers": cfg.vit.layers}}

    ref_logits, ref_tokens, t_times = run_torch_reference(
        args.ckpt, cfg, ids, pixels, args.new_tokens)
    report.update(t_times)

    # bf16 weights pair with the int8 KV cache at full scale: 7B bf16
    # (13.5 GB) + a bf16 2304-cache + vision does NOT fit 16 GB of HBM
    # (measured OOM) — the quantized cache is what makes the full-context
    # bf16 configuration servable at all, and this doubles as full-scale
    # parity evidence for the int8 cache itself.
    all_configs = {
        "bf16": ("bf16_int8cache",
                 dict(quantize=False, compute_dtype=jnp.bfloat16,
                      cache_dtype=jnp.int8)),
        "int8": ("int8_w8a8_int8cache",
                 dict(quantize=True, compute_dtype=jnp.bfloat16,
                      cache_dtype=jnp.int8)),
        "f32": ("f32_cpu",
                dict(quantize=False, compute_dtype=jnp.float32,
                     cache_dtype=jnp.float32)),
    }
    wanted = [c.strip() for c in args.configs.split(",") if c.strip()]
    if args.skip_int8 and "int8" in wanted:
        wanted.remove("int8")
    for short in wanted:
        name, kw = all_configs[short]
        try:
            logits, tokens, times = run_ours(
                args.ckpt, cfg, ids, pixels, args.new_tokens,
                max_seq_len=max_seq_len, **kw)
            report[name] = {**compare(ref_logits, ref_tokens, logits,
                                      tokens, args.new_tokens), **times}
        except Exception as exc:  # noqa: BLE001 — keep earlier configs
            report[name] = {"error": str(exc)[:300]}

    if args.out and os.path.exists(args.out):
        # merge: separate invocations (e.g. the f32/CPU config cannot share
        # a process with the TPU configs — backend choice is global) build
        # up one report file
        try:
            with open(args.out) as fh:
                merged = json.load(fh)
            merged.update(report)
            report = merged
        except Exception:  # noqa: BLE001 — unreadable -> overwrite
            pass
    line = json.dumps(report)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
