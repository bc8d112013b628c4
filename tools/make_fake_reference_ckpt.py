"""Generate FULL-7B-SHAPE random checkpoints in the reference's formats.

No trained weights exist in this environment, so full-scale load-path
validation uses random tensors with the EXACT shapes/layouts the reference
writes (SURVEY.md §5.4):

  <out>/llama/            HF LLaMA-2-7B dir (config.json + 2 sharded
                          fp16 safetensors, real key names)
  <out>/clip/             HF CLIP ViT-L/14 vision dir (fp16 safetensors)
  <out>/FINAL.pt          {rgb_ckpt, other_ckpt} with the NESTED
                          other_ckpt {rgb_pooler, text_proj, embed_tokens,
                          lm_head} of get_other_maybe_zero_3
                          (lhrs/models/UniBind.py:275-294); embed_tokens is
                          RESIZED to 32004 rows (special-token parity,
                          text_modal.py:191-240)
  <out>/TextLoRA/         peft adapter dir, r=128 α=256 on all 7 linears
                          (stage-2 recipe, Config/multi_modal_stage2.yaml)

Usage: python tools/make_fake_reference_ckpt.py --output /tmp/fake7b
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_llama(out_dir: str, seed: int = 0, *, d: int = 4096,
                ffn: int = 11008, L: int = 32, heads: int = 32,
                V: int = 32000, profile: str = "flat",
                margin_gain: float = 2.5, margin_mix: float = 5.0):
    """profile="flat": i.i.d. 0.02-scale weights (legacy; logit margins are
    extreme-value-statistics flat, so greedy flips under ANY precision
    perturbation carry no signal).

    profile="margin": weights shaped so the f32 logit-margin distribution
    resembles a trained LM's (VERDICT r3 #3 — "low-rank + scaled residual"):
      * residual-dominant blocks: wo / down_proj are scaled by
        alpha = margin_mix / (sqrt(L)·0.02·d), making each block's addition
        ≈ |embedding|/sqrt(L) so the input token's embedding keeps O(1)
        share of the final residual stream instead of being swamped;
      * lm_head = margin_gain · embed[perm] + 0.002·noise (a low-rank-ish
        coupling through the shared embedding): each hidden state strongly
        prefers ONE vocab row (the permutation successor of the dominant
        stream token), giving confident positions, while the accumulated
        block randomness supplies a spread of genuinely close calls.
    Greedy trajectories walk pseudo-randomly through the permutation, so
    agreement statistics are informative at every position.

    Returns the fp32 embedding matrix so FINAL.pt's resized embed_tokens
    overlay can keep the SAME rows (the margin structure couples embedding
    and lm_head; an uncorrelated overlay would destroy it).
    """
    import torch

    torch.manual_seed(seed)
    os.makedirs(out_dir, exist_ok=True)
    cfg = {
        "architectures": ["LlamaForCausalLM"], "model_type": "llama",
        "hidden_size": d, "intermediate_size": ffn,
        "num_hidden_layers": L, "num_attention_heads": heads,
        "num_key_value_heads": heads, "vocab_size": V,
        "max_position_embeddings": 2048, "rms_norm_eps": 1e-5,
        "torch_dtype": "float16",
    }
    with open(os.path.join(out_dir, "config.json"), "w") as fh:
        json.dump(cfg, fh)

    def t(*shape, scale=0.02):
        return (torch.randn(*shape, dtype=torch.float32) * scale).to(
            torch.float16)

    from safetensors.torch import save_file

    out_scale = 0.02
    if profile == "margin":
        out_scale = 0.02 * margin_mix / (max(L, 1) ** 0.5 * 0.02 * d)

    shard1, shard2 = {}, {}
    emb = torch.randn(V, d, dtype=torch.float32) * 0.02
    shard1["model.embed_tokens.weight"] = emb.to(torch.float16)
    for i in range(L):
        dst = shard1 if i < L // 2 else shard2
        p = f"model.layers.{i}."
        dst[p + "input_layernorm.weight"] = torch.ones(d,
                                                       dtype=torch.float16)
        for proj in ("q_proj", "k_proj", "v_proj"):
            dst[p + f"self_attn.{proj}.weight"] = t(d, d)
        dst[p + "self_attn.o_proj.weight"] = t(d, d, scale=out_scale)
        dst[p + "post_attention_layernorm.weight"] = torch.ones(
            d, dtype=torch.float16)
        dst[p + "mlp.gate_proj.weight"] = t(ffn, d)
        dst[p + "mlp.up_proj.weight"] = t(ffn, d)
        dst[p + "mlp.down_proj.weight"] = t(d, ffn, scale=out_scale)
    shard2["model.norm.weight"] = torch.ones(d, dtype=torch.float16)
    if profile == "margin":
        # per-row lognormal gains widen the margin distribution the way a
        # trained LM's confidence varies by context: a position whose
        # dominant stream token couples through a strong row is a
        # high-margin call, a weak row leaves the block noise competitive
        # → margins span near-0 to ~10x the median
        perm = torch.randperm(V)
        row_gain = torch.exp(
            torch.randn(V, 1, dtype=torch.float32) * 0.9)
        shard2["lm_head.weight"] = (
            margin_gain * row_gain * emb[perm]
            + torch.randn(V, d, dtype=torch.float32) * 0.002
        ).to(torch.float16)
    else:
        shard2["lm_head.weight"] = t(V, d)
    save_file(shard1, os.path.join(out_dir,
                                   "model-00001-of-00002.safetensors"))
    save_file(shard2, os.path.join(out_dir,
                                   "model-00002-of-00002.safetensors"))
    # HF from_pretrained needs the shard index (the real artifact has one)
    weight_map = {}
    for name, shard in (("model-00001-of-00002.safetensors", shard1),
                        ("model-00002-of-00002.safetensors", shard2)):
        for k in shard:
            weight_map[k] = name
    with open(os.path.join(out_dir, "model.safetensors.index.json"),
              "w") as fh:
        json.dump({"metadata": {"total_size": 0},
                   "weight_map": weight_map}, fh)
    return emb


def clip_vision_sd(prefix: str = "vision_model.", seed: int = 1, *,
                   w: int = 1024, L: int = 24, p: int = 14,
                   ffn: int = 4096, image_size: int = 224):
    import torch

    torch.manual_seed(seed)
    n_pos = (image_size // p) ** 2 + 1

    def t(*shape, scale=0.02):
        return torch.randn(*shape, dtype=torch.float32) * scale

    sd = {
        prefix + "embeddings.patch_embedding.weight": t(w, 3, p, p),
        prefix + "embeddings.class_embedding": t(w),
        prefix + "embeddings.position_embedding.weight": t(n_pos, w),
        prefix + "pre_layrnorm.weight": torch.ones(w),
        prefix + "pre_layrnorm.bias": torch.zeros(w),
        prefix + "post_layernorm.weight": torch.ones(w),
        prefix + "post_layernorm.bias": torch.zeros(w),
    }
    for i in range(L):
        lp = prefix + f"encoder.layers.{i}."
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[lp + f"self_attn.{name}.weight"] = t(w, w)
            sd[lp + f"self_attn.{name}.bias"] = torch.zeros(w)
        sd[lp + "layer_norm1.weight"] = torch.ones(w)
        sd[lp + "layer_norm1.bias"] = torch.zeros(w)
        sd[lp + "layer_norm2.weight"] = torch.ones(w)
        sd[lp + "layer_norm2.bias"] = torch.zeros(w)
        sd[lp + "mlp.fc1.weight"] = t(ffn, w)
        sd[lp + "mlp.fc1.bias"] = torch.zeros(ffn)
        sd[lp + "mlp.fc2.weight"] = t(w, ffn)
        sd[lp + "mlp.fc2.bias"] = torch.zeros(w)
    return sd


def write_clip(out_dir: str, *, w: int = 1024, L: int = 24,
               heads: int = 16, ffn: int = 4096, p: int = 14,
               image_size: int = 224) -> None:
    import torch

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as fh:
        json.dump({"model_type": "clip_vision_model", "hidden_size": w,
                   "num_hidden_layers": L, "num_attention_heads": heads,
                   "image_size": image_size, "patch_size": p,
                   "intermediate_size": ffn,
                   "hidden_act": "quick_gelu"}, fh)
    from safetensors.torch import save_file

    sd = {k: v.to(torch.float16)
          for k, v in clip_vision_sd(w=w, L=L, p=p, ffn=ffn,
                                     image_size=image_size).items()}
    save_file(sd, os.path.join(out_dir, "model.safetensors"))


def write_final_pt(path: str, resized_vocab: int = 32004,
                   seed: int = 2, *, w: int = 1024, nq: int = 144,
                   L: int = 6, d_llm: int = 4096, vit_layers: int = 24,
                   vit_ffn: int = 4096, vit_patch: int = 14,
                   image_size: int = 224, base_embedding=None) -> None:
    import torch

    torch.manual_seed(seed)

    def t(*shape, scale=0.02):
        return torch.randn(*shape, dtype=torch.float32) * scale

    # rgb_ckpt: keys as written by get_rgb_maybe_zero_3 — the VisionModal
    # module prefix is "encoder." (rgb.encoder = CLIPVisionModel)
    rgb = {("encoder." + k): v
           for k, v in clip_vision_sd(w=w, L=vit_layers, p=vit_patch,
                                      ffn=vit_ffn,
                                      image_size=image_size).items()}

    pooler = {"query": t(1, nq, w)}
    for i in range(L):
        p = f"layers.{i}."
        pooler[p + "attn.in_proj_weight"] = t(3 * w, w)
        pooler[p + "attn.in_proj_bias"] = torch.zeros(3 * w)
        pooler[p + "attn.out_proj.weight"] = t(w, w)
        pooler[p + "attn.out_proj.bias"] = torch.zeros(w)
        for ln in ("ln_1", "ln_1_kv", "ln_2"):
            pooler[p + f"{ln}.weight"] = torch.ones(w)
            pooler[p + f"{ln}.bias"] = torch.zeros(w)
        pooler[p + "mlp.c_fc.weight"] = t(4 * w, w)
        pooler[p + "mlp.c_fc.bias"] = torch.zeros(4 * w)
        pooler[p + "mlp.c_proj.weight"] = t(w, 4 * w)
        pooler[p + "mlp.c_proj.bias"] = torch.zeros(w)
    pooler["out_proj.weight"] = t(d_llm, w)
    pooler["out_proj.bias"] = torch.zeros(d_llm)

    # resized embedding rows (reference adds special tokens). When the
    # llama weights carry the margin profile, the overlay must KEEP the
    # base rows (the margin structure ties embed_tokens to lm_head) and
    # only append fresh rows for the special tokens.
    emb_overlay = t(resized_vocab, d_llm)
    if base_embedding is not None:
        n = min(base_embedding.shape[0], resized_vocab)
        emb_overlay[:n] = base_embedding[:n].to(emb_overlay.dtype)
    other = {
        "rgb_pooler": pooler,
        "text_proj": {},
        "embed_tokens": {"weight": emb_overlay},
        "lm_head": {},
    }
    torch.save({"rgb_ckpt": rgb, "other_ckpt": other}, path)


def write_text_lora(out_dir: str, r: int = 128, alpha: int = 256,
                    seed: int = 3, *, d: int = 4096, ffn: int = 11008,
                    L: int = 32, profile: str = "flat",
                    margin_mix: float = 1.0) -> None:
    import torch

    torch.manual_seed(seed)
    os.makedirs(out_dir, exist_ok=True)
    dims = {"q_proj": (d, d), "k_proj": (d, d), "v_proj": (d, d),
            "o_proj": (d, d), "gate_proj": (d, ffn), "up_proj": (d, ffn),
            "down_proj": (ffn, d)}
    # margin profile: the merged delta on the residual-WRITING projections
    # (o/down) must not swamp their deliberately small base scale — shrink
    # lora_B there by the same factor write_llama applies to the base
    out_shrink = 1.0
    if profile == "margin":
        out_shrink = margin_mix / (max(L, 1) ** 0.5 * 0.02 * d)
    sd = {}
    for i in range(L):
        for proj, (din, dout) in dims.items():
            base = (f"base_model.model.model.layers.{i}.self_attn."
                    if proj.endswith(("q_proj", "k_proj", "v_proj",
                                      "o_proj"))
                    else f"base_model.model.model.layers.{i}.mlp.")
            b_scale = 0.002 * (out_shrink
                               if proj in ("o_proj", "down_proj") else 1.0)
            sd[base + f"{proj}.lora_A.weight"] = (
                torch.randn(r, din) * 0.01)
            # nonzero B: a trained adapter's B is nonzero, and the parity
            # oracle (tools/parity_full_scale.py) must exercise a REAL
            # merge — zero B would make merge-vs-no-merge indistinguishable
            sd[base + f"{proj}.lora_B.weight"] = (
                torch.randn(dout, r) * b_scale)
    torch.save(sd, os.path.join(out_dir, "adapter_model.bin"))
    with open(os.path.join(out_dir, "adapter_config.json"), "w") as fh:
        json.dump({"peft_type": "LORA", "r": r, "lora_alpha": alpha,
                   "target_modules": list(dims)}, fh)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True)
    ap.add_argument("--resized-vocab", type=int, default=32004)
    # reduced-scale knobs (defaults = the published 7B recipe shapes);
    # used by the CI-runnable subset of tools/parity_full_scale.py
    ap.add_argument("--llama-layers", type=int, default=32)
    ap.add_argument("--llama-width", type=int, default=4096)
    ap.add_argument("--llama-ffn", type=int, default=11008)
    ap.add_argument("--llama-heads", type=int, default=32)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--vit-layers", type=int, default=24)
    ap.add_argument("--vit-width", type=int, default=1024)
    ap.add_argument("--vit-ffn", type=int, default=4096)
    ap.add_argument("--vit-heads", type=int, default=16)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--pooler-layers", type=int, default=6)
    ap.add_argument("--num-query", type=int, default=144)
    ap.add_argument("--lora-r", type=int, default=128)
    ap.add_argument("--profile", choices=("flat", "margin"),
                    default="flat",
                    help="'margin': realistic logit-margin spectrum "
                    "(residual-dominant blocks + embedding-coupled "
                    "lm_head) so greedy-agreement statistics are "
                    "informative; 'flat': legacy i.i.d. weights")
    ap.add_argument("--margin-gain", type=float, default=2.5)
    ap.add_argument("--margin-mix", type=float, default=5.0)
    args = ap.parse_args()
    os.makedirs(args.output, exist_ok=True)
    print("writing llama/ ...", flush=True)
    emb = write_llama(os.path.join(args.output, "llama"),
                      d=args.llama_width, ffn=args.llama_ffn,
                      L=args.llama_layers, heads=args.llama_heads,
                      V=args.vocab, profile=args.profile,
                      margin_gain=args.margin_gain,
                      margin_mix=args.margin_mix)
    print("writing clip/ ...", flush=True)
    write_clip(os.path.join(args.output, "clip"), w=args.vit_width,
               L=args.vit_layers, heads=args.vit_heads, ffn=args.vit_ffn,
               image_size=args.image_size)
    print("writing FINAL.pt ...", flush=True)
    write_final_pt(os.path.join(args.output, "FINAL.pt"),
                   args.resized_vocab, w=args.vit_width,
                   nq=args.num_query, L=args.pooler_layers,
                   d_llm=args.llama_width, vit_layers=args.vit_layers,
                   vit_ffn=args.vit_ffn, image_size=args.image_size,
                   base_embedding=(emb if args.profile == "margin"
                                   else None))
    print("writing TextLoRA/ ...", flush=True)
    write_text_lora(os.path.join(args.output, "TextLoRA"), r=args.lora_r,
                    alpha=2 * args.lora_r, d=args.llama_width,
                    ffn=args.llama_ffn, L=args.llama_layers,
                    profile=args.profile, margin_mix=args.margin_mix)
    with open(os.path.join(args.output, "gen_config.json"), "w") as fh:
        json.dump({"profile": args.profile,
                   "margin_gain": args.margin_gain,
                   "margin_mix": args.margin_mix}, fh)
    print("done:", args.output)


if __name__ == "__main__":
    main()
