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


def write_llama(out_dir: str, seed: int = 0) -> None:
    import torch

    torch.manual_seed(seed)
    os.makedirs(out_dir, exist_ok=True)
    d, ffn, L, V = 4096, 11008, 32, 32000
    cfg = {
        "architectures": ["LlamaForCausalLM"], "model_type": "llama",
        "hidden_size": d, "intermediate_size": ffn,
        "num_hidden_layers": L, "num_attention_heads": 32,
        "num_key_value_heads": 32, "vocab_size": V,
        "max_position_embeddings": 2048, "rms_norm_eps": 1e-5,
        "torch_dtype": "float16",
    }
    with open(os.path.join(out_dir, "config.json"), "w") as fh:
        json.dump(cfg, fh)

    def t(*shape, scale=0.02):
        return (torch.randn(*shape, dtype=torch.float32) * scale).to(
            torch.float16)

    from safetensors.torch import save_file

    shard1, shard2 = {}, {}
    shard1["model.embed_tokens.weight"] = t(V, d)
    for i in range(L):
        dst = shard1 if i < L // 2 else shard2
        p = f"model.layers.{i}."
        dst[p + "input_layernorm.weight"] = torch.ones(d,
                                                       dtype=torch.float16)
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            dst[p + f"self_attn.{proj}.weight"] = t(d, d)
        dst[p + "post_attention_layernorm.weight"] = torch.ones(
            d, dtype=torch.float16)
        dst[p + "mlp.gate_proj.weight"] = t(ffn, d)
        dst[p + "mlp.up_proj.weight"] = t(ffn, d)
        dst[p + "mlp.down_proj.weight"] = t(d, ffn)
    shard2["model.norm.weight"] = torch.ones(d, dtype=torch.float16)
    shard2["lm_head.weight"] = t(V, d)
    save_file(shard1, os.path.join(out_dir,
                                   "model-00001-of-00002.safetensors"))
    save_file(shard2, os.path.join(out_dir,
                                   "model-00002-of-00002.safetensors"))


def clip_vision_sd(prefix: str = "vision_model.", seed: int = 1):
    import torch

    torch.manual_seed(seed)
    w, L, p, ffn = 1024, 24, 14, 4096

    def t(*shape, scale=0.02):
        return torch.randn(*shape, dtype=torch.float32) * scale

    sd = {
        prefix + "embeddings.patch_embedding.weight": t(w, 3, p, p),
        prefix + "embeddings.class_embedding": t(w),
        prefix + "embeddings.position_embedding.weight": t(257, w),
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


def write_clip(out_dir: str) -> None:
    import torch

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as fh:
        json.dump({"model_type": "clip_vision_model", "hidden_size": 1024,
                   "num_hidden_layers": 24, "num_attention_heads": 16,
                   "image_size": 224, "patch_size": 14,
                   "intermediate_size": 4096,
                   "hidden_act": "quick_gelu"}, fh)
    from safetensors.torch import save_file

    sd = {k: v.to(torch.float16) for k, v in clip_vision_sd().items()}
    save_file(sd, os.path.join(out_dir, "model.safetensors"))


def write_final_pt(path: str, resized_vocab: int = 32004,
                   seed: int = 2) -> None:
    import torch

    torch.manual_seed(seed)
    w, nq, L = 1024, 144, 6

    def t(*shape, scale=0.02):
        return torch.randn(*shape, dtype=torch.float32) * scale

    # rgb_ckpt: keys as written by get_rgb_maybe_zero_3 — the VisionModal
    # module prefix is "encoder." (rgb.encoder = CLIPVisionModel)
    rgb = {("encoder." + k): v for k, v in clip_vision_sd().items()}

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
    pooler["out_proj.weight"] = t(4096, w)
    pooler["out_proj.bias"] = torch.zeros(4096)

    other = {
        "rgb_pooler": pooler,
        "text_proj": {},
        # resized embedding rows (reference adds special tokens)
        "embed_tokens": {"weight": t(resized_vocab, 4096)},
        "lm_head": {},
    }
    torch.save({"rgb_ckpt": rgb, "other_ckpt": other}, path)


def write_text_lora(out_dir: str, r: int = 128, alpha: int = 256,
                    seed: int = 3) -> None:
    import torch

    torch.manual_seed(seed)
    os.makedirs(out_dir, exist_ok=True)
    d, ffn, L = 4096, 11008, 32
    dims = {"q_proj": (d, d), "k_proj": (d, d), "v_proj": (d, d),
            "o_proj": (d, d), "gate_proj": (d, ffn), "up_proj": (d, ffn),
            "down_proj": (ffn, d)}
    sd = {}
    for i in range(L):
        for proj, (din, dout) in dims.items():
            base = (f"base_model.model.model.layers.{i}.self_attn."
                    if proj.endswith(("q_proj", "k_proj", "v_proj",
                                      "o_proj"))
                    else f"base_model.model.model.layers.{i}.mlp.")
            sd[base + f"{proj}.lora_A.weight"] = (
                torch.randn(r, din) * 0.01)
            sd[base + f"{proj}.lora_B.weight"] = torch.zeros(dout, r)
    torch.save(sd, os.path.join(out_dir, "adapter_model.bin"))
    with open(os.path.join(out_dir, "adapter_config.json"), "w") as fh:
        json.dump({"peft_type": "LORA", "r": r, "lora_alpha": alpha,
                   "target_modules": list(dims)}, fh)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True)
    ap.add_argument("--resized-vocab", type=int, default=32004)
    args = ap.parse_args()
    os.makedirs(args.output, exist_ok=True)
    print("writing llama/ ...", flush=True)
    write_llama(os.path.join(args.output, "llama"))
    print("writing clip/ ...", flush=True)
    write_clip(os.path.join(args.output, "clip"))
    print("writing FINAL.pt ...", flush=True)
    write_final_pt(os.path.join(args.output, "FINAL.pt"),
                   args.resized_vocab)
    print("writing TextLoRA/ ...", flush=True)
    write_text_lora(os.path.join(args.output, "TextLoRA"))
    print("done:", args.output)


if __name__ == "__main__":
    main()
