"""Torch/HF checkpoint interop: import the reference's weights, export back.

Parity targets (SURVEY.md §5.4 checkpoint artifacts):
  * HF LLaMA-2 (`LlamaForCausalLM` state dict) → stacked decoder params;
  * HF CLIP vision tower (`CLIPVisionModel`) → ViT params;
  * the consolidated FINAL.pt = {rgb_ckpt, other_ckpt{rgb_pooler, ...}}
    written by UniBind.custom_save_checkpoint (UniBind.py:68-81, :275-302);
  * the TextLoRA/ peft directory with detect-and-merge at load
    (UniBind.py:105-116) — adapter A/B matrices → stacked LoRA params;
  * reverse export of FINAL.pt + TextLoRA for round-tripping.

torch is used CPU-only as a (de)serialization library; all math stays in JAX.
Weight-layout conventions: torch Linear stores (out, in) — ours are (in, out),
so every projection transposes; nn.MultiheadAttention packs q/k/v row-wise in
in_proj_weight; HF conv patch-embed (out, in, kh, kw) flattens to our
(kh*kw*in, out) with (row, col, channel) pixel order.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from ..models.llama import LlamaConfig
from ..models.perceiver import PerceiverConfig
from ..models.vit import ViTConfig


def _np(tensor) -> np.ndarray:
    """Preserve the stored dtype: upcasting a 13.5 GB f16 checkpoint to f32
    on the host doubles the copy work at load (consumers cast to their
    compute dtype on device anyway)."""
    if isinstance(tensor, np.ndarray):
        return tensor  # already host-side (e.g. the ZeRO consolidation path)
    t = tensor.detach().to("cpu")
    if t.dtype == __import__("torch").bfloat16:
        t = t.float()  # numpy has no bf16
    return t.numpy()


def _stack(layers):
    return np.stack(layers, axis=0)


# ---------------------------------------------------------------------------
# HF LLaMA
# ---------------------------------------------------------------------------


def llama_params_from_hf_state_dict(sd: Dict[str, Any],
                                    cfg: LlamaConfig) -> Dict:
    """Keys like model.layers.{i}.self_attn.q_proj.weight →
    init_llama_params structure."""
    def get(key):
        for prefix in ("", "model."):
            k = prefix + key
            if k in sd:
                return _np(sd[k])
        raise KeyError(key)

    L = cfg.num_hidden_layers
    layers = {
        "input_norm": [], "wq": [], "wk": [], "wv": [], "wo": [],
        "post_attn_norm": [], "w_gate": [], "w_up": [], "w_down": [],
    }
    for i in range(L):
        p = f"layers.{i}."
        layers["input_norm"].append(get(p + "input_layernorm.weight"))
        layers["wq"].append(get(p + "self_attn.q_proj.weight").T)
        layers["wk"].append(get(p + "self_attn.k_proj.weight").T)
        layers["wv"].append(get(p + "self_attn.v_proj.weight").T)
        layers["wo"].append(get(p + "self_attn.o_proj.weight").T)
        layers["post_attn_norm"].append(
            get(p + "post_attention_layernorm.weight"))
        layers["w_gate"].append(get(p + "mlp.gate_proj.weight").T)
        layers["w_up"].append(get(p + "mlp.up_proj.weight").T)
        layers["w_down"].append(get(p + "mlp.down_proj.weight").T)

    def get_top(key, alt):
        for k in (key, alt):
            for prefix in ("", "model."):
                if prefix + k in sd:
                    return _np(sd[prefix + k])
        raise KeyError(key)

    return {
        "embed_tokens": get_top("embed_tokens.weight",
                                "model.embed_tokens.weight"),
        "layers": {k: _stack(v) for k, v in layers.items()},
        "final_norm": get_top("norm.weight", "model.norm.weight"),
        "lm_head": get_top("lm_head.weight", "lm_head.weight").T,
    }


def load_hf_llama(path: str, cfg: LlamaConfig) -> Dict:
    """Load from a HF model dir (safetensors or torch bins)."""
    sd = _load_hf_dir_state_dict(path)
    return llama_params_from_hf_state_dict(sd, cfg)


def _load_hf_dir_state_dict(path: str) -> Dict[str, Any]:
    import torch

    sd: Dict[str, Any] = {}
    st_files = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    if st_files:
        from safetensors.torch import load_file

        for f in sorted(st_files):
            sd.update(load_file(os.path.join(path, f)))
        return sd
    bin_files = [f for f in os.listdir(path)
                 if f.endswith(".bin") and "pytorch_model" in f]
    for f in sorted(bin_files):
        sd.update(torch.load(os.path.join(path, f), map_location="cpu",
                             weights_only=True))
    return sd


def export_hf_llama_state_dict(params: Dict, cfg: LlamaConfig) -> Dict:
    """Our decoder params → HF LlamaForCausalLM state dict (round-trip of
    llama_params_from_hf_state_dict)."""
    import torch

    t = lambda x: torch.from_numpy(np.asarray(x, np.float32).copy())
    sd = {
        "model.embed_tokens.weight": t(params["embed_tokens"]),
        "model.norm.weight": t(params["final_norm"]),
        "lm_head.weight": t(np.asarray(params["lm_head"]).T),
    }
    lyr = params["layers"]
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = t(lyr["input_norm"][i])
        sd[p + "self_attn.q_proj.weight"] = t(np.asarray(lyr["wq"][i]).T)
        sd[p + "self_attn.k_proj.weight"] = t(np.asarray(lyr["wk"][i]).T)
        sd[p + "self_attn.v_proj.weight"] = t(np.asarray(lyr["wv"][i]).T)
        sd[p + "self_attn.o_proj.weight"] = t(np.asarray(lyr["wo"][i]).T)
        sd[p + "post_attention_layernorm.weight"] = t(
            lyr["post_attn_norm"][i])
        sd[p + "mlp.gate_proj.weight"] = t(np.asarray(lyr["w_gate"][i]).T)
        sd[p + "mlp.up_proj.weight"] = t(np.asarray(lyr["w_up"][i]).T)
        sd[p + "mlp.down_proj.weight"] = t(np.asarray(lyr["w_down"][i]).T)
    return sd


# ---------------------------------------------------------------------------
# HF CLIP vision tower
# ---------------------------------------------------------------------------


def vit_params_from_hf_state_dict(sd: Dict[str, Any],
                                  cfg: ViTConfig) -> Dict:
    def get(key):
        for prefix in ("vision_model.", "vision_tower.vision_model.",
                       "model.vision_model.", ""):
            k = prefix + key
            if k in sd:
                return _np(sd[k])
        raise KeyError(key)

    conv = get("embeddings.patch_embedding.weight")  # (W, 3, p, p)
    patch_proj = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])

    L = cfg.layers
    layers = {k: [] for k in (
        "ln1_scale", "ln1_bias", "wq", "bq", "wk", "bk", "wv", "bv",
        "wo", "bo", "ln2_scale", "ln2_bias", "w_fc", "b_fc", "w_proj",
        "b_proj")}
    for i in range(L):
        p = f"encoder.layers.{i}."
        layers["ln1_scale"].append(get(p + "layer_norm1.weight"))
        layers["ln1_bias"].append(get(p + "layer_norm1.bias"))
        layers["wq"].append(get(p + "self_attn.q_proj.weight").T)
        layers["bq"].append(get(p + "self_attn.q_proj.bias"))
        layers["wk"].append(get(p + "self_attn.k_proj.weight").T)
        layers["bk"].append(get(p + "self_attn.k_proj.bias"))
        layers["wv"].append(get(p + "self_attn.v_proj.weight").T)
        layers["bv"].append(get(p + "self_attn.v_proj.bias"))
        layers["wo"].append(get(p + "self_attn.out_proj.weight").T)
        layers["bo"].append(get(p + "self_attn.out_proj.bias"))
        layers["ln2_scale"].append(get(p + "layer_norm2.weight"))
        layers["ln2_bias"].append(get(p + "layer_norm2.bias"))
        layers["w_fc"].append(get(p + "mlp.fc1.weight").T)
        layers["b_fc"].append(get(p + "mlp.fc1.bias"))
        layers["w_proj"].append(get(p + "mlp.fc2.weight").T)
        layers["b_proj"].append(get(p + "mlp.fc2.bias"))

    return {
        "patch_proj": patch_proj,
        "class_emb": get("embeddings.class_embedding"),
        "pos_emb": get("embeddings.position_embedding.weight"),
        "pre_ln": {"scale": get("pre_layrnorm.weight"),
                   "bias": get("pre_layrnorm.bias")},
        "post_ln": {"scale": get("post_layernorm.weight"),
                    "bias": get("post_layernorm.bias")},
        "layers": {k: _stack(v) for k, v in layers.items()},
    }


def load_hf_clip_vision(path: str, cfg: ViTConfig) -> Dict:
    sd = _load_hf_dir_state_dict(path)
    return vit_params_from_hf_state_dict(sd, cfg)


# ---------------------------------------------------------------------------
# Perceiver (AttnPooler torch state dict, common_arch.py:93-132)
# ---------------------------------------------------------------------------


def pooler_params_from_torch_state_dict(sd: Dict[str, Any],
                                        cfg: PerceiverConfig) -> Dict:
    def get(key):
        for prefix in ("", "rgb_pooler."):
            if prefix + key in sd:
                return _np(sd[prefix + key])
        raise KeyError(key)

    h = cfg.hidden_size
    L = cfg.num_layers
    layers = {k: [] for k in (
        "ln1_scale", "ln1_bias", "ln_kv_scale", "ln_kv_bias",
        "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
        "ln2_scale", "ln2_bias", "w_fc", "b_fc", "w_proj", "b_proj")}
    for i in range(L):
        p = f"layers.{i}."
        in_w = get(p + "attn.in_proj_weight")  # (3h, h) rows [q; k; v]
        in_b = get(p + "attn.in_proj_bias")
        layers["wq"].append(in_w[:h].T)
        layers["bq"].append(in_b[:h])
        layers["wk"].append(in_w[h:2 * h].T)
        layers["bk"].append(in_b[h:2 * h])
        layers["wv"].append(in_w[2 * h:].T)
        layers["bv"].append(in_b[2 * h:])
        layers["wo"].append(get(p + "attn.out_proj.weight").T)
        layers["bo"].append(get(p + "attn.out_proj.bias"))
        layers["ln1_scale"].append(get(p + "ln_1.weight"))
        layers["ln1_bias"].append(get(p + "ln_1.bias"))
        layers["ln_kv_scale"].append(get(p + "ln_1_kv.weight"))
        layers["ln_kv_bias"].append(get(p + "ln_1_kv.bias"))
        layers["ln2_scale"].append(get(p + "ln_2.weight"))
        layers["ln2_bias"].append(get(p + "ln_2.bias"))
        layers["w_fc"].append(get(p + "mlp.c_fc.weight").T)
        layers["b_fc"].append(get(p + "mlp.c_fc.bias"))
        layers["w_proj"].append(get(p + "mlp.c_proj.weight").T)
        layers["b_proj"].append(get(p + "mlp.c_proj.bias"))

    params = {
        "query": get("query")[0],  # stored (1, nq, h)
        "layers": {k: _stack(v) for k, v in layers.items()},
        "out_proj_w": get("out_proj.weight").T,
        "out_proj_b": get("out_proj.bias"),
    }
    if "in_proj.weight" in sd or "rgb_pooler.in_proj.weight" in sd:
        params["in_proj_w"] = get("in_proj.weight").T
        params["in_proj_b"] = get("in_proj.bias")
    return params


# ---------------------------------------------------------------------------
# FINAL.pt + TextLoRA
# ---------------------------------------------------------------------------


def load_final_pt(path: str, vit_cfg: ViTConfig,
                  pooler_cfg: PerceiverConfig) -> Dict[str, Dict]:
    """FINAL.pt → {"vit": ..., "pooler": ..., "extra": {...}}.

    rgb_ckpt holds the (possibly fine-tuned) CLIP tower. The reference's
    other_ckpt is NESTED — get_other_maybe_zero_3 (UniBind.py:275-294) writes
    {"rgb_pooler": {...}, "text_proj": {}, "embed_tokens": {...},
    "lm_head": {}} with the group prefix stripped from sub-keys. A flat
    layout ("rgb_pooler.<param>" keys) is also accepted for artifacts
    written by older exports of this framework."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "model" in ckpt and "rgb_ckpt" not in ckpt:
        ckpt = ckpt["model"]  # custom_load_state_dict parity (UniBind.py:90-92)
    rgb_sd = ckpt.get("rgb_ckpt", {})
    other_sd = ckpt.get("other_ckpt", {})

    out: Dict[str, Any] = {"extra": {}}
    if rgb_sd:
        rgb_sd = {k.replace("encoder.", "", 1) if k.startswith("encoder.")
                  else k: v for k, v in rgb_sd.items()}
        out["vit"] = vit_params_from_hf_state_dict(rgb_sd, vit_cfg)

    if isinstance(other_sd.get("rgb_pooler"), dict):
        # nested reference layout
        pooler_sd = other_sd["rgb_pooler"]
        extra_src: Dict[str, Any] = {}
        for group in ("embed_tokens", "lm_head"):
            sub = other_sd.get(group)
            if isinstance(sub, dict):
                extra_src.update(
                    {f"{group}.{k}": v for k, v in sub.items()})
    else:
        # flat layout
        pooler_sd = {k[len("rgb_pooler."):]: v for k, v in other_sd.items()
                     if k.startswith("rgb_pooler.")}
        extra_src = {k: v for k, v in other_sd.items()
                     if not k.startswith("rgb_pooler.")
                     and ("embed_tokens" in k or "lm_head" in k)}
    if pooler_sd:
        out["pooler"] = pooler_params_from_torch_state_dict(
            pooler_sd, pooler_cfg)
    out["extra"] = {k: _np(v) for k, v in extra_src.items()
                    if hasattr(v, "detach")}
    return out


def load_text_lora(lora_dir: str, llama_cfg: LlamaConfig,
                   r: int, alpha: int) -> Optional[Dict]:
    """TextLoRA/ peft directory → stacked LoRA params (detect-and-merge
    parity: returns None when the directory doesn't exist)."""
    import torch

    if not os.path.isdir(lora_dir):
        return None
    candidates = ["adapter_model.bin", "adapter_model.safetensors"]
    sd = None
    for name in candidates:
        p = os.path.join(lora_dir, name)
        if os.path.exists(p):
            if name.endswith(".safetensors"):
                from safetensors.torch import load_file

                sd = load_file(p)
            else:
                sd = torch.load(p, map_location="cpu", weights_only=True)
            break
    if sd is None:
        return None

    name_map = {
        "q_proj": "wq", "k_proj": "wk", "v_proj": "wv", "o_proj": "wo",
        "gate_proj": "w_gate", "up_proj": "w_up", "down_proj": "w_down",
    }
    L = llama_cfg.num_hidden_layers
    out: Dict[str, Dict[str, list]] = {
        ours: {"a": [None] * L, "b": [None] * L}
        for ours in name_map.values()}
    for key, tensor in sd.items():
        if "lora_A" not in key and "lora_B" not in key:
            continue
        parts = key.split(".")
        layer_idx = int(parts[parts.index("layers") + 1])
        proj = next(p for p in name_map if p in key)
        ours = name_map[proj]
        w = _np(tensor)
        if "lora_A" in key:
            out[ours]["a"][layer_idx] = w.T  # (r, d_in) → (d_in, r)
        else:
            out[ours]["b"][layer_idx] = w.T  # (d_out, r) → (r, d_out)
    stacked = {}
    for ours, ab in out.items():
        if any(x is None for x in ab["a"]) or any(x is None for x in ab["b"]):
            continue
        stacked[ours] = {"a": _stack(ab["a"]), "b": _stack(ab["b"])}
    return stacked or None


# ---------------------------------------------------------------------------
# Export (round-trip): our params → FINAL.pt-compatible artifacts
# ---------------------------------------------------------------------------


def export_final_pt(path: str, params: Dict, vit_cfg: ViTConfig,
                    pooler_cfg: PerceiverConfig) -> None:
    """Write {rgb_ckpt, other_ckpt} consumable by load_final_pt (and shaped
    like the reference's artifact for external tooling)."""
    import torch

    t = lambda x: torch.from_numpy(np.asarray(x, np.float32).copy())
    vit = params["vit"]
    rgb_sd = {}
    conv = np.asarray(vit["patch_proj"])  # (p*p*3, W)
    p = vit_cfg.patch_size
    rgb_sd["vision_model.embeddings.patch_embedding.weight"] = t(
        conv.reshape(p, p, 3, -1).transpose(3, 2, 0, 1))
    rgb_sd["vision_model.embeddings.class_embedding"] = t(vit["class_emb"])
    rgb_sd["vision_model.embeddings.position_embedding.weight"] = t(
        vit["pos_emb"])
    rgb_sd["vision_model.pre_layrnorm.weight"] = t(vit["pre_ln"]["scale"])
    rgb_sd["vision_model.pre_layrnorm.bias"] = t(vit["pre_ln"]["bias"])
    rgb_sd["vision_model.post_layernorm.weight"] = t(vit["post_ln"]["scale"])
    rgb_sd["vision_model.post_layernorm.bias"] = t(vit["post_ln"]["bias"])
    lyr = vit["layers"]
    for i in range(vit_cfg.layers):
        pref = f"vision_model.encoder.layers.{i}."
        rgb_sd[pref + "layer_norm1.weight"] = t(lyr["ln1_scale"][i])
        rgb_sd[pref + "layer_norm1.bias"] = t(lyr["ln1_bias"][i])
        rgb_sd[pref + "self_attn.q_proj.weight"] = t(np.asarray(lyr["wq"][i]).T)
        rgb_sd[pref + "self_attn.q_proj.bias"] = t(lyr["bq"][i])
        rgb_sd[pref + "self_attn.k_proj.weight"] = t(np.asarray(lyr["wk"][i]).T)
        rgb_sd[pref + "self_attn.k_proj.bias"] = t(lyr["bk"][i])
        rgb_sd[pref + "self_attn.v_proj.weight"] = t(np.asarray(lyr["wv"][i]).T)
        rgb_sd[pref + "self_attn.v_proj.bias"] = t(lyr["bv"][i])
        rgb_sd[pref + "self_attn.out_proj.weight"] = t(np.asarray(lyr["wo"][i]).T)
        rgb_sd[pref + "self_attn.out_proj.bias"] = t(lyr["bo"][i])
        rgb_sd[pref + "layer_norm2.weight"] = t(lyr["ln2_scale"][i])
        rgb_sd[pref + "layer_norm2.bias"] = t(lyr["ln2_bias"][i])
        rgb_sd[pref + "mlp.fc1.weight"] = t(np.asarray(lyr["w_fc"][i]).T)
        rgb_sd[pref + "mlp.fc1.bias"] = t(lyr["b_fc"][i])
        rgb_sd[pref + "mlp.fc2.weight"] = t(np.asarray(lyr["w_proj"][i]).T)
        rgb_sd[pref + "mlp.fc2.bias"] = t(lyr["b_proj"][i])

    # other_ckpt uses the reference's NESTED layout (UniBind.py:275-294):
    # group dicts keyed rgb_pooler/text_proj/embed_tokens/lm_head, with the
    # group prefix stripped from sub-keys.
    pool = params["pooler"]
    pl = pool["layers"]
    h = pooler_cfg.hidden_size
    pool_sd = {"query": t(np.asarray(pool["query"])[None])}
    for i in range(pooler_cfg.num_layers):
        pref = f"layers.{i}."
        in_w = np.concatenate(
            [np.asarray(pl["wq"][i]).T, np.asarray(pl["wk"][i]).T,
             np.asarray(pl["wv"][i]).T], axis=0)
        in_b = np.concatenate(
            [np.asarray(pl["bq"][i]), np.asarray(pl["bk"][i]),
             np.asarray(pl["bv"][i])], axis=0)
        pool_sd[pref + "attn.in_proj_weight"] = t(in_w)
        pool_sd[pref + "attn.in_proj_bias"] = t(in_b)
        pool_sd[pref + "attn.out_proj.weight"] = t(np.asarray(pl["wo"][i]).T)
        pool_sd[pref + "attn.out_proj.bias"] = t(pl["bo"][i])
        pool_sd[pref + "ln_1.weight"] = t(pl["ln1_scale"][i])
        pool_sd[pref + "ln_1.bias"] = t(pl["ln1_bias"][i])
        pool_sd[pref + "ln_1_kv.weight"] = t(pl["ln_kv_scale"][i])
        pool_sd[pref + "ln_1_kv.bias"] = t(pl["ln_kv_bias"][i])
        pool_sd[pref + "ln_2.weight"] = t(pl["ln2_scale"][i])
        pool_sd[pref + "ln_2.bias"] = t(pl["ln2_bias"][i])
        pool_sd[pref + "mlp.c_fc.weight"] = t(np.asarray(pl["w_fc"][i]).T)
        pool_sd[pref + "mlp.c_fc.bias"] = t(pl["b_fc"][i])
        pool_sd[pref + "mlp.c_proj.weight"] = t(np.asarray(pl["w_proj"][i]).T)
        pool_sd[pref + "mlp.c_proj.bias"] = t(pl["b_proj"][i])
    pool_sd["out_proj.weight"] = t(np.asarray(pool["out_proj_w"]).T)
    pool_sd["out_proj.bias"] = t(pool["out_proj_b"])
    if "in_proj_w" in pool:
        pool_sd["in_proj.weight"] = t(np.asarray(pool["in_proj_w"]).T)
        pool_sd["in_proj.bias"] = t(pool["in_proj_b"])

    extra = params.get("extra", {})
    other_sd = {
        "rgb_pooler": pool_sd,
        "text_proj": {},
        "embed_tokens": {k.split("embed_tokens.")[-1]: t(v)
                         for k, v in extra.items() if "embed_tokens" in k},
        "lm_head": {k.split("lm_head.")[-1]: t(v)
                    for k, v in extra.items() if "lm_head" in k},
    }
    torch.save({"rgb_ckpt": rgb_sd, "other_ckpt": other_sd}, path)


def export_text_lora(lora_dir: str, lora_params: Dict,
                     llama_cfg: LlamaConfig, r: int, alpha: int) -> None:
    """Write a peft-layout TextLoRA/ directory (adapter_model.bin +
    adapter_config.json)."""
    import json

    import torch

    os.makedirs(lora_dir, exist_ok=True)
    name_map = {
        "wq": "q_proj", "wk": "k_proj", "wv": "v_proj", "wo": "o_proj",
        "w_gate": "gate_proj", "w_up": "up_proj", "w_down": "down_proj",
    }
    sd = {}
    for ours, ab in lora_params.items():
        peft_name = name_map[ours]
        a = np.asarray(ab["a"])
        b = np.asarray(ab["b"])
        for i in range(a.shape[0]):
            base = (f"base_model.model.model.layers.{i}.self_attn."
                    if peft_name in ("q_proj", "k_proj", "v_proj", "o_proj")
                    else f"base_model.model.model.layers.{i}.mlp.")
            sd[base + f"{peft_name}.lora_A.weight"] = torch.from_numpy(
                a[i].T.astype(np.float32))
            sd[base + f"{peft_name}.lora_B.weight"] = torch.from_numpy(
                b[i].T.astype(np.float32))
    torch.save(sd, os.path.join(lora_dir, "adapter_model.bin"))
    with open(os.path.join(lora_dir, "adapter_config.json"), "w") as fh:
        json.dump({"peft_type": "LORA", "r": r, "lora_alpha": alpha,
                   "target_modules": list(name_map.values())}, fh)
