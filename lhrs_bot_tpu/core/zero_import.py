"""DeepSpeed ZeRO checkpoint-directory ingestion.

The reference's mid-training checkpoints are ZeRO shard directories: a
``latest`` tag file plus ``global_step*/`` holding one
``mp_rank_00_model_states.pt`` and per-rank
``zero_pp_rank_{r}_mp_rank_00_optim_states.pt`` files. The reference
consolidates them with deepspeed's
``get_fp32_state_dict_from_zero_checkpoint`` both when saving FINAL.pt
(/root/reference/lhrs/models/UniBind.py:68-81) and when resuming/evaluating
straight from a directory (UniBind.py:83-88,
``load_state_dict_from_zero_checkpoint``). SURVEY §5.4 lists shard dirs as
artifact (a) the rebuild must consume.

This module reimplements the consolidation for ZeRO stages 1/2 (the
published recipes train with ZeRO-2: Script/train_stage*.sh →
``zero_optimization.stage: 2``): the authoritative fp32 values of every
*trainable* parameter live as flattened, rank-partitioned, group-wise
concatenated vectors inside the optimizer shards; frozen parameters and
buffers live in the model-states file. Reconstruction:

  1. for each param group g, concatenate each rank's
     ``single_partition_of_fp32_groups[g]`` in rank order → one flat vector
     (per-rank partitions are zero-padded at the end so every rank holds an
     equal share; the pad survives concatenation only at the group tail);
  2. walk ``param_shapes[g]`` in insertion order, carving
     ``prod(shape)``-element slices off the flat vector;
  3. frozen params come from ``frozen_param_fragments`` when present
     (DeepSpeed ≥0.8 writes them) else from the ``module`` state dict;
  4. buffers come from the ``module`` state dict (``buffer_names``).

ZeRO-3 directories (param-partitioned ``fp32_flat_groups``) are detected
and rejected with a clear error — the reference never produces them.

``load_zero_checkpoint`` then applies the reference's FINAL.pt split
(get_rgb_maybe_zero_3 / get_other_maybe_zero_3, UniBind.py:275-302) plus —
because a shard dir holds the WHOLE UniBind module, unlike FINAL.pt — the
text decoder and any live peft LoRA adapters (``custom_load_state_dict``'s
directory branch merges those, UniBind.py:84-88).
"""

from __future__ import annotations

import glob
import logging
import os
import re
from typing import Any, Dict, List, Optional

import numpy as np

from ..models.llama import LlamaConfig
from ..models.perceiver import PerceiverConfig
from ..models.vit import ViTConfig
from .torch_import import (
    _np,
    _stack,
    llama_params_from_hf_state_dict,
    pooler_params_from_torch_state_dict,
    vit_params_from_hf_state_dict,
)

logger = logging.getLogger("lhrs_tpu")

_MODEL_GLOB = "*_model_states.pt"
_OPTIM_GLOB = "*_optim_states.pt"


def looks_like_zero_checkpoint(path: str) -> bool:
    """True for a DeepSpeed checkpoint root (has ``latest``) or a tag dir
    (has ``*_model_states.pt``)."""
    if not os.path.isdir(path):
        return False
    if os.path.isfile(os.path.join(path, "latest")):
        return True
    return bool(glob.glob(os.path.join(path, _MODEL_GLOB)))


def _resolve_tag_dir(ckpt_dir: str, tag: Optional[str] = None) -> str:
    if tag is None:
        latest = os.path.join(ckpt_dir, "latest")
        if os.path.isfile(latest):
            with open(latest) as fh:
                tag = fh.read().strip()
    if tag:
        tagged = os.path.join(ckpt_dir, tag)
        if os.path.isdir(tagged):
            return tagged
        raise FileNotFoundError(
            f"tag directory {tagged!r} not found in ZeRO checkpoint")
    if glob.glob(os.path.join(ckpt_dir, _MODEL_GLOB)):
        return ckpt_dir  # caller pointed directly at the tag dir
    raise FileNotFoundError(
        f"{ckpt_dir!r} has no 'latest' file and no *_model_states.pt")


def _rank_key(path: str) -> int:
    m = re.search(r"zero_pp_rank_(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else 0


def get_fp32_state_dict_from_zero_checkpoint(
        ckpt_dir: str, tag: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Consolidate a ZeRO-1/2 shard directory → {name: fp32 numpy array}.

    Mirrors deepspeed.utils.zero_to_fp32.get_fp32_state_dict_from_
    zero_checkpoint for the data-parallel (mp_rank_00-only) layouts the
    reference produces.
    """
    import torch

    tag_dir = _resolve_tag_dir(ckpt_dir, tag)

    model_files = sorted(glob.glob(os.path.join(tag_dir, _MODEL_GLOB)))
    if not model_files:
        raise FileNotFoundError(f"no *_model_states.pt in {tag_dir!r}")
    if len(model_files) > 1:
        raise NotImplementedError(
            "model-parallel ZeRO checkpoints (multiple mp_rank model-states "
            "files) are not supported — the reference trains pure "
            "data-parallel ZeRO-2 (one mp_rank_00 file)")
    ms = torch.load(model_files[0], map_location="cpu", weights_only=False)

    optim_files = sorted(glob.glob(os.path.join(tag_dir, _OPTIM_GLOB)),
                         key=_rank_key)
    if not optim_files:
        raise FileNotFoundError(f"no *_optim_states.pt in {tag_dir!r}")

    osds = []
    for f in optim_files:
        sd = torch.load(f, map_location="cpu", weights_only=False)
        osds.append(sd.get("optimizer_state_dict", sd))
    zero_stage = int(osds[0].get("zero_stage", 2))
    if zero_stage not in (1, 2):
        raise NotImplementedError(
            f"ZeRO stage {zero_stage} consolidation not supported (the "
            "reference recipes are ZeRO-2); use deepspeed's zero_to_fp32 "
            "and import the resulting fp32 file instead")

    # flat fp32 partitions: one 1-D tensor per param group per rank
    def flat_groups(osd) -> List[np.ndarray]:
        for key in ("single_partition_of_fp32_groups", "fp32_flat_groups"):
            if key in osd:
                groups = osd[key]
                break
        else:
            raise KeyError(
                "optimizer shard missing single_partition_of_fp32_groups")
        out = []
        for g in groups:
            # newer DS sometimes nests a list of fragments per group
            if isinstance(g, (list, tuple)):
                out.append(np.concatenate(
                    [_np(x).reshape(-1).astype(np.float32) for x in g]))
            else:
                out.append(_np(g).reshape(-1).astype(np.float32))
        return out

    per_rank = [flat_groups(osd) for osd in osds]
    n_groups = len(per_rank[0])
    if any(len(r) != n_groups for r in per_rank):
        raise ValueError("optimizer shards disagree on param-group count")

    # param_shapes: list of {name: shape} per group (old DS: a single dict)
    param_shapes = ms.get("param_shapes")
    if param_shapes is None:
        raise KeyError("model-states file missing param_shapes")
    if isinstance(param_shapes, dict):
        param_shapes = [param_shapes]
    if len(param_shapes) != n_groups:
        raise ValueError(
            f"param_shapes has {len(param_shapes)} groups but optimizer "
            f"shards carry {n_groups}")

    state: Dict[str, np.ndarray] = {}

    # buffers first (zero_to_fp32 ordering), from the module state dict
    module_sd = ms.get("module", {}) or {}
    for name in ms.get("buffer_names", []) or []:
        if name in module_sd:
            state[name] = _np(module_sd[name]).astype(np.float32)

    # frozen params: fp32 fragments when saved, else the module copy
    frozen_shapes = ms.get("frozen_param_shapes") or {}
    frozen_frags = ms.get("frozen_param_fragments") or {}
    for name in frozen_shapes:
        src = frozen_frags.get(name, module_sd.get(name))
        if src is None:
            raise KeyError(f"frozen param {name!r} has no stored value")
        shape = tuple(frozen_shapes[name])
        state[name] = _np(src).astype(np.float32).reshape(shape)

    # trainable params from the merged flat groups
    trainable_names = {n for g in param_shapes for n in g}
    for g in range(n_groups):
        full = np.concatenate([r[g] for r in per_rank])
        offset = 0
        for name, shape in param_shapes[g].items():
            shape = tuple(int(s) for s in shape)
            numel = int(np.prod(shape)) if shape else 1
            if offset + numel > full.size:
                raise ValueError(
                    f"group {g} flat vector exhausted at {name!r}: need "
                    f"{offset + numel}, have {full.size}")
            state[name] = full[offset:offset + numel].reshape(shape)
            offset += numel
        # the remainder is per-rank alignment padding only
        pad = full.size - offset
        if pad >= max(len(per_rank), 1) * 64:
            logger.warning(
                "ZeRO group %d leaves %d unconsumed elements (expected "
                "only alignment padding) — shapes may be stale", g, pad)

    # anything in the module not already covered (e.g. frozen params in
    # checkpoints written without frozen_param_shapes)
    for name, val in module_sd.items():
        if name not in state and name not in trainable_names \
                and hasattr(val, "shape"):
            state[name] = _np(val).astype(np.float32)

    return state


# ---------------------------------------------------------------------------
# UniBind-module split (UniBind.py:275-302) + text/LoRA extraction
# ---------------------------------------------------------------------------


def _strip_text_prefix(key: str) -> str:
    k = key[len("text.text_encoder."):]
    # peft wrapping: base_model.model.<hf key>; base_layer shims on wrapped
    # linear layers
    if k.startswith("base_model.model."):
        k = k[len("base_model.model."):]
    return k.replace(".base_layer.", ".")


def split_unibind_state_dict(fp32_sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """UniBind module names → {rgb, pooler, text, lora, extra} groups.

    rgb / rgb_pooler / embed_tokens follow get_rgb_maybe_zero_3 /
    get_other_maybe_zero_3 exactly; text (full decoder) and lora (live peft
    adapters) have no FINAL.pt counterpart — they exist only in shard dirs.
    """
    rgb = {k[len("rgb."):]: v for k, v in fp32_sd.items()
           if k.startswith("rgb.")}
    pooler = {k.split("rgb_pooler.")[-1]: v for k, v in fp32_sd.items()
              if "rgb_pooler" in k}
    extra = {k: v for k, v in fp32_sd.items()
             if "embed_tokens" in k or ("lm_head" in k and "lora" not in k)}

    text: Dict[str, np.ndarray] = {}
    lora: Dict[str, np.ndarray] = {}
    for k, v in fp32_sd.items():
        if not k.startswith("text.text_encoder."):
            continue
        nk = _strip_text_prefix(k)
        if ".lora_A." in nk or ".lora_B." in nk:
            lora[nk] = v
        elif "lora" not in nk:
            text[nk] = v
    return {"rgb": rgb, "pooler": pooler, "text": text, "lora": lora,
            "extra": extra}


def _stacked_lora_from_keys(lora_sd: Dict[str, np.ndarray],
                            llama_cfg: LlamaConfig) -> Optional[Dict]:
    """peft lora_A/lora_B keys → our stacked {proj: {a, b}} layout (same
    transposes as torch_import.load_text_lora)."""
    name_map = {
        "q_proj": "wq", "k_proj": "wk", "v_proj": "wv", "o_proj": "wo",
        "gate_proj": "w_gate", "up_proj": "w_up", "down_proj": "w_down",
    }
    L = llama_cfg.num_hidden_layers
    out: Dict[str, Dict[str, list]] = {
        ours: {"a": [None] * L, "b": [None] * L}
        for ours in name_map.values()}
    for key, w in lora_sd.items():
        parts = key.split(".")
        try:
            layer_idx = int(parts[parts.index("layers") + 1])
            proj = next(p for p in name_map if p in key)
        except (ValueError, StopIteration):
            continue
        ours = name_map[proj]
        if ".lora_A." in key:
            out[ours]["a"][layer_idx] = np.asarray(w).T  # (r,in)→(in,r)
        else:
            out[ours]["b"][layer_idx] = np.asarray(w).T  # (out,r)→(r,out)
    stacked = {}
    for ours, ab in out.items():
        if any(x is None for x in ab["a"]) or any(x is None for x in ab["b"]):
            continue
        stacked[ours] = {"a": _stack(ab["a"]), "b": _stack(ab["b"])}
    return stacked or None


def load_zero_checkpoint(path: str, vit_cfg: ViTConfig,
                         pooler_cfg: PerceiverConfig,
                         llama_cfg: Optional[LlamaConfig] = None,
                         tag: Optional[str] = None) -> Dict[str, Any]:
    """ZeRO shard dir → the load_final_pt output shape (+ "llama"/"lora").

    Parity: custom_load_state_dict's directory branch (UniBind.py:84-88)
    restores the FULL module — vision tower, pooler, text decoder, live
    LoRA — from the consolidated fp32 state.
    """
    fp32 = get_fp32_state_dict_from_zero_checkpoint(path, tag)
    groups = split_unibind_state_dict(fp32)

    out: Dict[str, Any] = {"extra": {}}
    if groups["rgb"]:
        rgb_sd = {k.replace("encoder.", "", 1) if k.startswith("encoder.")
                  else k: v for k, v in groups["rgb"].items()}
        out["vit"] = vit_params_from_hf_state_dict(rgb_sd, vit_cfg)
    if groups["pooler"]:
        out["pooler"] = pooler_params_from_torch_state_dict(
            groups["pooler"], pooler_cfg)
    out["extra"] = dict(groups["extra"])

    if llama_cfg is not None and groups["text"]:
        probe = "model.layers.0.self_attn.q_proj.weight"
        if probe in groups["text"] or "layers.0.self_attn.q_proj.weight" \
                in groups["text"]:
            out["llama"] = llama_params_from_hf_state_dict(
                groups["text"], llama_cfg)
        if groups["lora"]:
            stacked = _stacked_lora_from_keys(groups["lora"], llama_cfg)
            if stacked:
                out["lora"] = stacked
    return out
