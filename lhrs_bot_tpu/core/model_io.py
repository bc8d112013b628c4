"""Model-level checkpoint orchestration.

Parity with UniBind's custom checkpoint protocol (lhrs/models/UniBind.py):
  * custom_load_state_dict (:83-117): FINAL.pt's rgb_ckpt → vision tower,
    other_ckpt["rgb_pooler"] → perceiver; if a sibling TextLoRA/ directory
    exists, attach the adapters, and at eval (stage==0) fold them into the
    base weights (merge_and_unload);
  * custom_save_checkpoint (:68-81): export FINAL.pt {rgb_ckpt, other_ckpt}
    (+ TextLoRA/ when LoRA is active).

Base HF weights (CLIP ViT + LLaMA-2) load from the paths in the YAML config
(rgb_vision.vit_name / text.path) when they exist locally.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..models.lora import merge_lora
from ..models.vlm import VLMConfig, init_vlm_params
from . import torch_import as ti

logger = logging.getLogger("lhrs_tpu")


def load_pretrained(
    cfg: VLMConfig,
    *,
    model_path: Optional[str] = None,  # FINAL.pt (config.model_path)
    vit_path: Optional[str] = None,  # HF CLIP dir (rgb_vision.vit_name)
    llama_path: Optional[str] = None,  # HF LLaMA dir (text.path)
    rng: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> Dict:
    """Build params: random init, then overlay whatever artifacts exist.

    Everything happens on the HOST (CPU backend): a 7B f32 init is ~27 GB,
    which must never touch the 16 GB chip — callers (engine/trainer) cast,
    quantize and shard onto devices afterwards."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = _load_pretrained_host(cfg, model_path=model_path,
                                       vit_path=vit_path,
                                       llama_path=llama_path, rng=rng,
                                       dtype=dtype)
    # hand back NUMPY leaves: jax CPU-backend arrays look host-side but are
    # committed to a device, which (a) defeats the engine's host-quantize
    # fast path (isinstance np.ndarray) and (b) makes downstream jit
    # placement ambiguous under a non-CPU default backend
    import numpy as np

    return jax.tree_util.tree_map(np.asarray, params)


def _load_pretrained_host(cfg, *, model_path, vit_path, llama_path, rng,
                          dtype) -> Dict:
    params = init_vlm_params(rng, cfg, dtype)

    def fit(a, ref):
        """Tolerate row-count mismatches on embedding-like tensors: the
        reference resizes embeddings when special tokens are added
        (text_modal.py:219-236); overlapping rows are copied, new rows keep
        their init."""
        a = jnp.asarray(a, ref.dtype)
        if a.shape == ref.shape:
            return a
        if a.ndim == ref.ndim and a.shape[1:] == ref.shape[1:]:
            n = min(a.shape[0], ref.shape[0])
            logger.warning(
                "size mismatch %s vs %s — copying %d overlapping rows",
                a.shape, ref.shape, n)
            return ref.at[:n].set(a[:n])
        if a.ndim == ref.ndim and a.shape[:-1] == ref.shape[:-1]:
            n = min(a.shape[-1], ref.shape[-1])
            logger.warning(
                "size mismatch %s vs %s — copying %d overlapping cols",
                a.shape, ref.shape, n)
            return ref.at[..., :n].set(a[..., :n])
        raise ValueError(f"incompatible shapes {a.shape} vs {ref.shape}")

    def as_tree(np_tree, like):
        return jax.tree_util.tree_map(fit, np_tree, like)

    if vit_path and os.path.isdir(vit_path):
        logger.info("loading CLIP vision tower from %s", vit_path)
        params["vit"] = as_tree(
            ti.load_hf_clip_vision(vit_path, cfg.vit), params["vit"])
    if llama_path and os.path.isdir(llama_path):
        logger.info("loading LLaMA decoder from %s", llama_path)
        params["llama"] = as_tree(
            ti.load_hf_llama(llama_path, cfg.llama), params["llama"])

    from .zero_import import load_zero_checkpoint, looks_like_zero_checkpoint

    if model_path and looks_like_zero_checkpoint(model_path):
        # custom_load_state_dict's directory branch (UniBind.py:84-88):
        # consolidate the DeepSpeed ZeRO shard dir to fp32 and restore the
        # FULL module (tower + pooler + decoder + any live LoRA)
        logger.info("loading DeepSpeed ZeRO shard dir from %s", model_path)
        loaded = load_zero_checkpoint(model_path, cfg.vit, cfg.pooler,
                                      cfg.llama)
        if "vit" in loaded:
            params["vit"] = as_tree(loaded["vit"], params["vit"])
        if "pooler" in loaded:
            params["pooler"] = as_tree(loaded["pooler"], params["pooler"])
        if "llama" in loaded:
            params["llama"] = as_tree(loaded["llama"], params["llama"])
        for key, val in loaded.get("extra", {}).items():
            if "embed_tokens" in key:
                params["llama"]["embed_tokens"] = fit(
                    val, params["llama"]["embed_tokens"])
            if "lm_head" in key:
                w = val.T if val.shape[0] != cfg.llama.hidden_size else val
                params["llama"]["lm_head"] = fit(
                    w, params["llama"]["lm_head"])
        lora = loaded.get("lora")
        if lora is not None:
            lora = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, dtype), lora)
            if cfg.stage == 0:
                # the reference merges live adapters on directory loads
                # (UniBind.py:86-87 merge_and_unload)
                from ..models.lora import LoraConfig

                r = cfg.lora.r if cfg.lora else 128
                alpha = cfg.lora.alpha if cfg.lora else 256
                lcfg = cfg.lora or LoraConfig(r=r, alpha=alpha)
                params["llama"]["layers"] = merge_lora(
                    params["llama"]["layers"], lora, lcfg,
                    stop_base_gradient=False)
            else:
                params["lora"] = lora
    elif model_path and os.path.exists(model_path):
        logger.info("loading FINAL checkpoint from %s", model_path)
        loaded = ti.load_final_pt(model_path, cfg.vit, cfg.pooler)
        if "vit" in loaded:
            params["vit"] = as_tree(loaded["vit"], params["vit"])
        if "pooler" in loaded:
            params["pooler"] = as_tree(loaded["pooler"], params["pooler"])
        for key, val in loaded.get("extra", {}).items():
            if "embed_tokens" in key:
                params["llama"]["embed_tokens"] = fit(
                    val, params["llama"]["embed_tokens"])
            if "lm_head" in key:
                w = val.T if val.shape[0] != cfg.llama.hidden_size else val
                params["llama"]["lm_head"] = fit(
                    w, params["llama"]["lm_head"])

        # TextLoRA detect-and-merge (UniBind.py:105-116)
        lora_dir = os.path.join(os.path.dirname(model_path), "TextLoRA")
        r = cfg.lora.r if cfg.lora else 128
        alpha = cfg.lora.alpha if cfg.lora else 256
        lora = ti.load_text_lora(lora_dir, cfg.llama, r, alpha)
        if lora is not None:
            logger.info("found TextLoRA adapters at %s", lora_dir)
            lora = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, dtype), lora)
            if cfg.stage == 0:
                # eval: merge_and_unload — fold into base weights
                from ..models.lora import LoraConfig

                lcfg = cfg.lora or LoraConfig(r=r, alpha=alpha)
                params["llama"]["layers"] = merge_lora(
                    params["llama"]["layers"], lora, lcfg,
                    stop_base_gradient=False)
            else:
                params["lora"] = lora
    if cfg.stage == 0:
        # eval never carries live adapters (they are merged or absent)
        params.pop("lora", None)
    return params


def save_orbax_params(path: str, params: Dict) -> str:
    """One-time conversion target: orbax pytree checkpoint of the full VLM
    params (fast parallel load at serving startup; see
    tools/convert_checkpoint.py)."""
    import shutil

    import numpy as np
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if os.path.exists(path):
        # overwrite stale output — but ONLY if it looks like a prior orbax
        # checkpoint; a mistyped --out pointing at an unrelated directory
        # must not be recursively deleted
        markers = ("_METADATA", "_CHECKPOINT_METADATA", "manifest.ocdbt",
                   "checkpoint")
        looks_like_ckpt = os.path.isdir(path) and any(
            os.path.exists(os.path.join(path, m)) for m in markers)
        if not looks_like_ckpt:
            raise ValueError(
                f"refusing to overwrite {path!r}: it exists but does not "
                "look like an orbax checkpoint (no "
                f"{'/'.join(markers)} inside); remove it manually or pick "
                "another output path")
        shutil.rmtree(path)
    host = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    ocp.PyTreeCheckpointer().save(path, host)
    return path


def load_orbax_params(path: str, cfg: VLMConfig, *,
                      rng: Optional[jax.Array] = None) -> Dict:
    """Restore params written by save_orbax_params (structure template from
    a fresh init so dtypes/treedef match)."""
    import numpy as np
    import orbax.checkpoint as ocp

    del rng, cfg  # structure/dtypes come from the checkpoint metadata:
    # a fresh-init template cannot describe merged-LoRA or resized-vocab
    # trees (and a real init would allocate 27 GB on-device at 7B scale)
    restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    # keep leaves on host (numpy): callers cast/quantize per use — a full
    # device_put of the f32 tree would not fit next to a serving engine
    return jax.tree_util.tree_map(np.asarray, restored)


def save_final(output_dir: str, params: Dict, cfg: VLMConfig,
               filename: str = "FINAL.pt") -> str:
    """custom_save_checkpoint parity: FINAL.pt + TextLoRA/ (when present)."""
    os.makedirs(output_dir, exist_ok=True)
    host = jax.tree_util.tree_map(
        lambda x: jax.device_get(x) if hasattr(x, "dtype") else x, params)
    path = os.path.join(output_dir, filename)
    ti.export_final_pt(path, host, cfg.vit, cfg.pooler)
    if "lora" in host and cfg.lora is not None:
        ti.export_text_lora(os.path.join(output_dir, "TextLoRA"),
                            host["lora"], cfg.llama, cfg.lora.r,
                            cfg.lora.alpha)
    logger.info("saved final checkpoint to %s", path)
    return path
