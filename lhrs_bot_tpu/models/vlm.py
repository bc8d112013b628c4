"""LhrsVLM — the composed vision-language model.

Capability parity with the reference's UniBind composite
(lhrs/models/UniBind.py:24-242): vision tower → multi-level perceiver →
embedding splice → LLaMA-2 decoder, with a training forward returning
{text_loss, total_loss} (UniBind.forward :178-199), an encode_image path
(:201-212), and per-stage trainability rules (prepare_for_training :119-176)
expressed here as a parameter-mask pytree consumed by the optimizer.

Everything is a pure function over a params pytree:
  params = {"vit": ..., "pooler": ..., "llama": ..., ["lora": ...]}
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .constants import IGNORE_INDEX
from .llama import LlamaConfig, causal_lm_loss, init_llama_params, llama_apply
from .lora import LoraConfig, init_lora_params, merge_lora
from .perceiver import PerceiverConfig, init_perceiver_params, perceiver_resample
from .splice import (SplicedBatch, splice_image_embeddings,
                     splice_image_embeddings_multi)
from .vit import ViTConfig, init_vit_params, vit_encode


@dataclasses.dataclass(frozen=True)
class VLMConfig:
    vit: ViTConfig = dataclasses.field(default_factory=ViTConfig.vit_large)
    pooler: PerceiverConfig = dataclasses.field(default_factory=PerceiverConfig)
    llama: LlamaConfig = dataclasses.field(default_factory=LlamaConfig.llama2_7b)
    lora: Optional[LoraConfig] = None
    # stage semantics follow the reference configs (Config/multi_modal_*.yaml):
    # 1 = caption alignment, 2/3 = instruction tuning w/ LoRA, 0 = eval (merged)
    stage: int = 1
    tune_rgb_bk: bool = False
    tune_rgb_pooler: bool = True

    @classmethod
    def tiny_test(cls, stage: int = 1, lora: bool = False) -> "VLMConfig":
        vit = ViTConfig.tiny_test()
        n_patches = (vit.image_size // vit.patch_size) ** 2
        pooler = dataclasses.replace(
            PerceiverConfig.tiny_test(),
            hidden_size=vit.width, encoder_hidden_size=vit.width,
            output_size=64, split_part=(n_patches,) * 3,
        )
        return cls(
            vit=vit, pooler=pooler, llama=LlamaConfig.tiny_test(),
            lora=LoraConfig(r=4, alpha=8) if lora else None, stage=stage,
        )

    @classmethod
    def from_config_dict(cls, cfg) -> "VLMConfig":
        arch = cfg.rgb_vision.arch
        if arch == "vit_large":
            vit = ViTConfig.vit_large()
        elif arch == "vit_base":
            vit = ViTConfig.vit_base()
        elif arch in ("vit_tiny", "vit_tiny_test"):
            vit = ViTConfig.tiny_test()
        else:
            raise ValueError(f"unknown rgb_vision.arch {arch!r}")
        ap = cfg.rgb_vision.attn_pooler
        default_stages = ((64, 48, 32) if ap.num_query == 144
                          else None)
        stage_num = tuple(ap.get("stage_num") or default_stages
                          or (ap.num_query // 2,
                              ap.num_query - ap.num_query // 2 -
                              ap.num_query // 4,
                              ap.num_query // 4))
        pooler = PerceiverConfig(
            num_query=ap.num_query, num_layers=ap.num_layers,
            heads=ap.num_attn_heads, hidden_size=vit.width,
            encoder_hidden_size=vit.width, output_size=cfg.text.hidden_size,
            stage_num=stage_num,
            split_part=(vit.num_patches,) * len(stage_num),
        )
        # stage 3 trains the stage-2 adapters loaded from TextLoRA/ even
        # though its yaml has lora.enable False (UniBind.py:105-116 semantics)
        lora = (LoraConfig.from_config_dict(cfg.lora)
                if getattr(cfg, "lora", None)
                and (cfg.lora.enable or cfg.stage == 3) else None)
        return cls(
            vit=vit, pooler=pooler,
            llama=LlamaConfig.from_config_dict(cfg.text), lora=lora,
            stage=cfg.stage, tune_rgb_bk=getattr(cfg, "tune_rgb_bk", False),
            tune_rgb_pooler=getattr(cfg, "tune_rgb_pooler", True),
        )


def init_vlm_params(rng: jax.Array, cfg: VLMConfig, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    params = {
        "vit": init_vit_params(k1, cfg.vit, dtype),
        "pooler": init_perceiver_params(k2, cfg.pooler, dtype),
        "llama": init_llama_params(k3, cfg.llama, dtype),
    }
    if cfg.lora is not None:
        params["lora"] = init_lora_params(k4, cfg.llama, cfg.lora, dtype)
    return params


def effective_llama_params(params, cfg: VLMConfig, *,
                           stop_base_gradient: bool = True):
    """Base decoder params with LoRA applied (if present): merged into the
    base weights when they are dense, attached as a runtime side path when
    the base is quantized (QLoRA)."""
    llama = params["llama"]
    if cfg.lora is None or "lora" not in params:
        return llama
    from ..ops.quant import QuantizedTensor
    from .lora import attach_runtime_lora

    if any(isinstance(w, QuantizedTensor)
           for w in llama["layers"].values()):
        layers = attach_runtime_lora(llama["layers"], params["lora"],
                                     cfg.lora)
    else:
        layers = merge_lora(llama["layers"], params["lora"], cfg.lora,
                            stop_base_gradient=stop_base_gradient)
    return {**llama, "layers": layers}


def encode_image(params, images: jnp.ndarray, cfg: VLMConfig,
                 compute_dtype=jnp.bfloat16, remat: bool = False,
                 vision_packed=None, interpret: bool = False):
    """images (uint8 NHWC or float NCHW pixel_values) → (B, 144, llm_d).

    Mirrors UniBind.encode_image (UniBind.py:201-212): multi-level ViT
    features → perceiver resample. When `vision_packed` (from
    ops.vit_block.pack_vit_layers_fused) is given, the tower runs through
    the fused W8A8 Pallas block kernel (serving fast path; ~2.7% rel-L2
    feature deviation vs bf16, opt-in)."""
    if vision_packed is not None:
        from .vit import vit_encode_fused

        feats = vit_encode_fused(params["vit"], vision_packed, images,
                                 cfg.vit, interpret=interpret)
    else:
        feats = vit_encode(params["vit"], images, cfg.vit,
                           compute_dtype=compute_dtype, remat=remat)
    return perceiver_resample(params["pooler"], feats, cfg.pooler,
                              compute_dtype=compute_dtype)


def prepare_multimodal_inputs(
    params, cfg: VLMConfig,
    input_ids: jnp.ndarray,
    images: Optional[jnp.ndarray],
    attention_mask: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    llama_params=None,
    vision_packed=None,
    interpret: bool = False,  # fused-tower kernels in interpret mode (CPU)
    segment_ids: Optional[jnp.ndarray] = None,  # (B, T) packing
) -> SplicedBatch:
    if llama_params is None:
        llama_params = params["llama"]
    embed_tokens = llama_params["embed_tokens"]
    if images is None:
        # text-only batch: embed directly, no length change
        ids_safe = jnp.maximum(input_ids, 0)
        embeds = jnp.take(embed_tokens, ids_safe, axis=0)
        if attention_mask is None:
            attention_mask = jnp.ones(input_ids.shape, bool)
        return SplicedBatch(
            embeds, attention_mask, labels,
            jnp.sum(attention_mask.astype(jnp.int32), axis=1),
            segment_ids,
        )
    if images.ndim == 5:
        # (B, K, H, W, 3): multi-image chat / packed rows — encode all
        # slots in one tower batch, splice marker k with slot k
        b, k = images.shape[:2]
        image_embeds = encode_image(
            params, images.reshape((b * k,) + images.shape[2:]), cfg,
            compute_dtype, remat, vision_packed=vision_packed,
            interpret=interpret)
        image_embeds = image_embeds.reshape(
            b, k, *image_embeds.shape[1:])
        return splice_image_embeddings_multi(
            input_ids, image_embeds, embed_tokens, attention_mask, labels,
            segment_ids=segment_ids)
    if segment_ids is not None:
        raise ValueError("sequence packing requires (B, K, H, W, 3) "
                         "images (PackingCollator) or text-only batches")
    image_embeds = encode_image(params, images, cfg, compute_dtype, remat,
                                vision_packed=vision_packed,
                                interpret=interpret)
    return splice_image_embeddings(
        input_ids, image_embeds, embed_tokens, attention_mask, labels)


def vlm_forward_loss(
    params, cfg: VLMConfig, batch: Dict[str, jnp.ndarray],
    compute_dtype=jnp.bfloat16, remat: bool = False,
    cp_mesh=None, seq_axis: str = "seq",
) -> Dict[str, jnp.ndarray]:
    """Training forward → {"text_loss", "total_loss"} (UniBind.forward
    :178-199 semantics; total == text for the published recipes).

    `cp_mesh`: run the DECODER context-parallel — vision tower + splice
    stay batch-parallel (they are short and per-image), the spliced
    sequence is padded to the ring size and sharded on `seq_axis`
    (parallel/context.py). Long-context training beyond the reference's
    2048-token cap; activation memory scales down with the ring."""
    llama_params = effective_llama_params(params, cfg)
    spliced = prepare_multimodal_inputs(
        params, cfg,
        input_ids=batch["input_ids"],
        images=batch.get("images"),
        attention_mask=batch.get("attention_mask"),
        labels=batch["labels"],
        compute_dtype=compute_dtype,
        remat=remat,
        llama_params=llama_params,
        segment_ids=batch.get("segment_ids"),
    )
    if cp_mesh is not None:
        if spliced.segment_ids is not None:
            raise ValueError("sequence packing + context parallelism are "
                             "not composable yet (ring attention has no "
                             "segment masking)")
        from ..parallel.context import context_parallel_apply

        cp = cp_mesh.shape[seq_axis]
        s = spliced.inputs_embeds.shape[1]
        pad = (-s) % cp
        embeds, mask, labels = spliced.inputs_embeds, \
            spliced.attention_mask, spliced.labels
        if pad:
            embeds = jnp.pad(embeds, ((0, 0), (0, pad), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, pad)))
            labels = jnp.pad(labels, ((0, 0), (0, pad)),
                             constant_values=IGNORE_INDEX)
        logits = context_parallel_apply(
            llama_params, cfg.llama, cp_mesh,
            inputs_embeds=embeds, attention_mask=mask,
            seq_axis=seq_axis, compute_dtype=compute_dtype, remat=remat)
        text_loss = causal_lm_loss(logits, labels)
        return {"text_loss": text_loss, "total_loss": text_loss}
    logits = llama_apply(
        llama_params, cfg.llama,
        inputs_embeds=spliced.inputs_embeds,
        attention_mask=spliced.attention_mask,
        compute_dtype=compute_dtype,
        remat=remat,
        segment_ids=spliced.segment_ids,
    )
    text_loss = causal_lm_loss(logits, spliced.labels)
    return {"text_loss": text_loss, "total_loss": text_loss}


def trainable_mask(params, cfg: VLMConfig) -> Any:
    """Pytree of bools marking trainable leaves, per stage semantics of
    UniBind.prepare_for_training (UniBind.py:119-176):
      stage 1: pooler trainable, ViT frozen unless tune_rgb_bk, LLM frozen
               (no LoRA);
      stage 2: pooler + LoRA trainable;
      stage 3: pooler frozen (tune_rgb_pooler False in the stage-3 recipe),
               LoRA trainable;
      stage 0 (eval): everything frozen.
    """
    def full(tree, value):
        return jax.tree_util.tree_map(lambda _: value, tree)

    mask = {
        "vit": full(params["vit"], bool(cfg.tune_rgb_bk and cfg.stage != 0)),
        "pooler": full(params["pooler"],
                       bool(cfg.tune_rgb_pooler and cfg.stage != 0)),
        "llama": full(params["llama"], False),
    }
    if "lora" in params:
        mask["lora"] = full(params["lora"], cfg.stage in (2, 3))
    return mask
