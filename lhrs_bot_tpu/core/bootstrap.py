"""Shared CLI bootstrap for the main_* entry points.

Covers the common preamble of the reference scripts (config parse → logger →
seed → model/tokenizer build → checkpoint load; e.g.
main_pretrain_stage1.py:88-175, main_cls.py:65-121): one YAML+CLI config
surface, deterministic seeding, mesh construction, engine assembly.
"""

from __future__ import annotations

import argparse
import os
import random
from typing import Optional, Tuple

import numpy as np

from ..models.vlm import VLMConfig
from ..utils.logger import setup_logger
from .config import ConfigArgumentParser, ConfigDict


def add_common_args(parser: ConfigArgumentParser) -> None:
    parser.add_argument("--model-path", type=str, default=None,
                        help="path to FINAL.pt checkpoint")
    parser.add_argument("--data-path", type=str, default=None)
    parser.add_argument("--eval-path", type=str, default=None)
    parser.add_argument("--data-target", type=str, default=None)
    parser.add_argument("--output", type=str, default="output")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--seed", type=int, default=322)
    parser.add_argument("--auto-resume", action="store_true")
    parser.add_argument("--use-checkpoint", action="store_true",
                        help="gradient (re)materialization")
    parser.add_argument("--enable-amp", type=lambda s: s.lower() == "true",
                        default=True, help="bf16 compute (fp16 configs map "
                        "to bf16 on TPU)")
    parser.add_argument("--dp", type=int, default=None,
                        help="data-parallel mesh size")
    parser.add_argument("--tp", type=int, default=None,
                        help="tensor-parallel mesh size")
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--scheduled-eval", action="store_true",
                        help="route eval generation through the "
                             "continuous-batching scheduler (slots free "
                             "at EOS instead of stepping every row for "
                             "max_new_tokens)")


def enable_compilation_cache(cache_dir: Optional[str] = None) -> str:
    """Wire JAX's persistent compilation cache so a fresh process reuses
    executables compiled by earlier runs (the round-2 serving cold start
    was 382 s of compilation before the first token). Idempotent; returns
    the cache dir. Override with LHRS_JAX_CACHE_DIR; disable with
    LHRS_JAX_CACHE_DIR=off."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "LHRS_JAX_CACHE_DIR",
        os.path.expanduser("~/.cache/lhrs_tpu/jax_cache"))
    if cache_dir.lower() in ("off", "none", ""):
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # serving programs are the ones worth persisting and they all take
    # >1 s to compile; tiny programs stay out of the cache
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def parse_config(description: str, extra=None, args=None) -> ConfigDict:
    parser = ConfigArgumentParser(description=description)
    add_common_args(parser)
    if extra is not None:
        extra(parser)
    config = parser.parse_args(args)
    from ..parallel.distribute import init_distributed

    init_distributed()  # multi-host discovery; no-op single process
    enable_compilation_cache()
    import jax

    config["rank"] = jax.process_index()
    config["world_size"] = jax.process_count()
    config["is_distribute"] = config["world_size"] > 1
    return config


def set_random_seed(seed: int, rank: int = 0) -> None:
    """Deterministic per-process seeding (misc.py:97 + seed+rank convention
    of main_pretrain_stage1.py:281-287)."""
    random.seed(seed + rank)
    np.random.seed(seed + rank)


def setup(config, name: str = "lhrs_tpu"):
    logger = setup_logger(name, output=config.output, rank=config.rank)
    set_random_seed(int(config.seed), int(config.rank))
    os.makedirs(config.output, exist_ok=True)
    from ..utils.misc import collect_env

    logger.info("environment:\n%s", collect_env())
    if config.rank == 0:
        with open(os.path.join(config.output, "config.json"), "w") as fh:
            fh.write(config.to_json(indent=2, default=str))
    return logger


def build_model_and_tokenizer(config, *, eval_mode: bool = False):
    """VLMConfig + params (with every available artifact overlaid) +
    tokenizer."""
    import jax.numpy as jnp

    from ..data.tokenizer import load_tokenizer
    from . import model_io

    cfg = VLMConfig.from_config_dict(config)
    params = model_io.load_pretrained(
        cfg,
        model_path=getattr(config, "model_path", None),
        vit_path=getattr(config.rgb_vision, "vit_name", None),
        llama_path=getattr(config.text, "path", None),
    )
    bits = int(getattr(config, "bits", 16) or 16)
    if bits in (4, 8) and cfg.stage != 0:
        # bits-8/4 recipe parity (bitsandbytes base quantization,
        # text_modal.py:91-109): frozen base in intN; LoRA attaches as a
        # runtime side path (QLoRA) since a merge is impossible
        from ..ops.quant import quantize_llama_layers

        params["llama"]["layers"] = quantize_llama_layers(
            params["llama"]["layers"], bits=bits,
            quant_type=str(getattr(config, "quant_type", "nf4") or "nf4"),
            double_quant=bool(getattr(config, "double_quant", True)))
    tokenizer = load_tokenizer(
        config.text.path,
        model_max_length=int(config.text.max_position_embeddings))
    return cfg, params, tokenizer


def build_engine(cfg, params, config, mesh=None):
    """Engine assembly honoring the serving knobs of the config surface.

    `bits: 8` (reference bitsandbytes recipe, text_modal.py:91-109) reaches
    the engine as `quantize_bits` — at stage 0 the params arrive unquantized
    from `build_model_and_tokenizer`, so without this the YAML knob was a
    silent no-op for serving. `kv_bits: 8` selects the int8 KV cache
    (8 full-context slots/chip vs 6 at bf16); `vision_w8a8` opts into the
    fused Pallas tower (guarded by the greedy-flip test in tests/test_ops.py)
    and defaults ON where it can run — TPU backend with int8 weights, the
    benchmarked product path."""
    import jax
    import jax.numpy as jnp

    from ..serve.engine import GenerationEngine

    enable_compilation_cache()  # library callers skip parse_config

    bits = int(getattr(config, "bits", 16) or 16)
    quantize_bits = bits if bits in (4, 8) else None
    kv_bits = int(getattr(config, "kv_bits", 16) or 16)
    cache_dtype = jnp.int8 if kv_bits == 8 else jnp.bfloat16
    on_tpu = jax.default_backend() == "tpu"
    # fused-kernel geometry: heads are 64-row sublane slices and the width
    # must be lane-aligned (ops/vit_block.py) — true for CLIP-L, not for
    # tiny test towers
    kernel_ok = cfg.vit.head_dim == 64 and cfg.vit.width % 128 == 0
    vision_w8a8 = bool(getattr(
        config, "vision_w8a8", on_tpu and quantize_bits == 8 and kernel_ok))

    chunk = int(getattr(config, "prefill_chunk", 0) or 0)
    return GenerationEngine(
        cfg, params,
        max_seq_len=int(config.text.max_position_embeddings) + 256,
        cache_dtype=cache_dtype,
        quantize_bits=quantize_bits,
        quant_type=str(getattr(config, "quant_type", "nf4") or "nf4"),
        double_quant=bool(getattr(config, "double_quant", True)),
        # `lm_head_bits: 8` (YAML/CLI, beyond-reference): int8 unembedding.
        # Decode streams every weight per token, so the bf16 head is
        # 262 MB of the per-token read; int8 halves it (+1.5% tok/s at 7B,
        # benchmarks/decode_breakdown.py). Default off — the reference's
        # bnb recipe keeps lm_head fp16.
        lm_head_bits=int(getattr(config, "lm_head_bits", 0) or 0) or None,
        vision_w8a8=vision_w8a8,
        prefill_chunk=chunk or None,
        mesh=mesh,
    )
