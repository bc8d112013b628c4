"""Training step throughput on one chip, stage 1 and stage 2.

Stage 1 (caption alignment, main_pretrain_stage1.py recipe): ViT-L +
perceiver trainable (f32 masters, bf16 compute), LLaMA-2-7B frozen in
per-channel int8 (the reference's bits-8 recipe), batch 8 × seq 128.

Stage 2 (instruction tuning, main_pretrain_stage2.py +
Config/multi_modal_stage2.yaml): pooler trainable + LoRA r=128 α=256 on
all 7 decoder projections as a QLoRA runtime side path over the SAME int8
frozen base (ops/quant.py attach_runtime_lora), batch 4 × seq 512 (longer
instruction turns). Verifies grad actually flows through every LoRA leaf
at full shape before timing.

Reports samples/sec/chip per stage. Run:
    python benchmarks/train_bench.py [--stage 1|2|both]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from lhrs_bot_tpu.core.config import ConfigDict
from lhrs_bot_tpu.models import (
    IMAGE_TOKEN_INDEX, VLMConfig, init_vlm_params, trainable_mask)
from lhrs_bot_tpu.models.lora import LoraConfig, init_lora_params
from lhrs_bot_tpu.models.perceiver import init_perceiver_params
from lhrs_bot_tpu.models.vit import init_vit_params
from lhrs_bot_tpu.ops.quant import quantize_int8
from lhrs_bot_tpu.train import build_optimizer, build_schedule, make_train_step


def build_params(cfg: VLMConfig):
    """Full-size params, frozen 7B base in int8, built tensor-by-tensor so
    no transient f32/bf16 copy of the 7B tree ever exists on the chip."""
    def qinit(key, shape):
        f = jax.jit(lambda k: quantize_int8(
            jax.random.normal(k, shape, jnp.bfloat16) * 0.02, axis=1))
        out = f(key)
        jax.block_until_ready(out.q)
        return out

    lcfg = cfg.llama
    d, ffn, L, V = (lcfg.hidden_size, lcfg.intermediate_size,
                    lcfg.num_hidden_layers, lcfg.vocab_size)
    keys = jax.random.split(jax.random.PRNGKey(0), 12)
    params = {
        "vit": jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16),
            init_vit_params(keys[9], cfg.vit, dtype=jnp.float32)),
        "pooler": init_perceiver_params(keys[10], cfg.pooler,
                                        dtype=jnp.float32),
        "llama": {
            "embed_tokens": jax.random.normal(keys[0], (V, d),
                                              jnp.bfloat16) * 0.02,
            "layers": {
                "input_norm": jnp.ones((L, d), jnp.bfloat16),
                "wq": qinit(keys[1], (L, d, d)),
                "wk": qinit(keys[2], (L, d, d)),
                "wv": qinit(keys[3], (L, d, d)),
                "wo": qinit(keys[4], (L, d, d)),
                "post_attn_norm": jnp.ones((L, d), jnp.bfloat16),
                "w_gate": qinit(keys[5], (L, d, ffn)),
                "w_up": qinit(keys[6], (L, d, ffn)),
                "w_down": qinit(keys[7], (L, ffn, d)),
            },
            "final_norm": jnp.ones((d,), jnp.bfloat16),
            "lm_head": jax.random.normal(keys[8], (d, V),
                                         jnp.bfloat16) * 0.02,
        },
    }
    if cfg.lora is not None:
        params["lora"] = init_lora_params(keys[11], cfg.llama, cfg.lora,
                                          dtype=jnp.float32)
    return jax.block_until_ready(params)


def bench_stage(stage: int, packed: bool = False):
    if stage == 2:
        cfg = VLMConfig(stage=2, lora=LoraConfig(r=128, alpha=256))
        B, T = 4, 512
        opt_name = "adamw"
    else:
        cfg = VLMConfig(stage=1)
        B, T = 8, 128
        opt_name = "adanp"

    print(f"stage {stage}: initializing full-size VLM "
          "(frozen 7B base in int8)...", flush=True)
    t0 = time.perf_counter()
    params = build_params(cfg)
    print(f"init {time.perf_counter() - t0:.1f}s", flush=True)

    conf = ConfigDict({
        "optimizer": opt_name, "lr": 2e-4, "wd": 0.0, "max_grad_norm": 0.3,
        "schedule": {"name": "cosine", "min_lr": 2e-5,
                     "warmup_epochs": 300},
    })
    schedule = build_schedule(conf, total_iters=10000)
    mask = trainable_mask(params, cfg)
    tx = build_optimizer(conf, params, mask, schedule=schedule)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 32000, size=(B, T)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, T), bool),
        "images": jnp.asarray(rng.integers(0, 255, (B, 224, 224, 3),
                                           dtype=np.uint8)),
    }
    n_samples = B
    if packed:
        # sequence packing: 2 samples of T/2 per row — same token count
        # per step but 2x samples; measures the packed-attention path
        # (segment-masked flash kernel) at stage shapes
        seg = np.concatenate([np.full((B, T // 2), 1, np.int32),
                              np.full((B, T - T // 2), 2, np.int32)],
                             axis=1)
        ids2 = ids.copy()
        ids2[:, T // 2 + 1] = IMAGE_TOKEN_INDEX  # 2nd sample's marker
        labels = ids2.copy()
        labels[:, 0] = labels[:, T // 2] = -100
        batch = {
            "input_ids": jnp.asarray(ids2),
            "labels": jnp.asarray(labels),
            "attention_mask": jnp.ones((B, T), bool),
            "segment_ids": jnp.asarray(seg),
            "images": jnp.asarray(rng.integers(
                0, 255, (B, 2, 224, 224, 3), dtype=np.uint8)),
        }
        n_samples = 2 * B

    step = jax.jit(make_train_step(cfg, tx, compute_dtype=jnp.bfloat16,
                                   remat=True, trainable=mask),
                   donate_argnums=(0, 1))

    t0 = time.perf_counter()
    params, opt_state, metrics = step(params, opt_state, batch)
    loss = float(metrics["total_loss"])
    compile_s = time.perf_counter() - t0
    print(f"compile+first step: {compile_s:.1f}s loss={loss:.3f}",
          flush=True)

    out = {"stage": stage, "batch": B, "seq": T,
           "compile_s": round(compile_s, 1)}
    if stage == 2:
        # grad-flow-through-LoRA at full shape: one step must move every
        # LoRA A leaf (B starts at zero so dL/dA needs B to have moved
        # first — check A after TWO steps, B after one)
        params2, opt_state, m2 = step(params, opt_state, batch)
        moved_b = float(jnp.max(jnp.abs(params2["lora"]["wq"]["b"])))
        # snapshot BEFORE the next step donates params2's buffers
        a_before = np.asarray(params2["lora"]["wq"]["a"][0, :4, :4])
        params3, opt_state, _ = step(params2, opt_state, batch)
        delta_a = float(np.max(np.abs(
            np.asarray(params3["lora"]["wq"]["a"][0, :4, :4]) - a_before)))
        out["lora_b_moved"] = moved_b > 0
        out["lora_a_moved"] = delta_a > 0
        assert moved_b > 0 and delta_a > 0, (moved_b, delta_a)
        params = params3

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, metrics = step(params, opt_state, batch)
    loss = float(metrics["total_loss"])  # host fetch = sync
    dt = (time.perf_counter() - t0) / iters

    nq = cfg.pooler.num_query
    n_img = 2 if packed else 1
    tok = B * (T + n_img * (nq - 1))
    out["packed"] = packed
    out.update({"step_ms": round(dt * 1000),
                "samples_s": round(n_samples / dt, 2),
                "tok_s": round(tok / dt), "loss": round(loss, 3)})
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="both", choices=("1", "2", "both"))
    ap.add_argument("--packed", action="store_true",
                    help="sequence-packed batch (2 samples/row, segment-"
                         "masked flash attention)")
    args = ap.parse_args()
    stages = [1, 2] if args.stage == "both" else [int(args.stage)]
    for s in stages:
        bench_stage(s, packed=args.packed)


if __name__ == "__main__":
    main()
