"""Stage-1 training step throughput on one chip.

Realistic shape: ViT-L + perceiver trainable (bf16 compute, f32 masters via
the masked optimizer — moments exist only for trainable leaves), LLaMA-2-7B
frozen in bf16, batch of image+caption samples at seq 128 (stage-1 captions
are short). Reports samples/sec/chip.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from lhrs_bot_tpu.core.config import ConfigDict
from lhrs_bot_tpu.models import (
    IMAGE_TOKEN_INDEX, VLMConfig, init_vlm_params, trainable_mask)
from lhrs_bot_tpu.train import build_optimizer, build_schedule, make_train_step

cfg = VLMConfig(stage=1)  # full-size: ViT-L + 144q pooler + 7B decoder
print("initializing full-size VLM (frozen 7B base in int8)...", flush=True)
t0 = time.perf_counter()
# trainable pooler in f32 (master weights); frozen ViT in bf16; frozen 7B
# base in per-channel int8 (the reference's own bits-8 training recipe).
# The decoder is built tensor-by-tensor so no transient f32/bf16 copy of the
# full 7B tree ever exists on the chip.
from lhrs_bot_tpu.models.vit import init_vit_params
from lhrs_bot_tpu.models.perceiver import init_perceiver_params
from lhrs_bot_tpu.ops.quant import quantize_int8

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
    "pooler": init_perceiver_params(keys[10], cfg.pooler, dtype=jnp.float32),
    "llama": {
        "embed_tokens": jax.random.normal(keys[0], (V, d), jnp.bfloat16) * 0.02,
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
        "lm_head": jax.random.normal(keys[8], (d, V), jnp.bfloat16) * 0.02,
    },
}
params = jax.block_until_ready(params)
print(f"init {time.perf_counter()-t0:.1f}s", flush=True)

conf = ConfigDict({
    "optimizer": "adanp", "lr": 2e-4, "wd": 0.0, "max_grad_norm": 0.3,
    "schedule": {"name": "cosine", "min_lr": 2e-5, "warmup_epochs": 300},
})
schedule = build_schedule(conf, total_iters=10000)
tx = build_optimizer(conf, params, trainable_mask(params, cfg),
                     schedule=schedule)
opt_state = tx.init(params)

B, T = 8, 128
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

step = jax.jit(make_train_step(cfg, tx, compute_dtype=jnp.bfloat16,
                               remat=True,
                               trainable=trainable_mask(params, cfg)),
               donate_argnums=(0, 1))

def run_once():
    global params, opt_state
    params, opt_state, metrics = step(params, opt_state, batch)
    return float(metrics["total_loss"])

t0 = time.perf_counter()
loss = run_once()
print(f"compile+first step: {time.perf_counter()-t0:.1f}s loss={loss:.3f}",
      flush=True)
iters = 5
t0 = time.perf_counter()
for _ in range(iters):
    loss = run_once()
dt = (time.perf_counter() - t0) / iters
tok = B * (T + 143)  # spliced length
print(f"train step: {dt*1000:.0f} ms -> {B/dt:.1f} samples/s, "
      f"{tok/dt:.0f} tok/s (loss {loss:.3f})", flush=True)
