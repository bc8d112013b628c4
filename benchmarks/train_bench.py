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
print("initializing full-size VLM (7B decoder in bf16)...", flush=True)
t0 = time.perf_counter()
# frozen parts in bf16, trainable parts in f32 (master weights)
params = init_vlm_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
# frozen 7B base in int8 (the reference's own stage-2 recipe trains with
# bits: 8 via bitsandbytes; here symmetric per-channel int8)
from lhrs_bot_tpu.ops.quant import quantize_llama_layers
params["llama"] = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16), params["llama"])
params["llama"]["layers"] = jax.jit(
    lambda l: quantize_llama_layers(l, bits=8))(params["llama"]["layers"])
params["vit"] = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16), params["vit"])  # frozen at stage 1
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
