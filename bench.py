"""Benchmark: ViT-L/14 + multi-level perceiver prefill throughput on one chip.

Measures the BASELINE.md north-star metric "ViT-L + perceiver prefill
throughput ≥ 2,000 images/sec/chip" — raw uint8 images in (H2D of pixels
only; normalize+patchify+project fused on device), 144 LLM-space embeddings
out. Prints ONE JSON line.
"""

import json
import time

import numpy as np

TARGET = 2000.0  # images/sec/chip (BASELINE.md rebuild target)


def main():
    import jax
    import jax.numpy as jnp

    from lhrs_bot_tpu.models.perceiver import PerceiverConfig, init_perceiver_params, perceiver_resample
    from lhrs_bot_tpu.models.vit import ViTConfig, init_vit_params, vit_encode

    vit_cfg = ViTConfig.vit_large()
    pool_cfg = PerceiverConfig()

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    vit_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        init_vit_params(k1, vit_cfg, dtype=jnp.float32))
    pool_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        init_perceiver_params(k2, pool_cfg, dtype=jnp.float32))

    batch = 64
    images = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 255, (batch, 224, 224, 3), dtype=np.uint8))

    @jax.jit
    def prefill(vp, pp, imgs):
        feats = vit_encode(vp, imgs, vit_cfg, compute_dtype=jnp.bfloat16)
        out = perceiver_resample(pp, feats, pool_cfg,
                                 compute_dtype=jnp.bfloat16)
        # reduce on device: the final float() fetch is the only reliable
        # synchronization point through the remote-execution tunnel
        # (block_until_ready returns before compute completes there)
        return jnp.sum(out)

    # warmup / compile
    float(prefill(vit_params, pool_params, images))

    iters = 20
    start = time.perf_counter()
    for _ in range(iters - 1):
        prefill(vit_params, pool_params, images)  # queued async, in-order
    float(prefill(vit_params, pool_params, images))  # sync on host fetch
    elapsed = time.perf_counter() - start

    ips = batch * iters / elapsed
    print(json.dumps({
        "metric": "vit_perceiver_prefill_throughput",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
