"""Prefill configuration sweep on the real chip (round-3 roofline work).

Measures tower-only and combined (tower + perceiver) images/sec for a grid
of fused-kernel configurations: group (images per token-group), attn_pair
(images per block-diagonal attention matmul). Also isolates the
perceiver+glue cost. Timing ends with a host fetch (tunnel sync).

Run: python benchmarks/prefill_sweep.py [--batch 64] [--iters 10]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--configs", default="8:2,8:4,8:8,16:2,16:4")
    ap.add_argument("--vmem-mb", type=int, default=0,
                    help="raise the fused-block VMEM limit (MB) — the r3 "
                         "attn_pair>=4 Mosaic crash class; 0 = kernel "
                         "default (110)")
    ap.add_argument("--skip-glue", action="store_true",
                    help="skip the perceiver-only isolation run")
    args = ap.parse_args()

    from lhrs_bot_tpu.core.bootstrap import enable_compilation_cache

    enable_compilation_cache()

    from lhrs_bot_tpu.models.perceiver import (
        PerceiverConfig, init_perceiver_params, pack_perceiver_kv,
        perceiver_resample)
    from lhrs_bot_tpu.models.vit import (ViTConfig, init_vit_params,
                                         vit_encode_fused)
    from lhrs_bot_tpu.ops.quant import quantize_vision_layers
    from lhrs_bot_tpu.ops.vit_block import pack_vit_layers_fused

    vit_cfg = ViTConfig.vit_large()
    pool_cfg = PerceiverConfig()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), t)
    vp = cast(init_vit_params(k1, vit_cfg))
    pp = cast(init_perceiver_params(k2, pool_cfg))
    pq = {**pp, "layers": quantize_vision_layers(pp["layers"])}
    pqh = jax.jit(pack_perceiver_kv)(pq)  # hoisted K/V (W8A8)
    packed = jax.jit(pack_vit_layers_fused)(vp["layers"])
    jax.block_until_ready(packed)

    b = args.batch
    images = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (b, 224, 224, 3), dtype=np.uint8))

    def timed(fn, *a):
        float(fn(*a))
        t0 = time.perf_counter()
        for _ in range(args.iters - 1):
            fn(*a)
        float(fn(*a))
        return b * args.iters / (time.perf_counter() - t0)

    out = {}
    vmem = args.vmem_mb * 1024 * 1024 or None
    for spec in args.configs.split(","):
        g, pair = (int(x) for x in spec.split(":"))

        @jax.jit
        def tower(vp_, packed_, imgs, g=g, pair=pair):
            f = vit_encode_fused(vp_, packed_, imgs, vit_cfg,
                                 group=g, attn_pair=pair, vmem_limit=vmem)
            return jnp.sum(f.astype(jnp.float32))

        @jax.jit
        def combined(vp_, packed_, pp_, imgs, g=g, pair=pair):
            f = vit_encode_fused(vp_, packed_, imgs, vit_cfg,
                                 group=g, attn_pair=pair, vmem_limit=vmem)
            return jnp.sum(perceiver_resample(
                pp_, f, pool_cfg, compute_dtype=jnp.bfloat16))

        try:
            out[f"tower_g{g}_p{pair}"] = round(
                timed(tower, vp, packed, images), 1)
            out[f"combined_g{g}_p{pair}"] = round(
                timed(combined, vp, packed, pq, images), 1)
        except Exception as exc:  # noqa: BLE001
            out[f"g{g}_p{pair}_error"] = str(exc)[:150]
        print(json.dumps(out), flush=True)

    if args.skip_glue:
        return

    # glue cost: perceiver alone on precomputed features
    feats = jax.jit(lambda v, p, i: vit_encode_fused(v, p, i, vit_cfg))(
        vp, packed, images)
    jax.block_until_ready(feats)

    @jax.jit
    def pool_only(pp_, f):
        return jnp.sum(perceiver_resample(pp_, f, pool_cfg,
                                          compute_dtype=jnp.bfloat16))

    out["perceiver_only_img_s"] = round(timed(pool_only, pq, feats), 1)
    out["perceiver_hoisted_img_s"] = round(timed(pool_only, pqh, feats), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
