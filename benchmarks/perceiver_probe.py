"""Perceiver-half roofline probe (round-4, VERDICT item 2).

The prefill pipeline spends ~30% of its time outside the ViT tower
(combined 764 img/s vs tower 1096 => perceiver+glue ~0.40 ms/img =
45.4 GF at ~116 TF/s effective). This probe gives that half the same
measured per-op accounting the tower got in ROOFLINE_prefill.md:

1. full-path variants, delta-timed (default per-layer loop, folded
   kv-LN [pack_perceiver_kv_folded], hoisted K/V [pack_perceiver_kv],
   group-batched attention, fused Pallas block) — img/s each;
2. isolated per-op chains at the exact serving shapes (B=64, groups
   (64,320)/(48,304)/(32,288), W8A8 weights): kv LayerNorm, K/V
   projections (split and fused-folded), Q/O projections, attention,
   MLP, out_proj — ms/img and TF/s per op, plus the unattributed glue
   remainder (full - sum of ops).

Timing: scan-repeated chains at two repeat counts; the rate comes from
the time DELTA, canceling the ~25 ms tunnel fetch (int8_probe.py
pattern). Every chain feeds its output back into its input so nothing
is dead-code eliminated or loop-hoisted.

Run from the repo root on the real chip:
    python benchmarks/perceiver_probe.py [--batch 64]

Reference behavior being accounted: AttnPooler,
/root/reference/lhrs/models/common_arch.py:93-173.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

G_LO = int(os.environ.get("PROBE_G_LO", 8))
G_HI = int(os.environ.get("PROBE_G_HI", 32))


def _time(fn, *args, reps=3):
    float(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def _delta_ms(mk_fn, *args):
    """Per-step ms from the G_HI-G_LO delta of scan-repeated chains."""
    t_lo = _time(mk_fn(G_LO), *args)
    t_hi = _time(mk_fn(G_HI), *args)
    return (t_hi - t_lo) * 1e3 / (G_HI - G_LO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-ops", action="store_true")
    args = ap.parse_args()
    b = args.batch

    from lhrs_bot_tpu.core.bootstrap import enable_compilation_cache

    enable_compilation_cache()

    from lhrs_bot_tpu.models.perceiver import (
        PerceiverConfig, _normalize_rows, init_perceiver_params,
        pack_perceiver_kv, pack_perceiver_kv_folded, perceiver_resample)
    from lhrs_bot_tpu.ops.attention import flash_attention
    from lhrs_bot_tpu.ops.mlp import dense_any, gelu_mlp
    from lhrs_bot_tpu.ops.quant import quantize_int8, quantize_vision_layers

    cfg = PerceiverConfig()
    rng = np.random.default_rng(0)
    pp = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        init_perceiver_params(jax.random.PRNGKey(0), cfg))
    pq = {**pp, "layers": quantize_vision_layers(pp["layers"])}
    pq_fold = jax.jit(pack_perceiver_kv_folded)(pq)
    pq_hoist = jax.jit(pack_perceiver_kv)(pq)
    feats = jnp.asarray(rng.standard_normal(
        (b, sum(cfg.split_part), cfg.encoder_hidden_size)) * 0.05,
        jnp.bfloat16)
    jax.block_until_ready((pq_fold, pq_hoist, feats))

    out = {"batch": b}

    # ---------------- full-path variants (amortized-dispatch timing) -------
    def timed_path(params, **kw):
        @jax.jit
        def run(p, f):
            return jnp.sum(perceiver_resample(
                p, f, cfg, compute_dtype=jnp.bfloat16, **kw
            ).astype(jnp.float32))

        float(run(params, feats))
        t0 = time.perf_counter()
        for _ in range(args.iters - 1):
            run(params, feats)
        float(run(params, feats))
        return b * args.iters / (time.perf_counter() - t0)

    out["default_img_s"] = round(timed_path(pq), 1)
    out["folded_img_s"] = round(timed_path(pq_fold), 1)
    out["hoisted_img_s"] = round(timed_path(pq_hoist), 1)
    out["batched_groups_img_s"] = round(timed_path(pq, batch_groups=True), 1)
    print(json.dumps(out), flush=True)

    if args.skip_ops:
        return

    # ---------------- isolated per-op chains -------------------------------
    # one chain step == ONE LAYER's worth of the op across all 3 groups
    groups = list(zip(cfg.stage_num,
                      [q + s for q, s in zip(cfg.stage_num, cfg.split_part)]))
    h, heads, d = cfg.hidden_size, cfg.heads, cfg.head_dim
    ffn = cfg.hidden_size * cfg.mlp_ratio
    lay = pq["layers"]

    def first_layer(x):
        from lhrs_bot_tpu.ops.quant import QuantizedTensor
        if isinstance(x, QuantizedTensor):
            return QuantizedTensor(x.q[0], x.scale[0], bits=x.bits)
        return x[0]

    lp = jax.tree_util.tree_map(
        first_layer, lay,
        is_leaf=lambda x: hasattr(x, "bits"))
    lp_fold = jax.tree_util.tree_map(
        first_layer, pq_fold["layers"],
        is_leaf=lambda x: hasattr(x, "bits"))

    def scan_chain(body):
        """body(x) -> x, same pytree/shape; returns mk(g) -> jitted fn."""
        def mk(g):
            @jax.jit
            def run(x0):
                xg, _ = jax.lax.scan(lambda x, _: (body(x), None),
                                     x0, None, length=g)
                return jnp.sum(jax.tree_util.tree_reduce(
                    lambda a, t: a + jnp.sum(t.astype(jnp.float32)),
                    xg, jnp.zeros((), jnp.float32)))
            return run
        return mk

    def feedback(y):
        """Cast a matmul output back into a bf16 input slice, keeping the
        chain live (mirrors the requant-chain trick in int8_probe.py)."""
        return (y[..., :h] * 0.1).astype(jnp.bfloat16)

    ops = {}

    # kv LayerNorm: per layer the default path normalizes all 912 kv rows
    kv_rows = jnp.asarray(rng.standard_normal((b, 912, h)), jnp.bfloat16)

    def body_ln(x):
        return (_normalize_rows(x, cfg.ln_eps) * 1.01).astype(jnp.bfloat16)

    ops["kv_ln"] = (_delta_ms(scan_chain(body_ln), kv_rows), 0.0)

    # K/V projections, split (default): 2 W8A8 matmuls per group per layer
    kv_ins = [jnp.asarray(rng.standard_normal((b, skv, h)), jnp.bfloat16)
              for _, skv in groups]

    def body_kv_split(xs):
        outs = []
        for x in xs:
            k = dense_any(x, lp["wk"], lp["bk"])
            v = dense_any(x, lp["wv"], lp["bv"])
            outs.append(feedback(k + v))
        return tuple(outs)

    gf_kv = 2 * sum(2 * skv * h * h for _, skv in groups) / 1e9  # per img/layer
    ops["kv_proj_split"] = (_delta_ms(scan_chain(body_kv_split),
                                      tuple(kv_ins)), gf_kv)

    # K/V projection, folded fused (one (h, 2h) matmul per group per layer)
    def body_kv_fold(xs):
        return tuple(
            feedback(dense_any(x, lp_fold["w_kv"],
                               lp_fold["b_kv"].astype(jnp.float32)))
            for x in xs)

    ops["kv_proj_folded"] = (_delta_ms(scan_chain(body_kv_fold),
                                       tuple(kv_ins)), gf_kv)

    # Q projection (and O is the same shape): per group (B, nq, h) @ (h, h)
    q_ins = [jnp.asarray(rng.standard_normal((b, nq, h)), jnp.bfloat16)
             for nq, _ in groups]

    def body_q(xs):
        return tuple(feedback(dense_any(x, lp["wq"], lp["bq"]))
                     for x in xs)

    gf_q = sum(2 * nq * h * h for nq, _ in groups) / 1e9
    ops["q_proj"] = (_delta_ms(scan_chain(body_q), tuple(q_ins)), gf_q)
    ops["o_proj"] = ops["q_proj"]  # identical geometry (wo)

    # attention: per group (B, heads, nq, d) x (B, heads, skv, d)
    attn_kv = [
        (jnp.asarray(rng.standard_normal((b, heads, skv, d)) * 0.1,
                     jnp.bfloat16),
         jnp.asarray(rng.standard_normal((b, heads, skv, d)) * 0.1,
                     jnp.bfloat16))
        for _, skv in groups]

    def body_attn(qs):
        outs = []
        for q, (k, v) in zip(qs, attn_kv):
            o = flash_attention(q, k, v, None, causal=False)
            outs.append((o * 1.01).astype(jnp.bfloat16))
        return tuple(outs)

    q_attn = tuple(
        jnp.asarray(rng.standard_normal((b, heads, nq, d)) * 0.1,
                    jnp.bfloat16) for nq, _ in groups)
    gf_attn = sum(2 * 2 * nq * skv * h for (nq, _), (_, skv)
                  in zip(groups, groups)) / 1e9
    ops["attention"] = (_delta_ms(scan_chain(body_attn), q_attn), gf_attn)

    # MLP: per group fc(h->4h) + gelu + proj(4h->h)
    def body_mlp(xs):
        return tuple(
            (gelu_mlp(x, lp["w_fc"], lp["b_fc"], lp["w_proj"],
                      lp["b_proj"], quick_gelu=False) * 0.1
             ).astype(jnp.bfloat16)
            for x in xs)

    gf_mlp = sum(2 * 2 * nq * h * ffn for nq, _ in groups) / 1e9
    ops["mlp"] = (_delta_ms(scan_chain(body_mlp), tuple(q_ins)), gf_mlp)

    # out_proj: once per forward (B, 144, h) @ (h, 4096)
    wq_out = quantize_int8(jnp.asarray(
        rng.standard_normal((h, cfg.output_size)), jnp.float32), axis=-2)
    pooled = jnp.asarray(rng.standard_normal((b, cfg.num_query, h)),
                         jnp.bfloat16)

    def body_out(x):
        return feedback(dense_any(x, wq_out, None))

    gf_out = 2 * cfg.num_query * h * cfg.output_size / 1e9
    ops["out_proj"] = (_delta_ms(scan_chain(body_out), pooled), gf_out)

    # ---------------- report ----------------------------------------------
    L = cfg.num_layers
    per_layer = ("kv_ln", "kv_proj_split", "kv_proj_folded", "q_proj",
                 "o_proj", "attention", "mlp")
    total_default = 0.0
    print(f"{'op':16s} {'ms/img':>8s} {'GF/img':>8s} {'TF/s':>7s}")
    for name, (ms_step, gf_step) in ops.items():
        mult = L if name in per_layer else 1
        ms_img = ms_step * mult / b
        gf_img = gf_step * mult
        tfs = gf_img / ms_img if ms_img > 0 else float("inf")
        out[f"op_{name}_ms_img"] = round(ms_img, 4)
        out[f"op_{name}_tf_s"] = round(tfs, 1)
        print(f"{name:16s} {ms_img:8.4f} {gf_img:8.1f} {tfs:7.1f}")
        if name != "kv_proj_folded":
            total_default += ms_img

    for variant in ("default", "folded", "hoisted"):
        ms_full = 1e3 / out[f"{variant}_img_s"] * 1  # ms/img
        out[f"{variant}_ms_img"] = round(ms_full, 4)
    out["op_sum_default_ms_img"] = round(total_default, 4)
    out["glue_remainder_ms_img"] = round(
        out["default_ms_img"] - total_default, 4)
    # implied combined ceiling with the round-3 tower at 0.912 ms/img
    best = min(out["default_ms_img"], out["folded_ms_img"],
               out["hoisted_ms_img"])
    out["implied_combined_img_s"] = round(1e3 / (0.912 + best), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
