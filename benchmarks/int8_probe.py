"""MXU int8-rate probe: why do Mosaic int8 dots run at ~150 T while the
same chain under XLA hits ~318 TOPS on v5e? (VERDICT r2, prefill lever (a))

Measures chained matmul rates at ViT-L-ish shapes (M=2048 tokens, K=N=1024)
for a matrix of variants; each variant is run at two repeat counts G and the
rate is computed from the time DELTA, canceling the ~25 ms fixed host-fetch
latency of the remote tunnel (a single fetch is still the only reliable
sync, CLAUDE.md).

  xla_int8      int8·int8→int32 dot chain under XLA (repeat via scan)
  xla_int8_req  same with f32 scale + requantize between dots (real chain)
  xla_bf16      bf16 comparison chain
  pl_int8       Pallas: accumulate int8·int8→int32 dots, weights resident
  pl_int8_req   Pallas: requantized chain (each dot feeds the next)
  pl_int8_lhsT  Pallas: the (K,N)ᵀ·(M,K)ᵀ form the fused ViT kernel uses
  pl_bf16       Pallas bf16 comparison

Run from the repo root on the real chip: python benchmarks/int8_probe.py
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 2048, 1024, 1024
NDOTS = 16  # dots per chain
G_LO, G_HI = 4, 16  # chain repeats (delta cancels fixed fetch latency)
VMEM_LIMIT = 110 * 1024 * 1024


def _mk_int8(key, shape):
    return jax.random.randint(key, shape, -127, 127, jnp.int8)


def _time(fn, *args, reps=4):
    float(fn(*args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


# ---------------------------------------------------------------- XLA chains


def _xla_repeat(chain_body, g):
    """Repeat `chain_body(h, ws) -> h` g times via scan (no Python unroll —
    keeps one compiled loop whatever g is)."""
    def run(x, ws):
        h, _ = jax.lax.scan(lambda h, _: (chain_body(h, ws), None),
                            x, None, length=g)
        return jnp.sum(h.astype(jnp.float32))
    return run


def _chain_int8(h, ws):
    acc = jnp.zeros((M, N), jnp.int32)
    for i in range(NDOTS):
        acc += jax.lax.dot_general(
            h, ws[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    # fold the accumulator back into an int8 carry (keeps the chain live)
    return jnp.clip(acc[:, :K] // 256, -127, 127).astype(jnp.int8)


def _chain_int8_req(h, ws):
    for i in range(NDOTS):
        acc = jax.lax.dot_general(
            h, ws[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        f = acc.astype(jnp.float32) * (1.0 / 127.0)
        amax = jnp.max(jnp.abs(f), axis=-1, keepdims=True)
        s = jnp.where(amax == 0, 1.0, amax / 127.0)
        h = jnp.clip(jnp.round(f / s), -127, 127).astype(jnp.int8)[:, :K]
    return h


def _chain_bf16(h, ws):
    for i in range(NDOTS):
        h = jnp.dot(h, ws[i], preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)[:, :K]
    return h


# ------------------------------------------------------------- Pallas chains


def _pl_repeat(kernel, g, out_dtype):
    """Each grid step consumes its OWN (M, K) activation block: with
    identical inputs per step the whole body is grid-invariant and Mosaic
    hoists it out of the grid loop (measured: g-independent time, i.e. the
    chain ran once, not g times)."""
    def run(xg, ws):  # xg: (g, M, K)
        out = pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[pl.BlockSpec((1, M, K), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, 8, 128), out_dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
        )(xg, ws)
        return jnp.sum(out.astype(jnp.float32))
    return run


def _k_int8(x_ref, w_ref, o_ref):
    x = x_ref[0]
    acc = jnp.zeros((M, N), jnp.int32)
    for i in range(NDOTS):
        acc += jax.lax.dot_general(
            x, w_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    # row-sum forces every M row to be computed (a bare [:8] slice lets
    # Mosaic dead-code-eliminate 2040 of 2048 rows -> fake TOPS)
    # full scalar reduction: every row AND column of every dot feeds the
    # output, so Mosaic cannot narrow M or N via dead-code elimination
    o_ref[0] = acc[:8, :128] + jnp.sum(acc)


def _k_int8_req(x_ref, w_ref, o_ref):
    h = x_ref[0]
    acc = None
    for i in range(NDOTS):
        acc = jax.lax.dot_general(
            h, w_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        f = acc.astype(jnp.float32) * (1.0 / 127.0)
        amax = jnp.max(jnp.abs(f), axis=-1, keepdims=True)
        s = jnp.where(amax == 0, 1.0, amax / 127.0)
        h = jnp.clip(jnp.round(f / s), -127, 127).astype(jnp.int8)[:, :K]
    # full scalar reduction: every row AND column of every dot feeds the
    # output, so Mosaic cannot narrow M or N via dead-code elimination
    o_ref[0] = acc[:8, :128] + jnp.sum(acc)


def _k_int8_lhsT(x_ref, w_ref, o_ref):
    # the fused ViT kernel's QKV form: w (K, N) contracted on dim 0 with
    # x (M, K) on dim 1 → (N, M) output
    acc = jnp.zeros((N, M), jnp.int32)
    x = x_ref[0]
    for i in range(NDOTS):
        acc += jax.lax.dot_general(
            w_ref[i], x, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
    # full scalar reduction: every row AND column of every dot feeds the
    # output, so Mosaic cannot narrow M or N via dead-code elimination
    o_ref[0] = acc[:8, :128] + jnp.sum(acc)


def _k_int8_alt(x_ref, w_ref, o_ref):
    """The fused ViT kernel's ACTUAL alternating dot forms, chained with
    requantization: odd dots run the transposed-QKV form w(K,N)ᵀ·h(M,K)ᵀ →
    (N, M) with per-COLUMN requant, even dots contract sublanes back
    (a_q(N,M) dim0 · w(N,N) dim0 → (M, N)) with per-row requant — the
    QKV→O-projection pattern of ops/vit_block.py."""
    h = x_ref[0]  # (M, K) int8
    acc = None
    for i in range(NDOTS):
        if i % 2 == 0:
            acc = jax.lax.dot_general(
                w_ref[i], h, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)  # (N, M)
            f = acc.astype(jnp.float32) * (1.0 / 127.0)
            amax = jnp.max(jnp.abs(f), axis=0, keepdims=True)  # per column
            s = jnp.where(amax == 0, 1.0, amax / 127.0)
            h = jnp.clip(jnp.round(f / s), -127, 127).astype(jnp.int8)
        else:
            acc = jax.lax.dot_general(
                h, w_ref[i], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)  # (M, N)
            f = acc.astype(jnp.float32) * (1.0 / 127.0)
            amax = jnp.max(jnp.abs(f), axis=-1, keepdims=True)  # per row
            s = jnp.where(amax == 0, 1.0, amax / 127.0)
            h = jnp.clip(jnp.round(f / s), -127, 127).astype(jnp.int8)[:, :K]
    o_ref[0] = acc[:8, :128] + jnp.sum(acc)


def _k_bf16(x_ref, w_ref, o_ref):
    x = x_ref[0]
    acc = jnp.zeros((M, N), jnp.float32)
    for i in range(NDOTS):
        acc += jnp.dot(x, w_ref[i],
                       preferred_element_type=jnp.float32)
    # full scalar reduction: every row AND column of every dot feeds the
    # output, so Mosaic cannot narrow M or N via dead-code elimination
    o_ref[0] = acc[:8, :128] + jnp.sum(acc)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="comma list of variants")
    args = ap.parse_args()

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x8 = _mk_int8(k1, (G_HI, M, K))
    ws8 = _mk_int8(k2, (NDOTS, K, N))
    xb = (jax.random.normal(k1, (G_HI, M, K), jnp.float32) * 0.1
          ).astype(jnp.bfloat16)
    wsb = (jax.random.normal(k2, (NDOTS, K, N), jnp.float32) * 0.1
           ).astype(jnp.bfloat16)
    jax.block_until_ready((x8, ws8, xb, wsb))

    variants = {
        "xla_int8": (lambda g: jax.jit(_xla_repeat(_chain_int8, g)),
                     x8[0], ws8),
        "xla_int8_req": (lambda g: jax.jit(_xla_repeat(_chain_int8_req, g)),
                         x8[0], ws8),
        "xla_bf16": (lambda g: jax.jit(_xla_repeat(_chain_bf16, g)),
                     xb[0], wsb),
        "pl_int8": (lambda g: jax.jit(_pl_repeat(_k_int8, g, jnp.int32)),
                    x8, ws8),
        "pl_int8_req": (lambda g: jax.jit(_pl_repeat(_k_int8_req, g,
                                                     jnp.int32)),
                        x8, ws8),
        "pl_int8_lhsT": (lambda g: jax.jit(_pl_repeat(_k_int8_lhsT, g,
                                                      jnp.int32)),
                         x8, ws8),
        "pl_int8_alt": (lambda g: jax.jit(_pl_repeat(_k_int8_alt, g,
                                                     jnp.int32)),
                        x8, ws8),
        "pl_bf16": (lambda g: jax.jit(_pl_repeat(_k_bf16, g, jnp.float32)),
                    xb, wsb),
    }
    only = set(args.only.split(",")) if args.only else None
    flop_per_chain = 2.0 * M * K * N * NDOTS
    for name, (mk, x, ws) in variants.items():
        if only and name not in only:
            continue
        try:
            t_lo = _time(mk(G_LO), x[:G_LO] if x.ndim == 3 else x, ws)
            t_hi = _time(mk(G_HI), x, ws)
            dt = t_hi - t_lo
            tops = flop_per_chain * (G_HI - G_LO) / dt / 1e12
            print(f"{name:14s} d={dt * 1e3:8.2f} ms over {G_HI - G_LO} "
                  f"chains  {tops:7.1f} TOPS")
        except Exception as exc:  # noqa: BLE001
            print(f"{name:14s} FAILED: {str(exc)[:200]}")


if __name__ == "__main__":
    main()
