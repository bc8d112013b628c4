"""Fused paged decode kernel (ops/paged_fused.py) vs the XLA reference.

Interpret mode on the CPU mesh; shapes kept tiny (pages_per_seq * page
<= 128 tokens) per the repo interpret-mode budget. Covers: mid-page
append, page-boundary append (off == 0 opens a fresh page), window
alignment cases, int8 scale planes, and pool in-place update integrity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lhrs_bot_tpu.models.llama_paged import paged_attention_reference
from lhrs_bot_tpu.ops.paged_fused import (paged_fused_decode,
                                          paged_fused_decode_q)

L, H, D, PAGE, PPS = 2, 4, 128, 32, 4
NPAGES = 1 + 3 * PPS  # null page + 3 seqs


def _setup(dtype, seed=0):
    rng = np.random.default_rng(seed)
    b = 3
    pools = rng.standard_normal((2, L, NPAGES, H, PAGE, D)).astype(np.float32)
    # each seq s owns pages [1 + s*PPS, 1 + (s+1)*PPS)
    table = (1 + np.arange(b)[:, None] * PPS +
             np.arange(PPS)[None, :]).astype(np.int32)
    # mid-page / page-boundary / second-window appends
    lengths = np.array([37, 64, 97], np.int32)
    q = rng.standard_normal((b, H, 1, D)).astype(np.float32)
    k_new = rng.standard_normal((b, H, 1, D)).astype(np.float32)
    v_new = rng.standard_normal((b, H, 1, D)).astype(np.float32)
    return b, pools, table, lengths, q, k_new, v_new


def _ref_out(k_pages_lnh, v_pages_lnh, table, lengths, q, layer,
             ks=None, vs=None):
    """Per-layer reference over (L, N, H, p, d) pools (post-append)."""
    return paged_attention_reference(
        q, k_pages_lnh[layer], v_pages_lnh[layer],
        jnp.asarray(table), jnp.asarray(lengths) + 1,
        k_scales=None if ks is None else ks[layer],
        v_scales=None if vs is None else vs[layer])


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
@pytest.mark.parametrize("layer", [0, 1])
def test_paged_fused_matches_reference(dtype, layer):
    b, pools, table, lengths, q, k_new, v_new = _setup(dtype)
    kp = jnp.asarray(pools[0], dtype)
    vp = jnp.asarray(pools[1], dtype)

    out, kp2, vp2 = paged_fused_decode(
        jnp.asarray(q, dtype), jnp.asarray(k_new, dtype),
        jnp.asarray(v_new, dtype), kp, vp,
        jnp.asarray(table), jnp.asarray(lengths),
        jnp.asarray(layer, jnp.int32), interpret=True)

    # expected post-append pools (append only touches `layer`)
    exp_k = np.array(jnp.asarray(kp, jnp.float32))
    exp_v = np.array(jnp.asarray(vp, jnp.float32))
    for s in range(b):
        pg = table[s, lengths[s] // PAGE]
        off = lengths[s] % PAGE
        exp_k[layer, pg, :, off, :] = np.asarray(
            jnp.asarray(k_new[s, :, 0], dtype), np.float32)
        exp_v[layer, pg, :, off, :] = np.asarray(
            jnp.asarray(v_new[s, :, 0], dtype), np.float32)
    np.testing.assert_allclose(np.array(kp2, np.float32), exp_k, atol=0)
    np.testing.assert_allclose(np.array(vp2, np.float32), exp_v, atol=0)

    ref = _ref_out(jnp.asarray(exp_k, dtype), jnp.asarray(exp_v, dtype),
                   table, lengths, jnp.asarray(q, dtype), layer)
    tol = 5e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.array(out, np.float32),
                               np.array(ref, np.float32),
                               atol=tol, rtol=tol)


@pytest.mark.parametrize("layer", [0, 1])
def test_paged_fused_int8_matches_reference(layer):
    b, pools, table, lengths, q, k_new, v_new = _setup(jnp.int8, seed=1)
    rng = np.random.default_rng(7)
    kp = jnp.asarray(rng.integers(-127, 128, (L, NPAGES, H, PAGE, D)),
                     jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 128, (L, NPAGES, H, PAGE, D)),
                     jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.03, (L, NPAGES, H, PAGE)),
                     jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.03, (L, NPAGES, H, PAGE)),
                     jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (b, H, 1, D)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (b, H, 1, D)), jnp.int8)
    kqs = jnp.asarray(rng.uniform(0.01, 0.03, (b, H, 1)), jnp.float32)
    vqs = jnp.asarray(rng.uniform(0.01, 0.03, (b, H, 1)), jnp.float32)

    out, kp2, vp2, ks2, vs2 = paged_fused_decode_q(
        jnp.asarray(q, jnp.bfloat16), kq, kqs, vq, vqs,
        kp, vp, ks, vs, jnp.asarray(table), jnp.asarray(lengths),
        jnp.asarray(layer, jnp.int32), interpret=True)

    exp_k = np.array(kp)
    exp_v = np.array(vp)
    exp_ks = np.array(ks)
    exp_vs = np.array(vs)
    for s in range(b):
        pg = table[s, lengths[s] // PAGE]
        off = lengths[s] % PAGE
        exp_k[layer, pg, :, off, :] = np.array(kq[s, :, 0])
        exp_v[layer, pg, :, off, :] = np.array(vq[s, :, 0])
        exp_ks[layer, pg, :, off] = np.array(kqs[s, :, 0])
        exp_vs[layer, pg, :, off] = np.array(vqs[s, :, 0])
    np.testing.assert_array_equal(np.array(kp2), exp_k)
    np.testing.assert_array_equal(np.array(vp2), exp_v)
    np.testing.assert_allclose(np.array(ks2), exp_ks, atol=0)
    np.testing.assert_allclose(np.array(vs2), exp_vs, atol=0)

    ref = _ref_out(jnp.asarray(exp_k), jnp.asarray(exp_v), table, lengths,
                   jnp.asarray(q, jnp.bfloat16), layer,
                   ks=jnp.asarray(exp_ks), vs=jnp.asarray(exp_vs))
    np.testing.assert_allclose(np.array(out, np.float32),
                               np.array(ref, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_paged_fused_single_page_seq():
    """A sequence whose whole history fits in one page (np_valid == 1)."""
    rng = np.random.default_rng(3)
    kp = jnp.asarray(rng.standard_normal((1, 3, H, PAGE, D)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((1, 3, H, PAGE, D)), jnp.float32)
    table = np.array([[1, 2]], np.int32)
    lengths = np.array([5], np.int32)
    q = jnp.asarray(rng.standard_normal((1, H, 1, D)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((1, H, 1, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((1, H, 1, D)), jnp.float32)
    out, kp2, vp2 = paged_fused_decode(
        q, kn, vn, kp, vp, jnp.asarray(table), jnp.asarray(lengths),
        jnp.zeros((), jnp.int32), interpret=True)
    exp_k = np.array(kp).copy()
    exp_v = np.array(vp).copy()
    exp_k[0, 1, :, 5, :] = np.array(kn[0, :, 0])
    exp_v[0, 1, :, 5, :] = np.array(vn[0, :, 0])
    ref = _ref_out(jnp.asarray(exp_k), jnp.asarray(exp_v), table, lengths,
                   q, 0)
    np.testing.assert_allclose(np.array(out), np.array(ref),
                               atol=1e-5, rtol=1e-5)
