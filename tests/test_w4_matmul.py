"""Pallas W4A8 decode matmul (ops/w4_matmul.py) numerics on the CPU mesh.

The kernel serves the reference's `bits: 4` surface
(/root/reference/lhrs/models/text_modal.py:91-109) on the TPU decode fast
path: halves-packed int4 weights streamed packed from HBM, int8x int8 dots,
scales folded into the epilogue. Interpret mode on CPU checks exactness
against the dequantized-weight reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lhrs_bot_tpu.models.llama import (KVCache, LlamaConfig,
                                       init_llama_params, llama_decode_step)
from lhrs_bot_tpu.ops.quant import (dequantize, dequantize_llama_layers,
                                    pack_int4_halves, quantize_activation,
                                    quantize_int4h, quantize_llama_layers,
                                    unpack_int4_halves)
from lhrs_bot_tpu.ops.w4_matmul import w4a8_project


class TestHalvesPacking:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(0)
        q = rng.integers(-7, 8, size=(3, 64, 48)).astype(np.int8)
        packed = np.asarray(pack_int4_halves(jnp.asarray(q)))
        assert packed.shape == (3, 32, 48)
        out = np.asarray(unpack_int4_halves(jnp.asarray(packed)))
        np.testing.assert_array_equal(out, q)

    def test_quantize_int4h_dequant_error_bounded(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 32)) * 0.1
        qt = quantize_int4h(w, axis=1)
        assert qt.bits == "4h" and qt.q.shape == (2, 32, 32)
        err = jnp.max(jnp.abs(dequantize(qt) - w))
        # |err| <= scale/2 per element, scale = absmax/7
        bound = float(jnp.max(qt.scale)) * 0.5 + 1e-6
        assert float(err) <= bound

    def test_quantize_llama_layers_int4h_dispatch(self):
        cfg = LlamaConfig(vocab_size=64, hidden_size=32,
                          intermediate_size=64, num_hidden_layers=2,
                          num_attention_heads=2,
                          max_position_embeddings=32)
        params = init_llama_params(jax.random.PRNGKey(1), cfg)
        q = quantize_llama_layers(params["layers"], bits=4,
                                  quant_type="int4h")
        assert q["wq"].bits == "4h"
        assert q["w_gate"].q.shape == (2, 16, 64)  # packed along K
        assert q["input_norm"].dtype != jnp.int8  # norms untouched


class TestW4A8Kernel:
    def test_matches_dequant_reference_per_layer(self):
        key = jax.random.PRNGKey(0)
        L, K, N, B = 3, 256, 384, 2
        w = jax.random.normal(key, (L, K, N), jnp.float32) * 0.05
        qt = quantize_int4h(w, axis=1)
        wd = np.asarray(dequantize(qt))
        x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, K), jnp.float32)
        xq, xs = quantize_activation(x.reshape(B, K))
        for li in range(L):
            out = np.asarray(w4a8_project(
                x, qt, jnp.int32(li), interpret=True)).reshape(B, N)
            ref = (np.asarray(xq, np.float32) * np.asarray(xs)) @ wd[li]
            rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
            # int8 x int8 -> int32 accumulation is exact; only the f32
            # epilogue rounds
            assert rel < 1e-5, (li, rel)

    def test_i8_unpack_matches_i32_exactly(self):
        """The i8-native nibble unpack (no widening; exact /16 of the
        high-nibble dot in the int32 accumulator) must be bit-identical
        to the i32 shift unpack for every packed byte value."""
        from lhrs_bot_tpu.ops.w4_matmul import w4a8_matmul_stacked

        rng = np.random.default_rng(0)
        L, K2, N, B = 2, 128, 128, 3
        # raw bytes: every (hi, lo) nibble pair, incl. extremes like -8
        w = jnp.asarray(rng.integers(-128, 128, (L, K2, N)), jnp.int8)
        ws = jnp.asarray(rng.uniform(0.01, 0.03, (L, 1, N)), jnp.float32)
        xlo = jnp.asarray(rng.integers(-127, 128, (B, K2)), jnp.int8)
        xhi = jnp.asarray(rng.integers(-127, 128, (B, K2)), jnp.int8)
        xs = jnp.asarray(rng.uniform(0.01, 0.03, (B, 1)), jnp.float32)
        for li in range(L):
            a = np.asarray(w4a8_matmul_stacked(
                xlo, xhi, xs, w, ws, jnp.int32(li), interpret=True,
                unpack="i32"))
            b = np.asarray(w4a8_matmul_stacked(
                xlo, xhi, xs, w, ws, jnp.int32(li), interpret=True,
                unpack="i8"))
            np.testing.assert_array_equal(a, b)

    def test_batch_dim(self):
        key = jax.random.PRNGKey(2)
        L, K, N, B = 2, 128, 128, 5
        w = jax.random.normal(key, (L, K, N), jnp.float32) * 0.1
        qt = quantize_int4h(w, axis=1)
        x = jax.random.normal(jax.random.PRNGKey(3), (B, 1, K), jnp.float32)
        out = w4a8_project(x, qt, jnp.int32(1), interpret=True)
        assert out.shape == (B, 1, N)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestDecodeStepW4:
    def _setup(self):
        cfg = LlamaConfig(vocab_size=160, hidden_size=64,
                          intermediate_size=128, num_hidden_layers=3,
                          num_attention_heads=4,
                          max_position_embeddings=64)
        params = init_llama_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
        q_layers = quantize_llama_layers(params["layers"], bits=4,
                                         quant_type="int4h")
        deq = {k: jnp.asarray(v)
               for k, v in dequantize_llama_layers(q_layers).items()}
        return cfg, dict(params, layers=q_layers), dict(params, layers=deq)

    def test_w4_scan_matches_dequant_weights(self):
        cfg, p_q, p_d = self._setup()
        B, S = 2, 16
        shape = (cfg.num_hidden_layers, B, cfg.num_attention_heads, S,
                 cfg.head_dim)

        def fresh():
            return KVCache(jnp.zeros(shape, jnp.float32),
                           jnp.zeros(shape, jnp.float32),
                           jnp.full((B,), 3, jnp.int32))

        emb = jax.random.normal(jax.random.PRNGKey(5),
                                (B, 1, cfg.hidden_size), jnp.float32)
        lw4, cw4 = llama_decode_step(p_q, cfg, fresh(), inputs_embeds=emb,
                                     compute_dtype=jnp.float32,
                                     use_fused=False, use_w4=True)
        lref, cref = llama_decode_step(p_d, cfg, fresh(), inputs_embeds=emb,
                                       compute_dtype=jnp.float32,
                                       use_fused=False, use_w4=False)
        # only the per-token int8 activation quantization separates the two
        rel = float(jnp.linalg.norm(lw4 - lref) / jnp.linalg.norm(lref))
        assert rel < 5e-3, rel
        assert bool((jnp.argmax(lw4, -1) == jnp.argmax(lref, -1)).all())
        assert int(cw4.length[0]) == int(cref.length[0]) == 4

    def test_multi_step_greedy_stays_close(self):
        cfg, p_q, p_d = self._setup()
        B, S = 1, 24
        shape = (cfg.num_hidden_layers, B, cfg.num_attention_heads, S,
                 cfg.head_dim)

        def roll(params, use_w4):
            cache = KVCache(jnp.zeros(shape, jnp.float32),
                            jnp.zeros(shape, jnp.float32),
                            jnp.zeros((B,), jnp.int32))
            tok = jnp.full((B,), 7, jnp.int32)
            toks = []
            for _ in range(6):
                emb = jnp.take(params["embed_tokens"], tok[:, None], axis=0)
                logits, cache = llama_decode_step(
                    params, cfg, cache, inputs_embeds=emb,
                    compute_dtype=jnp.float32, use_fused=False,
                    use_w4=use_w4)
                tok = jnp.argmax(logits, -1).astype(jnp.int32)
                toks.append(int(tok[0]))
            return toks

        # both runs quantize weights identically; the w4 path adds only
        # activation-int8 noise — greedy tokens should dominantly agree
        a = roll(p_q, True)
        b = roll(p_d, False)
        agree = sum(x == y for x, y in zip(a, b))
        assert agree >= 4, (a, b)
