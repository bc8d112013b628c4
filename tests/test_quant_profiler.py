"""Quantization ops + profiler hook tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lhrs_bot_tpu.ops.quant import (
    QuantizedTensor,
    dequantize,
    dequantize_llama_layers,
    pack_int4,
    quantize_int4,
    quantize_int8,
    quantize_llama_layers,
    quantized_matmul,
    unpack_int4,
)


class TestInt8:
    def test_roundtrip_error_small(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
        qt = quantize_int8(w)
        back = dequantize(qt)
        err = float(jnp.abs(back - w).max() / jnp.abs(w).max())
        assert err < 0.02

    def test_matmul_close_to_fp(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        x = jax.random.normal(k1, (8, 64), jnp.bfloat16)
        w = jax.random.normal(k2, (64, 32))
        qt = quantize_int8(w)
        got = quantized_matmul(x, qt, out_dtype=jnp.float32)
        ref = jnp.dot(x.astype(jnp.float32), w)
        rel = float(jnp.abs(got - ref).max() / jnp.abs(ref).max())
        assert rel < 0.05

    def test_zero_column_safe(self):
        w = jnp.zeros((16, 4))
        qt = quantize_int8(w)
        assert np.isfinite(np.asarray(dequantize(qt))).all()


class TestInt4:
    def test_pack_unpack_roundtrip(self):
        q = jax.random.randint(jax.random.PRNGKey(0), (32, 8), -7, 8
                               ).astype(jnp.int8)
        np.testing.assert_array_equal(np.asarray(unpack_int4(pack_int4(q))),
                                      np.asarray(q))

    def test_quantize_roundtrip_error(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 16))
        qt = quantize_int4(w)
        assert qt.q.shape == (32, 16)  # packed
        back = dequantize(qt)
        err = float(jnp.abs(back - w).max() / jnp.abs(w).max())
        assert err < 0.15

    def test_stacked_pack_keeps_layer_axis(self):
        """Packing runs along the contraction axis (-2), NOT the leading
        stacked-layer axis: a (L, in, out) QuantizedTensor must slice
        per-layer under lax.scan with q and scale leading dims aligned."""
        L, d, out = 4, 32, 16
        w = jax.random.normal(jax.random.PRNGKey(0), (L, d, out))
        qt = quantize_int4(w, axis=1)
        assert qt.q.shape == (L, d // 2, out)
        assert qt.scale.shape == (L, 1, out)
        np.testing.assert_allclose(
            np.asarray(dequantize(qt)),
            np.stack([np.asarray(dequantize(quantize_int4(w[i])))
                      for i in range(L)]))

    def test_packed_matmul_matches_explicit_dequant(self):
        """quantized_matmul over packed int4 == the same bf16 dot over the
        explicitly unpacked weights (exact: identical arithmetic path)."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        x = jax.random.normal(k1, (8, 64), jnp.bfloat16)
        qt = quantize_int4(jax.random.normal(k2, (64, 32)))
        got = quantized_matmul(x, qt, out_dtype=jnp.float32)
        q = unpack_int4(qt.q)
        want = (jnp.dot(x, q.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
                * qt.scale.astype(jnp.float32))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_llama_int4_decode_runs(self):
        """bits=4 end-to-end: stacked int4 weights scan + prefill + cached
        decode produce finite logits close to the dequantized-weights path
        (same bf16 matmul route through dequantize_llama_layers is NOT
        identical — it skips the epilogue scale ordering — so compare to
        the f32 model at int4-quantization-error tolerance)."""
        from lhrs_bot_tpu.models.llama import (
            KVCache, LlamaConfig, init_llama_params, llama_decode_step,
            llama_prefill)

        cfg = LlamaConfig.tiny_test()
        params = init_llama_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        ids = np.random.default_rng(0).integers(3, 250, size=(2, 10))
        emb = jnp.take(params["embed_tokens"], jnp.asarray(ids), axis=0)
        lens = jnp.asarray([10, 8], jnp.int32)

        def roll(layers):
            p = {**params, "layers": layers}
            cache = KVCache.create(cfg, 2, 24)
            logits, cache = llama_prefill(
                p, cfg, cache, inputs_embeds=emb, prompt_len=lens,
                compute_dtype=jnp.float32)
            logs = [np.asarray(logits)]
            for _ in range(4):
                nxt = jnp.argmax(logits, -1)
                e = jnp.take(params["embed_tokens"], nxt[:, None], axis=0)
                logits, cache = llama_decode_step(
                    p, cfg, cache, inputs_embeds=e,
                    compute_dtype=jnp.float32)
                logs.append(np.asarray(logits))
            return np.stack(logs, 1)

        ref = roll(params["layers"])
        q4 = roll(quantize_llama_layers(params["layers"], bits=4))
        assert np.isfinite(q4).all()
        rel = np.linalg.norm(q4 - ref) / np.linalg.norm(ref)
        assert rel < 0.5, rel


class TestModelQuant:
    def test_llama_layers_quantize(self):
        from lhrs_bot_tpu.models.llama import LlamaConfig, init_llama_params

        cfg = LlamaConfig.tiny_test()
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        qlayers = quantize_llama_layers(params["layers"], bits=8)
        assert isinstance(qlayers["wq"], QuantizedTensor)
        assert qlayers["input_norm"].dtype == params["layers"]["input_norm"].dtype
        back = dequantize_llama_layers(qlayers)
        rel = float(jnp.abs(back["wq"] - params["layers"]["wq"]).max())
        assert rel < 0.01


class TestProfilerHook:
    def test_trace_window(self, tmp_path, monkeypatch):
        from lhrs_bot_tpu.utils.profiler import ProfilerHook

        calls = []
        monkeypatch.setattr(jax.profiler, "start_trace",
                            lambda d: calls.append(("start", d)))
        monkeypatch.setattr(jax.profiler, "stop_trace",
                            lambda: calls.append(("stop",)))

        class FakeTrainer:
            cur_iter = 0

        hook = ProfilerHook(str(tmp_path), start_step=2, num_steps=2)
        hook.trainer = FakeTrainer()
        for it in range(6):
            hook.trainer.cur_iter = it
            hook.before_iter()
            hook.after_iter()
        hook.after_train()
        assert calls == [("start", str(tmp_path)), ("stop",)]


class TestW8A8:
    def test_activation_quant_roundtrip(self):
        from lhrs_bot_tpu.ops.quant import quantize_activation

        x = jax.random.normal(jax.random.PRNGKey(0), (4, 64), jnp.bfloat16)
        q, s = quantize_activation(x)
        back = q.astype(jnp.float32) * s
        err = float(jnp.abs(back - x.astype(jnp.float32)).max()
                    / jnp.abs(x.astype(jnp.float32)).max())
        assert err < 0.02

    def test_w8a8_matmul_close(self):
        from lhrs_bot_tpu.ops.quant import quantize_int8, w8a8_matmul

        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        x = jax.random.normal(k1, (8, 64), jnp.bfloat16)
        w = jax.random.normal(k2, (64, 32))
        got = w8a8_matmul(x, quantize_int8(w), out_dtype=jnp.float32)
        ref = jnp.dot(x.astype(jnp.float32), w)
        rel = float(jnp.abs(got - ref).max() / jnp.abs(ref).max())
        assert rel < 0.06

    def test_vit_w8a8_close_to_bf16(self):
        from lhrs_bot_tpu.models.vit import ViTConfig, init_vit_params, vit_encode
        from lhrs_bot_tpu.ops.quant import quantize_vision_layers

        cfg = ViTConfig.tiny_test()
        params = init_vit_params(jax.random.PRNGKey(0), cfg)
        img = np.random.default_rng(0).integers(
            0, 255, (2, 28, 28, 3)).astype(np.uint8)
        ref = vit_encode(params, jnp.asarray(img), cfg,
                         compute_dtype=jnp.float32)
        qparams = {**params,
                   "layers": quantize_vision_layers(params["layers"])}
        got = vit_encode(qparams, jnp.asarray(img), cfg,
                         compute_dtype=jnp.float32)
        rel = float(jnp.abs(got - ref).max() / (jnp.abs(ref).max() + 1e-9))
        assert rel < 0.25, rel  # W8A8 at tiny scale; accuracy eval gates real use
