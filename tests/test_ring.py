"""Ring attention (context parallelism) vs the single-device reference.

The sequence is sharded over a mesh axis and K/V shards rotate via
ppermute; outputs must match `mha_reference` on the full sequence up to
f32 accumulation order. Gradients flow through ppermute's transpose, so
the ring path must also be trainable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from lhrs_bot_tpu.ops.attention import mha_reference
from lhrs_bot_tpu.ops.ring_attention import ring_self_attention


def seq_mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("seq",))


def rand_qkv(key, b=2, h=4, s=64, d=16, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    return (jax.random.normal(kq, (b, h, s, d), dtype),
            jax.random.normal(kk, (b, h, s, d), dtype),
            jax.random.normal(kv, (b, h, s, d), dtype))


class TestRingAttention:
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_reference(self, causal):
        mesh = seq_mesh(4)
        q, k, v = rand_qkv(jax.random.PRNGKey(0))
        ref = mha_reference(q, k, v, causal=causal)
        out = jax.jit(lambda a, b, c: ring_self_attention(
            mesh, a, b, c, seq_axis="seq", causal=causal))(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_kv_mask_rides_the_ring(self):
        """Right-padded batch: the padding mask shard must rotate with its
        K/V shard, masking the same global columns at every step."""
        mesh = seq_mesh(4)
        q, k, v = rand_qkv(jax.random.PRNGKey(1), b=3, s=64)
        lens = jnp.array([64, 37, 5])
        kv_mask = jnp.arange(64)[None, :] < lens[:, None]
        ref = mha_reference(q, k, v, kv_mask, causal=True)
        out = jax.jit(lambda a, b, c, m: ring_self_attention(
            mesh, a, b, c, m, seq_axis="seq", causal=True))(q, k, v, kv_mask)
        # padded ROWS are garbage in both (masked-query outputs are
        # unspecified); compare valid rows only
        for i, n in enumerate(np.asarray(lens)):
            np.testing.assert_allclose(
                np.asarray(out)[i, :, :n], np.asarray(ref)[i, :, :n],
                atol=2e-5, rtol=2e-5)

    def test_eight_way(self):
        mesh = seq_mesh(8)
        q, k, v = rand_qkv(jax.random.PRNGKey(2), s=128)
        ref = mha_reference(q, k, v, causal=True)
        out = jax.jit(lambda a, b, c: ring_self_attention(
            mesh, a, b, c, seq_axis="seq", causal=True))(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_gradients_match(self):
        mesh = seq_mesh(4)
        q, k, v = rand_qkv(jax.random.PRNGKey(3), b=1, h=2, s=32, d=8)

        def loss_ring(q, k, v):
            return jnp.sum(ring_self_attention(
                mesh, q, k, v, seq_axis="seq", causal=True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
        g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
        for a, b in zip(g_ring, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-5, rtol=3e-5)

    def test_context_parallel_forward_matches(self):
        """Full decoder forward, sequence sharded 4-way: logits must match
        the single-device llama_apply (global RoPE positions + ring
        attention through every layer)."""
        from lhrs_bot_tpu.models.llama import (LlamaConfig, init_llama_params,
                                               llama_apply)
        from lhrs_bot_tpu.parallel.context import (context_parallel_apply,
                                                   make_cp_mesh)

        cfg = LlamaConfig.tiny_test()
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        mesh = make_cp_mesh(cp=4, dp=2)
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 32), 3, 200)
        lens = jnp.array([32, 20, 9, 32])
        mask = jnp.arange(32)[None, :] < lens[:, None]

        ref = llama_apply(params, cfg, input_ids=ids, attention_mask=mask,
                          positions=jnp.broadcast_to(jnp.arange(32)[None],
                                                     (4, 32)),
                          compute_dtype=jnp.float32)
        out = jax.jit(lambda p, i, m: context_parallel_apply(
            p, cfg, mesh, input_ids=i, attention_mask=m,
            compute_dtype=jnp.float32))(params, ids, mask)
        ref_h, out_h = np.asarray(ref), np.asarray(out)
        for i, n in enumerate(np.asarray(lens)):  # valid rows only
            np.testing.assert_allclose(out_h[i, :n], ref_h[i, :n],
                                       atol=5e-5, rtol=5e-5)

    def test_context_parallel_grads(self):
        """Loss gradients through the sequence-sharded forward equal the
        single-device gradients (ppermute transpose + replicated-param
        psum are exact)."""
        from lhrs_bot_tpu.models.llama import (LlamaConfig, causal_lm_loss,
                                               init_llama_params,
                                               llama_apply)
        from lhrs_bot_tpu.parallel.context import (context_parallel_apply,
                                                   make_cp_mesh)

        cfg = LlamaConfig.tiny_test()
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        mesh = make_cp_mesh(cp=4, dp=1)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 3, 200)

        def loss_cp(p):
            logits = context_parallel_apply(p, cfg, mesh, input_ids=ids,
                                            compute_dtype=jnp.float32)
            return causal_lm_loss(logits, ids)

        def loss_ref(p):
            logits = llama_apply(p, cfg, input_ids=ids,
                                 compute_dtype=jnp.float32)
            return causal_lm_loss(logits, ids)

        g_cp = jax.jit(jax.grad(loss_cp))(params)
        g_ref = jax.jit(jax.grad(loss_ref))(params)
        flat_cp, _ = jax.tree_util.tree_flatten(g_cp)
        flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
        for a, b in zip(flat_cp, flat_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_cp_train_step_matches(self):
        """Full multimodal TRAIN step with the decoder context-parallel
        (dp=2 x cp=4): loss and updated trainable params must match the
        single-device step (ring attention backward + padded splice)."""
        import optax

        from lhrs_bot_tpu.models import VLMConfig, init_vlm_params
        from lhrs_bot_tpu.models.constants import (IGNORE_INDEX,
                                                   IMAGE_TOKEN_INDEX)
        from lhrs_bot_tpu.models.vlm import trainable_mask
        from lhrs_bot_tpu.parallel.context import make_cp_mesh
        from lhrs_bot_tpu.train.trainer import make_train_step

        cfg = VLMConfig.tiny_test(stage=1)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(19)
        b, s = 2, 21
        ids = rng.integers(3, 200, size=(b, s)).astype(np.int32)
        ids[:, 1] = IMAGE_TOKEN_INDEX
        labels = ids.copy()
        labels[:, :4] = IGNORE_INDEX
        batch = {
            "input_ids": jnp.asarray(ids),
            "labels": jnp.asarray(labels),
            "attention_mask": jnp.ones((b, s), bool),
            "images": jnp.zeros((b, 28, 28, 3), jnp.uint8),
        }
        tx = optax.adam(1e-3)
        mask = trainable_mask(params, cfg)

        def run(cp_mesh):
            step = make_train_step(cfg, tx, compute_dtype=jnp.float32,
                                   trainable=mask, cp_mesh=cp_mesh)
            opt = tx.init(params)
            new_p, _, out = jax.jit(step)(params, opt, batch)
            return float(out["total_loss"]), new_p

        loss_ref, p_ref = run(None)
        loss_cp, p_cp = run(make_cp_mesh(cp=4, dp=2))
        assert abs(loss_cp - loss_ref) < 1e-4, (loss_cp, loss_ref)
        for a, b_ in zip(jax.tree_util.tree_leaves(p_cp),
                         jax.tree_util.tree_leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-4, rtol=2e-4)

    def test_bf16_io(self):
        mesh = seq_mesh(4)
        q, k, v = rand_qkv(jax.random.PRNGKey(4), dtype=jnp.bfloat16)
        ref = mha_reference(q, k, v, causal=True)
        out = jax.jit(lambda a, b, c: ring_self_attention(
            mesh, a, b, c, seq_axis="seq", causal=True))(q, k, v)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=3e-2, rtol=3e-2)
