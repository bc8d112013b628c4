"""Model-layer tests on tiny configs: shapes, splice oracle, cached decode
consistency, LoRA init no-op, stage trainability masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lhrs_bot_tpu.models import (
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
    KVCache,
    LlamaConfig,
    LoraConfig,
    PerceiverConfig,
    VLMConfig,
    ViTConfig,
    causal_lm_loss,
    effective_llama_params,
    encode_image,
    init_llama_params,
    init_lora_params,
    init_perceiver_params,
    init_vit_params,
    init_vlm_params,
    llama_apply,
    llama_decode_step,
    llama_prefill,
    merge_lora,
    perceiver_resample,
    splice_image_embeddings,
    trainable_mask,
    vit_encode,
    vlm_forward_loss,
)

F32 = jnp.float32


class TestViT:
    def test_multilevel_shapes(self):
        cfg = ViTConfig.tiny_test()  # 28px/14 → 4 patches, taps at 1,2,3
        params = init_vit_params(jax.random.PRNGKey(0), cfg)
        img = jnp.zeros((2, 28, 28, 3), jnp.uint8)
        out = vit_encode(params, img, cfg, compute_dtype=F32)
        assert out.shape == (2, 3 * cfg.num_patches, cfg.width)

    def test_pixel_values_and_uint8_agree(self):
        cfg = ViTConfig.tiny_test()
        params = init_vit_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (1, 28, 28, 3), dtype=np.uint8)
        from lhrs_bot_tpu.ops.patch_embed import CLIP_MEAN, CLIP_STD

        x = img.astype(np.float32) / 255.0
        x = (x - CLIP_MEAN) / np.asarray(CLIP_STD)
        pixel_values = jnp.asarray(x.transpose(0, 3, 1, 2))  # NCHW
        out_u8 = vit_encode(params, jnp.asarray(img), cfg, compute_dtype=F32)
        out_pv = vit_encode(params, pixel_values, cfg, compute_dtype=F32)
        np.testing.assert_allclose(out_u8, out_pv, rtol=1e-4, atol=1e-4)

    def test_taps_differ_across_levels(self):
        cfg = ViTConfig.tiny_test()
        params = init_vit_params(jax.random.PRNGKey(1), cfg)
        img = jnp.zeros((1, 28, 28, 3), jnp.uint8)
        out = np.asarray(vit_encode(params, img, cfg, compute_dtype=F32))
        n = cfg.num_patches
        assert not np.allclose(out[:, :n], out[:, n:2 * n])


class TestPerceiver:
    def test_shapes(self):
        cfg = PerceiverConfig.tiny_test()
        params = init_perceiver_params(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1),
                                (2, sum(cfg.split_part), cfg.encoder_hidden_size))
        out = perceiver_resample(params, img, cfg, compute_dtype=F32)
        assert out.shape == (2, cfg.num_query, cfg.output_size)

    def test_hoisted_kv_matches_loop(self):
        # pack_perceiver_kv folds the kv-LN affine into one big K/V matmul
        # hoisted out of the layer scan; float path must match the per-layer
        # path to fp32 rounding, W8A8 within the usual int8 budget.
        from lhrs_bot_tpu.models.perceiver import pack_perceiver_kv
        from lhrs_bot_tpu.ops.quant import quantize_vision_layers

        cfg = PerceiverConfig.tiny_test()
        params = init_perceiver_params(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1),
                                (2, sum(cfg.split_part),
                                 cfg.encoder_hidden_size))
        ref = np.asarray(perceiver_resample(params, img, cfg,
                                            compute_dtype=F32))
        out = np.asarray(perceiver_resample(pack_perceiver_kv(params),
                                            img, cfg, compute_dtype=F32))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

        pq = {**params, "layers": quantize_vision_layers(params["layers"])}
        ref_q = np.asarray(perceiver_resample(pq, img, cfg,
                                              compute_dtype=F32))
        out_q = np.asarray(perceiver_resample(pack_perceiver_kv(pq),
                                              img, cfg, compute_dtype=F32))
        rel = (np.linalg.norm(out_q - ref_q)
               / max(np.linalg.norm(ref_q), 1e-9))
        assert rel < 0.05, rel

    def test_folded_kv_matches_loop(self):
        # pack_perceiver_kv_folded normalizes the fixed kv rows once and
        # folds each layer's kv-LN affine into a fused K|V weight; float
        # path must match the per-layer path to fp32 rounding, W8A8 within
        # the usual int8 budget.
        from lhrs_bot_tpu.models.perceiver import pack_perceiver_kv_folded
        from lhrs_bot_tpu.ops.quant import quantize_vision_layers

        cfg = PerceiverConfig.tiny_test()
        params = init_perceiver_params(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1),
                                (2, sum(cfg.split_part),
                                 cfg.encoder_hidden_size))
        ref = np.asarray(perceiver_resample(params, img, cfg,
                                            compute_dtype=F32))
        out = np.asarray(perceiver_resample(pack_perceiver_kv_folded(params),
                                            img, cfg, compute_dtype=F32))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

        pq = {**params, "layers": quantize_vision_layers(params["layers"])}
        ref_q = np.asarray(perceiver_resample(pq, img, cfg,
                                              compute_dtype=F32))
        out_q = np.asarray(perceiver_resample(pack_perceiver_kv_folded(pq),
                                              img, cfg, compute_dtype=F32))
        rel = (np.linalg.norm(out_q - ref_q)
               / max(np.linalg.norm(ref_q), 1e-9))
        assert rel < 0.05, rel

    def test_batch_groups_matches_loop(self):
        # batch_groups folds the level groups into the batch axis (queries
        # zero-padded to the largest group, pad slots masked out of kv);
        # numerics must match the per-group loop exactly up to fp32
        # rounding. Guards the perceiver-probe lever (VERDICT r3 #2).
        cfg = PerceiverConfig.tiny_test()
        assert len(set(cfg.split_part)) == 1  # the fold requires equal kv
        params = init_perceiver_params(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1),
                                (2, sum(cfg.split_part),
                                 cfg.encoder_hidden_size))
        ref = np.asarray(perceiver_resample(params, img, cfg,
                                            compute_dtype=F32))
        out = np.asarray(perceiver_resample(params, img, cfg,
                                            compute_dtype=F32,
                                            batch_groups=True))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    def test_level_locality(self):
        # queries of group 0 attend only to level-0 tokens: perturbing level 2
        # must not change group-0 outputs
        cfg = PerceiverConfig.tiny_test()
        params = init_perceiver_params(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1),
                                (1, sum(cfg.split_part), cfg.encoder_hidden_size))
        out1 = perceiver_resample(params, img, cfg, compute_dtype=F32)
        # note: a constant shift would be LayerNorm-invariant; use noise
        noise = jax.random.normal(
            jax.random.PRNGKey(7), (1, cfg.split_part[-1],
                                    cfg.encoder_hidden_size)) * 3.0
        img2 = img.at[:, -cfg.split_part[-1]:, :].add(noise)
        out2 = perceiver_resample(params, img2, cfg, compute_dtype=F32)
        nq0, nq2 = cfg.stage_num[0], cfg.stage_num[-1]
        diff0 = float(np.abs(np.asarray(out1[:, :nq0] - out2[:, :nq0])).max())
        diff2 = float(np.abs(np.asarray(out1[:, -nq2:] - out2[:, -nq2:])).max())
        assert diff0 < 1e-6, diff0
        assert diff2 > 1e-4, diff2


class TestSplice:
    def _oracle(self, ids, img, table, attn, labels, n_img):
        """Reference semantics re-implemented as a per-row Python loop."""
        b, t = ids.shape
        t_out = t + n_img - 1
        d = table.shape[1]
        emb = np.zeros((b, t_out, d), np.float32)
        attn_o = np.zeros((b, t_out), bool)
        lab_o = np.full((b, t_out), IGNORE_INDEX, np.int64)
        for r in range(b):
            row_e, row_a, row_l = [], [], []
            for i, tok in enumerate(ids[r]):
                if tok == IMAGE_TOKEN_INDEX:
                    row_e.extend(img[r])
                    row_a.extend([True] * n_img)
                    row_l.extend([IGNORE_INDEX] * n_img)
                elif attn[r, i]:
                    row_e.append(table[tok])
                    row_a.append(True)
                    row_l.append(labels[r, i])
            emb[r, :len(row_e)] = row_e
            attn_o[r, :len(row_a)] = row_a
            lab_o[r, :len(row_l)] = row_l
        return emb, attn_o, lab_o

    def test_matches_python_oracle(self):
        rng = np.random.default_rng(0)
        b, t, n_img, v, d = 3, 10, 4, 50, 8
        table = rng.normal(size=(v, d)).astype(np.float32)
        img = rng.normal(size=(b, n_img, d)).astype(np.float32)
        ids = rng.integers(1, v, size=(b, t))
        ids[0, 3] = IMAGE_TOKEN_INDEX
        ids[1, 0] = IMAGE_TOKEN_INDEX
        # row 2: no image
        attn = np.ones((b, t), bool)
        attn[0, 8:] = False  # right padding
        labels = rng.integers(1, v, size=(b, t))

        out = splice_image_embeddings(
            jnp.asarray(ids), jnp.asarray(img), jnp.asarray(table),
            jnp.asarray(attn), jnp.asarray(labels))
        emb_o, attn_o, lab_o = self._oracle(ids, img, table, attn, labels, n_img)

        # rows with image: compare valid prefix (padding handled by mask)
        np.testing.assert_allclose(np.asarray(out.inputs_embeds)[0],
                                   emb_o[0], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(out.attention_mask), attn_o)
        np.testing.assert_array_equal(np.asarray(out.labels), lab_o)
        # row without image: embeddings in valid region match
        np.testing.assert_allclose(
            np.asarray(out.inputs_embeds)[2][attn_o[2]],
            emb_o[2][attn_o[2]], atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(out.seq_len), [8 + n_img - 1, t + n_img - 1, t])

    def _oracle_multi(self, ids, img, table, attn, labels, k_max, n_img):
        """Per-row Python loop, K images: marker j consumes slot j."""
        b, t = ids.shape
        t_out = t + k_max * (n_img - 1)
        d = table.shape[1]
        emb = np.zeros((b, t_out, d), np.float32)
        attn_o = np.zeros((b, t_out), bool)
        lab_o = np.full((b, t_out), IGNORE_INDEX, np.int64)
        for r in range(b):
            row_e, row_a, row_l = [], [], []
            slot = 0
            for i, tok in enumerate(ids[r]):
                if tok == IMAGE_TOKEN_INDEX and slot < k_max:
                    row_e.extend(img[r, slot])
                    row_a.extend([True] * n_img)
                    row_l.extend([IGNORE_INDEX] * n_img)
                    slot += 1
                elif attn[r, i]:
                    row_e.append(table[max(tok, 0)])
                    row_a.append(True)
                    row_l.append(labels[r, i])
            emb[r, :len(row_e)] = row_e
            attn_o[r, :len(row_a)] = row_a
            lab_o[r, :len(row_l)] = row_l
        return emb, attn_o, lab_o

    def test_multi_image_matches_python_oracle(self):
        from lhrs_bot_tpu.models.splice import splice_image_embeddings_multi

        rng = np.random.default_rng(5)
        b, t, k_max, n_img, v, d = 4, 12, 3, 4, 50, 8
        table = rng.normal(size=(v, d)).astype(np.float32)
        img = rng.normal(size=(b, k_max, n_img, d)).astype(np.float32)
        ids = rng.integers(1, v, size=(b, t))
        ids[0, [2, 7]] = IMAGE_TOKEN_INDEX       # two images
        ids[1, [0, 5, 9]] = IMAGE_TOKEN_INDEX    # three (== K)
        ids[2, 4] = IMAGE_TOKEN_INDEX            # one
        # row 3: none
        attn = np.ones((b, t), bool)
        attn[0, 10:] = False
        labels = rng.integers(1, v, size=(b, t))

        out = splice_image_embeddings_multi(
            jnp.asarray(ids), jnp.asarray(img), jnp.asarray(table),
            jnp.asarray(attn), jnp.asarray(labels))
        emb_o, attn_o, lab_o = self._oracle_multi(
            ids, img, table, attn, labels, k_max, n_img)
        np.testing.assert_array_equal(np.asarray(out.attention_mask),
                                      attn_o)
        np.testing.assert_array_equal(np.asarray(out.labels), lab_o)
        for r in range(b):
            np.testing.assert_allclose(
                np.asarray(out.inputs_embeds)[r][attn_o[r]],
                emb_o[r][attn_o[r]], atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(out.seq_len),
            [10 + 2 * (n_img - 1), t + 3 * (n_img - 1),
             t + (n_img - 1), t])

    def test_multi_image_k1_equals_single(self):
        from lhrs_bot_tpu.models.splice import splice_image_embeddings_multi

        rng = np.random.default_rng(6)
        b, t, n_img, v, d = 2, 9, 3, 30, 6
        table = rng.normal(size=(v, d)).astype(np.float32)
        img = rng.normal(size=(b, n_img, d)).astype(np.float32)
        ids = rng.integers(1, v, size=(b, t))
        ids[0, 4] = IMAGE_TOKEN_INDEX
        labels = rng.integers(1, v, size=(b, t))
        single = splice_image_embeddings(
            jnp.asarray(ids), jnp.asarray(img), jnp.asarray(table),
            labels=jnp.asarray(labels))
        multi = splice_image_embeddings_multi(
            jnp.asarray(ids), jnp.asarray(img)[:, None], jnp.asarray(table),
            labels=jnp.asarray(labels))
        np.testing.assert_array_equal(np.asarray(single.seq_len),
                                      np.asarray(multi.seq_len))
        m = np.asarray(single.attention_mask)
        np.testing.assert_array_equal(m, np.asarray(multi.attention_mask))
        np.testing.assert_allclose(
            np.asarray(single.inputs_embeds)[m],
            np.asarray(multi.inputs_embeds)[m], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(single.labels)[m],
                                      np.asarray(multi.labels)[m])

    def test_image_embeds_present(self):
        d = 4
        table = np.zeros((10, d), np.float32)
        img = np.arange(3 * 2 * d, dtype=np.float32).reshape(3, 2, d) + 1
        ids = np.array([[1, IMAGE_TOKEN_INDEX, 2]] * 3)
        out = splice_image_embeddings(
            jnp.asarray(ids), jnp.asarray(img), jnp.asarray(table))
        got = np.asarray(out.inputs_embeds)[:, 1:3, :]
        np.testing.assert_allclose(got, img, atol=1e-6)


class TestLlama:
    def test_logits_shape_and_loss(self):
        cfg = LlamaConfig.tiny_test()
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size)
        logits = llama_apply(params, cfg, input_ids=ids, compute_dtype=F32)
        assert logits.shape == (2, 12, cfg.vocab_size)
        labels = ids.at[:, :4].set(IGNORE_INDEX)
        loss = causal_lm_loss(logits, labels)
        assert np.isfinite(float(loss)) and float(loss) > 0

    def test_causality(self):
        cfg = LlamaConfig.tiny_test()
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        ids = jax.random.randint(jax.random.PRNGKey(1), (1, 10), 0, cfg.vocab_size)
        l1 = llama_apply(params, cfg, input_ids=ids, compute_dtype=F32)
        ids2 = ids.at[0, 7].set((ids[0, 7] + 1) % cfg.vocab_size)
        l2 = llama_apply(params, cfg, input_ids=ids2, compute_dtype=F32)
        np.testing.assert_allclose(l1[0, :7], l2[0, :7], atol=1e-4)
        assert not np.allclose(l1[0, 7:], l2[0, 7:], atol=1e-4)

    def test_prefill_decode_matches_full_forward(self):
        """Greedy logits from the cached path must equal the cacheless path."""
        cfg = LlamaConfig.tiny_test()
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        b, t = 2, 9
        ids = jax.random.randint(jax.random.PRNGKey(1), (b, t), 3, cfg.vocab_size)
        prompt_len = jnp.array([t, t - 3], jnp.int32)
        # right-pad row 1
        ids = ids.at[1, t - 3:].set(cfg.pad_token_id)

        embeds = jnp.take(params["embed_tokens"], ids, axis=0)
        cache = KVCache.create(cfg, b, t + 4, dtype=F32)
        logits_pre, cache = llama_prefill(
            params, cfg, cache, inputs_embeds=embeds, prompt_len=prompt_len,
            compute_dtype=F32)

        # oracle: full forwards at each row's true length
        for row in range(b):
            pl_ = int(prompt_len[row])
            full = llama_apply(params, cfg, input_ids=ids[row:row + 1, :pl_],
                               compute_dtype=F32)
            np.testing.assert_allclose(
                logits_pre[row], full[0, -1], rtol=2e-3, atol=2e-3)

        # one decode step with the argmax token
        next_tok = jnp.argmax(logits_pre, axis=-1)
        emb_next = jnp.take(params["embed_tokens"], next_tok[:, None], axis=0)
        logits_dec, cache = llama_decode_step(
            params, cfg, cache, inputs_embeds=emb_next, compute_dtype=F32)
        for row in range(b):
            pl_ = int(prompt_len[row])
            ext = jnp.concatenate(
                [ids[row:row + 1, :pl_], next_tok[row:row + 1][None]], axis=1)
            full = llama_apply(params, cfg, input_ids=ext, compute_dtype=F32)
            np.testing.assert_allclose(
                logits_dec[row], full[0, -1], rtol=2e-3, atol=2e-3)
        np.testing.assert_array_equal(np.asarray(cache.length),
                                      np.asarray(prompt_len) + 1)


class TestLora:
    def test_init_is_noop(self):
        cfg = LlamaConfig.tiny_test()
        lcfg = LoraConfig(r=4, alpha=8)
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        lora = init_lora_params(jax.random.PRNGKey(1), cfg, lcfg)
        merged = merge_lora(params["layers"], lora, lcfg)
        for name in lora:
            np.testing.assert_allclose(merged[name], params["layers"][name],
                                       atol=1e-6)

    def test_grads_reach_lora_not_base(self):
        cfg = VLMConfig.tiny_test(stage=2, lora=True)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        ids = jnp.array([[1, 5, 7, 9]])

        def loss_fn(p):
            lp = effective_llama_params(p, cfg)
            logits = llama_apply(lp, cfg.llama, input_ids=ids, compute_dtype=F32)
            return causal_lm_loss(logits, ids)

        g = jax.grad(loss_fn)(params)
        # base attn weights got no gradient (stop_gradient in merge)
        assert float(jnp.abs(g["llama"]["layers"]["wq"]).max()) == 0.0
        # lora B gets gradient (A's grad flows through B=0 → still zero at init,
        # B's grad flows through A != 0 → nonzero)
        assert float(jnp.abs(g["lora"]["wq"]["b"]).max()) > 0.0


class TestVLM:
    def test_forward_loss_and_masks(self):
        cfg = VLMConfig.tiny_test(stage=1)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        b, t = 2, 8
        ids = np.random.default_rng(0).integers(3, 100, size=(b, t))
        ids[:, 1] = IMAGE_TOKEN_INDEX
        batch = {
            "input_ids": jnp.asarray(ids),
            "labels": jnp.asarray(ids),
            "attention_mask": jnp.ones((b, t), bool),
            "images": jnp.zeros((b, 28, 28, 3), jnp.uint8),
        }
        out = vlm_forward_loss(params, cfg, batch, compute_dtype=F32)
        assert np.isfinite(float(out["total_loss"]))

        mask = trainable_mask(params, cfg)
        leaves_vit = jax.tree_util.tree_leaves(mask["vit"])
        leaves_pool = jax.tree_util.tree_leaves(mask["pooler"])
        leaves_llama = jax.tree_util.tree_leaves(mask["llama"])
        assert not any(leaves_vit) and all(leaves_pool) and not any(leaves_llama)

    def test_encode_image_shape(self):
        cfg = VLMConfig.tiny_test()
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        out = encode_image(params, jnp.zeros((2, 28, 28, 3), jnp.uint8), cfg,
                           compute_dtype=F32)
        assert out.shape == (2, cfg.pooler.num_query, cfg.llama.hidden_size)


class TestRuntimeLora:
    def test_runtime_path_matches_merge(self):
        """With a dense base, runtime-attached LoRA logits must equal the
        merged-weights logits (same math, different plumbing)."""
        from lhrs_bot_tpu.models.lora import attach_runtime_lora, merge_lora

        cfg = VLMConfig.tiny_test(stage=2, lora=True)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        params["lora"] = jax.tree_util.tree_map(
            lambda x: x + 0.02, params["lora"])
        ids = jnp.array([[1, 5, 7, 9, 12, 3]])

        merged = merge_lora(params["llama"]["layers"], params["lora"],
                            cfg.lora, stop_base_gradient=False)
        l_merged = llama_apply({**params["llama"], "layers": merged},
                               cfg.llama, input_ids=ids, compute_dtype=F32)
        attached = attach_runtime_lora(params["llama"]["layers"],
                                       params["lora"], cfg.lora)
        l_runtime = llama_apply({**params["llama"], "layers": attached},
                                cfg.llama, input_ids=ids, compute_dtype=F32)
        np.testing.assert_allclose(np.asarray(l_runtime),
                                   np.asarray(l_merged),
                                   rtol=2e-4, atol=2e-4)

    def test_qlora_quantized_base_trains(self):
        """int8 base + runtime LoRA: loss computes, grads reach adapters."""
        from lhrs_bot_tpu.ops.quant import quantize_llama_layers

        cfg = VLMConfig.tiny_test(stage=2, lora=True)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        params["llama"]["layers"] = quantize_llama_layers(
            params["llama"]["layers"], bits=8)
        ids = np.random.default_rng(0).integers(3, 200, size=(2, 8))
        ids[:, 1] = IMAGE_TOKEN_INDEX
        batch = {
            "input_ids": jnp.asarray(ids),
            "labels": jnp.asarray(ids),
            "attention_mask": jnp.ones((2, 8), bool),
            "images": jnp.zeros((2, 28, 28, 3), jnp.uint8),
        }

        def loss_fn(lora):
            p = {**params, "lora": lora}
            return vlm_forward_loss(p, cfg, batch,
                                    compute_dtype=F32)["total_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params["lora"])
        assert np.isfinite(float(loss))
        assert float(jnp.abs(grads["wq"]["b"]).max()) > 0.0


class TestQuantizedKVCache:
    """int8 KV cache (KVCache dtype=jnp.int8): per-vector quantized storage
    with scale-folded attention. At the 2304 parity context a bf16 slot is
    1.2 GB — int8 is what lets 8 full-context slots share one 16 GB chip
    (serve/scheduler.py cache_dtype)."""

    def _roll(self, cfg, params, emb, lens, cache_dtype, n=8):
        from lhrs_bot_tpu.models.llama import (KVCache, llama_decode_step,
                                               llama_prefill)

        cache = KVCache.create(cfg, emb.shape[0], 32, dtype=cache_dtype)
        logits, cache = llama_prefill(params, cfg, cache, inputs_embeds=emb,
                                      prompt_len=lens, compute_dtype=F32)
        toks, logs = [], [np.asarray(logits)]
        for _ in range(n):
            nxt = jnp.argmax(logits, -1)
            toks.append(np.asarray(nxt))
            e = jnp.take(params["embed_tokens"], nxt[:, None], axis=0)
            logits, cache = llama_decode_step(params, cfg, cache,
                                              inputs_embeds=e,
                                              compute_dtype=F32)
            logs.append(np.asarray(logits))
        assert cache.quantized == (cache_dtype == jnp.int8)
        return np.stack(toks, 1), np.stack(logs, 1)

    def test_matches_full_precision(self):
        from lhrs_bot_tpu.models.llama import LlamaConfig, init_llama_params

        cfg = LlamaConfig.tiny_test()
        params = init_llama_params(jax.random.PRNGKey(0), cfg, F32)
        rng = np.random.default_rng(0)
        b, t = 2, 10
        ids = rng.integers(3, 250, size=(b, t)).astype(np.int32)
        emb = jnp.take(params["embed_tokens"], jnp.asarray(ids), axis=0)
        lens = jnp.asarray([t, t - 2], jnp.int32)

        toks_f32, logs_f32 = self._roll(cfg, params, emb, lens, F32)
        toks_q, logs_q = self._roll(cfg, params, emb, lens, jnp.int8)
        # measured: 0.19% rel-L2, identical greedy tokens at tiny scale
        rel = (np.linalg.norm(logs_q - logs_f32)
               / np.linalg.norm(logs_f32))
        assert rel < 0.02, rel
        assert (toks_q == toks_f32).mean() >= 0.9, (toks_q, toks_f32)

    def test_engine_and_scheduler_with_int8_cache(self):
        """End-to-end: GenerationEngine + ContinuousBatchingScheduler with
        cache_dtype=int8 produce the plain-engine greedy tokens."""
        from lhrs_bot_tpu.serve.engine import (GenerationConfig,
                                               GenerationEngine)
        from lhrs_bot_tpu.serve.scheduler import (
            ContinuousBatchingScheduler, Request)

        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        ref = GenerationEngine(cfg, params, max_seq_len=96,
                               compute_dtype=F32, cache_dtype=F32)
        q = GenerationEngine(cfg, params, max_seq_len=96,
                             compute_dtype=F32, cache_dtype=jnp.int8)
        rng = np.random.default_rng(3)
        ids = rng.integers(3, 200, size=(2, 9)).astype(np.int32)
        lens = np.asarray([9, 7], np.int32)
        gcfg = GenerationConfig(max_new_tokens=6,
                                eos_token_id=cfg.llama.eos_token_id)
        expect = ref.generate(ids, lens, gen_cfg=gcfg)
        got = q.generate(ids, lens, gen_cfg=gcfg)
        assert got == expect, (got, expect)

        sched = ContinuousBatchingScheduler(
            cfg, params, ref.llama_params, max_batch=2, max_seq_len=96,
            compute_dtype=F32, cache_dtype=jnp.int8,
            eos_token_id=cfg.llama.eos_token_id, prompt_bucket=16)
        reqs = [Request(uid=i, input_ids=ids[i][:lens[i]],
                        max_new_tokens=6) for i in range(2)]
        sched.run(reqs)
        for r, exp in zip(reqs, expect):
            got_r = [t for t in r.output_ids
                     if t != cfg.llama.eos_token_id]
            assert got_r[:len(exp)] == exp, (r.uid, got_r, exp)
