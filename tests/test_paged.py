"""Paged KV cache vs the contiguous cache: decode must be numerically
identical (same attention, different storage), with pages deliberately
scattered through the pool to prove the table indirection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lhrs_bot_tpu.models.llama import (KVCache, LlamaConfig,
                                       init_llama_params, llama_decode_step,
                                       llama_prefill)
from lhrs_bot_tpu.models.llama_paged import (PagedKVCache,
                                             paged_decode_step,
                                             scatter_prefill)

PAGE = 16


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig.tiny_test()
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def prefill_both(cfg, params, ids, lens, max_len=96, pages_per_seq=None,
                 num_pages=64, shuffle_seed=7, alloc_tokens=None):
    """Contiguous prefill + an equivalent paged cache whose pages are
    allocated in SHUFFLED pool order."""
    b, w = ids.shape
    pages_per_seq = pages_per_seq or max_len // PAGE
    emb = jnp.take(params["embed_tokens"], ids, axis=0)
    cache = KVCache.create(cfg, b, max_len, dtype=jnp.float32)
    logits, cache = llama_prefill(
        params, cfg, cache, inputs_embeds=emb,
        prompt_len=lens, compute_dtype=jnp.float32)

    # paged: prefill into a width-W tmp cache, scatter into shuffled pages
    tmp = KVCache.create(cfg, b, w, dtype=jnp.float32)
    _, tmp = llama_prefill(params, cfg, tmp, inputs_embeds=emb,
                           prompt_len=lens, compute_dtype=jnp.float32)
    pcache = PagedKVCache.create(cfg, b, num_pages, pages_per_seq,
                                 page_size=PAGE, dtype=jnp.float32)
    rng = np.random.default_rng(shuffle_seed)
    pool_order = rng.permutation(np.arange(1, num_pages))  # never page 0
    table = np.zeros((b, pages_per_seq), np.int32)
    nxt = 0
    alloc = alloc_tokens or w  # pages must cover prompt + decode budget
    for row in range(b):
        need = int(np.ceil(alloc / PAGE))
        table[row, :need] = pool_order[nxt:nxt + need]
        nxt += need
    pcache = scatter_prefill(pcache, tmp, jnp.arange(b),
                             jnp.asarray(table), lens)
    return logits, cache, pcache


class TestPagedDecode:
    def test_matches_contiguous(self, setup):
        cfg, params = setup
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(3, 200, size=(3, 32)), jnp.int32)
        lens = jnp.array([32, 17, 5], jnp.int32)
        logits0, cache, pcache = prefill_both(cfg, params, ids, lens)
        np.testing.assert_array_equal(np.asarray(pcache.lengths),
                                      np.asarray(lens))

        tok_c = jnp.argmax(logits0, -1).astype(jnp.int32)
        tok_p = tok_c
        step_c = jax.jit(lambda p, c, e: llama_decode_step(
            p, cfg, c, inputs_embeds=e, compute_dtype=jnp.float32))
        step_p = jax.jit(lambda p, c, e: paged_decode_step(
            p, cfg, c, inputs_embeds=e, compute_dtype=jnp.float32))
        for _ in range(12):
            emb_c = jnp.take(params["embed_tokens"], tok_c[:, None], axis=0)
            emb_p = jnp.take(params["embed_tokens"], tok_p[:, None], axis=0)
            lc, cache = step_c(params, cache, emb_c)
            lp, pcache = step_p(params, pcache, emb_p)
            np.testing.assert_allclose(np.asarray(lp), np.asarray(lc),
                                       atol=2e-4, rtol=2e-4)
            tok_c = jnp.argmax(lc, -1).astype(jnp.int32)
            tok_p = jnp.argmax(lp, -1).astype(jnp.int32)
            assert (np.asarray(tok_p) == np.asarray(tok_c)).all()

    def test_decode_crosses_page_boundary(self, setup):
        """Start at length page_size-2 and decode 6 tokens: the append must
        walk onto the next allocated page."""
        cfg, params = setup
        rng = np.random.default_rng(1)
        w = PAGE  # one-page prompt width
        ids = jnp.asarray(rng.integers(3, 200, size=(2, w)), jnp.int32)
        lens = jnp.array([PAGE - 2, PAGE - 1], jnp.int32)
        logits0, cache, pcache = prefill_both(
            cfg, params, ids, lens, max_len=64, pages_per_seq=4,
            alloc_tokens=w + 6)
        tok = jnp.argmax(logits0, -1).astype(jnp.int32)
        tok_p = tok
        for _ in range(6):
            emb = jnp.take(params["embed_tokens"], tok[:, None], axis=0)
            emb_p = jnp.take(params["embed_tokens"], tok_p[:, None], axis=0)
            lc, cache = llama_decode_step(params, cfg, cache,
                                          inputs_embeds=emb,
                                          compute_dtype=jnp.float32)
            lpg, pcache = paged_decode_step(params, cfg, pcache,
                                            inputs_embeds=emb_p,
                                            compute_dtype=jnp.float32)
            tok = jnp.argmax(lc, -1).astype(jnp.int32)
            tok_p = jnp.argmax(lpg, -1).astype(jnp.int32)
            assert (np.asarray(tok_p) == np.asarray(tok)).all()
        assert int(pcache.lengths[1]) == PAGE - 1 + 6  # second page in use

    def test_scheduler_equivalence(self):
        """PagedScheduler must emit token-for-token the contiguous
        scheduler's greedy outputs over a mixed-length request wave that
        exercises page recycling (more total requests than the pool can
        hold at once)."""
        from lhrs_bot_tpu.models import VLMConfig, init_vlm_params
        from lhrs_bot_tpu.serve.paged import PagedScheduler
        from lhrs_bot_tpu.serve.scheduler import (
            ContinuousBatchingScheduler, Request)

        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        from lhrs_bot_tpu.serve.engine import GenerationEngine
        engine = GenerationEngine(cfg, params, max_seq_len=96,
                                  compute_dtype=jnp.float32,
                                  cache_dtype=jnp.float32)

        rng = np.random.default_rng(3)
        prompts = [rng.integers(3, 200, size=(n,)).astype(np.int32)
                   for n in (40, 7, 23, 12, 31, 5)]

        def make_reqs():
            return [Request(uid=i, input_ids=p, max_new_tokens=8)
                    for i, p in enumerate(prompts)]

        base = ContinuousBatchingScheduler(
            cfg, params, engine.llama_params, max_batch=3, max_seq_len=96,
            compute_dtype=jnp.float32, cache_dtype=jnp.float32,
            prompt_bucket=16, tokens_per_tick=2)
        base.run(make_reqs_base := make_reqs())

        # pool: 14 usable pages of 16 = 224 tokens — far less than
        # 3 slots x 96; two admission waves must recycle pages
        paged = PagedScheduler(
            cfg, params, engine.llama_params, max_batch=3,
            num_pages=15, page_size=16, pages_per_seq=6,
            compute_dtype=jnp.float32, cache_dtype=jnp.float32,
            prompt_bucket=16, tokens_per_tick=2)
        paged.run(make_reqs_paged := make_reqs())

        for rb, rp in zip(make_reqs_base, make_reqs_paged):
            assert rb.done and rp.done
            assert rp.output_ids == rb.output_ids, (
                rb.uid, rp.output_ids, rb.output_ids)
        # every page returned to the pool
        assert paged.allocator.available() == 14
        assert all(not p for p in paged.slot_pages)

    def test_scheduler_admission_deferred_by_pool(self):
        """With free slots but a nearly-empty pool, admission must defer
        requests rather than over-allocate, then serve them as pages
        free."""
        from lhrs_bot_tpu.models import VLMConfig, init_vlm_params
        from lhrs_bot_tpu.serve.engine import GenerationEngine
        from lhrs_bot_tpu.serve.paged import PagedScheduler
        from lhrs_bot_tpu.serve.scheduler import Request

        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        engine = GenerationEngine(cfg, params, max_seq_len=96,
                                  compute_dtype=jnp.float32,
                                  cache_dtype=jnp.float32)
        # 5 usable pages x 16 = 80 tokens total; each request needs
        # ceil((32+16)/16)=3 pages -> only ONE fits at a time despite
        # max_batch=4
        sched = PagedScheduler(
            cfg, params, engine.llama_params, max_batch=4,
            num_pages=6, page_size=16, pages_per_seq=4,
            compute_dtype=jnp.float32, cache_dtype=jnp.float32,
            prompt_bucket=16, tokens_per_tick=1)
        rng = np.random.default_rng(5)
        reqs = [Request(uid=i,
                        input_ids=rng.integers(3, 200, size=(32,))
                        .astype(np.int32),
                        max_new_tokens=16) for i in range(3)]
        n = sched.admit(reqs)
        assert n == 1, f"expected pool-limited admission of 1, got {n}"
        sched.run(reqs)
        assert all(r.done and len(r.output_ids) >= 1 for r in reqs)
        assert sched.allocator.available() == 5

    def test_scheduler_equivalence_int8(self):
        """int8 paged pool == int8 contiguous cache, greedy, with page
        recycling (the per-vector scales must ride the same page
        indirection as their K/V rows)."""
        from lhrs_bot_tpu.models import VLMConfig, init_vlm_params
        from lhrs_bot_tpu.serve.engine import GenerationEngine
        from lhrs_bot_tpu.serve.paged import PagedScheduler
        from lhrs_bot_tpu.serve.scheduler import (
            ContinuousBatchingScheduler, Request)

        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        engine = GenerationEngine(cfg, params, max_seq_len=96,
                                  compute_dtype=jnp.float32,
                                  cache_dtype=jnp.float32)
        rng = np.random.default_rng(11)
        prompts = [rng.integers(3, 200, size=(n,)).astype(np.int32)
                   for n in (26, 9, 33)]

        def reqs():
            return [Request(uid=i, input_ids=p, max_new_tokens=6)
                    for i, p in enumerate(prompts)]

        base = ContinuousBatchingScheduler(
            cfg, params, engine.llama_params, max_batch=2, max_seq_len=96,
            compute_dtype=jnp.float32, cache_dtype=jnp.int8,
            prompt_bucket=16, tokens_per_tick=2)
        a = reqs()
        base.run(a)
        paged = PagedScheduler(
            cfg, params, engine.llama_params, max_batch=2,
            num_pages=13, page_size=16, pages_per_seq=6,
            compute_dtype=jnp.float32, cache_dtype=jnp.int8,
            prompt_bucket=16, tokens_per_tick=2)
        b = reqs()
        paged.run(b)
        for rb, rp in zip(a, b):
            assert rp.output_ids == rb.output_ids, (
                rb.uid, rp.output_ids, rb.output_ids)
        assert paged.allocator.available() == 12

    def test_allocator(self):
        from lhrs_bot_tpu.serve.paged import PageAllocator

        a = PageAllocator(8)
        assert a.available() == 7
        p1 = a.alloc(3)
        p2 = a.alloc(4)
        assert not set(p1) & set(p2) and 0 not in p1 + p2
        with pytest.raises(RuntimeError):
            a.alloc(1)
        a.free(p1)
        assert sorted(a.alloc(3)) == sorted(p1)
        with pytest.raises(ValueError):
            a.free([0])

    def test_null_page_never_aliased(self, setup):
        """Poisoning the null page must not change any output (no live
        sequence may ever read page 0)."""
        cfg, params = setup
        rng = np.random.default_rng(2)
        ids = jnp.asarray(rng.integers(3, 200, size=(2, 32)), jnp.int32)
        lens = jnp.array([9, 32], jnp.int32)
        _, _, pcache = prefill_both(cfg, params, ids, lens)
        poisoned = pcache._replace(
            k_pages=pcache.k_pages.at[:, :, 0].set(1e9),
            v_pages=pcache.v_pages.at[:, :, 0].set(1e9))
        emb = jnp.take(params["embed_tokens"],
                       jnp.array([[5], [7]], jnp.int32), axis=0)
        l1, _ = paged_decode_step(params, cfg, pcache, inputs_embeds=emb,
                                  compute_dtype=jnp.float32)
        l2, _ = paged_decode_step(params, cfg, poisoned, inputs_embeds=emb,
                                  compute_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
