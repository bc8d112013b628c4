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

    @pytest.mark.parametrize("quantized", [False, True])
    def test_context_prefill_matches_dense(self, setup, quantized):
        """Split prefill: pages 0..k via one request's dense prefill, the
        suffix via paged_prefill_with_context on a second slot SHARING
        those pages — logits and subsequent decode must match a dense
        prefill of the full prompt."""
        from lhrs_bot_tpu.models.llama_paged import (
            paged_prefill_with_context)

        cfg, params = setup
        dtype = jnp.int8 if quantized else jnp.float32
        rng = np.random.default_rng(4)
        full = rng.integers(3, 200, size=(48,)).astype(np.int32)
        ctx_tokens, suffix = full[:32], full[32:]  # 2 shared pages of 16

        emb = jnp.take(params["embed_tokens"], jnp.asarray(full)[None],
                       axis=0)
        # oracle: dense paged prefill of the whole prompt on slot 0
        pc = PagedKVCache.create(cfg, 2, 32, 6, page_size=PAGE, dtype=dtype)
        table0 = np.zeros((1, 6), np.int32)
        table0[0, :4] = [3, 7, 2, 9]
        l_dense, pc = paged_prefill_with_context(
            params, cfg, pc,
            inputs_embeds=emb, suffix_len=jnp.array([48]),
            ctx_len=jnp.array([0]), slot_idx=jnp.array([0]),
            table_rows=jnp.asarray(table0), compute_dtype=jnp.float32)

        # slot 1: shares pages [3, 7] (tokens 0..31), prefills the suffix
        emb_sfx = jnp.take(params["embed_tokens"],
                           jnp.asarray(suffix)[None], axis=0)
        table1 = np.zeros((1, 6), np.int32)
        table1[0, :2] = [3, 7]       # shared
        table1[0, 2:4] = [11, 5]     # fresh
        l_ctx, pc = paged_prefill_with_context(
            params, cfg, pc,
            inputs_embeds=emb_sfx, suffix_len=jnp.array([16]),
            ctx_len=jnp.array([32]), slot_idx=jnp.array([1]),
            table_rows=jnp.asarray(table1), compute_dtype=jnp.float32)
        tol = 2e-2 if quantized else 2e-5
        np.testing.assert_allclose(np.asarray(l_ctx), np.asarray(l_dense),
                                   atol=tol, rtol=tol)
        assert int(pc.lengths[1]) == 48

        # decode a few tokens on both slots: must agree exactly
        tok = jnp.argmax(l_dense, -1).astype(jnp.int32)
        toks = jnp.concatenate([tok, tok])
        for _ in range(4):
            e = jnp.take(params["embed_tokens"], toks[:, None], axis=0)
            logits, pc = paged_decode_step(params, cfg, pc,
                                           inputs_embeds=e,
                                           compute_dtype=jnp.float32)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            assert int(nxt[0]) == int(nxt[1])
            toks = nxt

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
        # every page is either free or a cached (refcount-0) prefix page
        stats = paged.pool_stats()
        assert (paged.allocator.available()
                + stats["prefix"]["evictable"]) == 14
        assert stats["prefix"]["entries"] == stats["prefix"]["evictable"]
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
        st = sched.pool_stats()
        assert sched.allocator.available() + st["prefix"]["evictable"] == 5

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
        st8 = paged.pool_stats()
        assert (paged.allocator.available()
                + st8["prefix"]["evictable"]) == 12

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


def _tiny_serving(max_batch=2, num_pages=30, pages_per_seq=6,
                  enable_prefix_cache=True, page_size=16):
    import jax as _jax

    from lhrs_bot_tpu.models import VLMConfig, init_vlm_params
    from lhrs_bot_tpu.serve.engine import GenerationEngine
    from lhrs_bot_tpu.serve.paged import PagedScheduler

    cfg = VLMConfig.tiny_test(stage=0)
    params = init_vlm_params(_jax.random.PRNGKey(0), cfg)
    engine = GenerationEngine(cfg, params, max_seq_len=96,
                              compute_dtype=jnp.float32,
                              cache_dtype=jnp.float32)
    sched = PagedScheduler(
        cfg, params, engine.llama_params, max_batch=max_batch,
        num_pages=num_pages, page_size=page_size,
        pages_per_seq=pages_per_seq, compute_dtype=jnp.float32,
        cache_dtype=jnp.float32, prompt_bucket=16, tokens_per_tick=2,
        enable_prefix_cache=enable_prefix_cache)
    return cfg, params, sched


class TestPrefixCache:
    def test_repeat_prompt_hits_and_matches(self):
        """The same prompt served twice: the rerun must hit the prefix
        pool (suffix-only prefill) and produce identical greedy tokens."""
        from lhrs_bot_tpu.serve.scheduler import Request

        cfg, params, sched = _tiny_serving()
        rng = np.random.default_rng(7)
        prompt = rng.integers(3, 200, size=(40,)).astype(np.int32)

        r1 = Request(uid=1, input_ids=prompt, max_new_tokens=6)
        sched.run([r1])
        stats1 = sched.pool_stats()["prefix"]
        assert stats1["entries"] >= 2  # 40 tokens -> 2 full pages promoted

        r2 = Request(uid=2, input_ids=prompt, max_new_tokens=6)
        sched.run([r2])
        stats2 = sched.pool_stats()["prefix"]
        assert stats2["hits"] >= 1
        assert stats2["tokens_reused"] >= 32
        assert r2.output_ids == r1.output_ids

    def test_shared_system_prefix_across_prompts(self):
        """Different questions behind a common 32-token system prefix:
        outputs must equal the prefix-cache-off scheduler's outputs."""
        from lhrs_bot_tpu.serve.scheduler import Request

        rng = np.random.default_rng(8)
        system = rng.integers(3, 200, size=(32,)).astype(np.int32)
        questions = [rng.integers(3, 200, size=(n,)).astype(np.int32)
                     for n in (9, 17, 4)]
        prompts = [np.concatenate([system, q]) for q in questions]

        def run(enable):
            _, _, sched = _tiny_serving(enable_prefix_cache=enable)
            reqs = [Request(uid=i, input_ids=p, max_new_tokens=5)
                    for i, p in enumerate(prompts)]
            # first request alone (promotes the system pages), then the
            # rest — sharing is across admission waves by design
            sched.run([reqs[0]])
            sched.run(reqs[1:])
            return [r.output_ids for r in reqs], sched

        base_out, _ = run(False)
        cached_out, sched = run(True)
        assert cached_out == base_out
        st = sched.pool_stats()["prefix"]
        assert st["tokens_reused"] >= 2 * 32  # 2nd+3rd reuse the system pages

    def test_chunked_prefill_scheduler_equivalence(self):
        """prefill_chunk=16: the decoder loops over fixed 16-wide embed
        slices — token-for-token identical to the monolithic paged
        prefill, including across prefix-cache reuse waves."""
        import jax as _jax

        from lhrs_bot_tpu.models import VLMConfig, init_vlm_params
        from lhrs_bot_tpu.serve.engine import GenerationEngine
        from lhrs_bot_tpu.serve.paged import PagedScheduler
        from lhrs_bot_tpu.serve.scheduler import Request

        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(_jax.random.PRNGKey(0), cfg)
        engine = GenerationEngine(cfg, params, max_seq_len=96,
                                  compute_dtype=jnp.float32,
                                  cache_dtype=jnp.float32)
        rng = np.random.default_rng(21)
        system = rng.integers(3, 200, size=(18,)).astype(np.int32)
        prompts = [np.concatenate(
            [system, rng.integers(3, 200, size=(n,)).astype(np.int32)])
            for n in (23, 6, 15)]

        def run(chunk):
            sched = PagedScheduler(
                cfg, params, engine.llama_params, max_batch=2,
                num_pages=30, page_size=16, pages_per_seq=6,
                compute_dtype=jnp.float32, cache_dtype=jnp.float32,
                prompt_bucket=16, tokens_per_tick=2,
                prefill_chunk=chunk)
            reqs = [Request(uid=i, input_ids=p, max_new_tokens=5)
                    for i, p in enumerate(prompts)]
            sched.run([reqs[0]])
            sched.run(reqs[1:])
            return [r.output_ids for r in reqs], sched

        mono, _ = run(None)
        chunked, sched = run(16)
        assert chunked == mono, (chunked, mono)
        assert sched.pool_stats()["prefix"]["tokens_reused"] >= 16

    def test_eviction_under_pressure(self):
        """A full pool of refcount-0 prefix pages must be evicted to admit
        new work rather than deferring forever."""
        from lhrs_bot_tpu.serve.scheduler import Request

        cfg, params, sched = _tiny_serving(max_batch=1, num_pages=10,
                                           pages_per_seq=5)
        rng = np.random.default_rng(9)
        outs = []
        for i in range(4):  # each run promotes pages; pool is 9 pages
            p = rng.integers(3, 200, size=(33,)).astype(np.int32)
            r = Request(uid=i, input_ids=p, max_new_tokens=4)
            sched.run([r])
            assert r.done and len(r.output_ids) >= 1
            outs.append(r.output_ids)
        st = sched.pool_stats()
        assert st["free_pages"] + st["prefix"]["evictable"] == 9

    def test_sampling_and_k8_tick_equivalence(self):
        """Paged scheduler with per-request sampling and tokens_per_tick=8
        must match the contiguous scheduler token-for-token under the same
        RNG seed (identical logits -> identical categorical draws)."""
        import jax as _jax

        from lhrs_bot_tpu.models import VLMConfig, init_vlm_params
        from lhrs_bot_tpu.serve.engine import (GenerationConfig,
                                               GenerationEngine)
        from lhrs_bot_tpu.serve.paged import PagedScheduler
        from lhrs_bot_tpu.serve.scheduler import (
            ContinuousBatchingScheduler, Request)

        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(_jax.random.PRNGKey(0), cfg)
        engine = GenerationEngine(cfg, params, max_seq_len=96,
                                  compute_dtype=jnp.float32,
                                  cache_dtype=jnp.float32)
        rng = np.random.default_rng(41)
        prompts = [rng.integers(3, 200, size=(n,)).astype(np.int32)
                   for n in (19, 8)]

        def reqs():
            return [Request(uid=0, input_ids=prompts[0], max_new_tokens=7,
                            temperature=1.5, top_p=0.9),
                    Request(uid=1, input_ids=prompts[1], max_new_tokens=7,
                            temperature=0.0)]

        kw = dict(max_batch=2, compute_dtype=jnp.float32,
                  cache_dtype=jnp.float32, prompt_bucket=16,
                  tokens_per_tick=8,
                  gen_cfg=GenerationConfig(
                      eos_token_id=cfg.llama.eos_token_id))
        base = ContinuousBatchingScheduler(
            cfg, params, engine.llama_params, max_seq_len=96,
            rng=_jax.random.PRNGKey(5), **kw)
        a = reqs()
        base.run(a)
        paged = PagedScheduler(
            cfg, params, engine.llama_params, num_pages=20, page_size=16,
            pages_per_seq=6, rng=_jax.random.PRNGKey(5), **kw)
        b = reqs()
        paged.run(b)
        for ra, rb in zip(a, b):
            assert rb.output_ids == ra.output_ids, (
                ra.uid, rb.output_ids, ra.output_ids)

    def test_page_accounting_fuzz(self):
        """Randomized admit/step/cancel stream: at every point the pool
        must conserve pages — free + prefix-held + slot-held == total —
        and no page may be held twice."""
        from lhrs_bot_tpu.serve.scheduler import Request

        cfg, params, sched = _tiny_serving(max_batch=3, num_pages=24,
                                           pages_per_seq=5)
        total = sched.num_pages - 1
        rng = np.random.default_rng(99)
        pending = []
        uid = 0
        live = []

        def check():
            free = set(sched.allocator._free)
            prefix_pages = {e.page for e in sched.prefix._entries.values()}
            slot_pages = set()
            for lst in sched.slot_pages:
                slot_pages |= set(lst)
            # no overlap between ownership classes
            assert not free & prefix_pages, (free, prefix_pages)
            assert not free & slot_pages
            assert not prefix_pages & slot_pages
            assert 0 not in free | prefix_pages | slot_pages
            assert len(free) + len(prefix_pages) + len(slot_pages) == total

        for step in range(60):
            op = rng.random()
            if op < 0.4:
                n = int(rng.integers(5, 40))
                # repeat some prompts to exercise prefix sharing
                if live and rng.random() < 0.4:
                    ids = live[int(rng.integers(len(live)))].input_ids
                else:
                    ids = rng.integers(3, 200, size=(n,)).astype(np.int32)
                r = Request(uid=uid, input_ids=np.asarray(ids),
                            max_new_tokens=int(rng.integers(1, 12)))
                uid += 1
                pending.append(r)
                k = sched.admit(pending)
                live.extend(pending[:k])
                pending = pending[k:]
            elif op < 0.55 and live:
                victim = live[int(rng.integers(len(live)))]
                sched.cancel(victim.uid)
            else:
                sched.step()
            live = [r for r in live if not r.done]
            check()
        # drain
        for _ in range(200):
            if not sched.active.any() and not pending:
                break
            if pending:
                k = sched.admit(pending)
                live.extend(pending[:k])
                pending = pending[k:]
            sched.step()
            check()
        assert not sched.active.any()

    def test_fail_all_releases_pages(self):
        """The serving worker's error recovery (fail_all) must return
        every page — private, shared and promoted — to the pool."""
        from lhrs_bot_tpu.serve.scheduler import Request

        cfg, params, sched = _tiny_serving(max_batch=2)
        rng = np.random.default_rng(12)
        p = rng.integers(3, 200, size=(33,)).astype(np.int32)
        r1 = Request(uid=1, input_ids=p, max_new_tokens=40)
        n = sched.admit([r1])
        assert n == 1 and sched.active.any()
        # a second identical request shares the promoted pages
        r2 = Request(uid=2, input_ids=p, max_new_tokens=40)
        sched.admit([r2])
        sched.fail_all()
        assert not sched.active.any()
        st = sched.pool_stats()
        assert (st["free_pages"] + st["prefix"]["evictable"]
                == st["total_pages"])
        assert st["prefix"]["evictable"] == st["prefix"]["entries"]
        # pool fully serviceable again
        r3 = Request(uid=3, input_ids=p, max_new_tokens=4)
        sched.run([r3])
        assert r3.done and len(r3.output_ids) >= 1

    def test_image_pages_not_promoted(self):
        """Pages containing the image splice must never enter the pool."""
        from lhrs_bot_tpu.serve.scheduler import Request

        cfg, params, sched = _tiny_serving(pages_per_seq=6, num_pages=40)
        rng = np.random.default_rng(10)
        head = rng.integers(3, 200, size=(16,)).astype(np.int32)
        tail = rng.integers(3, 200, size=(20,)).astype(np.int32)
        ids = np.concatenate([head, np.array([-200], np.int32), tail])
        img = np.zeros((28, 28, 3), np.uint8)
        r = Request(uid=1, input_ids=ids, image=img, max_new_tokens=4)
        sched.run([r])
        st = sched.pool_stats()["prefix"]
        # only the 1 pure-text page before the -200 is promotable
        assert st["entries"] == 1

        # identical request again: hits exactly the text page, same output
        r2 = Request(uid=2, input_ids=ids, image=img, max_new_tokens=4)
        sched.run([r2])
        assert r2.output_ids == r.output_ids

    def test_null_page_never_aliased(self, setup):
        """Poisoning the null page must not change any output (no live
        sequence may ever read page 0)."""
        cfg, params = setup
        rng = np.random.default_rng(2)
        ids = jnp.asarray(rng.integers(3, 200, size=(2, 32)), jnp.int32)
        lens = jnp.array([9, 32], jnp.int32)
        _, _, pcache = prefill_both(cfg, params, ids, lens)
        poisoned = pcache._replace(
            k_pages=pcache.k_pages.at[:, 0].set(1e9),
            v_pages=pcache.v_pages.at[:, 0].set(1e9))
        emb = jnp.take(params["embed_tokens"],
                       jnp.array([[5], [7]], jnp.int32), axis=0)
        l1, _ = paged_decode_step(params, cfg, pcache, inputs_embeds=emb,
                                  compute_dtype=jnp.float32)
        l2, _ = paged_decode_step(params, cfg, poisoned, inputs_embeds=emb,
                                  compute_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
