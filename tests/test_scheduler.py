"""Continuous-batching scheduler: output parity with the plain engine,
slot reuse, mixed admission."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lhrs_bot_tpu.models import (
    IMAGE_TOKEN_INDEX,
    VLMConfig,
    effective_llama_params,
    init_vlm_params,
)
from lhrs_bot_tpu.serve.engine import GenerationConfig, GenerationEngine
from lhrs_bot_tpu.serve.scheduler import ContinuousBatchingScheduler, Request


@pytest.fixture(scope="module")
def setup():
    cfg = VLMConfig.tiny_test(stage=0)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    engine = GenerationEngine(cfg, params, max_seq_len=96,
                              compute_dtype=jnp.float32,
                              cache_dtype=jnp.float32)
    sched = ContinuousBatchingScheduler(
        cfg, params, engine.llama_params, max_batch=3, max_seq_len=96,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32,
        eos_token_id=cfg.llama.eos_token_id, prompt_bucket=16)
    return cfg, params, engine, sched


class TestScheduler:
    def test_matches_plain_engine(self, setup):
        cfg, params, engine, sched = setup
        rng = np.random.default_rng(0)
        prompts = [rng.integers(3, 200, size=(n,)).astype(np.int32)
                   for n in (5, 9, 7, 6, 8)]  # 5 requests > 3 slots
        reqs = [Request(uid=i, input_ids=p, max_new_tokens=6)
                for i, p in enumerate(prompts)]
        sched.run(reqs)
        assert all(r.done for r in reqs)

        for r, p in zip(reqs, prompts):
            expected = engine.generate(
                p[None], np.asarray([len(p)], np.int32),
                gen_cfg=GenerationConfig(
                    max_new_tokens=6, eos_token_id=cfg.llama.eos_token_id))
            got = [t for t in r.output_ids if t != cfg.llama.eos_token_id]
            assert got[:len(expected[0])] == expected[0], (r.uid, got,
                                                           expected[0])

    def test_cancel_frees_slot_mid_generation(self, setup):
        cfg, params, engine, sched = setup
        rng = np.random.default_rng(7)
        a, b = (Request(uid=100 + i,
                        input_ids=rng.integers(3, 200, size=(6,)
                                               ).astype(np.int32),
                        max_new_tokens=30) for i in range(2))
        assert sched.admit([a, b]) == 2
        sched.step()
        n_at_cancel = len(a.output_ids)
        assert sched.cancel(a.uid)
        assert a.done and a.cancelled
        assert not sched.cancel(a.uid)  # slot already released
        # freed slot is immediately admittable while b keeps decoding
        c = Request(uid=102, input_ids=rng.integers(
            3, 200, size=(5,)).astype(np.int32), max_new_tokens=4)
        assert sched.admit([c]) == 1
        while sched.step():
            pass
        assert len(a.output_ids) == n_at_cancel  # no tokens after cancel
        assert b.done and not b.cancelled and len(b.output_ids) >= 1
        assert c.done and len(c.output_ids) >= 1

    def test_bucket_sizes(self):
        bs = ContinuousBatchingScheduler._bucket_sizes
        assert bs(1) == [1]
        assert bs(2) == [2]
        assert bs(3) == [2, 1]
        assert bs(5) == [4, 1]
        assert bs(7) == [4, 2, 1]
        assert bs(8) == [8]

    def test_trickle_admission_parity(self, setup):
        """Continuous batching with trickle arrivals: a request admitted
        mid-decode (b=1 bucketed prefill scattering into a free slot) must
        not disturb the active slots, and its own tokens must match the
        plain engine."""
        cfg, params, engine, sched = setup
        rng = np.random.default_rng(7)
        p0 = rng.integers(3, 200, size=(9,)).astype(np.int32)
        p1 = rng.integers(3, 200, size=(6,)).astype(np.int32)
        r0 = Request(uid=0, input_ids=p0, max_new_tokens=8)
        r1 = Request(uid=1, input_ids=p1, max_new_tokens=5)
        sched.admit([r0])
        sched.step()          # r0 decoding alone
        sched.admit([r1])     # trickle arrival joins mid-flight
        while sched.active.any():
            sched.step()
        for r, p, n in ((r0, p0, 8), (r1, p1, 5)):
            expected = engine.generate(
                p[None], np.asarray([len(p)], np.int32),
                gen_cfg=GenerationConfig(
                    max_new_tokens=n, eos_token_id=cfg.llama.eos_token_id))
            got = [t for t in r.output_ids if t != cfg.llama.eos_token_id]
            assert got[:len(expected[0])] == expected[0], (r.uid,)

    def test_multimodal_request(self, setup):
        cfg, params, engine, sched = setup
        ids = np.full((6,), 7, np.int32)
        ids[1] = IMAGE_TOKEN_INDEX
        img = np.zeros((cfg.vit.image_size, cfg.vit.image_size, 3), np.uint8)
        req = Request(uid=99, input_ids=ids, image=img, max_new_tokens=4)
        sched.run([req])
        assert req.done
        expected = engine.generate(
            ids[None], np.asarray([6], np.int32), images=img[None],
            gen_cfg=GenerationConfig(
                max_new_tokens=4, eos_token_id=cfg.llama.eos_token_id))
        got = [t for t in req.output_ids if t != cfg.llama.eos_token_id]
        assert got[:len(expected[0])] == expected[0]

    def test_staggered_admission_reuses_slots(self, setup):
        cfg, params, engine, sched = setup
        rng = np.random.default_rng(1)
        reqs = [Request(uid=i,
                        input_ids=rng.integers(3, 200, size=(5,)).astype(
                            np.int32),
                        max_new_tokens=3 + i % 3)
                for i in range(7)]
        sched.run(reqs)
        assert all(r.done for r in reqs)
        assert all(len(r.output_ids) >= 1 for r in reqs)


class TestAdmissionLimits:
    def test_long_image_prompt_admits_and_clamps(self, setup):
        """A prompt near max_seq_len with an image must not overflow the
        cache: width is capped by the num_query-1 splice expansion and the
        generation budget is clamped to remaining cache room."""
        cfg, params, engine, _ = setup
        sched = ContinuousBatchingScheduler(
            cfg, params, engine.llama_params, max_batch=2, max_seq_len=96,
            compute_dtype=jnp.float32, cache_dtype=jnp.float32,
            eos_token_id=cfg.llama.eos_token_id, prompt_bucket=16)
        nq = cfg.pooler.num_query
        ids = np.full((96,), 7, np.int32)  # == max_seq_len
        ids[1] = IMAGE_TOKEN_INDEX
        img = np.zeros((cfg.vit.image_size, cfg.vit.image_size, 3), np.uint8)
        req = Request(uid=1, input_ids=ids, image=img, max_new_tokens=50)
        sched.run([req])
        assert req.done
        # spliced length ≤ max_seq_len ⇒ budget was clamped, not corrupted
        spliced = min(96, 96 - nq + 1) + nq - 1
        assert len(req.output_ids) <= max(1, 96 - spliced) + 1

    def test_text_budget_clamped_to_cache(self, setup):
        cfg, params, engine, _ = setup
        sched = ContinuousBatchingScheduler(
            cfg, params, engine.llama_params, max_batch=2, max_seq_len=96,
            compute_dtype=jnp.float32, cache_dtype=jnp.float32,
            eos_token_id=cfg.llama.eos_token_id, prompt_bucket=16)
        ids = np.full((90,), 7, np.int32)
        req = Request(uid=2, input_ids=ids, max_new_tokens=1000)
        sched.run([req])
        assert req.done
        assert len(req.output_ids) <= 96 - 90 + 1


class TestSamplingScheduler:
    def test_sampled_generation_runs_and_varies(self, setup):
        cfg, params, engine, _ = setup
        sched = ContinuousBatchingScheduler(
            cfg, params, engine.llama_params, max_batch=2, max_seq_len=96,
            compute_dtype=jnp.float32, cache_dtype=jnp.float32,
            prompt_bucket=16,
            gen_cfg=GenerationConfig(do_sample=True, temperature=1.5,
                                     top_p=0.95,
                                     eos_token_id=cfg.llama.eos_token_id))
        rng = np.random.default_rng(3)
        prompts = [rng.integers(3, 200, size=(6,)).astype(np.int32)
                   for _ in range(4)]
        reqs = [Request(uid=i, input_ids=p, max_new_tokens=6)
                for i, p in enumerate(prompts)]
        sched.run(reqs)
        assert all(r.done for r in reqs)
        # same prompts, high temperature: some outputs should differ
        assert len({tuple(r.output_ids) for r in reqs}) > 1

    def test_per_request_sampling_mixed_batch(self, setup):
        """One shared batch mixes greedy and sampled slots: a greedy eval
        request riding with a T=1.5 chat request must produce EXACTLY the
        all-greedy scheduler's tokens (Request.temperature overrides the
        scheduler default per slot)."""
        cfg, params, engine, _ = setup

        def make(default_sampling):
            return ContinuousBatchingScheduler(
                cfg, params, engine.llama_params, max_batch=2,
                max_seq_len=96, compute_dtype=jnp.float32,
                cache_dtype=jnp.float32, prompt_bucket=16,
                gen_cfg=GenerationConfig(
                    do_sample=default_sampling, temperature=1.5, top_p=0.95,
                    eos_token_id=cfg.llama.eos_token_id),
                rng=jax.random.PRNGKey(11))

        rng = np.random.default_rng(9)
        prompt = rng.integers(3, 200, size=(7,)).astype(np.int32)

        ref = make(default_sampling=False)
        ref_req = Request(uid=0, input_ids=prompt, max_new_tokens=6)
        ref.run([ref_req])

        # sampling-by-default scheduler; the greedy request opts out via
        # temperature=0.0 while its batchmate samples hot
        mixed = make(default_sampling=True)
        greedy_req = Request(uid=1, input_ids=prompt, max_new_tokens=6,
                             temperature=0.0)
        hot_req = Request(uid=2, input_ids=prompt, max_new_tokens=6)
        mixed.run([greedy_req, hot_req])
        assert greedy_req.output_ids == ref_req.output_ids, (
            greedy_req.output_ids, ref_req.output_ids)
        assert hot_req.done and len(hot_req.output_ids) >= 1

    def test_sampling_deterministic_under_fixed_rng(self, setup):
        cfg, params, engine, _ = setup

        def run_once():
            sched = ContinuousBatchingScheduler(
                cfg, params, engine.llama_params, max_batch=1,
                max_seq_len=96, compute_dtype=jnp.float32,
                cache_dtype=jnp.float32, prompt_bucket=16,
                gen_cfg=GenerationConfig(
                    do_sample=True, temperature=1.2, top_p=0.9,
                    eos_token_id=cfg.llama.eos_token_id),
                rng=jax.random.PRNGKey(4))
            req = Request(uid=0, input_ids=np.arange(3, 10, dtype=np.int32),
                          max_new_tokens=6)
            sched.run([req])
            return req.output_ids

        assert run_once() == run_once()


class TestMultiImageScheduler:
    def test_multi_image_request_matches_engine(self, setup):
        """A 2-image request batched WITH a 1-image and a text request:
        every output must match the plain engine run of the same prompt
        (the (b, K, H, W, 3) chunk packing + per-row marker accounting)."""
        cfg, params, engine, _ = setup
        sched = ContinuousBatchingScheduler(
            cfg, params, engine.llama_params, max_batch=3, max_seq_len=96,
            compute_dtype=jnp.float32, cache_dtype=jnp.float32,
            eos_token_id=cfg.llama.eos_token_id, prompt_bucket=16)
        rng = np.random.default_rng(31)
        img1 = rng.integers(0, 255, size=(28, 28, 3)).astype(np.uint8)
        img2 = rng.integers(0, 255, size=(28, 28, 3)).astype(np.uint8)

        ids2 = rng.integers(3, 200, size=(12,)).astype(np.int32)
        ids2[[1, 6]] = IMAGE_TOKEN_INDEX
        ids1 = rng.integers(3, 200, size=(9,)).astype(np.int32)
        ids1[2] = IMAGE_TOKEN_INDEX
        ids0 = rng.integers(3, 200, size=(7,)).astype(np.int32)

        reqs = [
            Request(uid=0, input_ids=ids2, image=np.stack([img1, img2]),
                    max_new_tokens=5),
            Request(uid=1, input_ids=ids1, image=img1, max_new_tokens=5),
            Request(uid=2, input_ids=ids0, max_new_tokens=5),
        ]
        sched.run(reqs)

        gcfg = GenerationConfig(max_new_tokens=5,
                                eos_token_id=cfg.llama.eos_token_id)
        e2 = engine.generate(ids2[None], np.asarray([12]),
                             images=np.stack([img1, img2])[None],
                             gen_cfg=gcfg)[0]
        e1 = engine.generate(ids1[None], np.asarray([9]),
                             images=img1[None], gen_cfg=gcfg)[0]
        e0 = engine.generate(ids0[None], np.asarray([7]), gen_cfg=gcfg)[0]
        assert reqs[0].output_ids == e2, (reqs[0].output_ids, e2)
        assert reqs[1].output_ids == e1
        assert reqs[2].output_ids == e0

    def test_surplus_markers_degrade_to_token0(self, setup):
        """A request with more -200 markers than images must not expand
        the surplus against zero-image slots (composition-independent)."""
        cfg, params, engine, _ = setup
        sched = ContinuousBatchingScheduler(
            cfg, params, engine.llama_params, max_batch=2, max_seq_len=96,
            compute_dtype=jnp.float32, cache_dtype=jnp.float32,
            eos_token_id=cfg.llama.eos_token_id, prompt_bucket=16)
        rng = np.random.default_rng(33)
        img = rng.integers(0, 255, size=(28, 28, 3)).astype(np.uint8)
        ids = rng.integers(3, 200, size=(10,)).astype(np.int32)
        ids[[1, 5]] = IMAGE_TOKEN_INDEX  # 2 markers, 1 image
        two_img_ids = rng.integers(3, 200, size=(8,)).astype(np.int32)
        two_img_ids[[0, 4]] = IMAGE_TOKEN_INDEX
        reqs = [
            Request(uid=0, input_ids=ids, image=img, max_new_tokens=4),
            Request(uid=1, input_ids=two_img_ids,
                    image=np.stack([img, img]), max_new_tokens=4),
        ]
        sched.run(reqs)
        # oracle: surplus marker replaced by token 0, single image
        fixed = ids.copy()
        fixed[5] = 0
        gcfg = GenerationConfig(max_new_tokens=4,
                                eos_token_id=cfg.llama.eos_token_id)
        e = engine.generate(fixed[None], np.asarray([10]),
                            images=img[None], gen_cfg=gcfg)[0]
        assert reqs[0].output_ids == e, (reqs[0].output_ids, e)


class TestMeshScheduler:
    def test_tp_sharded_scheduler_matches(self, setup):
        """Multi-chip serving: the scheduler over a dp=1 x tp=4 mesh
        (TP-sharded decoder + head-sharded KV cache) must emit exactly
        the single-device scheduler's tokens."""
        from lhrs_bot_tpu.parallel.mesh import make_mesh

        cfg, params, engine, _ = setup
        rng = np.random.default_rng(51)
        prompts = [rng.integers(3, 200, size=(n,)).astype(np.int32)
                   for n in (21, 6, 13)]

        def run(mesh):
            sched = ContinuousBatchingScheduler(
                cfg, params, engine.llama_params, max_batch=2,
                max_seq_len=96, compute_dtype=jnp.float32,
                cache_dtype=jnp.float32, prompt_bucket=16,
                tokens_per_tick=2, mesh=mesh,
                eos_token_id=cfg.llama.eos_token_id)
            reqs = [Request(uid=i, input_ids=p, max_new_tokens=5)
                    for i, p in enumerate(prompts)]
            sched.run(reqs)
            return [r.output_ids for r in reqs]

        ref = run(None)
        tp = run(make_mesh(dp=1, tp=4))
        assert tp == ref, (tp, ref)

    def test_tp_sharded_paged_scheduler_matches(self, setup):
        from lhrs_bot_tpu.parallel.mesh import make_mesh
        from lhrs_bot_tpu.serve.paged import PagedScheduler

        cfg, params, engine, _ = setup
        rng = np.random.default_rng(53)
        prompts = [rng.integers(3, 200, size=(n,)).astype(np.int32)
                   for n in (17, 9)]

        def run(mesh):
            sched = PagedScheduler(
                cfg, params, engine.llama_params, max_batch=2,
                num_pages=20, page_size=16, pages_per_seq=6,
                compute_dtype=jnp.float32, cache_dtype=jnp.float32,
                prompt_bucket=16, tokens_per_tick=2, mesh=mesh,
                eos_token_id=cfg.llama.eos_token_id)
            reqs = [Request(uid=i, input_ids=p, max_new_tokens=5)
                    for i, p in enumerate(prompts)]
            sched.run(reqs)
            return [r.output_ids for r in reqs]

        ref = run(None)
        tp = run(make_mesh(dp=1, tp=4))
        assert tp == ref, (tp, ref)


class TestMultiTokenTick:
    def test_chunk_matches_single_step(self, setup):
        """tokens_per_tick=8 must be token-for-token identical to
        tokens_per_tick=1 (in-scan EOS/budget freezing is exact)."""
        cfg, params, engine, _ = setup
        rng = np.random.default_rng(5)
        prompts = [rng.integers(3, 200, size=(n,)).astype(np.int32)
                   for n in (5, 9, 7, 11)]

        def run(k):
            sched = ContinuousBatchingScheduler(
                cfg, params, engine.llama_params, max_batch=3,
                max_seq_len=96, compute_dtype=jnp.float32,
                cache_dtype=jnp.float32, tokens_per_tick=k,
                eos_token_id=cfg.llama.eos_token_id, prompt_bucket=16)
            reqs = [Request(uid=i, input_ids=p, max_new_tokens=3 + 2 * i)
                    for i, p in enumerate(prompts)]
            sched.run(reqs)
            return [list(r.output_ids) for r in reqs]

        assert run(1) == run(8)

    def test_adaptive_tick_policy(self, setup):
        """_tick_k: full k while budgets allow; pow2-round-down to the max
        remaining budget at the tail; to the MIN budget when requests are
        waiting (a freed slot is only admittable between ticks)."""
        cfg, params, engine, _ = setup
        s = ContinuousBatchingScheduler(
            cfg, params, engine.llama_params, max_batch=3, max_seq_len=96,
            compute_dtype=jnp.float32, cache_dtype=jnp.float32,
            tokens_per_tick=16, eos_token_id=cfg.llama.eos_token_id,
            prompt_bucket=16, adaptive_tick=True)
        s.active[:] = [True, True, False]
        s.slot_budget[:] = [3, 40, 0]
        assert s._tick_k(False) == 16   # max budget 40 >= k
        assert s._tick_k(True) == 4     # min budget 3 -> pow2 UP (cheap
        #                                 overshoot beats a second dispatch)
        s.slot_budget[:] = [9, 9, 0]
        assert s._tick_k(False) == 8    # overshoot 7 > 4: round down; the
        #                                 remainder re-decides next tick
        s.slot_budget[:] = [1, 16, 0]
        assert s._tick_k(True) == 1
        assert s._tick_k(False) == 16
        s.adaptive_tick = False
        s.slot_budget[:] = [1, 16, 0]
        assert s._tick_k(True) == 16    # knob off: always the full k

    def test_adaptive_tick_matches_and_shrinks(self, setup):
        """With more requests than slots, ticks shrink while the queue
        waits (observable via last_tick_k) and greedy outputs stay
        token-for-token identical to k=1."""
        cfg, params, engine, _ = setup
        rng = np.random.default_rng(11)
        prompts = [rng.integers(3, 200, size=(n,)).astype(np.int32)
                   for n in (5, 9, 7, 11, 6)]

        def run(k, record=None):
            sched = ContinuousBatchingScheduler(
                cfg, params, engine.llama_params, max_batch=3,
                max_seq_len=96, compute_dtype=jnp.float32,
                cache_dtype=jnp.float32, tokens_per_tick=k,
                eos_token_id=cfg.llama.eos_token_id, prompt_bucket=16,
                adaptive_tick=True)
            if record is not None:
                orig = sched.step

                def rec_step(waiting=0):
                    n = orig(waiting=waiting)
                    record.append(sched.last_tick_k)
                    return n

                sched.step = rec_step
            reqs = [Request(uid=i, input_ids=p, max_new_tokens=3 + 2 * i)
                    for i, p in enumerate(prompts)]
            sched.run(reqs)
            return [list(r.output_ids) for r in reqs]

        ks = []
        assert run(8, record=ks) == run(1)
        # budgets 3/5/7 admitted first with 2 queued -> first tick must
        # shrink to pow2(min budget 3) = 2, not the full 8
        assert ks[0] == 2
        assert any(k < 8 for k in ks)

    def test_budget_respected_mid_chunk(self, setup):
        """A 1-token budget inside an 8-token chunk must emit exactly one
        token (the scan freezes the slot after the budget hits zero)."""
        cfg, params, engine, _ = setup
        sched = ContinuousBatchingScheduler(
            cfg, params, engine.llama_params, max_batch=2, max_seq_len=96,
            compute_dtype=jnp.float32, cache_dtype=jnp.float32,
            tokens_per_tick=8, eos_token_id=cfg.llama.eos_token_id,
            prompt_bucket=16)
        req = Request(uid=1, input_ids=np.full((5,), 7, np.int32),
                      max_new_tokens=1)
        sched.run([req])
        assert req.done
        assert len(req.output_ids) <= 1


class TestSpeculativeScheduler:
    """On-device prompt-lookup speculation (serve/speculative.py): the
    spec tick must be token-for-token identical to the plain tick for
    greedy decoding, on proposals that hit AND on ones that never do."""

    def _run(self, setup, prompts, spec, budgets=None, k=4):
        cfg, params, engine, _ = setup
        sched = ContinuousBatchingScheduler(
            cfg, params, engine.llama_params, max_batch=3,
            max_seq_len=96, compute_dtype=jnp.float32,
            cache_dtype=jnp.float32, tokens_per_tick=k,
            eos_token_id=cfg.llama.eos_token_id, prompt_bucket=16,
            speculative=spec)
        reqs = [Request(uid=i, input_ids=p,
                        max_new_tokens=(budgets[i] if budgets else 8))
                for i, p in enumerate(prompts)]
        sched.run(reqs)
        assert all(r.done for r in reqs)
        return [list(r.output_ids) for r in reqs]

    def test_matches_plain_tick_random_prompts(self, setup):
        rng = np.random.default_rng(11)
        prompts = [rng.integers(3, 200, size=(n,)).astype(np.int32)
                   for n in (5, 9, 7, 6)]
        assert (self._run(setup, prompts, spec=4)
                == self._run(setup, prompts, spec=0))

    def test_matches_plain_tick_repetitive_prompts(self, setup):
        # repeated n-grams → proposals fire and (mostly) miss on a random
        # model; acceptance bookkeeping must stay exact either way
        base = np.asarray([7, 8, 9, 10], np.int32)
        prompts = [np.tile(base, 6), np.tile(base[:3], 8),
                   np.concatenate([base, base, [11, 12], base])]
        prompts = [p.astype(np.int32) for p in prompts]
        assert (self._run(setup, prompts, spec=4)
                == self._run(setup, prompts, spec=0))

    def test_budgets_respected(self, setup):
        rng = np.random.default_rng(3)
        prompts = [np.tile(np.asarray([5, 6], np.int32), 10),
                   rng.integers(3, 200, size=(7,)).astype(np.int32)]
        outs = self._run(setup, prompts, spec=3, budgets=[2, 5])
        plain = self._run(setup, prompts, spec=0, budgets=[2, 5])
        assert outs == plain
        assert len(outs[0]) <= 2 and len(outs[1]) <= 5

    def test_mixed_sampling_batch_keeps_greedy_rows_exact(self, setup):
        """A sampling slot no longer forces plain ticks: the spec tick
        runs the exact rejection rule for it, and the GREEDY slot sharing
        the batch must still emit token-for-token what a speculative
        all-greedy run emits (argmax acceptance is per-row)."""
        cfg, params, engine, _ = setup

        def run(with_sampler):
            sched = ContinuousBatchingScheduler(
                cfg, params, engine.llama_params, max_batch=2,
                max_seq_len=96, compute_dtype=jnp.float32,
                cache_dtype=jnp.float32, tokens_per_tick=4,
                eos_token_id=cfg.llama.eos_token_id, prompt_bucket=16,
                speculative=4)
            rng = np.random.default_rng(1)
            reqs = [Request(uid=1, input_ids=rng.integers(
                        3, 200, size=(8,)).astype(np.int32),
                        max_new_tokens=6)]
            if with_sampler:
                # reuse the same rng draws for the greedy prompt
                sampler = Request(uid=0, input_ids=rng.integers(
                    3, 200, size=(6,)).astype(np.int32),
                    max_new_tokens=6, temperature=0.9, top_p=0.9)
                reqs = [sampler] + reqs
            sched.run(reqs)
            assert all(r.done and len(r.output_ids) >= 1 for r in reqs)
            return list(reqs[-1].output_ids)

        greedy_alone = run(with_sampler=False)
        greedy_mixed = run(with_sampler=True)
        assert greedy_alone == greedy_mixed

    def test_accept_window_sampled_greedy_reduction(self):
        """temps<=0 rows of accept_window_sampled must equal
        accept_window's argmax rule exactly."""
        from lhrs_bot_tpu.serve.speculative import (accept_window,
                                                    accept_window_sampled)

        rng = np.random.default_rng(5)
        B, W, V = 4, 3, 11
        logits = jnp.asarray(rng.normal(size=(B, W + 1, V)), jnp.float32)
        prop = jnp.asarray(rng.integers(0, V, size=(B, W)), jnp.int32)
        # make some proposals agree with argmax so acceptance is nonzero
        preds = jnp.argmax(logits, -1).astype(jnp.int32)
        prop = prop.at[0].set(preds[0, :W]).at[2, 0].set(preds[2, 0])
        n_prop = jnp.asarray([3, 0, 2, 1], jnp.int32)
        p_ref, c_ref = accept_window(prop, n_prop, preds)
        p_s, c_s = accept_window_sampled(
            prop, n_prop, logits, jax.random.PRNGKey(0),
            jnp.zeros((B,), jnp.float32), jnp.ones((B,), jnp.float32))
        assert (np.asarray(p_s) == np.asarray(p_ref)).all()
        assert (np.asarray(c_s) == np.asarray(c_ref)).all()

    def test_accept_window_sampled_marginal_exactness(self):
        """Distributional exactness of deterministic-draft speculative
        sampling: over many RNG draws, the FIRST emitted token (accepted
        proposal or correction) must be distributed exactly like a plain
        sample from the warped verify distribution at position 0."""
        from lhrs_bot_tpu.serve.speculative import (_warp_logits,
                                                    accept_window_sampled)

        V, W, N = 6, 2, 4000
        rng = np.random.default_rng(7)
        logits_row = rng.normal(size=(W + 1, V)).astype(np.float32)
        temps = jnp.asarray([0.7], jnp.float32)
        top_ps = jnp.asarray([1.0], jnp.float32)
        logits = jnp.asarray(logits_row)[None]
        prop = jnp.asarray([[2, 3]], jnp.int32)
        n_prop = jnp.asarray([W], jnp.int32)

        @jax.jit
        def draw(key):
            p, corr = accept_window_sampled(prop, n_prop, logits, key,
                                            temps, top_ps)
            first = jnp.where(p[0] > 0, prop[0, 0], corr[0])
            return first

        keys = jax.random.split(jax.random.PRNGKey(42), N)
        firsts = np.asarray(jax.vmap(draw)(keys))
        counts = np.bincount(firsts, minlength=V) / N
        target = np.asarray(jax.nn.softmax(
            _warp_logits(logits, temps, top_ps)[0, 0]))
        # multinomial noise at N=4000: 4 sigma ≈ 4*sqrt(p(1-p)/N) < 0.032
        assert np.abs(counts - target).max() < 0.035, (counts, target)

    def test_paged_scheduler_rejects_speculative(self, setup):
        cfg, params, engine, _ = setup
        from lhrs_bot_tpu.serve.paged import PagedScheduler
        import pytest as _pytest
        with _pytest.raises(ValueError, match="paged"):
            PagedScheduler(cfg, params, engine.llama_params,
                           num_pages=16, page_size=16, max_seq_len=96,
                           compute_dtype=jnp.float32,
                           cache_dtype=jnp.float32, speculative=2)


class TestProposeFromHistory:
    def test_matches_host_reference(self):
        from lhrs_bot_tpu.serve.speculative import propose_from_history

        def host_ref(hist, n, ngram, width, min_token=3):
            """Mirror of the device policy: most recent occurrence of the
            final ngram (ending strictly before the end), continuation
            truncated at the first special token."""
            h = hist[:n]
            if n < ngram + 1:
                return [], 0
            pat = h[-ngram:]
            best = -1
            for i in range(n - ngram):
                if (h[i:i + ngram] == pat).all():
                    best = i
            if best < 0:
                return [], 0
            follow = h[best + ngram:best + ngram + width]
            out = []
            for t in follow:
                if t < min_token:
                    break
                out.append(int(t))
            return out, len(out)

        rng = np.random.default_rng(0)
        B, S, W, NG = 8, 40, 5, 2
        hist = rng.integers(0, 9, size=(B, S)).astype(np.int32)
        hlen = rng.integers(0, S + 1, size=(B,)).astype(np.int32)
        hist[3, :] = 7  # fully repetitive row
        hlen[3] = 20
        hlen[4] = 0
        prop, n = propose_from_history(
            jnp.asarray(hist), jnp.asarray(hlen), ngram=NG, width=W)
        prop, n = np.asarray(prop), np.asarray(n)
        for b in range(B):
            exp, en = host_ref(hist[b], int(hlen[b]), NG, W)
            assert int(n[b]) == en, (b, n[b], en)
            assert list(prop[b][:en]) == exp, (b, prop[b], exp)
