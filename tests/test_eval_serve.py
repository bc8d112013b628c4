"""Eval metrics + generation engine tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lhrs_bot_tpu.eval.metrics import (
    EvalAIAnswerProcessor,
    TextVQAAccuracyEvaluator,
    balanced_accuracy,
    bench_accuracy,
    calculate_iou,
    classname_to_idx,
    grounding_accuracy,
    longest_common_substring_index,
    normalize_answer,
    parse_bbox,
)
from lhrs_bot_tpu.models import (
    IMAGE_TOKEN_INDEX,
    VLMConfig,
    init_vlm_params,
    llama_apply,
)
from lhrs_bot_tpu.serve.engine import GenerationConfig, GenerationEngine
from lhrs_bot_tpu.utils.eval_utils import make_token_stopper


class TestClsMetrics:
    def test_fuzzy_match(self):
        classes = {"dense residential": 0, "river": 1, "forest": 2}
        preds = ["river", "a forest area", "dense residential zone"]
        assert classname_to_idx(preds, classes) == [1, 2, 0]

    def test_balanced_accuracy(self):
        y_true = [0, 0, 1, 1, 1, 1]
        y_pred = [0, 1, 1, 1, 1, 1]
        # class0 recall .5, class1 recall 1.0 → balanced .75
        assert balanced_accuracy(y_true, y_pred) == pytest.approx(0.75)


class TestVQAMetrics:
    def test_processor_normalizes(self):
        p = EvalAIAnswerProcessor()
        assert p("Yes!") == "yes"
        assert p("Three") == "3"
        assert p("The river") == "river"

    def test_soft_accuracy(self):
        ev = TextVQAAccuracyEvaluator()
        preds = [
            {"pred": "yes", "target": "yes", "types": "presence"},
            {"pred": "no", "target": "yes", "types": "presence"},
            {"pred": "two", "target": "2", "types": "comp"},
        ]
        acc, per_type = ev.eval_pred_list(preds)
        assert acc == pytest.approx(2 / 3)
        assert per_type["presence"] == pytest.approx(0.5)
        assert per_type["comp"] == pytest.approx(1.0)


class TestVGMetrics:
    def test_parse_bbox(self):
        assert parse_bbox("here [10, 20, 30, 40] done") == [10, 20, 30, 40]
        assert parse_bbox("[1,2,3,4,5,6]") == [1, 2, 3, 4]
        assert parse_bbox("[1, 2]") is None
        assert parse_bbox("no box") is None

    def test_iou_and_accuracy(self):
        assert calculate_iou([0, 0, 10, 10], [0, 0, 10, 10]) == 1.0
        assert calculate_iou([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0
        res = grounding_accuracy(
            ["[0,0,10,10]", "[100,100,110,110]", "garbage"],
            [[0, 0, 10, 10], [0, 0, 10, 10], [0, 0, 10, 10]])
        assert res["accuracy_parsed"] == pytest.approx(0.5)
        assert res["accuracy_all"] == pytest.approx(1 / 3)
        assert res["parse_failures"] == 1


class TestBenchMetrics:
    def test_normalize(self):
        assert normalize_answer("The Answer.") == "answer"
        assert normalize_answer("A") == ""

    def test_per_type(self):
        total, per = bench_accuracy([
            {"pred": "B.", "answer": "B", "qtype": "color"},
            {"pred": "C", "answer": "B", "qtype": ["color", "shape"]},
        ])
        assert total == pytest.approx(0.5)
        assert per["color"] == pytest.approx(0.5)
        assert per["shape"] == pytest.approx(0.0)


class TestEngine:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        engine = GenerationEngine(cfg, params, max_seq_len=96,
                                  compute_dtype=jnp.float32,
                                  cache_dtype=jnp.float32)
        return cfg, params, engine

    def test_greedy_matches_cacheless_forward(self, setup):
        cfg, params, engine = setup
        rng = np.random.default_rng(0)
        ids = rng.integers(3, 200, size=(2, 8)).astype(np.int32)
        seq_lens = np.asarray([8, 6], np.int32)
        ids[1, 6:] = 0
        gen = engine.generate(ids, seq_lens,
                              gen_cfg=GenerationConfig(max_new_tokens=4))
        # oracle: roll the cacheless forward manually, greedy
        for row in range(2):
            cur = list(ids[row, :seq_lens[row]])
            expect = []
            for _ in range(4):
                logits = llama_apply(
                    engine.llama_params, cfg.llama,
                    input_ids=jnp.asarray([cur]), compute_dtype=jnp.float32)
                nxt = int(jnp.argmax(logits[0, -1]))
                if nxt == cfg.llama.eos_token_id:
                    break
                expect.append(nxt)
                cur.append(nxt)
            assert gen[row] == expect

    def test_multimodal_generate_runs(self, setup):
        cfg, params, engine = setup
        ids = np.full((1, 6), 7, np.int32)
        ids[0, 1] = IMAGE_TOKEN_INDEX
        out = engine.generate(
            ids, np.asarray([6], np.int32),
            images=np.zeros((1, 28, 28, 3), np.uint8),
            gen_cfg=GenerationConfig(max_new_tokens=3))
        assert len(out) == 1 and len(out[0]) <= 3

    def test_stream_matches_generate(self, setup):
        cfg, params, engine = setup
        ids = np.full((1, 5), 11, np.int32)
        gcfg = GenerationConfig(max_new_tokens=4)
        batch_out = engine.generate(ids, np.asarray([5], np.int32),
                                    gen_cfg=gcfg)
        stream_out = list(engine.stream(ids, 5, gen_cfg=gcfg))
        assert stream_out == batch_out[0]

    def test_multi_image_generate_matches_cacheless(self, setup):
        """Two images in one prompt (B, K, H, W, 3): greedy generation
        must match rolling the cacheless forward over the multi-spliced
        embeds (splice slot k <- marker k, in order)."""
        from lhrs_bot_tpu.models.vlm import prepare_multimodal_inputs

        cfg, params, engine = setup
        rng = np.random.default_rng(23)
        ids = rng.integers(3, 200, size=(1, 14)).astype(np.int32)
        ids[0, [2, 8]] = IMAGE_TOKEN_INDEX
        imgs = rng.integers(0, 255, size=(1, 2, 28, 28, 3)).astype(np.uint8)
        gcfg = GenerationConfig(max_new_tokens=4,
                                eos_token_id=cfg.llama.eos_token_id)
        out = engine.generate(ids, np.asarray([14], np.int32),
                              images=imgs, gen_cfg=gcfg)[0]

        spliced = prepare_multimodal_inputs(
            engine.params, cfg, jnp.asarray(ids), jnp.asarray(imgs),
            compute_dtype=jnp.float32, llama_params=engine.llama_params)
        emb = spliced.inputs_embeds[:, :int(spliced.seq_len[0])]
        expect = []
        for _ in range(4):
            logits = llama_apply(engine.llama_params, cfg.llama,
                                 inputs_embeds=emb,
                                 compute_dtype=jnp.float32)
            nxt = int(jnp.argmax(logits[0, -1]))
            if nxt == cfg.llama.eos_token_id:
                break
            expect.append(nxt)
            emb = jnp.concatenate(
                [emb, jnp.take(engine.llama_params["embed_tokens"],
                               jnp.asarray([[nxt]]), axis=0)], axis=1)
        assert out == expect, (out, expect)

    @pytest.mark.parametrize("repetitive", [True, False])
    def test_speculative_matches_greedy(self, setup, repetitive):
        """Prompt-lookup speculative decoding must be token-identical to
        plain greedy — on a repetitive prompt (n-gram hits, windows
        accepted) and a random one (mostly rejected/fallback)."""
        cfg, params, engine = setup
        rng = np.random.default_rng(71)
        if repetitive:
            phrase = rng.integers(3, 200, size=(6,)).astype(np.int32)
            ids = np.concatenate([phrase] * 5)[None]
        else:
            ids = rng.integers(3, 200, size=(1, 30)).astype(np.int32)
        t = ids.shape[1]
        gcfg = GenerationConfig(max_new_tokens=12,
                                eos_token_id=cfg.llama.eos_token_id)
        plain = list(engine.stream(ids, t, gen_cfg=gcfg))
        spec = list(engine.stream(ids, t, gen_cfg=gcfg, speculative=4))
        assert spec == plain, (spec, plain)

    def test_speculative_respects_budget_and_stop(self, setup):
        cfg, params, engine = setup
        rng = np.random.default_rng(73)
        phrase = rng.integers(3, 200, size=(5,)).astype(np.int32)
        ids = np.concatenate([phrase] * 6)[None]
        t = ids.shape[1]
        gcfg = GenerationConfig(max_new_tokens=5,
                                eos_token_id=cfg.llama.eos_token_id)
        out = list(engine.stream(ids, t, gen_cfg=gcfg, speculative=8))
        ref = list(engine.stream(ids, t, gen_cfg=gcfg))
        assert out == ref and len(out) <= 5

        stopped = list(engine.stream(
            ids, t, gen_cfg=GenerationConfig(
                max_new_tokens=12, eos_token_id=cfg.llama.eos_token_id),
            speculative=4, stop_fn=lambda e: len(e) >= 3))
        assert len(stopped) == 3 and stopped == ref[:3]

    def test_chunked_prefill_matches_monolithic(self, setup):
        """prefill_chunk=16: the decoder runs over fixed 16-wide embed
        slices via the continuation program — outputs must equal the
        monolithic prefill for ragged lengths, text and image prompts."""
        cfg, params, engine = setup
        chunked = GenerationEngine(cfg, params, max_seq_len=96,
                                   compute_dtype=jnp.float32,
                                   cache_dtype=jnp.float32,
                                   prompt_bucket=16, prefill_chunk=16)
        rng = np.random.default_rng(15)
        ids = rng.integers(3, 200, size=(3, 41)).astype(np.int32)
        lens = np.asarray([41, 17, 5], np.int32)
        gcfg = GenerationConfig(max_new_tokens=4,
                                eos_token_id=cfg.llama.eos_token_id)
        a = engine.generate(ids, lens, gen_cfg=gcfg)
        b = chunked.generate(ids, lens, gen_cfg=gcfg)
        assert a == b, (a, b)

        img_ids = np.full((1, 20), 7, np.int32)
        img_ids[0, 1] = IMAGE_TOKEN_INDEX
        img = np.zeros((1, 28, 28, 3), np.uint8)
        a = engine.generate(img_ids, np.asarray([20], np.int32),
                            images=img, gen_cfg=gcfg)
        b = chunked.generate(img_ids, np.asarray([20], np.int32),
                             images=img, gen_cfg=gcfg)
        assert a == b, (a, b)

    def test_session_continuation_matches_fresh(self, setup):
        """Multi-turn chat with session=True: turn 2 re-submits the whole
        rendered history; the continuation (suffix-only prefill against
        the turn-1 cache) must emit exactly the sessionless tokens."""
        cfg, params, engine = setup
        rng = np.random.default_rng(11)
        turn1 = rng.integers(3, 200, size=(24,)).astype(np.int32)
        gcfg = GenerationConfig(max_new_tokens=5)

        engine.reset_session()
        t1 = list(engine.stream(turn1[None], 24, gen_cfg=gcfg,
                                session=True))
        st = engine._session
        assert st is not None
        # cache holds prompt + all-but-last emitted token
        assert len(st["raw_ids"]) == 24 + max(len(t1) - 1, 0)

        # turn 2 = turn 1 + its answer + a new question (render parity)
        turn2 = np.concatenate(
            [turn1, np.asarray(t1, np.int32),
             rng.integers(3, 200, size=(7,)).astype(np.int32)])
        t2_session = list(engine.stream(turn2[None], len(turn2),
                                        gen_cfg=gcfg, session=True))
        assert engine._session is not None
        assert len(engine._session["raw_ids"]) >= len(turn2)

        engine.reset_session()
        t2_fresh = list(engine.stream(turn2[None], len(turn2),
                                      gen_cfg=gcfg))
        assert t2_session == t2_fresh, (t2_session, t2_fresh)
        engine.reset_session()

    def test_session_multimodal_and_image_change_resets(self, setup):
        """Image turns continue only while the image is unchanged: same
        image -> continuation matches fresh; a different image must fall
        back to a full prefill (no stale KV reuse)."""
        cfg, params, engine = setup
        img1 = np.zeros((1, 28, 28, 3), np.uint8)
        img2 = np.full((1, 28, 28, 3), 255, np.uint8)
        base = np.full((20,), 7, np.int32)
        base[1] = IMAGE_TOKEN_INDEX
        gcfg = GenerationConfig(max_new_tokens=4)

        engine.reset_session()
        t1 = list(engine.stream(base[None], 20, images=img1,
                                gen_cfg=gcfg, session=True))
        follow = np.concatenate(
            [base, np.asarray(t1, np.int32),
             np.arange(30, 42, dtype=np.int32)])
        t2 = list(engine.stream(follow[None], len(follow), images=img1,
                                gen_cfg=gcfg, session=True))
        engine.reset_session()
        t2_fresh = list(engine.stream(follow[None], len(follow),
                                      images=img1, gen_cfg=gcfg))
        assert t2 == t2_fresh

        # same token history, DIFFERENT image: session must not be reused
        engine.reset_session()
        list(engine.stream(base[None], 20, images=img1, gen_cfg=gcfg,
                           session=True))
        t3 = list(engine.stream(follow[None], len(follow), images=img2,
                                gen_cfg=gcfg, session=True))
        engine.reset_session()
        t3_fresh = list(engine.stream(follow[None], len(follow),
                                      images=img2, gen_cfg=gcfg))
        assert t3 == t3_fresh

    def test_session_divergent_history_partial_match(self, setup):
        """An edited history (common prefix, divergent tail) still
        continues from the shared prefix and matches a fresh run."""
        cfg, params, engine = setup
        rng = np.random.default_rng(13)
        a = rng.integers(3, 200, size=(40,)).astype(np.int32)
        gcfg = GenerationConfig(max_new_tokens=4)
        engine.reset_session()
        list(engine.stream(a[None], 40, gen_cfg=gcfg, session=True))
        b = a.copy()
        b[30:] = rng.integers(3, 200, size=(10,))  # diverge mid-history
        b = np.concatenate([b, rng.integers(3, 200, size=(6,))
                            .astype(np.int32)])
        t_sess = list(engine.stream(b[None], len(b), gen_cfg=gcfg,
                                    session=True))
        engine.reset_session()
        t_fresh = list(engine.stream(b[None], len(b), gen_cfg=gcfg))
        assert t_sess == t_fresh
        engine.reset_session()

    def test_session_cache_presized_no_mid_chat_resize(self, setup):
        """session=True allocates the full-context cache on turn 1: a later
        turn must never grow it (a resize pays a whole-cache copy + a new
        continuation-program compile mid-chat — measured 2.7 s vs 0.05 s
        turn TTFT at 7B, benchmarks/session_ttft.py) and outputs must still
        match a fresh run."""
        cfg, params, engine = setup
        rng = np.random.default_rng(17)
        turn1 = rng.integers(3, 200, size=(10,)).astype(np.int32)
        gcfg = GenerationConfig(max_new_tokens=4)
        engine.reset_session()
        t1 = list(engine.stream(turn1[None], len(turn1), gen_cfg=gcfg,
                                session=True))
        assert engine._session["cache"].k.shape[3] == engine.max_seq_len
        # grow the history past what the old bucketed sizing allocated
        # (ceil((16+4)/256·bucket) — any later turn used to resize)
        convo = np.concatenate([turn1, np.asarray(t1, np.int32),
                                rng.integers(3, 200, size=(30,))
                                .astype(np.int32)])
        t2 = list(engine.stream(convo[None], len(convo), gen_cfg=gcfg,
                                session=True))
        assert engine._session["cache"].k.shape[3] == engine.max_seq_len
        engine.reset_session()
        t2_fresh = list(engine.stream(convo[None], len(convo),
                                      gen_cfg=gcfg))
        assert t2 == t2_fresh, (t2, t2_fresh)
        engine.reset_session()

    def test_generate_clamps_to_cache_room(self, setup):
        """A prompt + max_new_tokens that overflows the cache must be
        clamped (engine parity with scheduler.admit): without the clamp the
        select-based KV write silently drops and the fused append window
        lands out of range, corrupting the tail tokens."""
        cfg, params, engine = setup
        rng = np.random.default_rng(1)
        t = 80  # max_seq_len=96 → room for 96-80+1 = 17 new tokens
        ids = rng.integers(3, 200, size=(1, t)).astype(np.int32)
        gen = engine.generate(
            ids, np.asarray([t], np.int32),
            gen_cfg=GenerationConfig(max_new_tokens=64))
        room = engine.max_seq_len - t + 1
        assert 0 < len(gen[0]) <= room
        # every emitted token must match the cacheless greedy oracle —
        # an out-of-range KV write would corrupt the tail
        cur = list(ids[0])
        for tok in gen[0]:
            logits = llama_apply(
                engine.llama_params, cfg.llama,
                input_ids=jnp.asarray([cur]), compute_dtype=jnp.float32)
            assert tok == int(jnp.argmax(logits[0, -1]))
            cur.append(tok)
        # stream path takes the same clamp
        streamed = list(engine.stream(
            ids, t, gen_cfg=GenerationConfig(max_new_tokens=64)))
        assert streamed == gen[0]

    def test_build_engine_honors_serving_knobs(self):
        """`bits: 8` / `kv_bits: 8` in a serving config must reach the
        engine (reference bits recipe, text_modal.py:91-109): at stage 0
        `build_model_and_tokenizer` leaves params unquantized, so without
        build_engine plumbing the YAML knob was a silent no-op."""
        from lhrs_bot_tpu.core.bootstrap import build_engine
        from lhrs_bot_tpu.core.config import ConfigDict
        from lhrs_bot_tpu.ops.quant import QuantizedTensor

        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        config = ConfigDict({
            "bits": 8, "kv_bits": 8,
            "text": {"max_position_embeddings": 64},
        })
        engine = build_engine(cfg, params, config)
        assert any(isinstance(w, QuantizedTensor)
                   for w in engine.llama_params["layers"].values())
        assert engine.cache_dtype == jnp.int8
        # bf16 default path: no quantization, bf16 cache
        engine16 = build_engine(cfg, params, ConfigDict({
            "bits": 16, "text": {"max_position_embeddings": 64}}))
        assert not any(isinstance(w, QuantizedTensor)
                       for w in engine16.llama_params["layers"].values())
        assert engine16.cache_dtype == jnp.bfloat16

    def test_sampling_respects_temperature_zeroish(self, setup):
        cfg, params, engine = setup
        ids = np.full((1, 5), 11, np.int32)
        gcfg = GenerationConfig(max_new_tokens=3, do_sample=True,
                                temperature=1e-4, top_p=1.0)
        sampled = engine.generate(ids, np.asarray([5], np.int32), gen_cfg=gcfg)
        greedy = engine.generate(ids, np.asarray([5], np.int32),
                                 gen_cfg=GenerationConfig(max_new_tokens=3))
        assert sampled == greedy

    def test_bucketing_bounds_compiled_programs(self, setup):
        """The main_* eval prompt-length distribution must map onto a
        handful of (width, cache_len) programs — every distinct pair is a
        fresh 7B XLA compile through a remote runtime (VERDICT r1 weak 5)."""
        cfg, params, engine = setup
        import numpy as np

        rng = np.random.default_rng(0)
        # RSVQA/VG/bench-style prompts: 30-180 tokens, 50-100 new tokens
        lens = rng.integers(30, 180, size=200)
        news = rng.choice([20, 50, 100], size=200)
        pairs = {engine._bucketed(int(t), 12, int(m))
                 for t, m in zip(lens, news)}
        assert len(pairs) <= 6, pairs
        # every bucket fits the cache
        for width, cache_len in pairs:
            assert cache_len <= engine.max_seq_len
            assert width + 12 <= cache_len

    def test_token_stopper(self):
        stop = make_token_stopper([42])
        assert not stop([1, 2])
        assert stop([1, 42])


class TestQuantizedEngine:
    def test_host_quantize_path_matches_device(self):
        """The numpy merge+quantize fast path (7B load: device only sees
        int8) must produce the same engine outputs as the device path."""
        import numpy as np

        cfg = VLMConfig.tiny_test(stage=0, lora=True)
        params = init_vlm_params(jax.random.PRNGKey(3), cfg)
        host = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
        dev = jax.tree_util.tree_map(jnp.asarray, params)
        e_host = GenerationEngine(cfg, host, max_seq_len=64,
                                  quantize_bits=8,
                                  compute_dtype=jnp.float32,
                                  cache_dtype=jnp.float32)
        e_dev = GenerationEngine(cfg, dev, max_seq_len=64, quantize_bits=8,
                                 compute_dtype=jnp.float32,
                                 cache_dtype=jnp.float32)
        from lhrs_bot_tpu.ops.quant import QuantizedTensor

        assert isinstance(e_host.llama_params["layers"]["wq"],
                          QuantizedTensor)
        ids = np.full((1, 6), 9, np.int32)
        gen = GenerationConfig(max_new_tokens=5,
                               eos_token_id=cfg.llama.eos_token_id)
        a = e_host.generate(ids, np.asarray([6], np.int32), gen_cfg=gen)
        b = e_dev.generate(ids, np.asarray([6], np.int32), gen_cfg=gen)
        assert a == b, (a, b)

    def test_session_continuation_int8_cache(self):
        """Session continuation through the int8 KV cache (the 7B serving
        configuration): the quantized scale planes must ride the cache
        copy/continuation exactly like K/V."""
        import numpy as np

        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        engine = GenerationEngine(cfg, params, max_seq_len=96,
                                  compute_dtype=jnp.float32,
                                  cache_dtype=jnp.int8)
        rng = np.random.default_rng(17)
        turn1 = rng.integers(3, 200, size=(20,)).astype(np.int32)
        gcfg = GenerationConfig(max_new_tokens=4,
                                eos_token_id=cfg.llama.eos_token_id)
        t1 = list(engine.stream(turn1[None], 20, gen_cfg=gcfg,
                                session=True))
        turn2 = np.concatenate(
            [turn1, np.asarray(t1, np.int32),
             rng.integers(3, 200, size=(9,)).astype(np.int32)])
        t2 = list(engine.stream(turn2[None], len(turn2), gen_cfg=gcfg,
                                session=True))
        engine.reset_session()
        t2_fresh = list(engine.stream(turn2[None], len(turn2),
                                      gen_cfg=gcfg))
        assert t2 == t2_fresh, (t2, t2_fresh)

    def test_int8_decode_close_to_fp(self):
        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        fp = GenerationEngine(cfg, params, max_seq_len=64,
                              compute_dtype=jnp.float32,
                              cache_dtype=jnp.float32)
        q8 = GenerationEngine(cfg, params, max_seq_len=64,
                              compute_dtype=jnp.float32,
                              cache_dtype=jnp.float32, quantize_bits=8)
        ids = np.full((1, 6), 9, np.int32)
        gcfg = GenerationConfig(max_new_tokens=4)
        out_fp = fp.generate(ids, np.asarray([6], np.int32), gen_cfg=gcfg)
        out_q8 = q8.generate(ids, np.asarray([6], np.int32), gen_cfg=gcfg)
        # random tiny weights: logits are near-flat so argmax may flip;
        # just require the quantized path to run and produce tokens
        assert len(out_q8[0]) <= 4
        # and the underlying logits to be close
        from lhrs_bot_tpu.models.llama import KVCache, llama_prefill
        emb = jnp.take(fp.llama_params["embed_tokens"],
                       jnp.asarray(ids), axis=0)
        c1 = KVCache.create(cfg.llama, 1, 16, dtype=jnp.float32)
        l_fp, _ = llama_prefill(fp.llama_params, cfg.llama, c1,
                                inputs_embeds=emb,
                                prompt_len=jnp.asarray([6]),
                                compute_dtype=jnp.float32)
        c2 = KVCache.create(cfg.llama, 1, 16, dtype=jnp.float32)
        l_q8, _ = llama_prefill(q8.llama_params, cfg.llama, c2,
                                inputs_embeds=emb,
                                prompt_len=jnp.asarray([6]),
                                compute_dtype=jnp.float32)
        rel = float(jnp.abs(l_q8 - l_fp).max()
                    / (jnp.abs(l_fp).max() + 1e-9))
        assert rel < 0.15, rel

    def test_int8_lm_head_close_and_host_matches_device(self):
        """lm_head_bits=8 (int8 unembedding, serving bandwidth lever):
        logits stay within quantization tolerance of the fp head, and the
        numpy host-quantize path produces the same tokens as the device
        path."""
        import numpy as np

        cfg = VLMConfig.tiny_test(stage=0, lora=True)
        params = init_vlm_params(jax.random.PRNGKey(3), cfg)
        from lhrs_bot_tpu.ops.quant import QuantizedTensor

        fp = GenerationEngine(cfg, params, max_seq_len=64,
                              compute_dtype=jnp.float32,
                              cache_dtype=jnp.float32, quantize_bits=8)
        dev = GenerationEngine(cfg, params, max_seq_len=64,
                               compute_dtype=jnp.float32,
                               cache_dtype=jnp.float32, quantize_bits=8,
                               lm_head_bits=8)
        host_tree = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
        host = GenerationEngine(cfg, host_tree, max_seq_len=64,
                                compute_dtype=jnp.float32,
                                cache_dtype=jnp.float32, quantize_bits=8,
                                lm_head_bits=8)
        for e in (dev, host):
            assert isinstance(e.llama_params["lm_head"], QuantizedTensor)
        ids = np.full((1, 6), 9, np.int32)
        gcfg = GenerationConfig(max_new_tokens=4, eos_token_id=-1)
        lens = np.asarray([6], np.int32)
        assert (dev.generate(ids, lens, gen_cfg=gcfg)
                == host.generate(ids, lens, gen_cfg=gcfg))
        # logits within int8 weight-quant tolerance of the fp head
        from lhrs_bot_tpu.models.llama import KVCache, llama_prefill
        emb = jnp.take(fp.llama_params["embed_tokens"],
                       jnp.asarray(ids), axis=0)
        outs = []
        for e in (fp, dev):
            c = KVCache.create(cfg.llama, 1, 16, dtype=jnp.float32)
            l, _ = llama_prefill(e.llama_params, cfg.llama, c,
                                 inputs_embeds=emb,
                                 prompt_len=jnp.asarray([6]),
                                 compute_dtype=jnp.float32)
            outs.append(l)
        rel = float(jnp.abs(outs[1] - outs[0]).max()
                    / (jnp.abs(outs[0]).max() + 1e-9))
        assert rel < 0.05, rel

    def test_int4_engine_generates(self):
        """bits=4 (the reference's 4-bit recipe, text_modal.py:91-109):
        packed-nibble weights through prefill + cached decode produce
        finite logits and a full token budget."""
        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        q4 = GenerationEngine(cfg, params, max_seq_len=64,
                              compute_dtype=jnp.float32,
                              cache_dtype=jnp.float32, quantize_bits=4)
        ids = np.full((1, 6), 9, np.int32)
        gcfg = GenerationConfig(max_new_tokens=4, eos_token_id=-1)
        out = q4.generate(ids, np.asarray([6], np.int32), gen_cfg=gcfg)
        assert len(out[0]) == 4


class TestMeshEngine:
    @pytest.mark.parametrize("bits", [None, 8, 4])
    def test_tp_sharded_decode_matches_single(self, bits):
        from lhrs_bot_tpu.parallel.mesh import make_mesh

        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        lm8 = 8 if bits == 8 else None  # also cover the int8-head TP spec
        single = GenerationEngine(cfg, params, max_seq_len=64,
                                  compute_dtype=jnp.float32,
                                  cache_dtype=jnp.float32,
                                  quantize_bits=bits, lm_head_bits=lm8)
        mesh = make_mesh(dp=1, tp=4)
        sharded = GenerationEngine(cfg, params, max_seq_len=64,
                                   compute_dtype=jnp.float32,
                                   cache_dtype=jnp.float32,
                                   quantize_bits=bits, lm_head_bits=lm8,
                                   mesh=mesh)
        ids = np.full((2, 6), 13, np.int32)
        gcfg = GenerationConfig(max_new_tokens=4)
        lens = np.asarray([6, 6], np.int32)
        out_single = single.generate(ids, lens, gen_cfg=gcfg)
        out_sharded = sharded.generate(ids, lens, gen_cfg=gcfg)
        assert out_single == out_sharded


class TestScheduledEval:
    def test_matches_engine_batch_path(self):
        """eval/scheduled.scheduler_generate must emit token-identical
        outputs to the engine.generate batch loop over ragged multimodal
        items, and must drop item images once admitted."""
        from lhrs_bot_tpu.eval.scheduled import scheduler_generate

        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        engine = GenerationEngine(cfg, params, max_seq_len=96,
                                  compute_dtype=jnp.float32,
                                  cache_dtype=jnp.float32,
                                  prompt_bucket=16)
        rng = np.random.default_rng(61)
        items = []
        for i in range(7):
            n = int(rng.integers(5, 24))
            ids = rng.integers(3, 200, size=(n,)).astype(np.int32)
            img = None
            if i % 2 == 0:
                ids[0] = IMAGE_TOKEN_INDEX
                img = rng.integers(0, 255,
                                   size=(28, 28, 3)).astype(np.uint8)
            items.append({"input_ids": ids, "image": img})
        gen_cfg = GenerationConfig(max_new_tokens=6,
                                   eos_token_id=cfg.llama.eos_token_id)

        outs = scheduler_generate(cfg, engine, iter(items), len(items),
                                  gen_cfg=gen_cfg, max_batch=3,
                                  tokens_per_tick=2)
        for item, got in zip(items, outs):
            img = item["image"]
            ref = engine.generate(
                item["input_ids"][None],
                np.asarray([len(item["input_ids"])]),
                images=None if img is None else img[None],
                gen_cfg=gen_cfg)[0]
            assert got == ref, (got, ref)


class TestEvalProtocols:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        engine = GenerationEngine(cfg, params, max_seq_len=96,
                                  compute_dtype=jnp.float32,
                                  cache_dtype=jnp.float32)
        return cfg, params, engine

    def test_cls_and_caption_eval_fns(self, setup, tmp_path):
        cfg, params, engine = setup
        from tests.fake_tokenizer import FakeTokenizer

        tok = FakeTokenizer(cfg.llama.vocab_size)

        class ToyClsDS:
            class_names = ["river", "forest"]

            def __len__(self):
                return 4

            def __getitem__(self, i):
                return {"image": np.zeros((28, 28, 3), np.uint8),
                        "label": i % 2}

        class ToyCapDS:
            def __len__(self):
                return 3

            def __getitem__(self, i):
                return {"image": np.zeros((28, 28, 3), np.uint8),
                        "caption": f"a scene number {i}"}

        from lhrs_bot_tpu.eval.protocols import (
            make_caption_eval_fn, make_cls_eval_fn)

        cls_fn = make_cls_eval_fn(engine, tok, ToyClsDS(),
                                  ToyClsDS.class_names, batch_size=2,
                                  max_new_tokens=3)
        m = cls_fn()
        assert 0.0 <= m["accuracy"] <= 1.0

        cap_fn = make_caption_eval_fn(engine, tok, ToyCapDS(), batch_size=2,
                                      max_new_tokens=3)
        m2 = cap_fn()
        for key in ("bleu4", "cider", "rouge_l", "accuracy"):
            assert key in m2

    def test_pluggable_into_eval_hook(self, tmp_path):
        from lhrs_bot_tpu.train.hooks import EvalHook

        calls = []
        hook = EvalHook(period=2, eval_fn=lambda: (calls.append(1) or
                                                   {"accuracy": len(calls)}),
                        save_best=False)

        class FakeTrainer:
            cur_iter = 0

            class metric_storage:
                @staticmethod
                def update(**kw):
                    pass
        hook.trainer = FakeTrainer()
        for it in range(4):
            hook.trainer.cur_iter = it
            hook.after_iter()
        assert len(calls) == 2 and hook.best == 2
