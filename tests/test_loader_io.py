"""Loader/sampler/tar-reader/tokenizer-fallback/model-io tests."""

import io
import json
import os
import tarfile

import numpy as np
import pytest

from lhrs_bot_tpu.data.loader import (
    DataLoader,
    InfiniteSampler,
    ShardedSampler,
    WeightedShardedSampler,
)
from lhrs_bot_tpu.data.tario import TarShardDataset, braceexpand, default_decoder
from lhrs_bot_tpu.data.tokenizer import make_fallback_tokenizer


class TestSamplers:
    def test_sharded_partitions_everything(self):
        idx = set()
        for rank in range(4):
            s = ShardedSampler(10, rank=rank, world_size=4, shuffle=False)
            idx.update(iter(s))
        assert idx == set(range(10))

    def test_sharded_epoch_reshuffles(self):
        s = ShardedSampler(32, shuffle=True, seed=1)
        s.set_epoch(0)
        a = list(s)
        s.set_epoch(1)
        b = list(s)
        assert a != b and sorted(a) == sorted(b)

    def test_weighted_prefers_heavy(self):
        w = [0.01] * 50 + [1.0] * 50
        s = WeightedShardedSampler(w, num_samples=1000, seed=0)
        picks = list(s)
        heavy = sum(1 for i in picks if i >= 50)
        assert heavy > 900

    def test_infinite_wraps(self):
        s = InfiniteSampler(4, shuffle=False)
        it = iter(s)
        got = [next(it) for _ in range(10)]
        assert got[:8] == [0, 1, 2, 3, 0, 1, 2, 3]


class TestDataLoader:
    class _DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((3,), i)}

    def test_batches_and_len(self):
        coll = lambda items: {"x": np.stack([it["x"] for it in items])}
        dl = DataLoader(self._DS(), batch_size=3, collate_fn=coll,
                        num_workers=2, shuffle=False)
        batches = list(dl)
        assert len(dl) == 3 and len(batches) == 3
        assert batches[0]["x"].shape == (3, 3)

    def test_worker_error_propagates(self):
        class Bad:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                raise RuntimeError("boom")

        dl = DataLoader(Bad(), batch_size=2,
                        collate_fn=lambda x: x, num_workers=1)
        with pytest.raises(RuntimeError, match="boom"):
            list(dl)


class TestTarIO:
    def _make_shard(self, path, n=5, corrupt_one=False):
        from PIL import Image

        with tarfile.open(path, "w") as tf:
            for i in range(n):
                img = Image.fromarray(
                    np.random.default_rng(i).integers(
                        0, 255, (32, 32, 3)).astype(np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="JPEG")
                data = buf.getvalue()
                if corrupt_one and i == 2:
                    data = b"not a jpeg"
                info = tarfile.TarInfo(f"sample{i:04d}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                txt = f"caption number {i}".encode()
                info = tarfile.TarInfo(f"sample{i:04d}.txt")
                info.size = len(txt)
                tf.addfile(info, io.BytesIO(txt))

    def test_braceexpand(self):
        assert braceexpand("s-{00..02}.tar") == [
            "s-00.tar", "s-01.tar", "s-02.tar"]
        assert braceexpand("plain.tar") == ["plain.tar"]

    def test_stream_and_corrupt_skip(self, tmp_path):
        p1 = str(tmp_path / "a.tar")
        p2 = str(tmp_path / "b.tar")
        self._make_shard(p1, 5, corrupt_one=True)
        self._make_shard(p2, 3)
        ds = TarShardDataset([p1, p2], shuffle_buffer=0, shuffle_shards=False)
        samples = list(ds)
        # 8 total, 1 corrupt skipped
        assert len(samples) == 7
        assert samples[0]["rgb"].shape == (32, 32, 3)
        assert samples[0]["text"].startswith("caption")

    def test_rank_split(self, tmp_path):
        paths = []
        for i in range(4):
            p = str(tmp_path / f"s{i}.tar")
            self._make_shard(p, 2)
            paths.append(p)
        n0 = len(list(TarShardDataset(paths, rank=0, world_size=2,
                                      shuffle_shards=False,
                                      shuffle_buffer=0)))
        n1 = len(list(TarShardDataset(paths, rank=1, world_size=2,
                                      shuffle_shards=False,
                                      shuffle_buffer=0)))
        assert n0 == n1 == 4

    def test_pipe_shard_streams(self, tmp_path):
        """`pipe:<cmd>` shards stream through a subprocess stdout
        (webdataset pipe: parity, cap_dataset.py:618)."""
        p = str(tmp_path / "a.tar")
        self._make_shard(p, 4)
        ds = TarShardDataset([f"pipe:cat {p}"], shuffle_buffer=0,
                             shuffle_shards=False)
        assert len(list(ds)) == 4

    def test_pipe_failure_is_skipped(self, tmp_path):
        """A failing pipe command behaves like a corrupt shard: warn+skip."""
        good = str(tmp_path / "b.tar")
        self._make_shard(good, 3)
        ds = TarShardDataset(
            ["pipe:false", good], shuffle_buffer=0, shuffle_shards=False)
        assert len(list(ds)) == 3

    def test_http_shard_streams(self, tmp_path):
        """http(s):// shards stream via urllib against a local fixture
        server (remote RS5M parity without egress)."""
        import http.server
        import threading

        self._make_shard(str(tmp_path / "web.tar"), 5)

        class Handler(http.server.SimpleHTTPRequestHandler):
            def __init__(self, *a, **kw):
                super().__init__(*a, directory=str(tmp_path), **kw)

            def log_message(self, *a):  # quiet
                pass

        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}/web.tar"
            ds = TarShardDataset([url], shuffle_buffer=0,
                                 shuffle_shards=False)
            samples = list(ds)
            assert len(samples) == 5
            # missing remote shard → skipped, not fatal
            ds = TarShardDataset(
                [url.replace("web.tar", "missing.tar"), url],
                shuffle_buffer=0, shuffle_shards=False)
            assert len(list(ds)) == 5
        finally:
            srv.shutdown()
            srv.server_close()


class TestFallbackTokenizer:
    def test_roundtrip_and_specials(self):
        tok = make_fallback_tokenizer()
        ids = tok("hello world").input_ids
        assert ids[0] == tok.bos_token_id == 1
        assert tok.pad_token_id == 0 and tok.eos_token_id == 2
        assert tok.decode(ids, skip_special_tokens=True) == "hello world"

    def test_works_with_image_token_splice(self):
        from lhrs_bot_tpu.data.preprocess import tokenizer_image_token
        from lhrs_bot_tpu.models.constants import IMAGE_TOKEN_INDEX

        tok = make_fallback_tokenizer()
        ids = tokenizer_image_token("a <image> b", tok)
        assert ids.count(IMAGE_TOKEN_INDEX) == 1

    def test_weights_only_dir_falls_back(self, tmp_path):
        """A checkpoint dir that exists but has no tokenizer files
        (weights-only export) must fall back, not crash inside
        transformers' slow->fast conversion (r5 EVAL run regression:
        AttributeError on vocab_file=None)."""
        import json

        import pytest

        from lhrs_bot_tpu.data.tokenizer import load_tokenizer

        (tmp_path / "config.json").write_text(json.dumps(
            {"model_type": "llama", "vocab_size": 32000}))
        tok = load_tokenizer(str(tmp_path), 512)
        assert tok.pad_token_id == 0 and tok("x").input_ids
        with pytest.raises(Exception):
            load_tokenizer(str(tmp_path), 512, allow_fallback=False)


class TestModelIO:
    def test_save_and_load_final_roundtrip(self, tmp_path):
        import jax

        from lhrs_bot_tpu.core.model_io import load_pretrained, save_final
        from lhrs_bot_tpu.models import VLMConfig, init_vlm_params

        cfg = VLMConfig.tiny_test(stage=2, lora=True)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        # nonzero lora B so the roundtrip matters
        params["lora"] = jax.tree_util.tree_map(
            lambda x: x + 0.01, params["lora"])
        save_final(str(tmp_path), params, cfg)
        assert os.path.exists(tmp_path / "FINAL.pt")
        assert os.path.exists(tmp_path / "TextLoRA" / "adapter_model.bin")

        reloaded = load_pretrained(
            cfg, model_path=str(tmp_path / "FINAL.pt"))
        np.testing.assert_allclose(
            np.asarray(reloaded["pooler"]["query"]),
            np.asarray(params["pooler"]["query"]), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(reloaded["lora"]["wq"]["b"]),
            np.asarray(params["lora"]["wq"]["b"]), rtol=1e-5, atol=1e-6)

    def test_eval_stage_merges_lora(self, tmp_path):
        import dataclasses

        import jax

        from lhrs_bot_tpu.core.model_io import load_pretrained, save_final
        from lhrs_bot_tpu.models import VLMConfig, init_vlm_params

        cfg = VLMConfig.tiny_test(stage=2, lora=True)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        params["lora"] = jax.tree_util.tree_map(
            lambda x: x + 0.05, params["lora"])
        save_final(str(tmp_path), params, cfg)

        eval_cfg = dataclasses.replace(cfg, stage=0)
        merged = load_pretrained(eval_cfg,
                                 model_path=str(tmp_path / "FINAL.pt"))
        assert "lora" not in merged
        # merged base weights differ from the randomly-initialized base
        fresh = load_pretrained(
            dataclasses.replace(cfg, stage=2),
            model_path=str(tmp_path / "FINAL.pt"))
        assert "lora" in fresh


class TestBuildLoaderTar:
    def test_tar_path_routes_to_stream(self, tmp_path):
        import tarfile as tf_mod

        from lhrs_bot_tpu.core.config import ConfigDict
        from lhrs_bot_tpu.data.build_loader import build_loader
        from tests.fake_tokenizer import FakeTokenizer

        # build two tiny shards
        from PIL import Image

        for s in range(2):
            with tf_mod.open(str(tmp_path / f"shard-{s:02d}.tar"), "w") as tf:
                for i in range(4):
                    img = Image.fromarray(
                        np.random.default_rng(i).integers(
                            0, 255, (32, 32, 3)).astype(np.uint8))
                    buf = io.BytesIO()
                    img.save(buf, format="JPEG")
                    data = buf.getvalue()
                    info = tf_mod.TarInfo(f"s{s}_{i}.jpg")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
                    txt = f"caption {s} {i}".encode()
                    info = tf_mod.TarInfo(f"s{s}_{i}.txt")
                    info.size = len(txt)
                    tf.addfile(info, io.BytesIO(txt))

        cfg = ConfigDict({
            "stage": 1, "prompt_template": "plain",
            "data_path": str(tmp_path / "shard-{00..01}.tar"),
            "batch_size": 2, "seed": 0,
            "rgb_vision": {"input_size": [28, 28]},
        })
        tok = FakeTokenizer()
        loader = build_loader(cfg, tok, mode="pretrain")
        loader.dataset.num_samples = 8
        batches = list(loader)
        assert len(batches) == 4
        b = batches[0]
        assert b["images"].shape == (2, 28, 28, 3)
        assert b["input_ids"].shape[0] == 2
        assert (b["labels"] != -100).any()


class TestVocabResizeTolerance:
    def test_smaller_checkpoint_vocab_loads(self, tmp_path):
        """Reference checkpoints may carry resized embeddings (special
        tokens); overlapping rows load, the rest keeps its init."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from lhrs_bot_tpu.core.model_io import load_pretrained, save_final
        from lhrs_bot_tpu.models import VLMConfig, init_vlm_params
        from lhrs_bot_tpu.core import torch_import as ti

        cfg = VLMConfig.tiny_test(stage=2, lora=True)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        save_final(str(tmp_path), params, cfg)

        # target model with a LARGER vocab (e.g. +4 special tokens)
        bigger_llama = dataclasses.replace(cfg.llama,
                                           vocab_size=cfg.llama.vocab_size + 4)
        big_cfg = dataclasses.replace(cfg, llama=bigger_llama)
        # write an HF-style llama dir is overkill; exercise via FINAL.pt's
        # extra embed path instead: craft extra dict manually
        import numpy as np
        import torch

        ckpt = torch.load(str(tmp_path / "FINAL.pt"), map_location="cpu",
                          weights_only=False)
        # nested reference layout (UniBind.py:275-294)
        ckpt["other_ckpt"]["embed_tokens"] = {"weight": torch.randn(
            cfg.llama.vocab_size, cfg.llama.hidden_size)}
        torch.save(ckpt, str(tmp_path / "FINAL.pt"))

        loaded = load_pretrained(big_cfg,
                                 model_path=str(tmp_path / "FINAL.pt"))
        assert loaded["llama"]["embed_tokens"].shape[0] == \
            cfg.llama.vocab_size + 4
        # the overlapping rows actually came from the checkpoint
        np.testing.assert_allclose(
            np.asarray(loaded["llama"]["embed_tokens"])[:cfg.llama.vocab_size],
            ckpt["other_ckpt"]["embed_tokens"]["weight"].numpy(),
            rtol=1e-5, atol=1e-6)


class TestOrbaxRoundtrip:
    def test_save_load_orbax(self, tmp_path):
        import jax

        from lhrs_bot_tpu.core.model_io import (
            load_orbax_params, save_orbax_params)
        from lhrs_bot_tpu.models import VLMConfig, init_vlm_params

        cfg = VLMConfig.tiny_test(stage=1)
        params = init_vlm_params(jax.random.PRNGKey(7), cfg)
        save_orbax_params(str(tmp_path / "orbax"), params)
        back = load_orbax_params(str(tmp_path / "orbax"), cfg)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
