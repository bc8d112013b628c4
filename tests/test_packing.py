"""Sequence packing: block-diagonal attention + per-segment RoPE must be
loss- and gradient-equivalent to running each sample in its own row."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lhrs_bot_tpu.data.collate import PackingCollator
from lhrs_bot_tpu.models import VLMConfig, init_vlm_params
from lhrs_bot_tpu.models.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from lhrs_bot_tpu.models.llama import (LlamaConfig, init_llama_params,
                                       llama_apply)
from lhrs_bot_tpu.models.vlm import vlm_forward_loss

from .fake_tokenizer import FakeTokenizer


class TestPackedDecoder:
    def test_packed_logits_match_rows(self):
        cfg = LlamaConfig.tiny_test()
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        samples = [rng.integers(3, 200, size=(n,)).astype(np.int32)
                   for n in (13, 9, 6)]
        packed = np.zeros((1, 32), np.int32)
        seg = np.zeros((1, 32), np.int32)
        ofs = 0
        for si, ids in enumerate(samples):
            packed[0, ofs:ofs + len(ids)] = ids
            seg[0, ofs:ofs + len(ids)] = si + 1
            ofs += len(ids)
        logits = llama_apply(params, cfg, input_ids=jnp.asarray(packed),
                             segment_ids=jnp.asarray(seg),
                             compute_dtype=jnp.float32)
        ofs = 0
        for ids in samples:
            ref = llama_apply(params, cfg,
                              input_ids=jnp.asarray(ids)[None],
                              compute_dtype=jnp.float32)
            np.testing.assert_allclose(
                np.asarray(logits)[0, ofs:ofs + len(ids)],
                np.asarray(ref)[0], atol=3e-5, rtol=3e-5)
            ofs += len(ids)


class TestPackedTraining:
    def _samples(self, cfg, rng, n_samples=5):
        out = []
        for i in range(n_samples):
            n = int(rng.integers(8, 20))
            ids = rng.integers(3, 200, size=(n,)).astype(np.int64)
            labels = ids.copy()
            labels[:3] = IGNORE_INDEX  # prompt region masked
            img = None
            if i % 2 == 0:
                ids[1] = IMAGE_TOKEN_INDEX
                labels[1] = IGNORE_INDEX
                img = rng.integers(0, 255,
                                   size=(28, 28, 3)).astype(np.uint8)
            out.append({"input_ids": ids, "labels": labels, "image": img})
        return out

    def test_packed_loss_matches_weighted_per_sample(self):
        """Packed multimodal loss == token-weighted mean of per-sample
        losses (same forward semantics; packing only changes layout)."""
        cfg = VLMConfig.tiny_test(stage=1)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(7)
        samples = self._samples(cfg, rng)
        coll = PackingCollator(FakeTokenizer(cfg.llama.vocab_size),
                               target_len=48, rows_per_batch=4)
        batch = coll(samples)
        assert batch["segment_ids"].max() >= 2  # actually packed
        # all 5 samples must be in this emission for the comparison below
        n_emitted = sum(int(batch["segment_ids"][r].max())
                        for r in range(batch["segment_ids"].shape[0]))
        assert n_emitted == len(samples)
        packed = vlm_forward_loss(
            params, cfg,
            {k: jnp.asarray(v) for k, v in batch.items()},
            compute_dtype=jnp.float32)

        total, count = 0.0, 0
        for s in samples:
            ids = np.asarray(s["input_ids"], np.int64).copy()
            labels = np.asarray(s["labels"], np.int64).copy()
            labels[0] = IGNORE_INDEX  # the packer's boundary guard
            b = {"input_ids": jnp.asarray(ids[None]),
                 "labels": jnp.asarray(labels[None]),
                 "attention_mask": jnp.ones((1, len(ids)), bool)}
            if s["image"] is not None:
                b["images"] = jnp.asarray(s["image"][None])
            out = vlm_forward_loss(params, cfg, b,
                                   compute_dtype=jnp.float32)
            # token-weight: shifted CE counts labels[1:] != IGNORE; the
            # image marker expands but image labels are IGNORE either way
            n_valid = int(np.sum(labels[1:] != IGNORE_INDEX))
            total += float(out["total_loss"]) * n_valid
            count += n_valid
        expected = total / count
        assert abs(float(packed["total_loss"]) - expected) < 1e-4, (
            float(packed["total_loss"]), expected)

    def test_packer_invariants(self):
        cfg = VLMConfig.tiny_test(stage=1)
        rng = np.random.default_rng(9)
        samples = self._samples(cfg, rng, n_samples=9)
        coll = PackingCollator(FakeTokenizer(cfg.llama.vocab_size),
                               target_len=40, rows_per_batch=4,
                               max_images_per_row=2)
        batch = coll(samples)
        ids, segs, labels = (batch["input_ids"], batch["segment_ids"],
                             batch["labels"])
        # STATIC shapes: exactly rows_per_batch x target_len
        assert ids.shape == (4, 40)
        n_segments = sum(int(segs[r].max()) for r in range(ids.shape[0]))
        carried = len(coll._open)
        # every sample either emitted or carried over
        carried_segments = sum(int(max(r["segs"], default=0))
                               for r in coll._open)
        assert n_segments + carried_segments == len(samples)
        # image-slot constraint respected
        if "images" in batch:
            assert batch["images"].shape[1] == 2
        # a second call drains carryover with the SAME static shapes
        batch2 = coll([])
        assert batch2["input_ids"].shape == (4, 40)
        total2 = sum(int(batch2["segment_ids"][r].max())
                     for r in range(4))
        assert n_segments + total2 == len(samples)
        for r in range(ids.shape[0]):
            for s in range(1, int(segs[r].max()) + 1):
                span = np.flatnonzero(segs[r] == s)
                assert (np.diff(span) == 1).all()  # contiguous
                # boundary guard: first label of each segment is IGNORE
                assert labels[r, span[0]] == IGNORE_INDEX
        # marker count == image slots used per row
        if "images" in batch:
            for r in range(ids.shape[0]):
                n_markers = int((ids[r] == IMAGE_TOKEN_INDEX).sum())
                used = sum(1 for k in range(batch["images"].shape[1])
                           if batch["images"][r, k].any())
                assert n_markers >= used
