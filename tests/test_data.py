"""Data layer: conversation rendering goldens, tokenizer_image_token,
label masking, collators."""

import numpy as np
import pytest

from lhrs_bot_tpu.data import conversation as conv_lib
from lhrs_bot_tpu.data.collate import GenerationCollator, SupervisedCollator
from lhrs_bot_tpu.data.preprocess import (
    preprocess,
    preprocess_llama_2,
    preprocess_multimodal,
    preprocess_plain,
    tokenizer_image_token,
)
from lhrs_bot_tpu.models.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX

from .fake_tokenizer import FakeTokenizer


@pytest.fixture
def tok():
    return FakeTokenizer()


class TestConversation:
    def test_llama2_prompt_golden(self):
        conv = conv_lib.get_conversation("llava_llama_2")
        conv.append_message(conv.roles[0], "<image>\nWhat is this?")
        conv.append_message(conv.roles[1], "A river.")
        prompt = conv.get_prompt()
        expected = (
            "[INST] <<SYS>>\n" + conv.system + "\n<</SYS>>\n\n"
            "<image>\nWhat is this? [/INST] A river. </s>")
        assert prompt == expected

    def test_llama2_multiturn_separators(self):
        conv = conv_lib.get_conversation("llava_llama_2")
        conv.append_message(conv.roles[0], "q1")
        conv.append_message(conv.roles[1], "a1")
        conv.append_message(conv.roles[0], "q2")
        conv.append_message(conv.roles[1], "a2")
        prompt = conv.get_prompt()
        assert prompt.count("[INST]") == 2
        assert prompt.count("</s>") == 2
        assert "</s><s>[INST] q2 [/INST] a2 </s>" in prompt

    def test_llama2_generation_prompt_ends_with_inst(self):
        conv = conv_lib.get_conversation("llava_llama_2")
        conv.append_message(conv.roles[0], "question")
        conv.append_message(conv.roles[1], None)
        assert conv.get_prompt().endswith("[/INST]")

    def test_plain_prompt(self):
        conv = conv_lib.get_conversation("plain")
        conv.append_message(conv.roles[0], "<image>")
        conv.append_message(conv.roles[1], "a scene")
        assert conv.get_prompt() == "<image>\na scene"

    def test_v1_two_style(self):
        conv = conv_lib.get_conversation("llava_v1")
        conv.append_message(conv.roles[0], "hi")
        conv.append_message(conv.roles[1], "hello")
        p = conv.get_prompt()
        assert p.endswith("USER: hi ASSISTANT: hello</s>")

    def test_registry_matches_reference_surface(self):
        """conversation.py:381-395 registers 13 template names."""
        expected = {"default", "v0", "v1", "vicuna_v1", "llama_2", "plain",
                    "v0_plain", "llava_v0", "v0_mmtag", "llava_v1",
                    "v1_mmtag", "llava_llama_2", "mpt"}
        assert set(conv_lib.conv_templates) == expected

    def test_mmtag_templates_golden(self):
        """conversation.py:343-378: mmtag system prompts announce the
        <Image>...</Image> wrap; v0 variant is SINGLE/###, v1 TWO/</s>."""
        v0 = conv_lib.get_conversation("v0_mmtag")
        assert v0.version == "v0_mmtag"
        assert v0.roles == ("Human", "Assistant")
        assert "<Image>visual content</Image>" in v0.system
        v0.append_message(v0.roles[0], "q")
        v0.append_message(v0.roles[1], None)
        assert v0.get_prompt() == v0.system + "###Human: q###Assistant:"

        v1 = conv_lib.get_conversation("v1_mmtag")
        assert v1.version == "v1_mmtag"
        assert v1.roles == ("USER", "ASSISTANT")
        v1.append_message(v1.roles[0], "q")
        v1.append_message(v1.roles[1], "a")
        assert v1.get_prompt() == v1.system + " USER: q ASSISTANT: a</s>"

    def test_mmtag_tupled_first_message_inserts_image_turn(self):
        """conversation.py:33-41: a tupled (text, image, mode) first message
        under an mmtag template becomes a dedicated <Image><image></Image>
        turn answered "Received.", followed by the stripped text."""
        conv = conv_lib.get_conversation("v0_mmtag")
        conv.append_message(conv.roles[0],
                            ("what is this? <image>", object(), "Crop"))
        conv.append_message(conv.roles[1], None)
        p = conv.get_prompt()
        assert p == (conv.system
                     + "###Human: <Image><image></Image>"
                     + "###Assistant: Received."
                     + "###Human: what is this?"
                     + "###Assistant:")
        # the stored messages are untouched (rendering is non-destructive)
        assert isinstance(conv.messages[0][1], tuple)
        assert len(conv.messages) == 2

    def test_non_mmtag_tupled_first_message_front_normalizes(self):
        """conversation.py:42: non-mmtag templates move <image> to the
        text front instead."""
        conv = conv_lib.get_conversation("llava_v0")
        conv.messages = []
        conv.append_message(conv.roles[0],
                            ("what? <image>", object(), "Crop"))
        conv.append_message(conv.roles[1], None)
        assert ("Human: <image>\nwhat?###Assistant:"
                in conv.get_prompt())

    def test_mmtag_image_wrap_in_preprocess_and_generation(self):
        """cap_dataset.py:869-876 + text_modal.py:552-558: with an mmtag
        default template, the image slot is wrapped <Image><image></Image>
        in both training preprocessing and generation prompts."""
        from lhrs_bot_tpu.data.preprocess import (
            preprocess_multimodal, wrap_image_token_for_generation)

        conv_lib.set_default_conversation("v1_mmtag")
        try:
            out = preprocess_multimodal(
                [{"Question": "what is this? <image>", "Answer": "a dam"}])
            assert out[0]["Question"] == (
                "<Image><image></Image>\nwhat is this?")
            assert wrap_image_token_for_generation(
                "<image>\ndescribe") == "<Image><image></Image>\ndescribe"
        finally:
            conv_lib.set_default_conversation("llava_llama_2")
        # non-mmtag default: identity wrap
        assert wrap_image_token_for_generation(
            "<image>\ndescribe") == "<image>\ndescribe"


class TestTokenizerImageToken:
    def test_single_image_token(self, tok):
        ids = tokenizer_image_token("hello <image> world", tok)
        assert ids.count(IMAGE_TOKEN_INDEX) == 1
        assert ids[0] == tok.bos_token_id
        # surrounding words survive
        assert len(ids) == 1 + 1 + 1 + 1  # bos hello -200 world

    def test_no_image(self, tok):
        ids = tokenizer_image_token("just text", tok)
        assert IMAGE_TOKEN_INDEX not in ids
        assert ids == tok("just text").input_ids

    def test_leading_image(self, tok):
        ids = tokenizer_image_token("<image>\ncaption here", tok)
        assert ids[0] == tok.bos_token_id
        assert ids[1] == IMAGE_TOKEN_INDEX


class TestPreprocess:
    def test_plain_masks_question(self, tok):
        conv_lib.set_default_conversation("plain")
        out = preprocess_plain(
            [{"Question": "<image>", "Answer": "green field"}], tok)
        ids, labels = out["input_ids"][0], out["labels"][0]
        q_len = len(tokenizer_image_token("<image>", tok))
        assert (labels[:q_len] == IGNORE_INDEX).all()
        assert (labels[q_len:] != IGNORE_INDEX).any()
        np.testing.assert_array_equal(ids[q_len:], labels[q_len:])

    def test_llama2_masks_instruction_keeps_answer(self, tok):
        conv_lib.set_default_conversation("llava_llama_2")
        sources = [{"Question": "<image>\ndescribe", "Answer": "lake and trees"}]
        out = preprocess(preprocess_multimodal(sources), tok, has_image=True)
        ids, labels = out["input_ids"][0], out["labels"][0]
        assert ids[0] == tok.bos_token_id
        # the image token is inside the masked instruction span
        img_pos = int(np.argmax(ids == IMAGE_TOKEN_INDEX))
        assert labels[img_pos] == IGNORE_INDEX
        # answer tokens visible
        ans_ids = tok("lake and trees").input_ids[1:]
        visible = labels[labels != IGNORE_INDEX]
        for a in ans_ids:
            assert a in visible
        # nothing before [/INST]-end is visible: find first visible index
        first_vis = int(np.argmax(labels != IGNORE_INDEX))
        assert first_vis > img_pos

    def test_llama2_multiturn_masks_both_instructions(self, tok):
        conv_lib.set_default_conversation("llava_llama_2")
        sources = [
            {"Question": "<image>\nfirst query", "Answer": "alpha beta"},
            {"Question": "second query", "Answer": "gamma delta"},
        ]
        out = preprocess(preprocess_multimodal(sources), tok, has_image=True)
        labels = out["labels"][0]
        vis = labels[labels != IGNORE_INDEX]
        for a in tok("alpha beta").input_ids[1:] + tok("gamma delta").input_ids[1:]:
            assert a in vis
        assert tok("second").input_ids[1] not in vis  # instruction masked

    def test_multimodal_moves_image_to_front(self):
        out = preprocess_multimodal(
            [{"Question": "describe <image> now", "Answer": "x"}])
        assert out[0]["Question"].startswith("<image>\n")
        assert "<image>" not in out[0]["Question"][len("<image>"):]


class TestCollators:
    def _items(self, tok, lens=(5, 9)):
        items = []
        for n in lens:
            ids = list(range(10, 10 + n))
            items.append({
                "input_ids": np.asarray(ids),
                "labels": np.asarray(ids),
                "image": np.zeros((28, 28, 3), np.uint8),
            })
        return items

    def test_supervised_right_pad(self, tok):
        coll = SupervisedCollator(tok, pad_multiple=8)
        batch = coll(self._items(tok))
        assert batch["input_ids"].shape == (2, 16)
        assert batch["input_ids"][0, 5] == tok.pad_token_id
        assert batch["labels"][0, 5] == IGNORE_INDEX
        assert batch["attention_mask"][0, :5].all()
        assert not batch["attention_mask"][0, 5:].any()
        assert batch["images"].shape == (2, 28, 28, 3)

    def test_generation_collator_lengths(self, tok):
        coll = GenerationCollator(tok, pad_multiple=8)
        batch = coll(self._items(tok))
        np.testing.assert_array_equal(batch["seq_lens"], [5, 9])
        assert batch["input_ids"][1, 8] == 18  # last real token, right-pad

    def test_generation_collator_left_pad(self, tok):
        coll = GenerationCollator(tok, pad_multiple=8, left_pad=True)
        batch = coll(self._items(tok))
        assert batch["input_ids"][0, 0] == tok.pad_token_id
        assert batch["input_ids"][0, -5] == 10

    def test_truncation(self, tok):
        coll = SupervisedCollator(tok, pad_multiple=8, max_length=8)
        items = self._items(tok, lens=(20,))
        batch = coll(items)
        assert batch["input_ids"].shape == (1, 8)


class TestMultiImageGuard:
    def test_collator_rejects_two_image_tokens(self, tok):
        items = [{
            "input_ids": np.asarray([1, IMAGE_TOKEN_INDEX, 5,
                                     IMAGE_TOKEN_INDEX, 7]),
            "labels": np.asarray([1, IMAGE_TOKEN_INDEX, 5,
                                  IMAGE_TOKEN_INDEX, 7]),
        }]
        coll = SupervisedCollator(tok)
        with pytest.raises(ValueError, match="image tokens"):
            coll(items)


class TestMixedBatch:
    def test_text_only_rows_get_zero_images(self, tok):
        items = [
            {"input_ids": np.asarray([1, IMAGE_TOKEN_INDEX, 5]),
             "labels": np.asarray([1, IMAGE_TOKEN_INDEX, 5]),
             "image": np.full((28, 28, 3), 9, np.uint8)},
            {"input_ids": np.asarray([1, 6, 7]),
             "labels": np.asarray([1, 6, 7])},  # text-only (stage-3 mixing)
        ]
        coll = SupervisedCollator(tok, pad_multiple=8)
        batch = coll(items)
        assert batch["images"].shape == (2, 28, 28, 3)
        assert batch["images"][0].max() == 9
        assert batch["images"][1].max() == 0


class TestPreprocessV1:
    def test_v1_masks_instruction_keeps_answer(self, tok):
        conv_lib.set_default_conversation("llava_v1")
        from lhrs_bot_tpu.data.preprocess import preprocess_v1

        sources = [{"Question": "<image>\nwhat is shown",
                    "Answer": "open farmland"}]
        out = preprocess_v1(sources, tok, has_image=True)
        ids, labels = out["input_ids"][0], out["labels"][0]
        assert ids[0] == tok.bos_token_id
        vis = labels[labels != IGNORE_INDEX]
        for a in tok("open farmland").input_ids[1:]:
            assert a in vis
        assert tok("shown").input_ids[1] not in vis
        conv_lib.set_default_conversation("llava_llama_2")


class TestWeightedLoaderFactory:
    def test_stage3_weight_sample_routing(self, tok, tmp_path):
        import json

        from PIL import Image

        from lhrs_bot_tpu.core.config import ConfigDict
        from lhrs_bot_tpu.data.build_loader import build_loader
        from lhrs_bot_tpu.data.loader import WeightedShardedSampler

        img_dir = tmp_path / "osm_data_Image"
        img_dir.mkdir()
        recs = []
        for i in range(4):
            Image.fromarray(np.zeros((30, 30, 3), np.uint8)).save(
                str(img_dir / f"i{i}.jpg"))
            recs.append({"image": f"i{i}.jpg", "conversations": [
                {"from": "human", "value": "<image>\nq"},
                {"from": "gpt", "value": "a"}]})
        json.dump(recs, open(str(tmp_path / "osm_data.json"), "w"))

        cfg = ConfigDict({
            "stage": 3, "weight_sample": True,
            "prompt_template": "llava_llama_2",
            "data_path": str(tmp_path), "batch_size": 2, "seed": 0,
            "rgb_vision": {"input_size": [28, 28]},
        })
        loader = build_loader(cfg, tok, mode="pretrain")
        assert isinstance(loader.sampler, WeightedShardedSampler)
        batch = next(iter(loader))
        assert batch["input_ids"].shape[0] == 2
        assert (batch["labels"] != IGNORE_INDEX).any()


class TestConversationImages:
    """Conversation-held images (conversation.py:112-203): tuple user turns
    carry PIL images through get_images()/to_gradio_chatbot()."""

    def _conv_with_images(self):
        from PIL import Image

        conv = conv_lib.get_conversation("llava_llama_2")
        img1 = Image.new("RGB", (640, 480), (200, 10, 10))
        img2 = Image.new("RGB", (300, 300), (10, 200, 10))
        conv.append_message(conv.roles[0],
                            ("<image>\nwhat is here?", img1, "Crop"))
        conv.append_message(conv.roles[1], "a river")
        conv.append_message(conv.roles[0],
                            ("<image>\nand now?", img2, "Pad"))
        conv.append_message(conv.roles[1], None)
        return conv, img1, img2

    def test_get_images_pil_and_b64(self):
        import base64

        conv, img1, img2 = self._conv_with_images()
        pils = conv.get_images(return_pil=True)
        assert len(pils) == 2
        # bounded resize: shortest edge = min(800/aspect, 400, min_hw)
        w, h = pils[0].size
        assert h == int(min(800 / (640 / 480), 400, 480) * 480 / 480)
        assert w > h  # landscape preserved
        b64s = conv.get_images()
        assert all(isinstance(s, str) for s in b64s)
        assert base64.b64decode(b64s[0])[:8] == b"\x89PNG\r\n\x1a\n"

    def test_pad_mode_squares(self):
        conv, _, _ = self._conv_with_images()
        # second turn uses Pad on an already-square image → unchanged ratio
        pils = conv.get_images(return_pil=True)
        assert pils[1].size[0] == pils[1].size[1]

    def test_to_gradio_chatbot_rows(self):
        conv, _, _ = self._conv_with_images()
        rows = conv.to_gradio_chatbot()
        # img row + text row per image turn; assistant reply on last row
        assert rows[0][0].startswith('<img src="data:image/png;base64,')
        assert rows[1][0] == "what is here?"
        assert rows[1][1] == "a river"
        assert rows[2][0].startswith("<img")
        assert rows[3] == ["and now?", None]

    def test_prompt_unaffected_by_tuple_turns(self):
        conv, _, _ = self._conv_with_images()
        prompt = conv.get_prompt()
        assert "<image>" in prompt and "what is here?" in prompt


class TestRSVQAVariants:
    """RSVQA dataset variants (reference rsvqa.py:64-205): prefix-named
    file layout, count/area filtering, and the named LR/HR/xBEN classes."""

    def _write_corpus(self, tmp_path, prefix, n_img=2):
        import json as _json

        from PIL import Image

        qtypes = ["presence", "count", "comp", "area"]
        questions, answers = [], []
        for i in range(n_img * 2):
            questions.append({
                "id": i, "img_id": i % n_img, "active": True,
                "type": qtypes[i % len(qtypes)],
                "question": f"is there a road {i}?",
                "answers_ids": [i],
            })
            answers.append({"id": i, "answer": "yes" if i % 2 else "no",
                            "active": True})
        images = [{"id": i, "active": True,
                   "questions_ids": [j for j in range(n_img * 2)
                                     if j % n_img == i]}
                  for i in range(n_img)]
        for kind, payload in (("questions", questions),
                              ("answers", answers), ("images", images)):
            with open(tmp_path / f"{prefix}_split_test_{kind}.json",
                      "w") as fh:
                _json.dump({kind: payload}, fh)
        for i in range(n_img):
            Image.new("RGB", (32, 32), (i * 40, 100, 50)).save(
                tmp_path / f"{i}.tif")

    def test_xben_named_variant(self, tmp_path, tok):
        """rsvqa.py:201-205: RSVQAxBEN reads RSVQAxBEN_split_* files; the
        flat {id}.tif image layout resolves via the root fallback."""
        from lhrs_bot_tpu.data.datasets import RSVQA_VARIANTS, RSVQAxBEN

        self._write_corpus(tmp_path, "RSVQAxBEN")
        ds = RSVQAxBEN(str(tmp_path), tok, image_size=32)
        # count/area filtered: 4 questions, 2 survive
        assert len(ds) == 2
        assert all(it["type"] not in ("count", "area") for it in ds.items)
        item = ds[0]
        assert item["image"].shape == (32, 32, 3)
        assert item["target"] in ("yes", "no")
        assert RSVQA_VARIANTS["XBEN"] is RSVQAxBEN
        assert RSVQA_VARIANTS["RSVQAXBEN"] is RSVQAxBEN

    def test_hr_uses_usgs_prefix(self, tmp_path, tok):
        """rsvqa.py:195-199: the HR corpus ships USGS_split_* files."""
        from lhrs_bot_tpu.data.datasets import RSVQA_VARIANTS, RSVQAHR

        self._write_corpus(tmp_path, "USGS")
        ds = RSVQAHR(str(tmp_path), tok, image_size=32)
        assert len(ds) == 2
        assert RSVQA_VARIANTS["HR"] is RSVQAHR
        assert RSVQA_VARIANTS["USGS"] is RSVQAHR
