"""Web UI logic (UI-framework-independent parts of lhrs_webui.py)."""

import numpy as np
import pytest

import lhrs_webui as webui


class TestMask2Bbox:
    def test_empty(self):
        assert webui.mask2bbox(None) == ""
        assert webui.mask2bbox(np.zeros((10, 10), np.uint8)) == ""

    def test_box_coords_normalized(self):
        mask = np.zeros((100, 200), np.uint8)
        mask[20:40, 50:150] = 1
        out = webui.mask2bbox(mask)
        x1, y1, x2, y2 = [float(v) for v in out.strip("[]").split(",")]
        assert 24 <= x1 <= 26 and 74 <= x2 <= 76  # 50/200, 149/200
        assert 19 <= y1 <= 21 and 38 <= y2 <= 40


class TestExtractBboxes:
    def test_multiple_with_labels(self):
        text = "a plane [10,20,30,40] and a ship [50,60,70,80] docked"
        boxes = webui.extract_bboxes(text)
        assert len(boxes) == 2
        assert boxes[0][0] == [10, 20, 30, 40]
        assert "ship" in boxes[1][1] or boxes[1][1] == "docked"

    def test_garbage_skipped(self):
        assert webui.extract_bboxes("no boxes [a,b] here") == []


class TestVisualize:
    def test_draws_on_copy(self):
        img = np.zeros((100, 100, 3), np.uint8)
        out, colored = webui.visualize_all_bbox_together(
            img, "[10,10,90,90] object")
        assert out.shape == img.shape
        assert out.sum() > 0  # something drawn
        assert img.sum() == 0  # original untouched
        assert "<span" in colored

    def test_no_boxes_returns_none(self):
        img = np.zeros((50, 50, 3), np.uint8)
        out, colored = webui.visualize_all_bbox_together(img, "no boxes")
        assert out is None and colored == ""
        assert webui.visualize_all_bbox_together(None, "[1,2,3,4]") == (
            None, "")

    def test_colored_spans_match_bbox_colors(self):
        """Each bracketed group gets a span in its entity's color — the
        color-coded answer text of lhrs_webui.py:886-903."""
        img = np.zeros((100, 100, 3), np.uint8)
        ans = "a ship [10,10,40,40] and a dock [50,50,90,90]"
        _, colored = webui.visualize_all_bbox_together(img, ans)
        assert f"rgb{webui.BBOX_COLORS[0]}" in colored
        assert f"rgb{webui.BBOX_COLORS[1]}" in colored

    def test_normalized_and_percent_coords_both_render(self):
        img = np.zeros((200, 200, 3), np.uint8)
        a, _ = webui.visualize_all_bbox_together(img, "[0.1,0.1,0.9,0.9]")
        b, _ = webui.visualize_all_bbox_together(img, "[10,10,90,90]")
        # same box at both scales → overlays drawn in the same region
        assert a.sum() > 0 and b.sum() > 0
        ys_a = np.nonzero(a.sum(axis=(1, 2)))[0]
        ys_b = np.nonzero(b.sum(axis=(1, 2)))[0]
        assert abs(int(ys_a.max()) - int(ys_b.max())) <= 2

    def test_overlapping_labels_shift(self):
        """Two boxes at the same origin: the second numbered label must not
        sit on top of the first (is_overlapping avoidance)."""
        img = np.zeros((120, 120, 3), np.uint8)
        out, _ = webui.visualize_all_bbox_together(
            img, "[10,30,60,60] a [10,30,70,70] b")
        assert out.sum() > 0

    def test_extract_substrings_unfinished_brace(self):
        got = webui.extract_substrings("box [1,2,3,4] {<5><6><7")
        assert got == [[1.0, 2.0, 3.0, 4.0]]  # no } → nothing trimmed
        got = webui.extract_substrings("{<ok>} then [1,2,3,4]")
        assert got == []  # bracket group after the } is dropped
        got = webui.extract_substrings("[1,2,3,4] tail {<x>}")
        assert got == [[1.0, 2.0, 3.0, 4.0]]
        got = webui.extract_substrings("[1,2,3,4,5,6]")
        assert got == [[1.0, 2.0, 3.0, 4.0]]  # >4 coords trimmed


class TestWebUIDemoLogic:
    @pytest.fixture(scope="class")
    def demo(self):
        import jax
        import jax.numpy as jnp

        from lhrs_bot_tpu.core.config import ConfigDict
        from lhrs_bot_tpu.models import VLMConfig, init_vlm_params
        from tests.fake_tokenizer import FakeTokenizer

        cfg = VLMConfig.tiny_test(stage=0)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        config = ConfigDict({
            "prompt_template": "llava_llama_2",
            "rgb_vision": {"input_size": [28, 28]},
            "text": {"max_position_embeddings": 64},
        })
        d = webui.WebUIDemo(cfg, params, FakeTokenizer(cfg.llama.vocab_size), config)
        # shrink the engine for test speed
        return d

    def test_upload_and_ask_builds_prompt(self, demo):
        demo.upload_image(np.zeros((40, 40, 3), np.uint8))
        demo.ask("what is this?")
        ids = demo.answer_prepare()
        from lhrs_bot_tpu.models.constants import IMAGE_TOKEN_INDEX

        assert IMAGE_TOKEN_INDEX in ids
        assert demo.image_np.shape == (1, 28, 28, 3)

    def test_stream_answer_yields_text(self, demo):
        demo.upload_image(np.zeros((40, 40, 3), np.uint8))
        demo.ask("describe")
        chunks = list(demo.stream_answer(temperature=0.0, max_new_tokens=4))
        assert len(chunks) >= 1
        # conversation updated with the final answer
        assert demo.conv.messages[-1][1] == chunks[-1]

    def test_multi_image_chat(self, demo):
        """add_image mid-chat: the next turn carries a second image, the
        prompt holds two -200 markers, generation runs over a
        (1, 2, H, W, 3) stack, and history renders both images."""
        from lhrs_bot_tpu.models.constants import IMAGE_TOKEN_INDEX

        demo.reset()
        demo.upload_image(np.zeros((40, 40, 3), np.uint8))
        demo.ask("describe the first image")
        chunks = list(demo.stream_answer(temperature=0.0,
                                         max_new_tokens=3))
        assert chunks
        demo.add_image(np.full((40, 40, 3), 200, np.uint8))
        demo.ask("compare it with this second image")
        ids = demo.answer_prepare()
        assert sum(1 for i in ids if i == IMAGE_TOKEN_INDEX) == 2
        imgs = demo._history_images()
        assert imgs.shape == (1, 2, 28, 28, 3)
        chunks2 = list(demo.stream_answer(temperature=0.0,
                                          max_new_tokens=3))
        assert chunks2
        assert len(demo.conv.get_images(return_pil=True)) == 2

    def test_identify_appends_bbox(self, demo):
        demo.reset()
        demo.upload_image(np.zeros((40, 40, 3), np.uint8))
        mask = np.zeros((40, 40), np.uint8)
        mask[10:20, 10:20] = 1
        demo.ask("[Identify] this region", mask=mask)
        msg = demo.conv.messages[-2][1]
        text = msg[0] if isinstance(msg, tuple) else msg
        assert "[" in text
        # first image turn is a tuple: the conversation carries the upload
        assert isinstance(msg, tuple) and len(msg) == 3
