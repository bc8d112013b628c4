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
        out = webui.visualize_all_bbox_together(img, "[10,10,90,90] object")
        assert out.shape == img.shape
        assert out.sum() > 0  # something drawn
        assert img.sum() == 0  # original untouched


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
        d = webui.WebUIDemo(cfg, params, FakeTokenizer(), config)
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

    def test_identify_appends_bbox(self, demo):
        demo.reset()
        demo.upload_image(np.zeros((40, 40, 3), np.uint8))
        mask = np.zeros((40, 40), np.uint8)
        mask[10:20, 10:20] = 1
        demo.ask("[Identify] this region", mask=mask)
        assert "[" in demo.conv.messages[-2][1]
