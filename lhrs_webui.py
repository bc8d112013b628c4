"""Gradio web UI: multi-turn chat over an uploaded RS image with streaming
generation, task tags ([VG]/[CLS]/[VQA]/[Identify]) and bbox visualization.

Capability parity with the reference lhrs_webui.py (WebUIDemo: upload→encode→
chat :298-428, streaming :233-239, sketch-mask→bbox :609-626, bbox overlay
rendering :656-906, 2000-token context truncation :195-202), rebuilt on the
TPU generation engine (jitted prefill + streamed decode steps instead of a
background HF-generate thread).

gradio is an optional dependency; the UI logic (prompt assembly, streaming,
bbox parsing/drawing) lives in WebUIDemo and is importable/testable without
it.

Run: python lhrs_webui.py -c Config/multi_modal_eval.yaml --model-path <ckpt>
"""

from __future__ import annotations

import re
from typing import Iterator, List, Optional, Tuple

import numpy as np

TASK_TAGS = ["[VG]", "[CLS]", "[VQA]", "[Identify]"]
_BBOX_COLORS = [(255, 64, 64), (64, 200, 64), (64, 96, 255), (255, 160, 0),
                (200, 64, 200), (0, 200, 200)]


def mask2bbox(mask: Optional[np.ndarray]) -> str:
    """Sketch mask → "[x1,y1,x2,y2]" in 0-100 normalized coords
    (lhrs_webui.py:609-626)."""
    if mask is None:
        return ""
    if mask.ndim == 3:
        mask = mask[..., 0]
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return ""
    h, w = mask.shape
    x1, x2 = xs.min() / w * 100, xs.max() / w * 100
    y1, y2 = ys.min() / h * 100, ys.max() / h * 100
    return f"[{x1:.0f},{y1:.0f},{x2:.0f},{y2:.0f}]"


def extract_bboxes(text: str) -> List[Tuple[List[float], str]]:
    """All "[x1,y1,x2,y2]" groups with trailing label text."""
    out = []
    for m in re.finditer(r"\[([0-9., ]+)\]\s*([^\[\]]*)", text):
        try:
            coords = [float(x) for x in m.group(1).replace(" ", "").split(",")
                      if x != ""]
        except ValueError:
            continue
        if len(coords) >= 4:
            out.append((coords[:4], m.group(2).strip()))
    return out


def visualize_all_bbox_together(image: np.ndarray, answer: str) -> np.ndarray:
    """Draw every predicted bbox (0-100 normalized) with color-coded labels
    (lhrs_webui.py:656-906 behavior)."""
    import cv2

    img = np.ascontiguousarray(image.copy())
    h, w = img.shape[:2]
    for i, (box, label) in enumerate(extract_bboxes(answer)):
        color = _BBOX_COLORS[i % len(_BBOX_COLORS)]
        x1, y1, x2, y2 = (int(box[0] / 100 * w), int(box[1] / 100 * h),
                          int(box[2] / 100 * w), int(box[3] / 100 * h))
        cv2.rectangle(img, (x1, y1), (x2, y2), color, 2)
        if label:
            cv2.putText(img, label[:24], (x1, max(y1 - 6, 12)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1, cv2.LINE_AA)
    return img


class WebUIDemo:
    """UI-framework-independent chat session logic."""

    MAX_CONTEXT_TOKENS = 2000  # truncation parity (lhrs_webui.py:195-202)

    def __init__(self, cfg, params, tokenizer, config):
        from lhrs_bot_tpu.core.bootstrap import build_engine
        from lhrs_bot_tpu.data import conversation as conv_lib

        self.cfg = cfg
        self.config = config
        self.tokenizer = tokenizer
        self.engine = build_engine(cfg, params, config)
        self.conv_lib = conv_lib
        conv_lib.set_default_conversation(
            getattr(config, "prompt_template", "llava_llama_2"))
        self.reset()

    def reset(self):
        self.conv = self.conv_lib.default_conversation.copy()
        self.image_np: Optional[np.ndarray] = None
        self.raw_image: Optional[np.ndarray] = None
        self.first_turn = True

    def upload_image(self, image) -> None:
        from lhrs_bot_tpu.data.transforms import clip_preprocess_uint8

        self.reset()
        self.raw_image = np.asarray(image)
        self.image_np = clip_preprocess_uint8(
            image, int(self.config.rgb_vision.input_size[0]))[None]

    def ask(self, text: str, mask: Optional[np.ndarray] = None) -> None:
        if text.startswith("[Identify]"):
            bbox = mask2bbox(mask)
            text = text + " " + bbox if bbox else text
        if self.first_turn and self.image_np is not None:
            text = "<image>\n" + text
            self.first_turn = False
        self.conv.append_message(self.conv.roles[0], text)
        self.conv.append_message(self.conv.roles[1], None)

    def answer_prepare(self) -> List[int]:
        from lhrs_bot_tpu.data.preprocess import tokenizer_image_token

        ids = tokenizer_image_token(self.conv.get_prompt(), self.tokenizer)
        if len(ids) > self.MAX_CONTEXT_TOKENS:
            ids = ids[:1] + ids[-(self.MAX_CONTEXT_TOKENS - 1):]
        return ids

    def stream_answer(self, temperature: float = 0.4,
                      max_new_tokens: int = 512) -> Iterator[str]:
        from lhrs_bot_tpu.serve.engine import GenerationConfig

        ids = self.answer_prepare()
        gen_cfg = GenerationConfig(
            max_new_tokens=max_new_tokens, do_sample=temperature > 0,
            temperature=max(temperature, 1e-4), top_p=0.9,
            eos_token_id=self.tokenizer.eos_token_id,
            pad_token_id=self.tokenizer.pad_token_id)
        emitted: List[int] = []
        for tok in self.engine.stream(
                np.asarray([ids], np.int32), len(ids),
                images=self.image_np, gen_cfg=gen_cfg):
            emitted.append(tok)
            yield self.tokenizer.decode(emitted, skip_special_tokens=True)
        if emitted:
            self.conv.messages[-1][1] = self.tokenizer.decode(
                emitted, skip_special_tokens=True)

    def visualize(self, answer: str) -> Optional[np.ndarray]:
        if self.raw_image is None or "[" not in answer:
            return None
        return visualize_all_bbox_together(self.raw_image, answer)


def launch_demo(demo: WebUIDemo, server_port: int = 7860):
    try:
        import gradio as gr
    except ImportError as exc:  # pragma: no cover
        raise SystemExit(
            "gradio is not installed in this environment; the chat logic is "
            "available programmatically via WebUIDemo, or use cli_qa.py"
        ) from exc

    with gr.Blocks(title="LHRS-Bot TPU") as ui:
        gr.Markdown("## LHRS-Bot (TPU) — remote sensing chat")
        with gr.Row():
            with gr.Column(scale=1):
                image_in = gr.Image(type="pil", label="RS image")
                temp = gr.Slider(0.0, 1.5, value=0.4, label="temperature")
            with gr.Column(scale=2):
                chatbot = gr.Chatbot()
                textbox = gr.Textbox(
                    placeholder="Ask about the image — task tags: "
                    + " ".join(TASK_TAGS))
                vis_out = gr.Image(label="grounding overlay")

        state = {"demo": demo}

        def on_upload(img):
            state["demo"].upload_image(img)
            return []

        def on_ask(text, history, temperature):
            d = state["demo"]
            d.ask(text)
            history = history + [[text, ""]]
            for partial in d.stream_answer(temperature=temperature):
                history[-1][1] = partial
                yield history, d.visualize(partial)

        image_in.upload(on_upload, [image_in], [chatbot])
        textbox.submit(on_ask, [textbox, chatbot, temp],
                       [chatbot, vis_out])
    ui.queue().launch(server_port=server_port, share=False)


def main():
    from lhrs_bot_tpu.core.bootstrap import (
        build_model_and_tokenizer, parse_config, setup)

    config = parse_config(
        "LHRS-Bot TPU web UI",
        extra=lambda p: p.add_argument("--port", type=int, default=7860))
    setup(config)
    cfg, params, tokenizer = build_model_and_tokenizer(config, eval_mode=True)
    demo = WebUIDemo(cfg, params, tokenizer, config)
    launch_demo(demo, server_port=int(config.port))


if __name__ == "__main__":
    main()
