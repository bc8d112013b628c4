"""Interactive CLI chat over a single remote-sensing image.

Parity with the reference cli_qa.py: image via local path or URL, multi-turn
conversation state, streaming token output, sampling T=0.4 / 512 new tokens.

Run: python cli_qa.py -c Config/multi_modal_eval.yaml \
       --model-path <FINAL.pt> --image <path-or-url>
"""

from __future__ import annotations

import sys


def load_image(path_or_url: str):
    from PIL import Image

    if path_or_url.startswith(("http://", "https://")):
        import io
        import urllib.request

        with urllib.request.urlopen(path_or_url) as resp:
            return Image.open(io.BytesIO(resp.read())).convert("RGB")
    return Image.open(path_or_url).convert("RGB")


def main():
    import numpy as np

    from lhrs_bot_tpu.core.bootstrap import (
        build_engine, build_model_and_tokenizer, parse_config, setup)
    from lhrs_bot_tpu.data import conversation as conv_lib
    from lhrs_bot_tpu.data.preprocess import tokenizer_image_token
    from lhrs_bot_tpu.data.transforms import clip_preprocess_uint8
    from lhrs_bot_tpu.models.constants import DEFAULT_IMAGE_TOKEN
    from lhrs_bot_tpu.serve.engine import GenerationConfig

    config = parse_config(
        "LHRS-Bot TPU CLI chat",
        extra=lambda p: (
            p.add_argument("--image", type=str, default=None),
            p.add_argument("--temperature", type=float, default=0.4),
            p.add_argument("--max-new-tokens", type=int, default=512),
            p.add_argument("--speculative", type=int, default=0,
                           help="prompt-lookup speculation window (greedy "
                                "decoding only, i.e. --temperature 0): "
                                "token-identical output, fewer decode "
                                "dispatches when the answer repeats "
                                "prompt/history n-grams"),
        ))
    logger = setup(config)

    cfg, params, tokenizer = build_model_and_tokenizer(config, eval_mode=True)
    engine = build_engine(cfg, params, config)
    conv_lib.set_default_conversation(
        getattr(config, "prompt_template", "llava_llama_2"))

    image = None
    image_np = None
    if config.image:
        image = load_image(config.image)
        image_np = clip_preprocess_uint8(
            image, int(config.rgb_vision.input_size[0]))[None]
        print(f"loaded image: {config.image}")

    conv = conv_lib.default_conversation.copy()
    first_turn = True
    print("Type your question ('exit' to quit, 'image <path>' to load).")
    while True:
        try:
            user = input("USER: ").strip()
        except EOFError:
            break
        if not user:
            continue
        if user.lower() in ("exit", "quit"):
            break
        if user.startswith("image "):
            image = load_image(user[len("image "):].strip())
            image_np = clip_preprocess_uint8(
                image, int(config.rgb_vision.input_size[0]))[None]
            conv = conv_lib.default_conversation.copy()
            first_turn = True
            print("[image loaded; conversation reset]")
            continue

        if first_turn and image_np is not None:
            from lhrs_bot_tpu.data.preprocess import (
                wrap_image_token_for_generation)

            user = wrap_image_token_for_generation(
                DEFAULT_IMAGE_TOKEN + "\n" + user)
            first_turn = False
        conv.append_message(conv.roles[0], user)
        conv.append_message(conv.roles[1], None)

        ids = tokenizer_image_token(conv.get_prompt(), tokenizer)
        gen_cfg = GenerationConfig(
            max_new_tokens=int(config.max_new_tokens), do_sample=True,
            temperature=float(config.temperature), top_p=0.9,
            eos_token_id=tokenizer.eos_token_id,
            pad_token_id=tokenizer.pad_token_id)

        print("ASSISTANT: ", end="", flush=True)
        emitted = []
        prev_text = ""
        for tok in engine.stream(
                np.asarray([ids], np.int32), len(ids), images=image_np,
                gen_cfg=gen_cfg, session=True,
                speculative=int(config.speculative)):
            emitted.append(tok)
            text = tokenizer.decode(emitted, skip_special_tokens=True)
            sys.stdout.write(text[len(prev_text):])
            sys.stdout.flush()
            prev_text = text
        print()
        conv.messages[-1][1] = prev_text


if __name__ == "__main__":
    main()
