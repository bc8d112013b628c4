"""Zero-shot remote-sensing scene classification eval.

Parity with the reference main_cls.py: prompt
"[CLS] Choose the best categories describe the image from: {classes}",
batched greedy generation (≤20 new tokens; 30 for METERML), predictions
fuzzy-matched to class names by longest common substring, balanced accuracy
+ per-class report.

Run: python main_cls.py -c Config/multi_modal_eval.yaml \
       --model-path <FINAL.pt> --data-path <ImageFolder root>
"""

from __future__ import annotations


def main():
    import numpy as np

    from lhrs_bot_tpu.core.bootstrap import (
        build_engine, build_model_and_tokenizer, parse_config, setup)
    from lhrs_bot_tpu.data import conversation as conv_lib
    from lhrs_bot_tpu.data.build_loader import build_zero_shot_loader
    from lhrs_bot_tpu.data.preprocess import tokenizer_image_token
    from lhrs_bot_tpu.eval.metrics import (
        CLS_TEMPLATE, balanced_accuracy, classification_report_lines,
        classname_to_idx)
    from lhrs_bot_tpu.models.constants import DEFAULT_IMAGE_TOKEN
    from lhrs_bot_tpu.serve.engine import GenerationConfig

    config = parse_config("LHRS-Bot TPU zero-shot classification")
    logger = setup(config)

    cfg, params, tokenizer = build_model_and_tokenizer(config, eval_mode=True)
    engine = build_engine(cfg, params, config)
    conv_lib.set_default_conversation(
        getattr(config, "prompt_template", "llava_llama_2"))

    dataset, class_names = build_zero_shot_loader(config)
    class_to_idx = {c: i for i, c in enumerate(class_names)}
    class_str = ", ".join(class_names)

    conv = conv_lib.default_conversation.copy()
    conv.append_message(
        conv.roles[0],
        DEFAULT_IMAGE_TOKEN + CLS_TEMPLATE.format(class_str))
    conv.append_message(conv.roles[1], None)
    prompt_ids = tokenizer_image_token(conv.get_prompt(), tokenizer)

    max_new = 30 if getattr(config.eval, "dataset", "") == "METERML" else 20
    gen_cfg = GenerationConfig(
        max_new_tokens=max_new, do_sample=False,
        eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id)

    bs = int(config.batch_size)
    preds, trues = [], []
    # every sample shares one prompt; batch images only
    ids_batch = np.tile(np.asarray(prompt_ids, np.int32)[None], (bs, 1))
    lens = np.full((bs,), len(prompt_ids), np.int32)
    indices = list(range(config.rank, len(dataset), config.world_size))
    if getattr(config, "scheduled_eval", False):
        from lhrs_bot_tpu.eval.scheduled import scheduler_generate

        def item_stream():
            for i in indices:
                it = dataset[i]
                trues.append(it["label"])
                yield {"input_ids": np.asarray(prompt_ids, np.int32),
                       "image": it["image"]}

        outs = scheduler_generate(
            cfg, engine, item_stream(), len(indices), gen_cfg=gen_cfg,
            max_batch=bs, logger=logger)
        preds += [tokenizer.decode(ids, skip_special_tokens=True)
                  for ids in outs]
    else:
        for start in range(0, len(indices), bs):
            chunk = indices[start:start + bs]
            items = [dataset[i] for i in chunk]
            images = np.stack([it["image"] for it in items])
            n = len(chunk)
            out = engine.generate(ids_batch[:n], lens[:n], images=images,
                                  gen_cfg=gen_cfg)
            preds += [tokenizer.decode(ids, skip_special_tokens=True)
                      for ids in out]
            trues += [it["label"] for it in items]
            if (start // bs) % 10 == 0:
                logger.info("eval %d/%d", start + n, len(indices))

    pred_idx = classname_to_idx(preds, class_to_idx)
    acc = balanced_accuracy(trues, pred_idx)
    logger.info("\n%s", classification_report_lines(
        trues, pred_idx, class_names))
    logger.info("balanced accuracy (mean per-class recall): %.4f", acc)
    return acc


if __name__ == "__main__":
    main()
