"""Remote-sensing caption eval (RSICD/UCM/Sydney/NWPU/TextRS formats).

The reference evaluates captions only through pycocoevalcap inside its
training hooks; there is no standalone caption entry point. This one
completes the eval surface: batched greedy generation over CapEvalDataset
(format sniffers per lhrs/Dataset/cap_dataset.py:263-327), per-rank shard
merge (main_vqa.py:31-61 protocol), and BLEU-1..4 / CIDEr-D / ROUGE-L from
the dependency-free scorer (eval/caption.py; pycocoevalcap is absent on
this image).

Run: python main_caption.py -c Config/multi_modal_eval.yaml \
       --model-path <FINAL.pt> --data-path <image root> \
       --data-target <annotation json>
"""

from __future__ import annotations

from main_vqa import save_result


def main():
    from lhrs_bot_tpu.core.bootstrap import (
        build_engine, build_model_and_tokenizer, parse_config, setup)
    from lhrs_bot_tpu.data import conversation as conv_lib
    from lhrs_bot_tpu.data.datasets import CapEvalDataset
    from lhrs_bot_tpu.eval.caption import caption_eval
    from lhrs_bot_tpu.serve.engine import GenerationConfig

    import numpy as np

    from lhrs_bot_tpu.data.preprocess import tokenizer_image_token
    from lhrs_bot_tpu.models.constants import DEFAULT_IMAGE_TOKEN

    config = parse_config("LHRS-Bot TPU caption eval")
    logger = setup(config)

    cfg, params, tokenizer = build_model_and_tokenizer(config, eval_mode=True)
    engine = build_engine(cfg, params, config)
    template = getattr(config, "prompt_template", "llava_llama_2")
    conv_lib.set_default_conversation(template)

    dataset = CapEvalDataset(
        config.data_path, config.data_target, tokenizer,
        image_size=int(config.rgb_vision.input_size[0]))
    # one shared instruction prompt (training-time caption protocol,
    # eval/protocols.py make_caption_eval_fn)
    conv = conv_lib.conv_templates[template].copy()
    conv.append_message(conv.roles[0],
                        DEFAULT_IMAGE_TOKEN + "\nDescribe the image "
                        "concisely.")
    conv.append_message(conv.roles[1], None)
    prompt_ids = tokenizer_image_token(conv.get_prompt(), tokenizer)
    gen_cfg = GenerationConfig(
        max_new_tokens=60, do_sample=False,
        eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id)

    bs = int(config.batch_size)
    indices = list(range(config.rank, len(dataset), config.world_size))
    records = []
    if getattr(config, "scheduled_eval", False):
        from lhrs_bot_tpu.eval.scheduled import scheduler_generate

        metas = []

        def item_stream():
            for i in indices:
                it = dataset[i]
                metas.append({"target": it["caption"],
                              "filename": it["filename"]})
                yield {"input_ids": np.asarray(prompt_ids, np.int32),
                       "image": it["image"]}

        outs = scheduler_generate(
            cfg, engine, item_stream(), len(indices), gen_cfg=gen_cfg,
            max_batch=bs, logger=logger)
        for meta, oids in zip(metas, outs):
            records.append({
                "pred": tokenizer.decode(oids, skip_special_tokens=True),
                **meta,
            })
    else:
        for start in range(0, len(indices), bs):
            items = [dataset[i] for i in indices[start:start + bs]]
            b = len(items)
            ids = np.tile(np.asarray(prompt_ids, np.int32)[None], (b, 1))
            lens = np.full((b,), len(prompt_ids), np.int32)
            images = np.stack([it["image"] for it in items])
            out = engine.generate(ids, lens, images=images, gen_cfg=gen_cfg)
            for item, oids in zip(items, out):
                records.append({
                    "pred": tokenizer.decode(oids, skip_special_tokens=True),
                    "target": item["caption"],
                    "filename": item["filename"],
                })
            if (start // bs) % 10 == 0:
                logger.info("eval %d/%d", start + len(items), len(indices))

    merged = save_result(records, config.output, config.rank,
                         config.world_size, filename="caption_result")
    if merged is not None:
        scores = caption_eval([r["pred"] for r in merged],
                              [[r["target"]] for r in merged])
        for name, val in sorted(scores.items()):
            logger.info("%s: %.4f", name, val)
        return scores
    return None


if __name__ == "__main__":
    main()
