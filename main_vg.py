"""Visual grounding eval (DIOR-RSVG / RSVG).

Parity with the reference main_vg.py: generate ≤100 tokens, parse
"[x1, y1, x2, y2]" with the bbox regex, IoU@0.5 accuracy reported both over
parsed predictions and over all predictions (parse failures as misses).

Run: python main_vg.py -c Config/multi_modal_eval.yaml \
       --model-path <FINAL.pt> --data-path <img dir> \
       --data-target <DIOR_test.json>
"""

from __future__ import annotations


def main():
    import numpy as np

    from lhrs_bot_tpu.core.bootstrap import (
        build_engine, build_model_and_tokenizer, parse_config, setup)
    from lhrs_bot_tpu.data import conversation as conv_lib
    from lhrs_bot_tpu.data.collate import GenerationCollator
    from lhrs_bot_tpu.data.datasets import VGEvalDataset
    from lhrs_bot_tpu.eval.metrics import grounding_accuracy
    from lhrs_bot_tpu.serve.engine import GenerationConfig

    config = parse_config("LHRS-Bot TPU visual grounding eval")
    logger = setup(config)

    cfg, params, tokenizer = build_model_and_tokenizer(config, eval_mode=True)
    engine = build_engine(cfg, params, config)
    conv_lib.set_default_conversation(
        getattr(config, "prompt_template", "llava_llama_2"))

    dataset = VGEvalDataset(
        config.data_path, config.data_target, tokenizer,
        image_size=int(config.rgb_vision.input_size[0]),
        prompt_type=getattr(config, "prompt_template", "llava_llama_2"))
    collator = GenerationCollator(tokenizer, extra_keys=("target",))
    gen_cfg = GenerationConfig(
        max_new_tokens=100, do_sample=False,
        eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id)

    bs = int(config.batch_size)
    indices = list(range(config.rank, len(dataset), config.world_size))
    preds, targets = [], []
    if getattr(config, "scheduled_eval", False):
        from lhrs_bot_tpu.eval.scheduled import scheduler_generate

        def item_stream():
            for i in indices:
                it = dataset[i]
                targets.append(it["target"])
                yield it

        outs = scheduler_generate(
            cfg, engine, item_stream(), len(indices), gen_cfg=gen_cfg,
            max_batch=bs, logger=logger)
        preds += [tokenizer.decode(ids, skip_special_tokens=True)
                  for ids in outs]
    else:
        for start in range(0, len(indices), bs):
            items = [dataset[i] for i in indices[start:start + bs]]
            batch = collator(items)
            out = engine.generate(batch["input_ids"], batch["seq_lens"],
                                  images=batch["images"], gen_cfg=gen_cfg)
            preds += [tokenizer.decode(ids, skip_special_tokens=True)
                      for ids in out]
            targets += [it["target"] for it in items]
            if (start // bs) % 10 == 0:
                logger.info("eval %d/%d", start + len(items), len(indices))

    # merge per-rank shards before scoring (main_vqa-style protocol)
    from lhrs_bot_tpu.parallel.distribute import all_gather_object

    gathered = all_gather_object({"preds": preds, "targets": targets})
    if config.rank != 0:
        return None
    preds = [p for shard in gathered for p in shard["preds"]]
    targets = [t for shard in gathered for t in shard["targets"]]

    res = grounding_accuracy(preds, targets)
    logger.info("IoU@0.5 accuracy (parsed preds): %.4f",
                res["accuracy_parsed"])
    logger.info("IoU@0.5 accuracy (all preds):    %.4f", res["accuracy_all"])
    logger.info("parse failures: %d / %d", res["parse_failures"], len(preds))
    return res


if __name__ == "__main__":
    main()
