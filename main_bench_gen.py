"""LHRS-Bench multiple-choice eval.

Parity with the reference main_bench_gen.py: per-image multiple-choice QA,
prompt = "<image>\\n" + question + "\\nChoices: " + choices +
" Answer from the given choices with A., B., C., D., etc.",
greedy ≤10 tokens, normalized-answer match, per-question-type + total
accuracy.

Run: python main_bench_gen.py -c Config/multi_modal_eval.yaml \
       --model-path <FINAL.pt> --data-path <img dir> \
       --data-target <bench.json>
"""

from __future__ import annotations


def main():
    import numpy as np

    from lhrs_bot_tpu.core.bootstrap import (
        build_engine, build_model_and_tokenizer, parse_config, setup)
    from lhrs_bot_tpu.data import conversation as conv_lib
    from lhrs_bot_tpu.data.collate import GenerationCollator
    from lhrs_bot_tpu.data.datasets import LHRSBenchDataset
    from lhrs_bot_tpu.data.preprocess import tokenizer_image_token
    from lhrs_bot_tpu.eval.metrics import bench_accuracy
    from lhrs_bot_tpu.models.constants import DEFAULT_IMAGE_TOKEN
    from lhrs_bot_tpu.serve.engine import GenerationConfig

    config = parse_config("LHRS-Bot TPU LHRS-Bench eval")
    logger = setup(config)

    cfg, params, tokenizer = build_model_and_tokenizer(config, eval_mode=True)
    engine = build_engine(cfg, params, config)
    conv_lib.set_default_conversation(
        getattr(config, "prompt_template", "llava_llama_2"))

    dataset = LHRSBenchDataset(config.data_path, config.data_target,
                               image_size=int(config.rgb_vision.input_size[0]))
    gen_cfg = GenerationConfig(
        max_new_tokens=10, do_sample=False,
        eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id)
    collator = GenerationCollator(
        tokenizer, extra_keys=("answer", "type"))

    def prompt_ids(question: str, choices: str):
        inp = (DEFAULT_IMAGE_TOKEN + "\n" + question + "\nChoices: "
               + choices + " Answer from the given choices with A., B., C., "
               "D., etc.")
        conv = conv_lib.default_conversation.copy()
        conv.append_message(conv.roles[0], inp)
        conv.append_message(conv.roles[1], None)
        return tokenizer_image_token(conv.get_prompt(), tokenizer)

    bs = int(config.batch_size)
    indices = list(range(config.rank, len(dataset), config.world_size))
    records = []
    if getattr(config, "scheduled_eval", False):
        from lhrs_bot_tpu.eval.scheduled import scheduler_generate

        metas = []

        def item_stream():
            for i in indices:
                item = dataset[i]
                metas.append({"answer": item["answer"],
                              "qtype": item["type"]})
                yield {"input_ids": np.asarray(
                    prompt_ids(item["question"], item["choices"])),
                    "image": item["image"]}

        outs = scheduler_generate(
            cfg, engine, item_stream(), len(indices), gen_cfg=gen_cfg,
            max_batch=bs, logger=logger)
        for meta, ids in zip(metas, outs):
            records.append({
                "pred": tokenizer.decode(
                    ids, skip_special_tokens=True).strip(),
                "answer": meta["answer"],
                "qtype": meta["qtype"],
            })
    else:
        for start in range(0, len(indices), bs):
            items = []
            for i in indices[start:start + bs]:
                item = dataset[i]
                item["input_ids"] = np.asarray(
                    prompt_ids(item["question"], item["choices"]))
                items.append(item)
            batch = collator(items)
            out = engine.generate(batch["input_ids"], batch["seq_lens"],
                                  images=batch["images"], gen_cfg=gen_cfg)
            for item, ids in zip(items, out):
                records.append({
                    "pred": tokenizer.decode(ids, skip_special_tokens=True)
                    .strip(),
                    "answer": item["answer"],
                    "qtype": item["type"],
                })
            if (start // bs) % 10 == 0:
                logger.info("eval %d/%d", start + len(items), len(indices))

    from lhrs_bot_tpu.parallel.distribute import all_gather_object

    gathered = all_gather_object(records)
    if config.rank != 0:
        return None
    records = [r for shard in gathered for r in shard]

    total, per_type = bench_accuracy(records)
    id_to_type = dataset.id_to_type
    for qtype, score in sorted(per_type.items()):
        name = id_to_type.get(str(qtype), str(qtype))
        logger.info("%s: %.2f", name, 100.0 * score)
    logger.info("total accuracy: %.4f", total)
    return total


if __name__ == "__main__":
    main()
