"""RSVQA (LR/HR) visual question answering eval.

Parity with the reference main_vqa.py: "<image>[VQA] question" prompts,
greedy generation ≤50 tokens, count/area questions excluded at the dataset
level, per-rank JSON shard merge, EvalAI answer normalization + soft VQA
accuracy with per-type breakdown.

Run: python main_vqa.py -c Config/multi_modal_eval.yaml \
       --model-path <FINAL.pt> --data-path <RSVQA root> --data-target LR
"""

from __future__ import annotations

import json
import os


def save_result(records, output_dir: str, rank: int, world_size: int,
                filename: str = "vqa_result"):
    """Per-rank JSON shards merged by rank 0 (main_vqa.py:31-61)."""
    os.makedirs(output_dir, exist_ok=True)
    shard = os.path.join(output_dir, f"{filename}_rank{rank}.json")
    with open(shard, "w") as fh:
        json.dump(records, fh)
    if world_size > 1:
        import jax
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("vqa_save")
    if rank != 0:
        return None
    merged = []
    for r in range(world_size):
        p = os.path.join(output_dir, f"{filename}_rank{r}.json")
        with open(p) as fh:
            merged.extend(json.load(fh))
    final = os.path.join(output_dir, f"{filename}.json")
    with open(final, "w") as fh:
        json.dump(merged, fh)
    return merged


def main():
    import numpy as np

    from lhrs_bot_tpu.core.bootstrap import (
        build_engine, build_model_and_tokenizer, parse_config, setup)
    from lhrs_bot_tpu.data import conversation as conv_lib
    from lhrs_bot_tpu.data.collate import GenerationCollator
    from lhrs_bot_tpu.data.datasets import RSVQA_VARIANTS, RSVQADataset
    from lhrs_bot_tpu.eval.metrics import TextVQAAccuracyEvaluator

    from lhrs_bot_tpu.serve.engine import GenerationConfig

    config = parse_config("LHRS-Bot TPU RSVQA eval")
    logger = setup(config)

    cfg, params, tokenizer = build_model_and_tokenizer(config, eval_mode=True)
    engine = build_engine(cfg, params, config)
    conv_lib.set_default_conversation(
        getattr(config, "prompt_template", "llava_llama_2"))

    target = (getattr(config, "data_target", None) or "LR").upper()
    cls = RSVQA_VARIANTS.get(target)
    common = dict(image_size=int(config.rgb_vision.input_size[0]),
                  prompt_type=getattr(config, "prompt_template",
                                      "llava_llama_2"))
    if cls is not None:
        dataset = cls(config.data_path, tokenizer, **common)
    else:  # an explicit file prefix (back-compat escape hatch)
        dataset = RSVQADataset(config.data_path, tokenizer,
                               prefix=target, **common)
    collator = GenerationCollator(
        tokenizer, extra_keys=("target", "qtype", "question_id"))
    gen_cfg = GenerationConfig(
        max_new_tokens=50, do_sample=False,
        eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id)

    bs = int(config.batch_size)
    indices = list(range(config.rank, len(dataset), config.world_size))
    records = []
    if getattr(config, "scheduled_eval", False):
        # continuous batching: slots free at EOS, ragged answer lengths
        # stop costing worst-case decode (eval/scheduled.py)
        from lhrs_bot_tpu.eval.scheduled import scheduler_generate

        metas = []  # small metadata only; images stream lazily

        def item_stream():
            for i in indices:
                it = dataset[i]
                metas.append({k: it[k]
                              for k in ("target", "qtype", "question_id")})
                yield it

        outs = scheduler_generate(
            cfg, engine, item_stream(), len(indices), gen_cfg=gen_cfg,
            max_batch=bs, logger=logger)
        for item, ids in zip(metas, outs):
            records.append({
                "pred": tokenizer.decode(ids, skip_special_tokens=True),
                "target": item["target"],
                "types": item["qtype"],
                "question_id": int(item["question_id"]),
            })
    else:
        for start in range(0, len(indices), bs):
            items = [dataset[i] for i in indices[start:start + bs]]
            batch = collator(items)
            out = engine.generate(batch["input_ids"], batch["seq_lens"],
                                  images=batch["images"], gen_cfg=gen_cfg)
            for item, ids in zip(items, out):
                records.append({
                    "pred": tokenizer.decode(ids, skip_special_tokens=True),
                    "target": item["target"],
                    "types": item["qtype"],
                    "question_id": int(item["question_id"]),
                })
            if (start // bs) % 10 == 0:
                logger.info("eval %d/%d", start + len(items), len(indices))

    merged = save_result(records, config.output, config.rank,
                         config.world_size)
    if merged is not None:
        acc, per_type = TextVQAAccuracyEvaluator().eval_pred_list(merged)
        for qtype, score in sorted(per_type.items()):
            logger.info("%s: %.2f", qtype, 100.0 * score)
        logger.info("overall soft accuracy: %.4f", acc)
        return acc
    return None


if __name__ == "__main__":
    main()
