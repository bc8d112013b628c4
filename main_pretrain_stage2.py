"""Stage-2 pretraining: multi-task instruction tuning with LoRA.

Parity with the reference main_pretrain_stage2.py (diff-identical skeleton to
stage 1; LoRA r=128/α=256 on all decoder linears, AdamW, llava_llama_2
prompts, checkpoint period 100).

Run: python main_pretrain_stage2.py -c Config/multi_modal_stage2.yaml \
       --model-path out_stage1/FINAL.pt --data-path <dir>
"""

from __future__ import annotations


def main():
    from lhrs_bot_tpu.core.bootstrap import parse_config

    config = parse_config("LHRS-Bot TPU stage-2 pretraining")
    if "ckpt_period" not in config:
        config["ckpt_period"] = 100

    import main_pretrain_stage1

    main_pretrain_stage1.main(config)


if __name__ == "__main__":
    main()
