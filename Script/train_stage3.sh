#!/usr/bin/env bash
set -e
python main_pretrain_stage3.py \
    -c Config/multi_modal_stage3.yaml \
    --model-path out_stage2/FINAL.pt \
    --data-path "${DATA_PATH:?set DATA_PATH}" \
    --output out_stage3 \
    --batch-size 4 \
    --workers 2 \
    --enable-amp True \
    --use-checkpoint \
    --auto-resume
