#!/usr/bin/env bash
# Stage-1 caption alignment on a TPU slice (single host shown; multi-host via
# the same command on every worker — jax.distributed picks up the topology).
set -e
python main_pretrain_stage1.py \
    -c Config/multi_modal_stage1.yaml \
    --data-path "${DATA_PATH:?set DATA_PATH}" \
    --output out_stage1 \
    --batch-size 8 \
    --workers 4 \
    --enable-amp True \
    --use-checkpoint \
    --auto-resume
