#!/bin/bash
# KD-QAT finetune — counterpart of LLM-QAT/run_train.sh (args: w a kv bits)
set -e
W=${1:-2}; A=${2:-32}; KV=${3:-32}
MODEL=${4:?usage: qat_train.sh w_bits a_bits kv_bits <hf-model-dir>}
python -m mxq_tpu.cli train --model "$MODEL" \
    --w_bits "$W" --a_bits "$A" --kv_bits "$KV" \
    --use_kd --lr 2e-5 --batch_size 2 --block_size 2048 \
    --save_steps 1000 --output_dir out/qat-w${W}a${A}kv${KV}
