#!/bin/bash
# MXQ PTQ sweep for Llama-2-7B — counterpart of mxq_quant/scripts/llama_7b.sh
set -e
MODEL=${1:?usage: ptq_llama_7b.sh <hf-model-dir> [tokenizer]}
TOK=${2:-$MODEL}
python -m mxq_tpu.cli ptq --model "$MODEL" --tokenizer "$TOK" \
    --nsamples 128 --seqlen 2048 --mode packed \
    --save_model out/llama7b-mxq
python -m mxq_tpu.cli eval-tasks --model out/llama7b-mxq --tokenizer "$TOK" \
    --tasks piqa,winogrande,hellaswag,arc_easy
