#!/bin/bash
# MXQ PTQ sweep for Llama-2-13B — counterpart of mxq_quant/scripts/llama_13b.sh
set -e
MODEL=${1:?usage: ptq_llama_13b.sh <hf-model-dir> [tokenizer]}
TOK=${2:-$MODEL}
python -m mxq_tpu.cli ptq --model "$MODEL" --tokenizer "$TOK" \
    --preset llama2_13b --nsamples 128 --seqlen 2048 --mode packed \
    --save_model out/llama13b-mxq
python -m mxq_tpu.cli eval-tasks --model out/llama13b-mxq --tokenizer "$TOK" \
    --preset llama2_13b --tasks piqa,winogrande,hellaswag,arc_easy
