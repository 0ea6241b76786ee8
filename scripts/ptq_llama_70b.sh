#!/bin/bash
# MXQ PTQ sweep for Llama-2-70B (GQA) — counterpart of mxq_quant/scripts/llama_65b.sh;
# where the reference pins 5 GPUs via CUDA_VISIBLE_DEVICES, the TPU build
# shards the layer-sequential calibration over the default mesh (parallel/).
set -e
MODEL=${1:?usage: ptq_llama_70b.sh <hf-model-dir> [tokenizer]}
TOK=${2:-$MODEL}
python -m mxq_tpu.cli ptq --model "$MODEL" --tokenizer "$TOK" \
    --preset llama2_70b --nsamples 128 --seqlen 2048 --mode packed \
    --save_model out/llama70b-mxq
python -m mxq_tpu.cli eval-ppl --model out/llama70b-mxq --tokenizer "$TOK" \
    --preset llama2_70b
