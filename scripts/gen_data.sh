#!/bin/bash
# parallel data synthesis — counterpart of LLM-QAT/generate_data.py 64-way sharding
set -e
MODEL=${1:?usage: gen_data.sh <hf-model-dir> [num_chunks]}
N=${2:-8}
for i in $(seq 0 $((N-1))); do
  python -m mxq_tpu.cli generate-data --model "$MODEL" --chunk_id "$i" \
      --num_seeds 64 --length 2048 --out_dir out/gen_data
done
python -m mxq_tpu.cli generate-data --model "$MODEL" --chunk_id 0 \
    --num_seeds 1 --length 8 --out_dir out/gen_data --merge
