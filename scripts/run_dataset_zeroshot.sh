#!/bin/bash
# Zero-shot eval (reference scripts/run_dataset_zeroshot.sh).
# Usage: bash scripts/run_dataset_zeroshot.sh <dataset>
dataset=${1:-semi-aves}
folder="output/zeroshot"
mkdir -p "$folder" results/zeroshot
out="results/zeroshot/${dataset}.csv"
echo "Dataset,Method,DataSource,Init,Shots,Seed,Retrieve,ZSAcc" > "$out"
for init in "text" "REAL-Prompt"; do
  output=$(python -m swat_tpu.cli.main --dataset "$dataset" --method zeroshot \
      --cls_init "$init" --folder "$folder" --log_mode both ${SWAT_EXTRA_ARGS} | tail -1)
  echo "$output"; echo "$output" >> "$out"
done
