#!/bin/bash
# Plain few-shot finetune, no mixing (reference
# run_dataset_seed_finetune_fewshot.sh).
dataset=${1:-semi-aves}
folder="output/finetune_fewshot"
mkdir -p "$folder" results/finetune_fewshot
out="results/finetune_fewshot/${dataset}.csv"
echo "Dataset,Method,DataSource,Init,Shots,Seed,Retrieve,Stage1Acc,WSFTAcc,Stage2LPAcc,Stage2FSFTAcc" > "$out"
for shots in 4 8 16; do
 for seed in ${2:-1 2 3}; do
  output=$(python -m swat_tpu.cli.main --dataset "$dataset" --method finetune \
      --data_source fewshot --shots "$shots" --seed "$seed" --epochs 50 \
      --bsz 32 --skip_stage2 --folder "$folder" --log_mode both ${SWAT_EXTRA_ARGS} | tail -1)
  echo "$output"; echo "$output" >> "$out"
 done
done
