#!/bin/bash
# Finetune on retrieved data only (reference
# run_dataset_seed_finetune_retrieved.sh).
dataset=${1:-semi-aves}
folder="output/finetune_retrieved"
mkdir -p "$folder" results/finetune_retrieved
out="results/finetune_retrieved/${dataset}.csv"
echo "Dataset,Method,DataSource,Init,Shots,Seed,Retrieve,Stage1Acc,WSFTAcc,Stage2LPAcc,Stage2FSFTAcc" > "$out"
for seed in ${2:-1 2 3}; do
  output=$(python -m swat_tpu.cli.main --dataset "$dataset" --method finetune \
      --data_source retrieved --seed "$seed" --epochs 50 --bsz 32 \
      --retrieval_split T2T500.txt --skip_stage2 --folder "$folder" \
      --log_mode both ${SWAT_EXTRA_ARGS} | tail -1)
  echo "$output"; echo "$output" >> "$out"
done
