#!/bin/bash
# Half-retrieved / half-fewshot batches (reference
# run_dataset_seed_finetune_mixed.sh).
dataset=${1:-semi-aves}
folder="output/finetune_mixed"
mkdir -p "$folder" results/finetune_mixed
out="results/finetune_mixed/${dataset}.csv"
echo "Dataset,Method,DataSource,Init,Shots,Seed,Retrieve,Stage1Acc,WSFTAcc,Stage2LPAcc,Stage2FSFTAcc" > "$out"
for shots in 4 8 16; do
 for seed in ${2:-1 2 3}; do
  output=$(python -m swat_tpu.cli.main --dataset "$dataset" \
      --method finetune-mixed --data_source fewshot+retrieved \
      --shots "$shots" --seed "$seed" --epochs 50 --bsz 32 \
      --retrieval_split T2T500.txt --folder "$folder" \
      --log_mode both ${SWAT_EXTRA_ARGS} | tail -1)
  echo "$output"; echo "$output" >> "$out"
 done
done
