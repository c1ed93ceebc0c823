#!/bin/bash
# Linear probing / REAL-Linear sweeps (reference run_dataset_seed_probing.sh,
# run_dataset_REAL-Linear.sh).
# Usage: bash scripts/run_dataset_seed_probing.sh <dataset> [method] [seed]
dataset=${1:-semi-aves}
method=${2:-probing}    # probing | REAL-Linear | CMLP
folder="output/${method}_vitb32"
mkdir -p "$folder" "results/${method}_vitb32"
out="results/${method}_vitb32/${dataset}.csv"
echo "Dataset,Method,DataSource,Init,Shots,Seed,Retrieve,Stage1Acc,WSFTAcc,Stage2LPAcc,Stage2FSFTAcc" > "$out"
for shots in 4 8 16; do
 for seed in ${3:-1 2 3}; do
  output=$(python -m swat_tpu.cli.main --dataset "$dataset" --method "$method" \
      --data_source fewshot --shots "$shots" --seed "$seed" --epochs 50 \
      --skip_stage2 --folder "$folder" --log_mode both ${SWAT_EXTRA_ARGS} | tail -1)
  echo "$output"; echo "$output" >> "$out"
 done
done
