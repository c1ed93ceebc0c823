#!/bin/bash
# Few-shot finetune with CutMix (reference
# run_dataset_seed_finetune_fewshot_cutmix.sh).
dataset=${1:-semi-aves}
folder="output/finetune_fewshot_cutmix"
mkdir -p "$folder" results/finetune_fewshot_cutmix
out="results/finetune_fewshot_cutmix/${dataset}.csv"
echo "Dataset,Method,DataSource,Init,Shots,Seed,Retrieve,Stage1Acc,WSFTAcc,Stage2LPAcc,Stage2FSFTAcc" > "$out"
for shots in 4 8 16; do
 for seed in ${2:-1 2 3}; do
  output=$(python -m swat_tpu.cli.main --dataset "$dataset" --method cutmix \
      --data_source fewshot --shots "$shots" --seed "$seed" --epochs 50 \
      --bsz 32 --skip_stage2 --folder "$folder" --log_mode both ${SWAT_EXTRA_ARGS} | tail -1)
  echo "$output"; echo "$output" >> "$out"
 done
done
