#!/bin/bash
# SWAT sweep: method x data_source x shots x seed, accumulating each run's
# one-line CSV summary into results/{folder}/{dataset}.csv — drives
# swat_tpu exactly like the reference harness drives main.py
# (reference scripts/run_dataset_seed_SWAT.sh).
#
# Usage: bash scripts/run_dataset_seed_SWAT.sh <dataset> [seed]

methods=("cutmix")                       # SWAT stage-1 uses CutMix
data_sources=("fewshot+retrieved")
folder="swat_vitb32_T2T500"
cls_inits=("REAL-Prompt")
shot_values=(4 8 16)
retrieval_splits=("T2T500")
batch_size=32
epochs=50
model_cfg="vitb32_openclip_laion400m"
log_mode="both"

if [ "$#" -ge 1 ]; then
    datasets=("$1")
else
    datasets=("semi-aves")
fi
if [ "$#" -ge 2 ]; then
    seeds=("$2")
else
    seeds=(1 2 3)
fi

# ImageNet trains 10 epochs (reference convention)
if [ "${datasets[0]}" == "imagenet" ]; then
    epochs=10
fi

output_folder="output/$folder"
mkdir -p "$output_folder" "results/${folder}"
output_file="results/${folder}/${datasets[0]}.csv"
echo "Dataset,Method,DataSource,Init,Shots,Seed,Retrieve,Stage1Acc,WSFTAcc,Stage2LPAcc,Stage2FSFTAcc" > "$output_file"

for dataset in "${datasets[@]}"; do
 for method in "${methods[@]}"; do
  for data_source in "${data_sources[@]}"; do
   for shots in "${shot_values[@]}"; do
    for init in "${cls_inits[@]}"; do
     for seed in "${seeds[@]}"; do
      for retrieval_split in "${retrieval_splits[@]}"; do
        echo "Running: $dataset $method $data_source $init $shots $seed $retrieval_split"
        output=$(python -m swat_tpu.cli.main --dataset "$dataset" \
            --method "$method" --data_source "$data_source" \
            --cls_init "$init" --shots "$shots" --seed "$seed" \
            --epochs "$epochs" --bsz "$batch_size" --log_mode "$log_mode" \
            --retrieval_split "${retrieval_split}.txt" \
            --model_cfg "$model_cfg" --folder "$output_folder" \
            ${SWAT_EXTRA_ARGS} | tail -1)
        echo "$output"
        echo "$output" >> "$output_file"
      done
     done
    done
   done
  done
 done
done
