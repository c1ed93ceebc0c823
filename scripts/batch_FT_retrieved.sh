#!/bin/bash
# 9-dataset sweep (reference batch_FT_retrieved.sh).
for dataset in semi-aves flowers102 fgvc-aircraft eurosat dtd oxford_pets food101 stanford_cars imagenet; do
  bash "$(dirname "$0")/run_dataset_seed_finetune_retrieved.sh" "$dataset"
done
