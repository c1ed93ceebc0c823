#!/bin/bash
# REAL-Prompt zero-shot over all datasets (reference batch_REAL-Prompt.sh).
for dataset in semi-aves flowers102 fgvc-aircraft eurosat dtd oxford_pets food101 stanford_cars imagenet; do
  bash "$(dirname "$0")/run_dataset_zeroshot.sh" "$dataset"
done
