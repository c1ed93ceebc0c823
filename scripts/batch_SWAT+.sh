#!/bin/bash
# 9-dataset sweep (reference batch_SWAT+.sh).
for dataset in semi-aves flowers102 fgvc-aircraft eurosat dtd oxford_pets food101 stanford_cars imagenet; do
  bash "$(dirname "$0")/run_dataset_seed_SWAT+.sh" "$dataset"
done
