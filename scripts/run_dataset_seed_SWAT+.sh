#!/bin/bash
# SWAT+ = SWAT whose reported number is the stage-2 full finetune column
# (reference run_dataset_seed_SWAT+.sh). Same runs as SWAT; analysis reads
# Stage2FSFTAcc instead of Stage2LPAcc.
bash "$(dirname "$0")/run_dataset_seed_SWAT.sh" "$@"
