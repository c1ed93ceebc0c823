#!/bin/bash
# REAL-Prompt zero-shot (reference run_dataset_REAL-Prompt.sh): zeroshot
# with cls_init REAL-Prompt (the default) — covered by the zeroshot harness.
bash "$(dirname "$0")/run_dataset_zeroshot.sh" "${1:-semi-aves}"
