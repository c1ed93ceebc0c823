#!/bin/bash
# REAL-Linear: cross-modal probe w/ REAL-Prompt init (reference
# run_dataset_REAL-Linear.sh).
bash "$(dirname "$0")/run_dataset_seed_probing.sh" "${1:-semi-aves}" REAL-Linear "${2:-}"
