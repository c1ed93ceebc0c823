#!/bin/bash
# Cross-modal linear probing (reference run_dataset_seed_CMLP.sh).
bash "$(dirname "$0")/run_dataset_seed_probing.sh" "${1:-semi-aves}" CMLP "${2:-}"
