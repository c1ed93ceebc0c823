"""Shared helpers for the scripts/ benchmark harnesses."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_models_bsz(argv):
    """`[model_cfg ...] [--bsz N]` -> (model_cfgs, bsz_override or None)."""
    cfgs, bsz_over, i = [], None, 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--bsz"):
            if "=" in a:
                bsz_over = int(a.split("=")[1])
            else:
                bsz_over = int(argv[i + 1])
                i += 1
        else:
            cfgs.append(a)
        i += 1
    return cfgs, bsz_over


def default_bsz(model_cfg: str) -> int:
    """Largest per-model batch that fits one v5e chip (PARITY.md
    per-model table; L/14 additionally needs remat for training)."""
    if "vitb32" in model_cfg:
        return 256
    if "vitl14" in model_cfg:
        return 64
    return 128
