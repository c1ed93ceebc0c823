"""Checkpoint conversion CLI: OpenCLIP/CLIP torch ``.pt`` -> msgpack params.

The reference loads OpenCLIP checkpoints live through the open_clip library
(get_engine, reference utils/extras.py:138-171).  Here conversion is an
explicit offline step so runs never need torch on the TPU host:

    python -m swat_tpu.cli.convert --checkpoint vitb32_laion400m_e32.pt \
        --model_cfg vitb32_openclip_laion400m --output vitb32.msgpack

The output restores with `swat_tpu.train.checkpoint.load_bundle` and can be
passed to the training CLI as --checkpoint_path (the loader accepts both
raw torch files and converted msgpack bundles).

Round-trip validation: --verify re-exports the converted params back to a
torch state dict (loader.params_to_torch_state_dict) and checks every
tensor matches the source bit-for-bit.
"""

from __future__ import annotations

import argparse
import json


def convert(checkpoint: str, model_cfg: str, output: str,
            verify: bool = True, quantize: str = "none") -> dict:
    import numpy as np

    from swat_tpu.models.configs import get_model_config
    from swat_tpu.models.loader import (
        load_torch_checkpoint,
        params_to_torch_state_dict,
    )
    from swat_tpu.train.checkpoint import save_bundle

    cfg = get_model_config(model_cfg)
    params, logit_scale = load_torch_checkpoint(
        checkpoint, cfg.vision.layers, cfg.text.layers)

    report = {"model_cfg": model_cfg, "source": checkpoint,
              "logit_scale": float(logit_scale),
              "num_params": int(sum(
                  np.asarray(x).size
                  for x in _leaves(params)))}
    if verify:
        import torch

        sd = torch.load(checkpoint, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        elif hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        back = params_to_torch_state_dict(params, float(logit_scale))
        mismatched = []
        for k, v in back.items():
            if k not in sd:
                mismatched.append(f"missing {k}")
                continue
            a = np.asarray(v)
            b = sd[k].float().numpy()
            if a.shape != b.shape or not np.allclose(a, b, atol=0):
                mismatched.append(k)
        report["roundtrip_mismatches"] = mismatched
        if mismatched:
            raise ValueError(f"round-trip mismatch: {mismatched[:10]}")

    if quantize == "int8":
        # W8A8 serving bundle (models/quant.py): ~4x smaller on disk, drops
        # into every inference entry point unchanged (functional._qdot
        # dispatches on "kernel_q"); the torch round-trip check above runs
        # on the fp32 tree BEFORE quantization. Training warm-start from a
        # quantized bundle is refused by train.state.create_train_state.
        from swat_tpu.models.quant import quantize_tree

        params = quantize_tree(params)
        report["quantize"] = "int8"
    elif quantize != "none":
        raise ValueError(f"unknown quantize mode {quantize!r}")

    save_bundle(output, {"clip": params, "logit_scale": logit_scale},
                meta=report)
    return report


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def main(argv=None):
    p = argparse.ArgumentParser(description="swat-tpu checkpoint converter")
    p.add_argument("--checkpoint", required=True,
                   help="OpenCLIP/CLIP .pt/.bin state dict")
    p.add_argument("--model_cfg", default="vitb32_openclip_laion400m")
    p.add_argument("--output", required=True, help="msgpack bundle path")
    p.add_argument("--no_verify", action="store_true",
                   help="skip the torch round-trip check")
    p.add_argument("--quantize", default="none", choices=["none", "int8"],
                   help="int8 = write a W8A8 inference bundle "
                        "(models/quant.py): ~4x smaller, eval-only")
    args = p.parse_args(argv)
    report = convert(args.checkpoint, args.model_cfg, args.output,
                     verify=not args.no_verify, quantize=args.quantize)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
