"""Execute /root/reference/main.py under the shims, inside a sandbox.

usage: python run_reference.py <sandbox_dir> [--deterministic-train-aug]
           -- <main.py argv...>

The sandbox must contain the relative tree the reference expects from its
CWD: config.yml, data/<dataset>/{splits,images,metrics json,prompts/*.pth}.
Output lands wherever --folder points (pass a sandbox-relative folder).

--deterministic-train-aug replaces utils.extras.transform with the
deterministic eval-style preprocess for BOTH train and eval (explicit,
documented harness instrumentation): the trajectory differentials hold
augmentation fixed because torch-vs-jax augmentation RNG cannot be
lock-stepped (SURVEY §7); augmentation math has its own PIL-bit-exact
parity suite (tests/test_augment.py).
"""

import os
import runpy
import sys

REFERENCE = os.environ.get("SWAT_REFERENCE_DIR", "/root/reference")


def main():
    argv = sys.argv[1:]
    sandbox = argv.pop(0)
    det_aug = False
    if argv and argv[0] == "--deterministic-train-aug":
        det_aug = True
        argv.pop(0)
    assert argv and argv[0] == "--", f"expected -- before main args: {argv}"
    main_args = argv[1:]

    here = os.path.dirname(os.path.abspath(__file__))
    tests_dir = os.path.dirname(here)
    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, tests_dir)   # torch_oracle_lib
    sys.path.insert(0, here)        # shim_* modules

    import reference_shims

    reference_shims.install()

    head_npy = os.environ.get("SWAT_SHIM_DATASET_HEAD")
    if head_npy:
        # Documented harness instrumentation: the reference initializes
        # the dataset-cls head with torch's default (RNG-dependent)
        # nn.Linear init (utils/models.py:24-27) which a cross-framework
        # differential cannot reproduce — load harness-fixed weights so
        # both sides start from the same head and the TRAINING semantics
        # (source-as-label loop, validate_dataset) are what's compared.
        import numpy as _np
        import torch as _torch
        import utils.models as _models

        _orig_set_classifier = _models.set_classifier

        def _set_classifier(args, prompt_tensors, logger):
            head = _orig_set_classifier(args, prompt_tensors, logger)
            if getattr(args, "method", None) == "dataset-cls":
                w = _torch.from_numpy(_np.load(head_npy))
                with _torch.no_grad():
                    head.linear.weight.copy_(w)
            return head

        _models.set_classifier = _set_classifier

    if det_aug:
        import utils.extras as extras
        from shim_torchvision import (CenterCrop, Compose, Normalize,
                                      Resize, ToTensor)
        from PIL import Image

        def _det_transform(n_px, mode="train"):
            return Compose([
                Resize(n_px, interpolation=Image.BICUBIC),
                CenterCrop(n_px),
                lambda im: im.convert("RGB"),
                ToTensor(),
                Normalize((0.48145466, 0.4578275, 0.40821073),
                          (0.26862954, 0.26130258, 0.27577711)),
            ])

        extras.transform = _det_transform

    os.chdir(sandbox)
    sys.argv = ["main.py"] + main_args
    try:
        runpy.run_path(os.path.join(REFERENCE, "main.py"),
                       run_name="__main__")
    except SystemExit as e:   # the reference exit()s after zeroshot
        if e.code not in (None, 0):
            raise


if __name__ == "__main__":
    main()
