"""Shims that make /root/reference (tian1327/SWAT) EXECUTABLE in this
environment, so the reference's own code — not a re-reading of it — is
the differential oracle for training/orchestration semantics (VERDICT r5
item 2, the FTS5 lesson applied to the other 6,600 LoC).

Missing libraries shimmed: open_clip, clip, torchvision, torchmetrics
(torch, PIL, cv2, yaml, tqdm, pandas are real).  The CLIP model itself is
a real torch nn.Module over torch_oracle_lib's OpenCLIP math with
harness-supplied weights — the same oracle the JAX towers are
parity-tested against.

Environment instrumentation applied by install() (documented, explicit):
  * torch.Tensor.cuda -> identity: the reference hardcodes .cuda() in
    validate/features (testing.py:426,441, utils/features.py:30) even
    though utils/logger.py:43-47 falls back to device='cpu'.
  * torch.load -> weights_only=False: this image ships torch>=2.6 whose
    new default rejects the reference's numpy-bearing checkpoint bundles
    (utils/models.py:85-146 saves confusion matrices); the reference was
    written against the old default.
"""

import sys


def install():
    """Inject the shims into sys.modules + apply the documented
    instrumentation.  Idempotent."""
    import torch

    import shim_open_clip
    import shim_torchmetrics
    import shim_torchvision

    mods = {}
    mods.update(shim_torchvision.build_modules())
    mods.update(shim_torchmetrics.build_modules())
    mods.update(shim_open_clip.build_modules())
    for name, mod in mods.items():
        sys.modules.setdefault(name, mod)

    if not getattr(torch.Tensor.cuda, "_swat_shim", False):
        def _cuda(self, *a, **kw):
            return self

        _cuda._swat_shim = True
        torch.Tensor.cuda = _cuda

    if not getattr(torch.load, "_swat_shim", False):
        _orig_load = torch.load

        def _load(*a, **kw):
            kw.setdefault("weights_only", False)
            return _orig_load(*a, **kw)

        _load._swat_shim = True
        torch.load = _load

    # torch>=2.4 removed the `verbose` positional from
    # LRScheduler.__init__; the reference passes it positionally
    # (utils/optimizers.py:170).  Restore the old-signature acceptance.
    import inspect

    import torch.optim.lr_scheduler as lrs

    if not getattr(lrs.LRScheduler.__init__, "_swat_shim", False):
        _orig_sched_init = lrs.LRScheduler.__init__
        params = inspect.signature(_orig_sched_init).parameters
        if "verbose" not in params:
            def _sched_init(self, optimizer, last_epoch=-1,
                            verbose=False):
                _orig_sched_init(self, optimizer, last_epoch)

            _sched_init._swat_shim = True
            lrs.LRScheduler.__init__ = _sched_init
