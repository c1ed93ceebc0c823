"""Minimal honest `torchvision` shim for executing /root/reference on a
box without torchvision installed (VERDICT r5 item 2).

Implements exactly the symbols the reference imports
(utils/extras.py:2,8, utils/datasets/dataset_utils.py:4,11,
utils/datasets/imagenet_1k.py:5): the CLIP preprocessing transforms as
faithful PIL implementations of torchvision's documented semantics, the
folder.default_loader, and an import-only Flowers102 placeholder (the
reference only ever references it from commented-out code paths).

Randomized transforms draw from torch's global generator so
set_training_seed (reference utils/training.py:10-20) makes reference
runs reproducible, matching real torchvision.
"""

import math
import types

import torch
from PIL import Image


class InterpolationMode:
    NEAREST = Image.NEAREST
    BILINEAR = Image.BILINEAR
    BICUBIC = Image.BICUBIC


def _interp(i):
    # accept PIL ints (the reference passes Image.BICUBIC) or our enum
    return int(i)


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x

    def __repr__(self):
        return f"Compose({self.transforms})"


class Resize:
    """int size -> shorter side resized to size, aspect preserved
    (torchvision semantics)."""

    def __init__(self, size, interpolation=Image.BILINEAR, **kw):
        self.size = size
        self.interpolation = _interp(interpolation)

    def __call__(self, img):
        if isinstance(self.size, (tuple, list)):
            h, w = self.size
            return img.resize((w, h), self.interpolation)
        w, h = img.size
        # torchvision _compute_resized_output_size TRUNCATES the long
        # side (int(), not round) — swat_tpu/data/transforms.py:39-45
        # matches the same rule, keeping both preprocesses bit-comparable
        if w < h:
            nw, nh = self.size, max(self.size, int(h * self.size / w))
        else:
            nw, nh = max(self.size, int(w * self.size / h)), self.size
        return img.resize((nw, nh), self.interpolation)


class CenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        th, tw = self.size
        w, h = img.size
        if w < tw or h < th:
            img = _pad_to(img, max(tw, w), max(th, h))
            w, h = img.size
        i = int(round((h - th) / 2.0))
        j = int(round((w - tw) / 2.0))
        return img.crop((j, i, j + tw, i + th))


def _pad_to(img, tw, th):
    out = Image.new(img.mode, (tw, th))
    out.paste(img, ((tw - img.size[0]) // 2, (th - img.size[1]) // 2))
    return out


class ToTensor:
    def __call__(self, img):
        import numpy as np

        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
        return t.float().div(255.0)


class Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean).view(-1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1)

    def __call__(self, t):
        return (t - self.mean) / self.std


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img):
        if torch.rand(1).item() < self.p:
            return img.transpose(Image.FLIP_LEFT_RIGHT)
        return img


class RandomResizedCrop:
    """torchvision get_params semantics: 10 trials of uniform-area /
    log-uniform-ratio boxes, center-crop fallback."""

    def __init__(self, size, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
                 interpolation=Image.BILINEAR, **kw):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.scale = scale
        self.ratio = ratio
        self.interpolation = _interp(interpolation)

    def get_params(self, img):
        w, h = img.size
        area = h * w
        log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
        for _ in range(10):
            target_area = area * torch.empty(1).uniform_(
                self.scale[0], self.scale[1]).item()
            aspect = math.exp(torch.empty(1).uniform_(*log_ratio).item())
            cw = int(round(math.sqrt(target_area * aspect)))
            ch = int(round(math.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                i = torch.randint(0, h - ch + 1, (1,)).item()
                j = torch.randint(0, w - cw + 1, (1,)).item()
                return i, j, ch, cw
        # fallback: center crop at the closest valid ratio
        in_ratio = w / h
        if in_ratio < self.ratio[0]:
            cw = w
            ch = int(round(cw / self.ratio[0]))
        elif in_ratio > self.ratio[1]:
            ch = h
            cw = int(round(ch * self.ratio[1]))
        else:
            cw, ch = w, h
        i = (h - ch) // 2
        j = (w - cw) // 2
        return i, j, ch, cw

    def __call__(self, img):
        i, j, ch, cw = self.get_params(img)
        img = img.crop((j, i, j + cw, i + ch))
        return img.resize((self.size[1], self.size[0]), self.interpolation)


class RandomCrop:
    def __init__(self, size, **kw):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        th, tw = self.size
        w, h = img.size
        i = torch.randint(0, max(h - th, 0) + 1, (1,)).item()
        j = torch.randint(0, max(w - tw, 0) + 1, (1,)).item()
        return img.crop((j, i, j + tw, i + th))


def default_loader(path):
    with open(path, "rb") as f:
        img = Image.open(f)
        return img.convert("RGB")


class Flowers102:
    """Import-only placeholder: referenced by commented-out code in
    utils/datasets/dataset_utils.py:30 only."""

    def __init__(self, *a, **kw):
        raise NotImplementedError("Flowers102 shim is import-only")


def build_modules():
    """Return {module_name: module} for sys.modules injection."""
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    datasets = types.ModuleType("torchvision.datasets")
    folder = types.ModuleType("torchvision.datasets.folder")

    for name, obj in (
        ("Compose", Compose), ("Resize", Resize),
        ("CenterCrop", CenterCrop), ("ToTensor", ToTensor),
        ("Normalize", Normalize),
        ("RandomResizedCrop", RandomResizedCrop),
        ("RandomHorizontalFlip", RandomHorizontalFlip),
        ("RandomCrop", RandomCrop),
        ("InterpolationMode", InterpolationMode),
    ):
        setattr(transforms, name, obj)

    folder.default_loader = default_loader
    datasets.folder = folder
    datasets.Flowers102 = Flowers102
    tv.transforms = transforms
    tv.datasets = datasets
    return {
        "torchvision": tv,
        "torchvision.transforms": transforms,
        "torchvision.datasets": datasets,
        "torchvision.datasets.folder": folder,
    }
