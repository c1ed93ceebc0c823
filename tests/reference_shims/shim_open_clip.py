"""`open_clip` / `clip` shims: a real torch nn.Module CLIP whose
state-dict keys, module attributes, and forward math are the OpenCLIP
contract the reference programs against (utils/extras.py:138-171,
utils/optimizers.py:12-19,38-127, utils/models.py:85-146), with the
weights supplied by the harness through $SWAT_SHIM_CLIP.

The forward math is torch_oracle_lib's independent OpenCLIP oracle — the
same math the repo's JAX towers are parity-tested against
(tests/test_torch_oracle.py), so a reference run on this shim and a
swat_tpu run on the converted weights compute the same model.

The tokenizer reproduces swat_tpu.models.tokenizer.HashTokenizer
id-for-id (md5 word hash, sot=V-2 prefix, eot=V-1 suffix, zero pad,
truncate-with-EOT) WITHOUT importing swat_tpu (this module runs inside
the reference process); tests/test_reference_oracle.py asserts the two
stay identical.
"""

import hashlib
import html
import os
import types

import torch
from torch import nn

from torch_oracle_lib import oracle_encode_image, oracle_encode_text


# ---------------------------------------------------------------------------
# model


class _Node(nn.Module):
    pass


class ShimCLIP(nn.Module):
    """OpenCLIP-shaped torch module built from a flat OpenCLIP-format
    state dict: every dotted sd key becomes a real (sub)module path, so
    model.visual.parameters(), model.visual.proj, model.transformer,
    model.token_embedding, model.positional_embedding, model.ln_final,
    model.text_projection, state_dict(), load_state_dict(), and deepcopy
    all behave exactly as the reference expects of an OpenCLIP model."""

    def __init__(self, sd, vision_layers, vision_heads, patch,
                 text_layers, text_heads):
        super().__init__()
        self._dims = dict(vision_layers=vision_layers,
                          vision_heads=vision_heads, patch=patch,
                          text_layers=text_layers, text_heads=text_heads)
        for name, tensor in sd.items():
            parts = name.split(".")
            mod = self
            for p in parts[:-1]:
                if not hasattr(mod, p):
                    mod.add_module(p, _Node())
                mod = getattr(mod, p)
            mod.register_parameter(
                parts[-1], nn.Parameter(tensor.clone().detach()))

    def _sd(self):
        return dict(self.named_parameters())

    def encode_image(self, images):
        """images [B, 3, H, W] -> UNnormalized projected features
        (OpenCLIP encode_image default; the reference normalizes at every
        call site, e.g. utils/training.py:332-333)."""
        d = self._dims
        return oracle_encode_image(
            self._sd(), images.permute(0, 2, 3, 1),
            layers=d["vision_layers"], n_heads=d["vision_heads"],
            patch=d["patch"], normalize=False)

    def encode_text(self, tokens):
        d = self._dims
        return oracle_encode_text(
            self._sd(), tokens.long(), layers=d["text_layers"],
            n_heads=d["text_heads"], normalize=False)

    def forward(self, images, texts):
        img = self.encode_image(images)
        img = img / img.norm(dim=-1, keepdim=True)
        txt = self.encode_text(texts)
        txt = txt / txt.norm(dim=-1, keepdim=True)
        scale = self.logit_scale.exp()
        return scale * img @ txt.T, scale * txt @ img.T

    # nn.Module.__deepcopy__ default works; .float()/.to() inherited.


def load_shim_clip(path=None):
    """Load the bundle the harness wrote: {'sd': flat OpenCLIP sd,
    'vision_layers', 'vision_heads', 'patch', 'text_layers',
    'text_heads', 'vocab_size', 'context_length'}."""
    path = path or os.environ["SWAT_SHIM_CLIP"]
    bundle = torch.load(path, map_location="cpu", weights_only=False)
    model = ShimCLIP(bundle["sd"], bundle["vision_layers"],
                     bundle["vision_heads"], bundle["patch"],
                     bundle["text_layers"], bundle["text_heads"])
    return model, bundle


# ---------------------------------------------------------------------------
# tokenizer (HashTokenizer twin — see module docstring)


def _basic_clean(text):
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        import unicodedata

        text = unicodedata.normalize("NFC", text)
    text = html.unescape(html.unescape(text))
    return text.strip()


class ShimTokenizer:
    def __init__(self, vocab_size, context_length):
        self.vocab_size = vocab_size
        self.context_length = context_length
        self.sot_token = vocab_size - 2
        self.eot_token = vocab_size - 1

    def encode(self, text):
        words = " ".join(_basic_clean(text).split()).lower().split()
        ids = []
        for w in words:
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[:4],
                               "little")
            ids.append(1 + h % (self.vocab_size - 3))
        return ids

    def __call__(self, texts, context_length=None):
        ctx = context_length or self.context_length
        if isinstance(texts, str):
            texts = [texts]
        out = torch.zeros((len(texts), ctx), dtype=torch.long)
        for i, text in enumerate(texts):
            toks = [self.sot_token] + self.encode(text) + [self.eot_token]
            if len(toks) > ctx:
                toks = toks[:ctx]
                toks[-1] = self.eot_token
            out[i, : len(toks)] = torch.tensor(toks, dtype=torch.long)
        return out


# ---------------------------------------------------------------------------
# module surface


def _val_preprocess():
    from shim_torchvision import (CenterCrop, Compose, Normalize, Resize,
                                  ToTensor)
    from PIL import Image

    bundle = torch.load(os.environ["SWAT_SHIM_CLIP"], map_location="cpu",
                        weights_only=False)
    n_px = bundle["image_size"]
    return Compose([
        Resize(n_px, interpolation=Image.BICUBIC),
        CenterCrop(n_px),
        lambda im: im.convert("RGB"),
        ToTensor(),
        Normalize((0.48145466, 0.4578275, 0.40821073),
                  (0.26862954, 0.26130258, 0.27577711)),
    ])


def create_model_and_transforms(model_arch, pretrained=None, **kw):
    model, _ = load_shim_clip()
    val = _val_preprocess()
    return model, val, val


def get_tokenizer(model_arch):
    bundle = torch.load(os.environ["SWAT_SHIM_CLIP"], map_location="cpu",
                        weights_only=False)
    return ShimTokenizer(bundle["vocab_size"], bundle["context_length"])


def build_modules():
    oc = types.ModuleType("open_clip")
    oc.create_model_and_transforms = create_model_and_transforms
    oc.get_tokenizer = get_tokenizer
    oc.ShimCLIP = ShimCLIP
    oc.load_shim_clip = load_shim_clip

    cl = types.ModuleType("clip")

    def _clip_load(*a, **kw):
        raise NotImplementedError(
            "the shim harness drives OpenCLIP model_cfgs only")

    cl.load = _clip_load
    cl.tokenize = None  # set by install() once the bundle path is known
    return {"open_clip": oc, "clip": cl}
