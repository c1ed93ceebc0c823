"""Torch-only OpenCLIP oracle: an INDEPENDENT torch implementation of the
OpenCLIP forward (written from the architecture spec — quickgelu, pre-LN,
eps=1e-5, torch in_proj conventions) plus a seeded OpenCLIP-format state
dict generator.

Split out of test_torch_oracle.py so the reference-shim harness
(tests/reference_shims/) can import the oracle math into a subprocess that
executes /root/reference/main.py without dragging jax/swat_tpu along.
test_torch_oracle.py re-exports everything, so existing importers keep
working.
"""

import math

import numpy as np
import torch

W, LAYERS, HEADS, EMBED = 64, 2, 4, 48
PATCH, IMG = 16, 32
CTX, VOCAB = 12, 100


def _attn(x, sd, pre, n_heads=None):
    """torch F.multi_head_attention_forward semantics: qkv from
    in_proj_weight [3D, D] (y = x @ W^T + b), per-head softmax."""
    n_heads = HEADS if n_heads is None else n_heads
    d = x.shape[-1]
    hd = d // n_heads
    qkv = x @ sd[f"{pre}.attn.in_proj_weight"].T + \
        sd[f"{pre}.attn.in_proj_bias"]
    q, k, v = qkv.chunk(3, dim=-1)

    def heads(t):  # [B, S, D] -> [B, H, S, hd]
        b, s, _ = t.shape
        return t.reshape(b, s, n_heads, hd).transpose(1, 2)

    q, k, v = heads(q), heads(k), heads(v)
    scores = q @ k.transpose(-1, -2) / math.sqrt(hd)
    if pre.startswith("transformer."):  # text tower is causal
        s = scores.shape[-1]
        mask = torch.triu(torch.full((s, s), float("-inf")), diagonal=1)
        scores = scores + mask
    p = scores.softmax(dim=-1)
    o = (p @ v).transpose(1, 2).reshape(x.shape)
    return o @ sd[f"{pre}.attn.out_proj.weight"].T + \
        sd[f"{pre}.attn.out_proj.bias"]


def _ln(x, sd, name):
    return torch.nn.functional.layer_norm(
        x, (x.shape[-1],), sd[f"{name}.weight"], sd[f"{name}.bias"], 1e-5)


def _block(x, sd, pre, n_heads=None):
    x = x + _attn(_ln(x, sd, f"{pre}.ln_1"), sd, pre, n_heads)
    h = _ln(x, sd, f"{pre}.ln_2")
    h = h @ sd[f"{pre}.mlp.c_fc.weight"].T + sd[f"{pre}.mlp.c_fc.bias"]
    h = h * torch.sigmoid(1.702 * h)            # quickgelu
    return x + h @ sd[f"{pre}.mlp.c_proj.weight"].T + \
        sd[f"{pre}.mlp.c_proj.bias"]


def oracle_encode_image(sd, images, layers=None, n_heads=None, patch=None,
                        normalize=True):
    """images [B, H, W, 3] float -> features (OpenCLIP
    VisionTransformer.forward).  Dims default to the tiny module
    constants; pass layers/n_heads/patch to run at other scales
    (e.g. the full ViT-B/32 twin in test_torch_twin_fullscale.py).
    normalize=False returns the raw projected features — what the real
    OpenCLIP model.encode_image returns (the reference normalizes at
    every call site, e.g. utils/training.py:332-333)."""
    layers = LAYERS if layers is None else layers
    patch = PATCH if patch is None else patch
    x = torch.nn.functional.conv2d(
        images.permute(0, 3, 1, 2), sd["visual.conv1.weight"],
        stride=patch)                            # [B, W, gh, gw]
    b, w, gh, gw = x.shape
    x = x.reshape(b, w, gh * gw).permute(0, 2, 1)
    cls = sd["visual.class_embedding"].expand(b, 1, w)
    x = torch.cat([cls, x], dim=1) + sd["visual.positional_embedding"]
    x = _ln(x, sd, "visual.ln_pre")
    for i in range(layers):
        x = _block(x, sd, f"visual.transformer.resblocks.{i}", n_heads)
    x = _ln(x[:, 0], sd, "visual.ln_post") @ sd["visual.proj"]
    if normalize:
        x = x / x.norm(dim=-1, keepdim=True)
    return x


def oracle_encode_text(sd, tokens, layers=None, n_heads=None,
                       normalize=True):
    layers = LAYERS if layers is None else layers
    x = sd["token_embedding.weight"][tokens] + sd["positional_embedding"]
    for i in range(layers):
        x = _block(x, sd, f"transformer.resblocks.{i}", n_heads)
    x = _ln(x, sd, "ln_final")
    eot = tokens.argmax(dim=-1)
    x = x[torch.arange(x.shape[0]), eot] @ sd["text_projection"]
    if normalize:
        x = x / x.norm(dim=-1, keepdim=True)
    return x


def make_oracle_sd(seed: int = 7, w=W, layers=LAYERS, embed=EMBED,
                   patch=PATCH, img=IMG, ctx=CTX, vocab=VOCAB,
                   text_w=None, text_layers=None):
    """Random OpenCLIP-format state dict.  Defaults produce the tiny
    shared-width towers the unit twins use; pass real dims (e.g.
    w=768, text_w=512, layers=12, patch=32, img=224) for full-scale."""
    text_w = w if text_w is None else text_w
    text_layers = layers if text_layers is None else text_layers
    g = torch.Generator().manual_seed(seed)

    def r(*shape, scale=0.05):
        return torch.randn(*shape, generator=g) * scale

    sd = {
        "visual.conv1.weight": r(w, 3, patch, patch),
        "visual.class_embedding": r(w),
        "visual.positional_embedding": r((img // patch) ** 2 + 1, w),
        "visual.ln_pre.weight": 1 + r(w), "visual.ln_pre.bias": r(w),
        "visual.ln_post.weight": 1 + r(w), "visual.ln_post.bias": r(w),
        "visual.proj": r(w, embed),
        "token_embedding.weight": r(vocab, text_w),
        "positional_embedding": r(ctx, text_w),
        "ln_final.weight": 1 + r(text_w), "ln_final.bias": r(text_w),
        "text_projection": r(text_w, embed),
        "logit_scale": torch.tensor(float(np.log(1 / 0.07))),
    }
    for tower, n, tw in [("visual.transformer", layers, w),
                         ("transformer", text_layers, text_w)]:
        for i in range(n):
            p = f"{tower}.resblocks.{i}"
            sd.update({
                f"{p}.ln_1.weight": 1 + r(tw), f"{p}.ln_1.bias": r(tw),
                f"{p}.ln_2.weight": 1 + r(tw), f"{p}.ln_2.bias": r(tw),
                f"{p}.attn.in_proj_weight": r(3 * tw, tw, scale=0.1),
                f"{p}.attn.in_proj_bias": r(3 * tw),
                f"{p}.attn.out_proj.weight": r(tw, tw, scale=0.1),
                f"{p}.attn.out_proj.bias": r(tw),
                f"{p}.mlp.c_fc.weight": r(4 * tw, tw, scale=0.1),
                f"{p}.mlp.c_fc.bias": r(4 * tw),
                f"{p}.mlp.c_proj.weight": r(tw, 4 * tw, scale=0.1),
                f"{p}.mlp.c_proj.bias": r(tw),
            })
    return sd
