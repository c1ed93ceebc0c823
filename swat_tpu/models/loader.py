"""OpenCLIP / CLIP torch-checkpoint → Flax parameter conversion.

The reference obtains pretrained towers via ``open_clip.create_model_and_
transforms`` (reference utils/extras.py:155).  Here we read the raw torch
state dict (no open_clip dependency) and rename/transpose/stack into the
`swat_tpu.models.clip.CLIPModel` layout:

torch (OpenCLIP ``CLIP`` class)           flax (this repo)
---------------------------------------   ------------------------------------
visual.conv1.weight [w,3,p,p]             visual/patch_embed/kernel [p*p*3, w]
visual.class_embedding                    visual/class_embedding
visual.positional_embedding               visual/positional_embedding
visual.ln_pre.{weight,bias}               visual/ln_pre/ln/{scale,bias}
visual.transformer.resblocks.N.*          visual/transformer/blocks/* (stacked on axis 0)
  .attn.in_proj_weight [3d,d]             attn/qkv/kernel [N,d,3d]  (transposed)
  .attn.out_proj.weight [d,d]             attn/out/kernel [N,d,d]   (transposed)
  .mlp.c_fc.weight [4d,d]                 mlp/fc/kernel  [N,d,4d]   (transposed)
  .mlp.c_proj.weight [d,4d]               mlp/proj/kernel [N,4d,d]  (transposed)
  .ln_1/.ln_2.{weight,bias}               ln_1/ln, ln_2/ln {scale,bias}
visual.ln_post / visual.proj              visual/ln_post, visual/proj
token_embedding.weight                    text/token_embedding
positional_embedding                      text/positional_embedding
transformer.resblocks.N.*                 text/transformer/blocks/*
ln_final.{weight,bias}                    text/ln_final/ln/{scale,bias}
text_projection                           text/text_projection
logit_scale                               returned separately

The reverse conversion (`params_to_torch_state_dict`) round-trips for
checkpoint export / parity testing.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _convert_blocks(sd: Mapping[str, Any], prefix: str, layers: int) -> dict:
    """Stack per-layer resblock weights along a leading ``layers`` axis."""

    def stack(fmt, transpose=False):
        mats = [_np(sd[fmt.format(i)]).astype(np.float32) for i in range(layers)]
        if transpose:
            mats = [m.T for m in mats]
        return np.stack(mats, axis=0)

    return {
        "ln_1": {"ln": {"scale": stack(prefix + "{}.ln_1.weight"),
                        "bias": stack(prefix + "{}.ln_1.bias")}},
        "ln_2": {"ln": {"scale": stack(prefix + "{}.ln_2.weight"),
                        "bias": stack(prefix + "{}.ln_2.bias")}},
        "attn": {
            "qkv": {"kernel": stack(prefix + "{}.attn.in_proj_weight", True),
                    "bias": stack(prefix + "{}.attn.in_proj_bias")},
            "out": {"kernel": stack(prefix + "{}.attn.out_proj.weight", True),
                    "bias": stack(prefix + "{}.attn.out_proj.bias")},
        },
        "mlp": {
            "fc": {"kernel": stack(prefix + "{}.mlp.c_fc.weight", True),
                   "bias": stack(prefix + "{}.mlp.c_fc.bias")},
            "proj": {"kernel": stack(prefix + "{}.mlp.c_proj.weight", True),
                     "bias": stack(prefix + "{}.mlp.c_proj.bias")},
        },
    }


def torch_state_dict_to_params(sd: Mapping[str, Any],
                               vision_layers: int,
                               text_layers: int) -> tuple[dict, float]:
    """Returns (flax params dict, logit_scale scalar)."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    if "visual.layer1.0.conv1.weight" in sd:  # ModifiedResNet visual tower
        params = {
            "visual": torch_rn50_visual_to_params(sd),
            "text": {
                "token_embedding": _np(
                    sd["token_embedding.weight"]).astype(np.float32),
                "positional_embedding": _np(
                    sd["positional_embedding"]).astype(np.float32),
                "ln_final": {"ln": {
                    "scale": _np(sd["ln_final.weight"]).astype(np.float32),
                    "bias": _np(sd["ln_final.bias"]).astype(np.float32)}},
                "text_projection": _np(
                    sd["text_projection"]).astype(np.float32),
                "transformer": {"blocks": _convert_blocks(
                    sd, "transformer.resblocks.", text_layers)},
            },
        }
        return params, float(_np(sd["logit_scale"]).reshape(()))

    conv1 = _np(sd["visual.conv1.weight"]).astype(np.float32)  # [w,3,p,p]
    w, c, p, _ = conv1.shape
    # (out,in,kh,kw) -> (kh,kw,in) flattened, matching the NHWC unfold order
    patch_kernel = conv1.transpose(2, 3, 1, 0).reshape(p * p * c, w)

    def ln(name):
        return {"ln": {"scale": _np(sd[f"{name}.weight"]).astype(np.float32),
                       "bias": _np(sd[f"{name}.bias"]).astype(np.float32)}}

    params = {
        "visual": {
            "patch_embed": {"kernel": patch_kernel},
            "class_embedding": _np(sd["visual.class_embedding"]).astype(np.float32),
            "positional_embedding": _np(sd["visual.positional_embedding"]).astype(np.float32),
            "ln_pre": ln("visual.ln_pre"),
            "ln_post": ln("visual.ln_post"),
            "proj": _np(sd["visual.proj"]).astype(np.float32),
            "transformer": {"blocks": _convert_blocks(
                sd, "visual.transformer.resblocks.", vision_layers)},
        },
        "text": {
            "token_embedding": _np(sd["token_embedding.weight"]).astype(np.float32),
            "positional_embedding": _np(sd["positional_embedding"]).astype(np.float32),
            "ln_final": ln("ln_final"),
            "text_projection": _np(sd["text_projection"]).astype(np.float32),
            "transformer": {"blocks": _convert_blocks(
                sd, "transformer.resblocks.", text_layers)},
        },
    }
    logit_scale = float(_np(sd["logit_scale"]).reshape(()))
    return params, logit_scale


def _rn50_visual_to_torch(vis: Mapping[str, Any],
                          out: dict) -> None:
    """Inverse of torch_rn50_visual_to_params."""
    def put_conv(flax_conv, key):
        out[key] = np.asarray(
            flax_conv["conv"]["kernel"], np.float32).transpose(3, 2, 0, 1)

    def put_bn(flax_bn, prefix):
        out[f"{prefix}.weight"] = np.asarray(flax_bn["scale"])
        out[f"{prefix}.bias"] = np.asarray(flax_bn["bias"])
        out[f"{prefix}.running_mean"] = np.asarray(flax_bn["mean"])
        out[f"{prefix}.running_var"] = np.asarray(flax_bn["var"])

    for i in (1, 2, 3):
        put_conv(vis[f"conv{i}"], f"visual.conv{i}.weight")
        put_bn(vis[f"bn{i}"], f"visual.bn{i}")
    for name, blk in vis.items():
        if not name.startswith("layer"):
            continue
        stage_block = name[len("layer"):]         # e.g. "2_0"
        stage, idx = stage_block.split("_")
        pre = f"visual.layer{stage}.{idx}"
        for j in (1, 2, 3):
            put_conv(blk[f"conv{j}"], f"{pre}.conv{j}.weight")
            put_bn(blk[f"bn{j}"], f"{pre}.bn{j}")
        if "down_conv" in blk:
            put_conv(blk["down_conv"], f"{pre}.downsample.0.weight")
            put_bn(blk["down_bn"], f"{pre}.downsample.1")
    ap = vis["attnpool"]
    out["visual.attnpool.positional_embedding"] = np.asarray(
        ap["positional_embedding"])
    for name in ("q_proj", "k_proj", "v_proj", "c_proj"):
        out[f"visual.attnpool.{name}.weight"] = np.asarray(
            ap[name]["kernel"]).T
        out[f"visual.attnpool.{name}.bias"] = np.asarray(ap[name]["bias"])


def params_to_torch_state_dict(params: Mapping[str, Any],
                               logit_scale: float) -> dict:
    """Inverse of `torch_state_dict_to_params` (numpy arrays as values),
    for both ViT and ModifiedResNet visual towers."""
    out: dict[str, np.ndarray] = {}
    vis, txt = params["visual"], params["text"]

    out["token_embedding.weight"] = np.asarray(txt["token_embedding"])
    out["positional_embedding"] = np.asarray(txt["positional_embedding"])
    out["text_projection"] = np.asarray(txt["text_projection"])
    out["logit_scale"] = np.asarray(logit_scale, dtype=np.float32)

    vis_lns = []
    if "patch_embed" in vis:   # ViT tower
        k = np.asarray(vis["patch_embed"]["kernel"], dtype=np.float32)
        ppc, w = k.shape
        side = int(round((ppc // 3) ** 0.5))
        out["visual.conv1.weight"] = (
            k.reshape(side, side, 3, w).transpose(3, 2, 0, 1))
        out["visual.class_embedding"] = np.asarray(vis["class_embedding"])
        out["visual.positional_embedding"] = np.asarray(
            vis["positional_embedding"])
        out["visual.proj"] = np.asarray(vis["proj"])
        vis_lns = [(vis["ln_pre"], "visual.ln_pre"),
                   (vis["ln_post"], "visual.ln_post")]
        vis_blocks = [(vis["transformer"]["blocks"],
                       "visual.transformer.resblocks.")]
    else:                      # ModifiedResNet tower
        _rn50_visual_to_torch(vis, out)
        vis_blocks = []

    for flax_ln, torch_ln in vis_lns + [(txt["ln_final"], "ln_final")]:
        out[f"{torch_ln}.weight"] = np.asarray(flax_ln["ln"]["scale"])
        out[f"{torch_ln}.bias"] = np.asarray(flax_ln["ln"]["bias"])

    for blocks, prefix in vis_blocks + [
        (txt["transformer"]["blocks"], "transformer.resblocks."),
    ]:
        n = np.asarray(blocks["ln_1"]["ln"]["scale"]).shape[0]
        for i in range(n):
            pre = f"{prefix}{i}"
            out[f"{pre}.ln_1.weight"] = np.asarray(blocks["ln_1"]["ln"]["scale"])[i]
            out[f"{pre}.ln_1.bias"] = np.asarray(blocks["ln_1"]["ln"]["bias"])[i]
            out[f"{pre}.ln_2.weight"] = np.asarray(blocks["ln_2"]["ln"]["scale"])[i]
            out[f"{pre}.ln_2.bias"] = np.asarray(blocks["ln_2"]["ln"]["bias"])[i]
            out[f"{pre}.attn.in_proj_weight"] = np.asarray(
                blocks["attn"]["qkv"]["kernel"])[i].T
            out[f"{pre}.attn.in_proj_bias"] = np.asarray(
                blocks["attn"]["qkv"]["bias"])[i]
            out[f"{pre}.attn.out_proj.weight"] = np.asarray(
                blocks["attn"]["out"]["kernel"])[i].T
            out[f"{pre}.attn.out_proj.bias"] = np.asarray(
                blocks["attn"]["out"]["bias"])[i]
            out[f"{pre}.mlp.c_fc.weight"] = np.asarray(
                blocks["mlp"]["fc"]["kernel"])[i].T
            out[f"{pre}.mlp.c_fc.bias"] = np.asarray(
                blocks["mlp"]["fc"]["bias"])[i]
            out[f"{pre}.mlp.c_proj.weight"] = np.asarray(
                blocks["mlp"]["proj"]["kernel"])[i].T
            out[f"{pre}.mlp.c_proj.bias"] = np.asarray(
                blocks["mlp"]["proj"]["bias"])[i]
    return out


def fold_bn(sd: Mapping[str, Any], prefix: str, eps: float = 1e-5):
    """BatchNorm -> frozen-stats affine: a = gamma/sqrt(var+eps),
    b = beta - mean*a.  Retained as the eval-equivalence oracle for
    AffineBN's running-stat path (tests/test_resnet.py)."""
    gamma = _np(sd[f"{prefix}.weight"]).astype(np.float32)
    beta = _np(sd[f"{prefix}.bias"]).astype(np.float32)
    mean = _np(sd[f"{prefix}.running_mean"]).astype(np.float32)
    var = _np(sd[f"{prefix}.running_var"]).astype(np.float32)
    a = gamma / np.sqrt(var + eps)
    return {"scale": a, "bias": beta - mean * a}


def bn_params(sd: Mapping[str, Any], prefix: str):
    """torch BatchNorm tensors -> AffineBN params: gamma/beta plus the
    running statistics as frozen params leaves (batch-stat training reads
    and momentum-updates them; eval normalizes by them)."""
    return {"scale": _np(sd[f"{prefix}.weight"]).astype(np.float32),
            "bias": _np(sd[f"{prefix}.bias"]).astype(np.float32),
            "mean": _np(sd[f"{prefix}.running_mean"]).astype(np.float32),
            "var": _np(sd[f"{prefix}.running_var"]).astype(np.float32)}


def _conv_kernel(sd, key):
    # torch [out, in, kh, kw] -> flax [kh, kw, in, out]
    return {"conv": {"kernel": _np(sd[key]).astype(np.float32)
                     .transpose(2, 3, 1, 0)}}


def torch_rn50_visual_to_params(sd: Mapping[str, Any],
                                layers=None) -> dict:
    """OpenCLIP ModifiedResNet visual state dict -> flax params
    (swat_tpu.models.resnet.ModifiedResNet layout).  ``layers`` (blocks
    per stage) is inferred from the state dict when not given, so RN50's
    (3,4,6,3), RN101's (3,4,23,3), and tiny test towers all load."""
    if layers is None:
        layers = tuple(
            1 + max(int(k.split(".")[2]) for k in sd
                    if k.startswith(f"visual.layer{s}."))
            for s in (1, 2, 3, 4))
    v: dict = {}
    for i in (1, 2, 3):
        v[f"conv{i}"] = _conv_kernel(sd, f"visual.conv{i}.weight")
        v[f"bn{i}"] = bn_params(sd, f"visual.bn{i}")
    for stage, blocks in enumerate(layers):
        for i in range(blocks):
            pre = f"visual.layer{stage + 1}.{i}"
            blk = {}
            for j in (1, 2, 3):
                blk[f"conv{j}"] = _conv_kernel(sd, f"{pre}.conv{j}.weight")
                blk[f"bn{j}"] = bn_params(sd, f"{pre}.bn{j}")
            if f"{pre}.downsample.0.weight" in sd:
                blk["down_conv"] = _conv_kernel(
                    sd, f"{pre}.downsample.0.weight")
                blk["down_bn"] = bn_params(sd, f"{pre}.downsample.1")
            v[f"layer{stage + 1}_{i}"] = blk
    ap = "visual.attnpool"
    v["attnpool"] = {
        "positional_embedding": _np(
            sd[f"{ap}.positional_embedding"]).astype(np.float32),
    }
    for name in ("q_proj", "k_proj", "v_proj", "c_proj"):
        v["attnpool"][name] = {
            "kernel": _np(sd[f"{ap}.{name}.weight"]).astype(np.float32).T,
            "bias": _np(sd[f"{ap}.{name}.bias"]).astype(np.float32),
        }
    return v


def load_torch_checkpoint(path: str, vision_layers: int, text_layers: int):
    """Load pretrained weights: an OpenCLIP/CLIP torch ``.pt``/``.bin``
    state dict, or a converted msgpack bundle from
    ``python -m swat_tpu.cli.convert`` (no torch needed on the TPU host)."""
    if path.endswith(".msgpack"):
        from swat_tpu.train.checkpoint import load_bundle

        arrays, _ = load_bundle(path)
        return arrays["clip"], float(np.asarray(arrays["logit_scale"]))
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    elif hasattr(ckpt, "state_dict"):  # jit-scripted archive
        ckpt = ckpt.state_dict()
    return torch_state_dict_to_params(ckpt, vision_layers, text_layers)
