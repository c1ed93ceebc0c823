"""Independent torch oracle for the RN50 (ModifiedResNet) visual tower.

The ViT towers have an independent-implementation parity bar
(test_torch_oracle.py); until now the RN50 tower only self-tested shapes
and BN math in isolation.  This file implements OpenAI/OpenCLIP
ModifiedResNet semantics *directly in torch functional ops* from the
state dict — 3-conv anti-aliased stem, bottlenecks with avgpool-strided
paths (reference engine: open_clip ModifiedResNet, loaded via
utils/extras.py:138-171) — and requires:

  * eval-mode forward parity (running-stat BN) vs our Flax tower,
  * train-mode forward parity (batch-stat BN),
  * a CE finetune TRAJECTORY twin: per-step losses, every trained conv /
    BN-affine / attnpool weight, the head, logit_scale, AND the
    momentum-updated BN running statistics all match torch step for step
    (reference RN50 finetunes run model.train() with live BN).
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from swat_tpu.core.precision import FP32_PRECISION
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.configs import CLIPConfig, TextConfig
from swat_tpu.models.loader import torch_state_dict_to_params
from swat_tpu.models.resnet import ResNetConfig
from swat_tpu.train import steps as steps_mod
from swat_tpu.train.state import create_train_state

W = 16               # stem width; attnpool channels = W * 32
LAYERS = (1, 1, 1, 1)
IMG = 64
EMBED = 32
HEADS = 4
TW, TL, CTX, VOCAB = 32, 1, 12, 64
C = 4                # classes
B = 6                # batch
N_STEPS = 6
WARM = 2
LR_HEAD, LR_BB, WD = 1e-4, 1e-6, 1e-2   # the reference's finetune lrs
WARMUP_LR = 1e-6   # reference: 1e-6 when lr_backbone <= 5e-5 (:32)
ETA_MIN = 1e-9

CFG = CLIPConfig(
    name="rn-tiny-oracle",
    vision=ResNetConfig(image_size=IMG, width=W, layers=LAYERS,
                        embed_dim=EMBED, heads=HEADS),
    text=TextConfig(context_length=CTX, vocab_size=VOCAB, width=TW,
                    layers=TL, heads=4, embed_dim=EMBED, quick_gelu=True),
)


def make_rn50_sd(seed=0):
    """Random OpenCLIP-RN50-layout state dict at the tiny shape."""
    rng = np.random.default_rng(seed)
    sd = {}

    def bn(prefix, n):
        sd[f"{prefix}.weight"] = rng.normal(1, .05, (n,))
        sd[f"{prefix}.bias"] = rng.normal(0, .05, (n,))
        sd[f"{prefix}.running_mean"] = rng.normal(0, .05, (n,))
        sd[f"{prefix}.running_var"] = rng.uniform(.5, 1.5, (n,))

    sd["visual.conv1.weight"] = rng.normal(0, .05, (W // 2, 3, 3, 3))
    bn("visual.bn1", W // 2)
    sd["visual.conv2.weight"] = rng.normal(0, .05, (W // 2, W // 2, 3, 3))
    bn("visual.bn2", W // 2)
    sd["visual.conv3.weight"] = rng.normal(0, .05, (W, W // 2, 3, 3))
    bn("visual.bn3", W)

    inplanes, planes = W, W
    for stage, blocks in enumerate(LAYERS):
        for i in range(blocks):
            pre = f"visual.layer{stage + 1}.{i}"
            cin = inplanes if i == 0 else planes * 4
            sd[f"{pre}.conv1.weight"] = rng.normal(0, .05, (planes, cin, 1, 1))
            bn(f"{pre}.bn1", planes)
            sd[f"{pre}.conv2.weight"] = rng.normal(
                0, .05, (planes, planes, 3, 3))
            bn(f"{pre}.bn2", planes)
            sd[f"{pre}.conv3.weight"] = rng.normal(
                0, .05, (planes * 4, planes, 1, 1))
            bn(f"{pre}.bn3", planes * 4)
            if i == 0:
                sd[f"{pre}.downsample.0.weight"] = rng.normal(
                    0, .05, (planes * 4, cin, 1, 1))
                bn(f"{pre}.downsample.1", planes * 4)
        inplanes = planes * 4
        planes *= 2

    c = W * 32
    g = IMG // 32
    sd["visual.attnpool.positional_embedding"] = rng.normal(
        0, c ** -0.5, (g * g + 1, c))
    for name in ("q_proj", "k_proj", "v_proj"):
        sd[f"visual.attnpool.{name}.weight"] = rng.normal(0, .03, (c, c))
        sd[f"visual.attnpool.{name}.bias"] = rng.normal(0, .03, (c,))
    sd["visual.attnpool.c_proj.weight"] = rng.normal(0, .03, (EMBED, c))
    sd["visual.attnpool.c_proj.bias"] = rng.normal(0, .03, (EMBED,))

    sd["token_embedding.weight"] = rng.normal(0, .02, (VOCAB, TW))
    sd["positional_embedding"] = rng.normal(0, .01, (CTX, TW))
    sd["ln_final.weight"] = rng.normal(1, .02, (TW,))
    sd["ln_final.bias"] = rng.normal(0, .02, (TW,))
    sd["text_projection"] = rng.normal(0, .02, (TW, EMBED))
    sd["logit_scale"] = np.array(np.log(1 / .07))
    for i in range(TL):
        p = f"transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = rng.normal(1, .02, (TW,))
        sd[f"{p}.ln_1.bias"] = rng.normal(0, .02, (TW,))
        sd[f"{p}.ln_2.weight"] = rng.normal(1, .02, (TW,))
        sd[f"{p}.ln_2.bias"] = rng.normal(0, .02, (TW,))
        sd[f"{p}.attn.in_proj_weight"] = rng.normal(0, .02, (3 * TW, TW))
        sd[f"{p}.attn.in_proj_bias"] = rng.normal(0, .02, (3 * TW,))
        sd[f"{p}.attn.out_proj.weight"] = rng.normal(0, .02, (TW, TW))
        sd[f"{p}.attn.out_proj.bias"] = rng.normal(0, .02, (TW,))
        sd[f"{p}.mlp.c_fc.weight"] = rng.normal(0, .02, (4 * TW, TW))
        sd[f"{p}.mlp.c_fc.bias"] = rng.normal(0, .02, (4 * TW,))
        sd[f"{p}.mlp.c_proj.weight"] = rng.normal(0, .02, (TW, 4 * TW))
        sd[f"{p}.mlp.c_proj.bias"] = rng.normal(0, .02, (TW,))
    return {k: torch.tensor(np.asarray(v, np.float32)) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# torch functional ModifiedResNet (the independent oracle)


def _bn(x, sd, p, training):
    return TF.batch_norm(x, sd[p + ".running_mean"], sd[p + ".running_var"],
                         sd[p + ".weight"], sd[p + ".bias"],
                         training=training, momentum=0.1, eps=1e-5)


def _conv(x, w, stride=1):
    return TF.conv2d(x, w, None, stride, w.shape[-1] // 2)


def _bottleneck(x, sd, pre, stride, has_down, training):
    out = TF.relu(_bn(_conv(x, sd[pre + ".conv1.weight"]), sd,
                      pre + ".bn1", training))
    out = TF.relu(_bn(_conv(out, sd[pre + ".conv2.weight"]), sd,
                      pre + ".bn2", training))
    if stride > 1:
        out = TF.avg_pool2d(out, stride)
    out = _bn(_conv(out, sd[pre + ".conv3.weight"]), sd,
              pre + ".bn3", training)
    identity = x
    if has_down:
        if stride > 1:
            identity = TF.avg_pool2d(x, stride)
        identity = _bn(_conv(identity, sd[pre + ".downsample.0.weight"]),
                       sd, pre + ".downsample.1", training)
    return TF.relu(out + identity)


def _attnpool(x, sd):
    b, c, h, w = x.shape
    t = x.reshape(b, c, h * w).permute(0, 2, 1)          # [B, S, C]
    t = torch.cat([t.mean(dim=1, keepdim=True), t], dim=1)
    t = t + sd["visual.attnpool.positional_embedding"][None]
    q = TF.linear(t[:, :1], sd["visual.attnpool.q_proj.weight"],
                  sd["visual.attnpool.q_proj.bias"])
    k = TF.linear(t, sd["visual.attnpool.k_proj.weight"],
                  sd["visual.attnpool.k_proj.bias"])
    v = TF.linear(t, sd["visual.attnpool.v_proj.weight"],
                  sd["visual.attnpool.v_proj.bias"])
    hd = c // HEADS
    s = h * w + 1

    def hf(u, n):
        return u.reshape(b, n, HEADS, hd).permute(0, 2, 1, 3)

    q, k, v = hf(q, 1), hf(k, s), hf(v, s)
    attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), dim=-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
    return TF.linear(out, sd["visual.attnpool.c_proj.weight"],
                     sd["visual.attnpool.c_proj.bias"])


def oracle_rn50_encode_image(sd, images_nhwc, training=False,
                             normalize=True):
    """images [B, H, W, 3] (channels-last, like our tower) -> [B, EMBED]."""
    x = images_nhwc.permute(0, 3, 1, 2)
    x = TF.relu(_bn(_conv(x, sd["visual.conv1.weight"], 2), sd,
                    "visual.bn1", training))
    x = TF.relu(_bn(_conv(x, sd["visual.conv2.weight"]), sd,
                    "visual.bn2", training))
    x = TF.relu(_bn(_conv(x, sd["visual.conv3.weight"]), sd,
                    "visual.bn3", training))
    x = TF.avg_pool2d(x, 2)
    for stage, blocks in enumerate(LAYERS):
        stride = 1 if stage == 0 else 2
        for i in range(blocks):
            x = _bottleneck(x, sd, f"visual.layer{stage + 1}.{i}",
                            stride if i == 0 else 1, i == 0, training)
    feats = _attnpool(x, sd)
    if normalize:
        feats = feats / feats.norm(dim=-1, keepdim=True)
    return feats


# ---------------------------------------------------------------------------


def _jax_params(sd):
    return torch_state_dict_to_params(
        {k: v.clone() for k, v in sd.items()}, 0, TL)


def test_rn50_forward_matches_torch_oracle():
    sd = make_rn50_sd(seed=3)
    g = torch.Generator().manual_seed(5)
    images = torch.randn(B, IMG, IMG, 3, generator=g)

    params, _ = _jax_params(sd)
    model = CLIPModel(CFG, precision=FP32_PRECISION)

    # eval mode: running-stat BN
    ours = np.asarray(model.apply({"params": params},
                                  jnp.asarray(images.numpy()), True,
                                  method=CLIPModel.encode_image))
    with torch.no_grad():
        ref = oracle_rn50_encode_image(
            {k: v.clone() for k, v in sd.items()}, images).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)

    # train mode: batch-stat BN drives normalization
    ours_t = np.asarray(model.apply(
        {"params": params}, jnp.asarray(images.numpy()),
        method=CLIPModel.encode_image, normalize=True, train=True,
        mutable=["intermediates"])[0])
    with torch.no_grad():
        ref_t = oracle_rn50_encode_image(
            {k: v.clone() for k, v in sd.items()}, images,
            training=True).numpy()
    np.testing.assert_allclose(ours_t, ref_t, rtol=2e-4, atol=2e-5)
    # and the two modes genuinely differ (batch stats != running stats)
    assert np.abs(ours_t - ours).max() > 1e-4


def _ref_lr(i, base):
    if i == 0:
        return WARMUP_LR
    if i < WARM:
        return base * i / WARM
    s = i - (WARM - 1)
    return ETA_MIN + (base - ETA_MIN) * 0.5 * (
        1.0 + math.cos(math.pi * s / N_STEPS))


def test_rn50_ce_trajectory_matches_torch():
    sd0 = make_rn50_sd(seed=7)
    g = torch.Generator().manual_seed(9)
    images = torch.randn(B, IMG, IMG, 3, generator=g)
    labels = torch.randint(0, C, (B,), generator=g)
    head0 = torch.randn(C, EMBED, generator=g) * 0.05

    # -- torch twin: visual trainables (conv weights, BN affines,
    # attnpool) at lr_backbone; running stats are BUFFERS (never in the
    # optimizer, updated in place by F.batch_norm); head + logit_scale
    # at lr_classifier; text tower frozen
    sd = {k: v.clone().detach() for k, v in sd0.items()}
    vis_params = []
    for k, v in sd.items():
        if k.startswith("visual.") and "running_" not in k:
            v.requires_grad_(True)
            vis_params.append(v)
    head = head0.clone().detach().requires_grad_(True)
    logit_scale = sd["logit_scale"].clone().detach().requires_grad_(True)
    opt = torch.optim.AdamW(
        [{"params": vis_params, "lr": LR_BB},
         {"params": [head, logit_scale], "lr": LR_HEAD}],
        betas=(0.9, 0.999), eps=1e-8, weight_decay=WD)
    t_losses = []
    for i in range(N_STEPS):
        for group, base in zip(opt.param_groups, (LR_BB, LR_HEAD)):
            group["lr"] = _ref_lr(i, base)
        opt.zero_grad()
        feats = oracle_rn50_encode_image(sd, images, training=True)
        logits = logit_scale.exp() * (feats @ head.T)
        loss = torch.nn.functional.cross_entropy(logits, labels)
        loss.backward()
        opt.step()
        t_losses.append(loss.item())
    t_sd = {k: v.detach().numpy() for k, v in sd.items()}

    # -- our production CE step on the RN50 tower
    params, ls0 = _jax_params(sd0)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    state, tx = create_train_state(
        params, head0.numpy(), "finetune", lr_classifier=LR_HEAD,
        lr_backbone=LR_BB, total_iter=N_STEPS, wd=WD,
        logit_scale=ls0, warmup_iter=WARM)
    step = steps_mod.make_ce_step(model, tx, image_size=IMG)
    batch = {"images": jnp.asarray(images.numpy()),
             "labels": jnp.asarray(labels.numpy()),
             "source": jnp.zeros((B,), jnp.int32)}
    j_losses = []
    for _ in range(N_STEPS):
        state, loss = step(state, batch, jax.random.PRNGKey(0))
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(state.logit_scale),
                               logit_scale.item(), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.head),
                               head.detach().numpy(), rtol=0, atol=2e-5)

    from swat_tpu.models.loader import params_to_torch_state_dict

    j_sd = params_to_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, jax.device_get(state.model)),
        float(state.logit_scale))
    moved = 0
    for k, ref in t_sd.items():
        if k == "logit_scale":
            continue
        if k.startswith("visual."):
            tol = dict(rtol=0, atol=5e-5)
            np.testing.assert_allclose(j_sd[k], ref, err_msg=k, **tol)
            if np.abs(ref - sd0[k].numpy()).max() > 0:
                moved += 1
        else:
            np.testing.assert_array_equal(j_sd[k], sd0[k].numpy(),
                                          err_msg=k)
    # weights AND running stats both genuinely moved
    assert moved > 10
    assert np.abs(t_sd["visual.bn1.running_mean"]
                  - sd0["visual.bn1.running_mean"].numpy()).max() > 0
