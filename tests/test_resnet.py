"""RN50 tower: loader conversion from an OpenCLIP-format RN50 state dict,
forward shapes, BN folding math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from swat_tpu.core.precision import FP32_PRECISION
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.configs import get_model_config
from swat_tpu.models.loader import fold_bn, torch_state_dict_to_params


def _rn50_sd(rng):
    """Random weights in OpenCLIP RN50 state-dict layout (small text)."""
    sd = {}

    def bn(prefix, n):
        sd[f"{prefix}.weight"] = rng.normal(1, .02, (n,))
        sd[f"{prefix}.bias"] = rng.normal(0, .02, (n,))
        sd[f"{prefix}.running_mean"] = rng.normal(0, .02, (n,))
        sd[f"{prefix}.running_var"] = rng.uniform(.5, 1.5, (n,))

    w = 64
    sd["visual.conv1.weight"] = rng.normal(0, .02, (w // 2, 3, 3, 3))
    bn("visual.bn1", w // 2)
    sd["visual.conv2.weight"] = rng.normal(0, .02, (w // 2, w // 2, 3, 3))
    bn("visual.bn2", w // 2)
    sd["visual.conv3.weight"] = rng.normal(0, .02, (w, w // 2, 3, 3))
    bn("visual.bn3", w)

    inplanes = w
    planes = w
    for stage, blocks in enumerate((3, 4, 6, 3)):
        for i in range(blocks):
            pre = f"visual.layer{stage + 1}.{i}"
            cin = inplanes if i == 0 else planes * 4
            sd[f"{pre}.conv1.weight"] = rng.normal(0, .02, (planes, cin, 1, 1))
            bn(f"{pre}.bn1", planes)
            sd[f"{pre}.conv2.weight"] = rng.normal(0, .02, (planes, planes, 3, 3))
            bn(f"{pre}.bn2", planes)
            sd[f"{pre}.conv3.weight"] = rng.normal(0, .02, (planes * 4, planes, 1, 1))
            bn(f"{pre}.bn3", planes * 4)
            if i == 0:
                sd[f"{pre}.downsample.0.weight"] = rng.normal(
                    0, .02, (planes * 4, cin, 1, 1))
                bn(f"{pre}.downsample.1", planes * 4)
        inplanes = planes * 4
        planes *= 2

    c = w * 32
    g = 224 // 32
    sd["visual.attnpool.positional_embedding"] = rng.normal(
        0, .02, (g * g + 1, c))
    for name in ("q_proj", "k_proj", "v_proj"):
        sd[f"visual.attnpool.{name}.weight"] = rng.normal(0, .02, (c, c))
        sd[f"visual.attnpool.{name}.bias"] = rng.normal(0, .02, (c,))
    sd["visual.attnpool.c_proj.weight"] = rng.normal(0, .02, (1024, c))
    sd["visual.attnpool.c_proj.bias"] = rng.normal(0, .02, (1024,))

    # text tower (12 layers, width 512)
    tw, tl = 512, 12
    sd["token_embedding.weight"] = rng.normal(0, .02, (49408, tw))
    sd["positional_embedding"] = rng.normal(0, .01, (77, tw))
    sd["ln_final.weight"] = rng.normal(1, .02, (tw,))
    sd["ln_final.bias"] = rng.normal(0, .02, (tw,))
    sd["text_projection"] = rng.normal(0, .02, (tw, 1024))
    sd["logit_scale"] = np.array(np.log(1 / .07))
    for i in range(tl):
        p = f"transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = rng.normal(1, .02, (tw,))
        sd[f"{p}.ln_1.bias"] = rng.normal(0, .02, (tw,))
        sd[f"{p}.ln_2.weight"] = rng.normal(1, .02, (tw,))
        sd[f"{p}.ln_2.bias"] = rng.normal(0, .02, (tw,))
        sd[f"{p}.attn.in_proj_weight"] = rng.normal(0, .02, (3 * tw, tw))
        sd[f"{p}.attn.in_proj_bias"] = rng.normal(0, .02, (3 * tw,))
        sd[f"{p}.attn.out_proj.weight"] = rng.normal(0, .02, (tw, tw))
        sd[f"{p}.attn.out_proj.bias"] = rng.normal(0, .02, (tw,))
        sd[f"{p}.mlp.c_fc.weight"] = rng.normal(0, .02, (4 * tw, tw))
        sd[f"{p}.mlp.c_fc.bias"] = rng.normal(0, .02, (4 * tw,))
        sd[f"{p}.mlp.c_proj.weight"] = rng.normal(0, .02, (tw, 4 * tw))
        sd[f"{p}.mlp.c_proj.bias"] = rng.normal(0, .02, (tw,))
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def test_fold_bn_math(rng):
    sd = {"x.weight": np.array([2.0], np.float32),
          "x.bias": np.array([1.0], np.float32),
          "x.running_mean": np.array([0.5], np.float32),
          "x.running_var": np.array([4.0], np.float32)}
    ab = fold_bn(sd, "x")
    x = np.array([3.0], np.float32)
    expected = (x - 0.5) / np.sqrt(4.0 + 1e-5) * 2.0 + 1.0
    np.testing.assert_allclose(x * ab["scale"] + ab["bias"], expected,
                               rtol=1e-6)


def test_rn50_load_and_forward(rng):
    cfg = get_model_config("rn50_openclip_openai")
    sd = _rn50_sd(rng)
    params, logit_scale = torch_state_dict_to_params(sd, 0, 12)
    model = CLIPModel(cfg, precision=FP32_PRECISION)

    # structure must match a fresh init
    init_params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32))["params"]
    s1 = jax.tree_util.tree_map(lambda x: x.shape, init_params)
    s2 = jax.tree_util.tree_map(lambda x: np.asarray(x).shape, params)
    assert s1 == s2

    images = jnp.asarray(rng.normal(size=(2, 224, 224, 3)), jnp.float32)
    feats = model.apply({"params": params}, images, True,
                        method=CLIPModel.encode_image)
    assert feats.shape == (2, 1024)
    assert bool(jnp.isfinite(feats).all())
    txt = model.apply(
        {"params": params},
        jnp.zeros((2, 77), jnp.int32).at[:, 0].set(49406).at[:, 5].set(49407),
        True, method=CLIPModel.encode_text)
    assert txt.shape == (2, 1024)


def test_affine_bn_train_matches_torch(rng):
    """AffineBN train-mode normalization AND the sown running-stat
    updates must reproduce torch.nn.BatchNorm2d (momentum 0.1, unbiased
    running var) — VERDICT r2 item 6."""
    import torch

    from swat_tpu.models.resnet import AffineBN

    c = 8
    x = rng.normal(size=(4, 5, 5, c)).astype(np.float32)
    gamma = rng.normal(1, 0.1, c).astype(np.float32)
    beta = rng.normal(0, 0.1, c).astype(np.float32)
    r_mean = rng.normal(0, 0.1, c).astype(np.float32)
    r_var = rng.uniform(0.5, 1.5, c).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(gamma))
        tbn.bias.copy_(torch.tensor(beta))
        tbn.running_mean.copy_(torch.tensor(r_mean))
        tbn.running_var.copy_(torch.tensor(r_var))
    tbn.train()
    tx = torch.tensor(x).permute(0, 3, 1, 2)
    ty = tbn(tx).permute(0, 2, 3, 1).detach().numpy()

    bn = AffineBN(c, FP32_PRECISION)
    params = {"scale": gamma, "bias": beta, "mean": r_mean, "var": r_var}
    y, inter = bn.apply({"params": params}, jnp.asarray(x), True,
                        mutable=["intermediates"])
    np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-4, atol=1e-5)
    sown = inter["intermediates"]
    np.testing.assert_allclose(np.asarray(sown["new_mean"][0]),
                               tbn.running_mean.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sown["new_var"][0]),
                               tbn.running_var.numpy(), rtol=1e-5,
                               atol=1e-6)

    # eval mode == the folded-affine math, bit-for-bit contract
    y_eval = bn.apply({"params": params}, jnp.asarray(x), False)
    a = gamma / np.sqrt(r_var + 1e-5)
    np.testing.assert_allclose(np.asarray(y_eval),
                               x * a + (beta - r_mean * a),
                               rtol=1e-5, atol=1e-6)


def test_rn50_finetune_step_updates_running_stats(rng):
    """A CE finetune step on the RN50 tower must (a) train BN gamma/beta,
    (b) momentum-update the running statistics, (c) never gradient-update
    the statistics themselves."""
    from swat_tpu.train import steps as S
    from swat_tpu.train.state import create_train_state

    cfg = get_model_config("rn50_openclip_openai")
    # tiny-fy: 1-block stages at 64px to keep the test fast
    import dataclasses

    from swat_tpu.models.configs import CLIPConfig, TextConfig
    from swat_tpu.models.resnet import ResNetConfig

    tiny = CLIPConfig(
        name="rn-tiny",
        vision=ResNetConfig(image_size=64, width=16, layers=(1, 1, 1, 1),
                            embed_dim=32, heads=4),
        text=TextConfig(context_length=12, vocab_size=64, width=32,
                        layers=1, heads=4, embed_dim=32, quick_gelu=True),
    )
    model = CLIPModel(tiny, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
        jnp.zeros((1, 12), jnp.int32))["params"]
    head = jnp.asarray(rng.normal(size=(3, 32)), jnp.float32)
    state, tx = create_train_state(params, head, "finetune",
                                   lr_classifier=1e-2, lr_backbone=1e-3,
                                   total_iter=10)
    step = S.make_ce_step(model, tx, image_size=64)

    before = jax.tree_util.tree_map(np.asarray, state.model["visual"])
    batch = {
        "images": jnp.asarray(rng.normal(size=(8, 64, 64, 3)),
                              jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 3, 8), jnp.int32),
        "source": jnp.ones((8,), jnp.int32),
    }
    new_state, loss_val = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss_val))
    after = new_state.model["visual"]

    bn1_b, bn1_a = before["bn1"], after["bn1"]
    # running stats moved by the momentum rule (not by AdamW)
    assert not np.allclose(bn1_b["mean"], np.asarray(bn1_a["mean"]))
    assert not np.allclose(bn1_b["var"], np.asarray(bn1_a["var"]))
    # gamma/beta train
    assert not np.allclose(bn1_b["scale"], np.asarray(bn1_a["scale"]))
    # the momentum update: new = 0.9*old + 0.1*batch -> moves toward
    # batch stats, bounded by the old value and the batch value
    assert float(np.max(np.abs(np.asarray(bn1_a["mean"])
                               - bn1_b["mean"]))) < 1.0


def test_rn50_state_dict_round_trip(rng):
    """params_to_torch_state_dict is a true inverse for RN50 trees (it
    used to crash on them with KeyError: 'patch_embed')."""
    from swat_tpu.models.loader import params_to_torch_state_dict

    sd = _rn50_sd(rng)
    params, ls = torch_state_dict_to_params(sd, vision_layers=4,
                                            text_layers=12)
    back = params_to_torch_state_dict(params, ls)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k], rtol=0, atol=0,
                                   err_msg=k)


def test_rn50_token_embeddings_and_heatmap(rng):
    """RN50 encode_image_tokens returns joint-space per-position tokens
    (mean token first) so attentivemix heatmaps work for RN50 too (it
    used to fail at trace time: ModifiedResNet ignored pool)."""
    from swat_tpu.eval.heatmap import clip_attention_heatmap

    sd = _rn50_sd(rng)
    params, _ = torch_state_dict_to_params(sd, vision_layers=4,
                                           text_layers=12)
    cfg = get_model_config("rn50_clip")
    model = CLIPModel(cfg, precision=FP32_PRECISION)
    images = jnp.asarray(rng.normal(size=(2, 224, 224, 3)), jnp.float32)
    tokens = model.apply({"params": params}, images,
                         method=CLIPModel.encode_image_tokens)
    assert tokens.shape == (2, 7 * 7 + 1, 1024)
    hm = clip_attention_heatmap(model, params, images)
    assert hm.shape == (2, 7, 7)
    assert np.isfinite(np.asarray(hm)).all()
