"""Model tests: shapes, loader round-trip, and numerical parity of the Flax
CLIP against an independent numpy implementation of the OpenCLIP forward
pass (stands in for feature-parity against the real library, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from swat_tpu.core.precision import FP32_PRECISION
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.configs import get_model_config
from swat_tpu.models.loader import (
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)

CFG = get_model_config("test_tiny")


def _random_torch_sd(rng, cfg):
    """Random weights in torch/OpenCLIP state-dict layout."""
    v, t = cfg.vision, cfg.text
    sd = {}
    sd["visual.conv1.weight"] = rng.normal(
        0, 0.02, (v.width, 3, v.patch_size, v.patch_size))
    sd["visual.class_embedding"] = rng.normal(0, 0.02, (v.width,))
    sd["visual.positional_embedding"] = rng.normal(
        0, 0.02, (v.seq_len, v.width))
    sd["visual.proj"] = rng.normal(0, 0.02, (v.width, v.embed_dim))
    for name, width in [("visual.ln_pre", v.width), ("visual.ln_post", v.width),
                        ("ln_final", t.width)]:
        sd[f"{name}.weight"] = rng.normal(1, 0.02, (width,))
        sd[f"{name}.bias"] = rng.normal(0, 0.02, (width,))
    for prefix, width, layers in [("visual.transformer.resblocks.", v.width, v.layers),
                                  ("transformer.resblocks.", t.width, t.layers)]:
        for i in range(layers):
            p = f"{prefix}{i}"
            sd[f"{p}.ln_1.weight"] = rng.normal(1, 0.02, (width,))
            sd[f"{p}.ln_1.bias"] = rng.normal(0, 0.02, (width,))
            sd[f"{p}.ln_2.weight"] = rng.normal(1, 0.02, (width,))
            sd[f"{p}.ln_2.bias"] = rng.normal(0, 0.02, (width,))
            sd[f"{p}.attn.in_proj_weight"] = rng.normal(0, 0.02, (3 * width, width))
            sd[f"{p}.attn.in_proj_bias"] = rng.normal(0, 0.02, (3 * width,))
            sd[f"{p}.attn.out_proj.weight"] = rng.normal(0, 0.02, (width, width))
            sd[f"{p}.attn.out_proj.bias"] = rng.normal(0, 0.02, (width,))
            sd[f"{p}.mlp.c_fc.weight"] = rng.normal(0, 0.02, (4 * width, width))
            sd[f"{p}.mlp.c_fc.bias"] = rng.normal(0, 0.02, (4 * width,))
            sd[f"{p}.mlp.c_proj.weight"] = rng.normal(0, 0.02, (width, 4 * width))
            sd[f"{p}.mlp.c_proj.bias"] = rng.normal(0, 0.02, (width,))
    sd["token_embedding.weight"] = rng.normal(0, 0.02, (t.vocab_size, t.width))
    sd["positional_embedding"] = rng.normal(0, 0.01, (t.context_length, t.width))
    sd["text_projection"] = rng.normal(0, 0.02, (t.width, t.embed_dim))
    sd["logit_scale"] = np.array(np.log(1 / 0.07))
    return {k: np.asarray(val, dtype=np.float32) for k, val in sd.items()}


# --------------------------------------------------------------------------
# independent numpy reference of the OpenCLIP forward pass

def _np_ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _np_attn(x, sd, p, heads, causal):
    s, d = x.shape
    hd = d // heads
    qkv = x @ sd[f"{p}.attn.in_proj_weight"].T + sd[f"{p}.attn.in_proj_bias"]
    q, k, v = np.split(qkv, 3, axis=-1)

    def split_heads(t):
        return t.reshape(s, heads, hd).transpose(1, 0, 2)

    q, k, v = map(split_heads, (q, k, v))
    scores = q @ k.transpose(0, 2, 1) / np.sqrt(hd)
    if causal:
        mask = np.triu(np.ones((s, s), dtype=bool), 1)
        scores = np.where(mask, -1e30, scores)
    scores = scores - scores.max(-1, keepdims=True)
    probs = np.exp(scores)
    probs /= probs.sum(-1, keepdims=True)
    out = (probs @ v).transpose(1, 0, 2).reshape(s, d)
    return out @ sd[f"{p}.attn.out_proj.weight"].T + sd[f"{p}.attn.out_proj.bias"]


def _np_block(x, sd, p, heads, causal, qgelu):
    x = x + _np_attn(
        _np_ln(x, sd[f"{p}.ln_1.weight"], sd[f"{p}.ln_1.bias"]),
        sd, p, heads, causal)
    h = _np_ln(x, sd[f"{p}.ln_2.weight"], sd[f"{p}.ln_2.bias"])
    h = h @ sd[f"{p}.mlp.c_fc.weight"].T + sd[f"{p}.mlp.c_fc.bias"]
    if qgelu:
        h = h * (1 / (1 + np.exp(-1.702 * h)))
    else:
        from scipy.special import erf  # exact gelu
        h = 0.5 * h * (1 + erf(h / np.sqrt(2)))
    h = h @ sd[f"{p}.mlp.c_proj.weight"].T + sd[f"{p}.mlp.c_proj.bias"]
    return x + h


def _np_encode_image(sd, cfg, images):
    """images: [B,H,W,3] NHWC. Implements OpenCLIP VisionTransformer."""
    v = cfg.vision
    p = v.patch_size
    conv = sd["visual.conv1.weight"]  # [w,3,p,p]
    feats = []
    for img in images:
        # conv with stride p == per-patch dot product
        gh = img.shape[0] // p
        patches = np.zeros((gh * gh, v.width), dtype=np.float32)
        idx = 0
        for r in range(gh):
            for c in range(gh):
                patch = img[r * p:(r + 1) * p, c * p:(c + 1) * p, :]  # [p,p,3]
                patches[idx] = np.tensordot(
                    conv, patch.transpose(2, 0, 1), axes=([1, 2, 3], [0, 1, 2]))
                idx += 1
        x = np.concatenate(
            [sd["visual.class_embedding"][None], patches], axis=0)
        x = x + sd["visual.positional_embedding"]
        x = _np_ln(x, sd["visual.ln_pre.weight"], sd["visual.ln_pre.bias"])
        for i in range(v.layers):
            x = _np_block(x, sd, f"visual.transformer.resblocks.{i}",
                          v.heads, False, v.quick_gelu)
        x = _np_ln(x[0:1], sd["visual.ln_post.weight"], sd["visual.ln_post.bias"])
        feats.append((x @ sd["visual.proj"])[0])
    return np.stack(feats)


def _np_encode_text(sd, cfg, tokens):
    t = cfg.text
    feats = []
    for tok in tokens:
        x = sd["token_embedding.weight"][tok] + sd["positional_embedding"]
        for i in range(t.layers):
            x = _np_block(x, sd, f"transformer.resblocks.{i}",
                          t.heads, True, t.quick_gelu)
        x = _np_ln(x, sd["ln_final.weight"], sd["ln_final.bias"])
        feats.append(x[tok.argmax()] @ sd["text_projection"])
    return np.stack(feats)


@pytest.fixture(scope="module")
def sd():
    return _random_torch_sd(np.random.default_rng(7), CFG)


@pytest.fixture(scope="module")
def model_and_params(sd):
    params, logit_scale = torch_state_dict_to_params(
        sd, CFG.vision.layers, CFG.text.layers)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    return model, params, logit_scale


def test_encode_shapes(model_and_params, rng):
    model, params, _ = model_and_params
    images = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    tokens = np.zeros((2, CFG.text.context_length), dtype=np.int32)
    tokens[:, 0] = CFG.text.vocab_size - 2
    tokens[:, 3] = CFG.text.vocab_size - 1
    img_f = model.apply({"params": params}, jnp.asarray(images), True,
                        method=CLIPModel.encode_image)
    txt_f = model.apply({"params": params}, jnp.asarray(tokens), True,
                        method=CLIPModel.encode_text)
    assert img_f.shape == (2, CFG.embed_dim)
    assert txt_f.shape == (2, CFG.embed_dim)
    np.testing.assert_allclose(
        np.linalg.norm(img_f, axis=-1), 1.0, rtol=1e-5)


def test_image_parity_vs_numpy(model_and_params, sd, rng):
    model, params, _ = model_and_params
    images = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(images), False,
        method=CLIPModel.encode_image))
    ref = _np_encode_image(sd, CFG, images)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_text_parity_vs_numpy(model_and_params, sd, rng):
    model, params, _ = model_and_params
    tokens = np.zeros((3, CFG.text.context_length), dtype=np.int64)
    for i in range(3):
        n = int(rng.integers(2, 8))
        tokens[i, 0] = CFG.text.vocab_size - 2
        tokens[i, 1:n] = rng.integers(1, 400, n - 1)
        tokens[i, n] = CFG.text.vocab_size - 1
    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(tokens), False,
        method=CLIPModel.encode_text))
    ref = _np_encode_text(sd, CFG, tokens)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_loader_roundtrip(sd):
    params, logit_scale = torch_state_dict_to_params(
        sd, CFG.vision.layers, CFG.text.layers)
    back = params_to_torch_state_dict(params, logit_scale)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)


def test_init_matches_loaded_structure(model_and_params):
    model, params, _ = model_and_params
    init_params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, CFG.text.context_length), jnp.int32))["params"]
    init_shapes = jax.tree_util.tree_map(lambda x: x.shape, init_params)
    loaded_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    assert init_shapes == loaded_shapes


def test_convert_cli_synthetic(tmp_path):
    """convert CLI: torch .pt -> msgpack bundle, verified round-trip, and
    the loader accepts the converted bundle as --checkpoint_path."""
    import torch

    from swat_tpu.cli.convert import convert
    from swat_tpu.models.configs import get_model_config
    from swat_tpu.models.loader import load_torch_checkpoint

    tiny = get_model_config("test_tiny")
    sd_np = _random_torch_sd(np.random.default_rng(3), tiny)
    sd_torch = {k: torch.from_numpy(np.asarray(v, np.float32))
                for k, v in sd_np.items()}
    src = str(tmp_path / "tiny.pt")
    torch.save(sd_torch, src)

    out = str(tmp_path / "tiny.msgpack")
    report = convert(src, "test_tiny", out, verify=True)
    assert report["roundtrip_mismatches"] == []

    params, ls = load_torch_checkpoint(out, tiny.vision.layers,
                                       tiny.text.layers)
    direct, ls2 = load_torch_checkpoint(src, tiny.vision.layers,
                                        tiny.text.layers)
    assert abs(ls - ls2) < 1e-7
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_get_tokenizer_strict_on_explicit_path(tmp_path, monkeypatch):
    """An explicit (but unusable) BPE path raises loudly instead of
    silently substituting the hash tokenizer — which would build prompt
    embeddings from meaningless tokens while training proceeds."""
    import pytest as _pytest

    from swat_tpu.models.tokenizer import HashTokenizer, get_tokenizer

    monkeypatch.delenv("SWAT_BPE_PATH", raising=False)
    assert isinstance(get_tokenizer(None), HashTokenizer)
    with _pytest.raises(FileNotFoundError):
        get_tokenizer(str(tmp_path / "missing_vocab.txt.gz"))
    monkeypatch.setenv("SWAT_BPE_PATH", str(tmp_path / "nope.txt.gz"))
    with _pytest.raises(FileNotFoundError):
        get_tokenizer(None)


def test_get_tokenizer_env_dir_dispatches_hf(tmp_path, monkeypatch):
    """A *directory* given via $SWAT_BPE_PATH (not just the explicit
    argument) must route to the HF-tokenizer adapter — regression for the
    env-var path falling through to SimpleTokenizer and failing on a
    directory open."""
    from swat_tpu.models import tokenizer as tok_mod

    seen = {}

    class _Sentinel:
        def __init__(self, path):
            seen["path"] = path

    monkeypatch.setattr(tok_mod, "HFTokenizerAdapter", _Sentinel)
    hf_dir = tmp_path / "hf_tok"
    hf_dir.mkdir()
    monkeypatch.setenv("SWAT_BPE_PATH", str(hf_dir))
    assert isinstance(tok_mod.get_tokenizer(None), _Sentinel)
    assert seen["path"] == str(hf_dir)
    # explicit argument still wins over the env var
    hf_dir2 = tmp_path / "hf_tok2"
    hf_dir2.mkdir()
    assert isinstance(tok_mod.get_tokenizer(str(hf_dir2)), _Sentinel)
    assert seen["path"] == str(hf_dir2)
