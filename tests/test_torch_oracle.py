"""Golden-feature parity without assets (VERDICT r2 item 4): an
INDEPENDENT torch implementation of the OpenCLIP forward (written here
from the architecture spec — quickgelu, pre-LN, eps=1e-5, torch
in_proj conventions) generates a real OpenCLIP-format state dict with
seeded weights; the repo's loader converts it and the JAX towers must
reproduce the torch features to fp32 rounding on every CI run.

This exercises the exact contract `tests/test_real_weights.py` checks
with the real laion400m_e32 checkpoint (feature cosine >= 1-1e-5,
reference utils/features.py:39-64) — but runs asset-free: the oracle is
the same torch math OpenCLIP executes, so a key-mapping, transpose, or
activation divergence in the loader/towers fails here.
"""

import numpy as np
import pytest
import torch

from swat_tpu.core.precision import FP32_PRECISION
from swat_tpu.models import functional as F
from swat_tpu.models.configs import CLIPConfig, TextConfig, VisionConfig
from swat_tpu.models.loader import torch_state_dict_to_params

torch.manual_seed(0)

W, LAYERS, HEADS, EMBED = 64, 2, 4, 48
PATCH, IMG = 16, 32
CTX, VOCAB = 12, 100

CFG = CLIPConfig(
    name="oracle-tiny",
    vision=VisionConfig(image_size=IMG, patch_size=PATCH, width=W,
                        layers=LAYERS, heads=HEADS, embed_dim=EMBED,
                        quick_gelu=True),
    text=TextConfig(context_length=CTX, vocab_size=VOCAB, width=W,
                    layers=LAYERS, heads=HEADS, embed_dim=EMBED,
                    quick_gelu=True),
)


# --------------------------------------------------------------------------
# the torch oracle lives in torch_oracle_lib.py (torch-only, shared with
# the reference-shim harness); re-exported here because the twin tests
# historically import it from this module.

from torch_oracle_lib import (  # noqa: F401  (re-exports)
    _attn,
    _block,
    _ln,
    make_oracle_sd,
    oracle_encode_image,
    oracle_encode_text,
)


@pytest.fixture(scope="module")
def oracle_sd():
    return make_oracle_sd()


@pytest.fixture(scope="module")
def converted(oracle_sd):
    params, logit_scale = torch_state_dict_to_params(
        oracle_sd, vision_layers=LAYERS, text_layers=LAYERS)
    assert logit_scale == pytest.approx(float(np.log(1 / 0.07)))
    return params


@pytest.mark.parametrize("use_mega", [False, True],
                         ids=["functional", "megakernel"])
def test_image_features_match_torch(oracle_sd, converted, use_mega):
    images = torch.randn(4, IMG, IMG, 3,
                         generator=torch.Generator().manual_seed(3))
    ref = oracle_encode_image(oracle_sd, images).detach().numpy()
    got = np.asarray(F.vit_encode_image(
        converted["visual"], images.numpy(), CFG.vision, FP32_PRECISION,
        normalize=True, use_mega=use_mega))
    cos = (ref * got).sum(-1)
    assert cos.min() >= 1 - 1e-5
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


@pytest.mark.parametrize("use_mega", [False, True],
                         ids=["functional", "megakernel"])
def test_text_features_match_torch(oracle_sd, converted, use_mega):
    g = torch.Generator().manual_seed(4)
    tokens = torch.randint(1, VOCAB - 1, (5, CTX), generator=g)
    tokens[:, 7] = VOCAB - 1   # EOT = highest id at a known position
    ref = oracle_encode_text(oracle_sd, tokens).detach().numpy()
    got = np.asarray(F.text_encode(
        converted["text"], tokens.numpy(), CFG.text, FP32_PRECISION,
        normalize=True, use_mega=use_mega))
    cos = (ref * got).sum(-1)
    assert cos.min() >= 1 - 1e-5
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)
