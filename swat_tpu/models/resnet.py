"""ModifiedResNet visual tower (CLIP RN50).

The reference's rn50 configs (``rn50_openclip_openai`` / ``rn50_clip``,
reference utils/extras.py:107,116-120) use OpenAI's modified ResNet: a
3-conv stem with blur-free avgpool, bottleneck blocks whose strided path is
avgpool->conv, and an attention-pooling head instead of GAP.

BatchNorm keeps torch semantics (AffineBN): running statistics live as
frozen params leaves, eval normalizes by them (identical to a folded
affine), and RN50 finetuning passes train=True so batch statistics drive
normalization and the torch-momentum running-stat updates are sown for
the train step to fold back (steps.bn_updates_from_intermediates).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from swat_tpu.core.precision import Precision, DEFAULT_PRECISION


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    image_size: int = 224
    width: int = 64
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    embed_dim: int = 1024
    heads: int = 32          # attention-pool heads
    quick_gelu: bool = True  # text tower activation (vision uses ReLU)

    @property
    def seq_len(self) -> int:  # attnpool tokens
        g = self.image_size // 32
        return g * g + 1


class AffineBN(nn.Module):
    """BatchNorm with torch semantics (momentum 0.1, eps 1e-5).

    The running statistics live as PARAMS leaves (``mean``/``var``,
    labeled 'frozen' by the optimizer so they are never gradient-updated
    or weight-decayed) — every params-only code path (eval, features,
    checkpoints, TP specs) works unchanged.

    ``train=False`` (default) normalizes with the running statistics —
    mathematically identical to the round-2 folded affine, so zero-shot /
    probing / frozen-backbone behavior is unchanged.  ``train=True``
    normalizes with BATCH statistics (gradients flow through them, true
    BN training) and sows the torch-momentum-updated running values
    (running = (1-m)*running + m*batch, UNBIASED variance for the
    update, biased for normalization) into the ``intermediates``
    collection for the train step to fold back into the param tree
    (reference RN50 finetunes run model.train() with live BN — VERDICT
    r2 item 6)."""

    features: int
    precision: Precision = DEFAULT_PRECISION
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        gamma = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        r_mean = self.param("mean", nn.initializers.zeros,
                            (self.features,), jnp.float32)
        r_var = self.param("var", nn.initializers.ones,
                           (self.features,), jnp.float32)
        if train:
            x32 = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = x32.mean(axis=axes)
            var = x32.var(axis=axes)          # biased, used to normalize
            n = x.size // self.features
            unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            self.sow("intermediates", "new_mean", jax.lax.stop_gradient(
                (1 - m) * r_mean + m * mean))
            self.sow("intermediates", "new_var", jax.lax.stop_gradient(
                (1 - m) * r_var + m * unbiased))
        else:
            mean, var = r_mean, r_var
        dt = self.precision.compute_dtype
        rstd = jax.lax.rsqrt(var + self.eps)
        a = (gamma * rstd).astype(dt)
        b = (beta - mean * gamma * rstd).astype(dt)
        return x * a + b


class _Conv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       padding=[(self.kernel // 2,) * 2] * 2,
                       use_bias=False, dtype=self.precision.compute_dtype,
                       param_dtype=self.precision.param_dtype,
                       precision=self.precision.matmul_precision,
                       name="conv")(x)


def _avg_pool(x, stride):
    return nn.avg_pool(x, (stride, stride), strides=(stride, stride))


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    precision: Precision = DEFAULT_PRECISION
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.precision
        out = nn.relu(AffineBN(self.planes, p, name="bn1")(
            _Conv(self.planes, 1, precision=p, name="conv1")(x), train))
        out = nn.relu(AffineBN(self.planes, p, name="bn2")(
            _Conv(self.planes, 3, precision=p, name="conv2")(out), train))
        if self.stride > 1:  # anti-aliased stride: avgpool then 1x1 conv
            out = _avg_pool(out, self.stride)
        out = AffineBN(self.planes * self.expansion, p, name="bn3")(
            _Conv(self.planes * self.expansion, 1, precision=p,
                  name="conv3")(out), train)
        identity = x
        if self.downsample:
            identity = _avg_pool(x, self.stride) if self.stride > 1 else x
            identity = AffineBN(self.planes * self.expansion, p,
                                name="down_bn")(
                _Conv(self.planes * self.expansion, 1, precision=p,
                      name="down_conv")(identity), train)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    embed_dim: int      # input channels (width * 32)
    output_dim: int
    heads: int
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, x, tokens_out: bool = False):
        """x: [B, H, W, C] -> [B, output_dim]; with ``tokens_out`` the
        per-position value embeddings projected into the joint space
        [B, H*W+1, output_dim] (mean token first) — the GEM-style token
        surface attentivemix heatmaps read (eval/heatmap.py)."""
        p = self.precision
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # [B, S, C]
        pos = self.param("positional_embedding",
                         nn.initializers.normal(stddev=c ** -0.5),
                         (h * w + 1, c), jnp.float32)
        tokens = tokens + pos.astype(p.compute_dtype)

        dense = lambda f, name: nn.Dense(
            f, dtype=p.compute_dtype, param_dtype=p.param_dtype,
            precision=p.matmul_precision, name=name)
        q = dense(c, "q_proj")(tokens[:, :1])
        k = dense(c, "k_proj")(tokens)
        v = dense(c, "v_proj")(tokens)
        if tokens_out:
            return dense(self.output_dim, "c_proj")(v).astype(jnp.float32)
        hd = c // self.heads

        def heads_first(t, s):
            return t.reshape(b, s, self.heads, hd).transpose(0, 2, 1, 3)

        from swat_tpu.kernels.attention import _attention_xla

        q, k, v = (heads_first(q, 1), heads_first(k, h * w + 1),
                   heads_first(v, h * w + 1))
        scale = 1.0 / (hd ** 0.5)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            precision=p.matmul_precision,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(
            q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                         precision=p.matmul_precision,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
        return dense(self.output_dim, "c_proj")(out.astype(
            p.compute_dtype)).astype(jnp.float32)


class ModifiedResNet(nn.Module):
    cfg: ResNetConfig
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, images, pool: bool = True, train: bool = False):
        cfg = self.cfg
        p = self.precision
        x = images.astype(p.compute_dtype)
        # 3-conv stem (stride 2 on conv1) + avgpool
        x = nn.relu(AffineBN(cfg.width // 2, p, name="bn1")(
            _Conv(cfg.width // 2, 3, 2, p, name="conv1")(x), train))
        x = nn.relu(AffineBN(cfg.width // 2, p, name="bn2")(
            _Conv(cfg.width // 2, 3, 1, p, name="conv2")(x), train))
        x = nn.relu(AffineBN(cfg.width, p, name="bn3")(
            _Conv(cfg.width, 3, 1, p, name="conv3")(x), train))
        x = _avg_pool(x, 2)

        planes = cfg.width
        for stage, blocks in enumerate(cfg.layers):
            stride = 1 if stage == 0 else 2
            for i in range(blocks):
                x = Bottleneck(planes, stride=stride if i == 0 else 1,
                               downsample=(i == 0), precision=p,
                               name=f"layer{stage + 1}_{i}")(x, train)
            planes *= 2

        return AttentionPool2d(cfg.width * 32, cfg.embed_dim, cfg.heads,
                               p, name="attnpool")(x, tokens_out=not pool)
