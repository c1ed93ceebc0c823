"""Flax CLIP: Vision Transformer + text transformer towers.

TPU-native re-design of the towers the reference imports from OpenCLIP/CLIP
(`get_engine`, reference utils/extras.py:138-171).  Differences from a torch
port, on purpose:

* NHWC images; patch embedding is an unfold + Dense (one big MXU matmul)
  instead of a conv.
* Transformer blocks run under ``nn.scan`` with stacked per-layer parameters —
  one compiled block body regardless of depth (fast compiles, XLA-friendly).
* bf16 compute / fp32 params & LayerNorm / fp32 matmul accumulation
  (the reference forces fp32 end-to-end, utils/extras.py:163; on TPU the MXU
  wants bf16 with fp32 accumulation).
* optional gradient rematerialisation of each block.
* attention routes through `swat_tpu.kernels.attention` (XLA or fused Pallas).

Parameter layout intentionally mirrors OpenCLIP's state dict modulo stacking,
so `swat_tpu.models.loader` is a pure renaming/stacking pass.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from swat_tpu.core.precision import Precision, DEFAULT_PRECISION
from swat_tpu.kernels.attention import multi_head_attention
from swat_tpu.models.configs import CLIPConfig, TextConfig, VisionConfig


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _LayerNorm(nn.Module):
    """LayerNorm computed in fp32, output cast back to compute dtype.
    ``fast_variance`` picks the one-pass E[x^2]-E[x]^2 form (throughput
    policy) vs the exact two-pass form (fp32 parity policy)."""

    compute_dtype: Any = jnp.bfloat16
    fast_variance: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32,
                         use_fast_variance=self.fast_variance,
                         name="ln")(
            x.astype(jnp.float32))
        return y.astype(self.compute_dtype)


class Attention(nn.Module):
    width: int
    heads: int
    causal: bool = False
    precision: Precision = DEFAULT_PRECISION
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        b, s, d = x.shape
        head_dim = d // self.heads
        qkv = nn.Dense(3 * d, dtype=self.precision.compute_dtype,
                       param_dtype=self.precision.param_dtype,
                       precision=self.precision.matmul_precision,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        if self.use_pallas:
            def heads_first(t):
                return t.reshape(b, s, self.heads, head_dim).transpose(
                    0, 2, 1, 3)

            out = multi_head_attention(
                heads_first(q), heads_first(k), heads_first(v),
                causal=self.causal, use_pallas=True,
                accum_dtype=self.precision.accum_dtype,
                matmul_precision=self.precision.matmul_precision)
            out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
        else:
            from swat_tpu.kernels.attention import attention_heads_last

            def heads_last(t):
                return t.reshape(b, s, self.heads, head_dim)

            out = attention_heads_last(
                heads_last(q), heads_last(k), heads_last(v),
                causal=self.causal,
                accum_dtype=self.precision.accum_dtype,
                matmul_precision=self.precision.matmul_precision,
                softmax_dtype=self.precision.softmax_dtype)
            out = out.reshape(b, s, d)
        return nn.Dense(d, dtype=self.precision.compute_dtype,
                        param_dtype=self.precision.param_dtype,
                        precision=self.precision.matmul_precision,
                        name="out")(out)


class MLP(nn.Module):
    width: int
    quick_gelu: bool = True
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(4 * self.width, dtype=self.precision.compute_dtype,
                     param_dtype=self.precision.param_dtype,
                     precision=self.precision.matmul_precision, name="fc")(x)
        h = quick_gelu(h) if self.quick_gelu else nn.gelu(h, approximate=False)
        return nn.Dense(self.width, dtype=self.precision.compute_dtype,
                        param_dtype=self.precision.param_dtype,
                        precision=self.precision.matmul_precision,
                        name="proj")(h)


class Block(nn.Module):
    width: int
    heads: int
    causal: bool = False
    quick_gelu: bool = True
    precision: Precision = DEFAULT_PRECISION
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, _=None):
        x = x + Attention(self.width, self.heads, causal=self.causal,
                          precision=self.precision,
                          use_pallas=self.use_pallas, name="attn")(
            _LayerNorm(self.precision.compute_dtype,
                       self.precision.ln_fast_variance, name="ln_1")(x))
        x = x + MLP(self.width, quick_gelu=self.quick_gelu,
                    precision=self.precision, name="mlp")(
            _LayerNorm(self.precision.compute_dtype,
                       self.precision.ln_fast_variance, name="ln_2")(x))
        return x, None


def resolve_remat_policy(remat):
    """Map the remat flag to (enabled, jax.checkpoint policy, first_k).

    False          -> no remat
    True / 'full'  -> checkpoint everything (recompute the whole block on
                      the backward pass; smallest memory, most recompute)
    'dots'         -> save non-batched matmul outputs (qkv/out/fc/proj
                      projections) and recompute only elementwise ops and
                      the batched attention scores/softmax
                      (jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    'dots_all'     -> save every matmul output including the batched
                      attention score matrices (dots_saveable; largest
                      memory of the remat modes, least recompute)
    'first<K>'     -> full-block checkpoint on the FIRST K blocks only;
                      the remaining blocks keep all residuals (first_k is
                      None when not in this mode).  The first blocks are
                      the cheapest to remat: their saved residuals have
                      the longest lifetime across the backward pass.

    The selective modes trade a little HBM for skipping most of full
    remat's recompute — built as the lever for L/14 single-chip training,
    which needs remat at bsz>=64 (16.5G > 15.75G HBM) but loses ~25%
    nominal MFU to full-block recompute.  Measured r4 (ablate_l14_mfu.py,
    one subprocess per point): at L/14 bsz 64 EVERY selective policy
    OOMs — 'dots'/'dots_all' save the dot outputs, which at S=257 is
    exactly what does not fit, and even 'first8' (nominally ~3 GB of
    residuals freed) RESOURCE_EXHAUSTs at runtime while 'first4'/'first2'
    OOM at compile: XLA's scheduling holds peak memory well above the
    sum-of-live-residuals estimate.  Full-block remat remains the only
    fitting single-chip L/14 policy; 'first<K>' is kept as a general
    policy for other shapes and for sharded runs where per-device
    activations shrink.
    """
    if not remat:
        return False, None, None
    if remat is True or remat == "full":
        return True, None, None
    if isinstance(remat, str) and remat.startswith("first"):
        suffix = remat[len("first"):]
        if not suffix.isdigit() or int(suffix) <= 0:
            raise ValueError(
                f"remat 'first<K>' needs a positive block count; "
                f"got {remat!r}")
        return True, None, int(suffix)
    policies = {
        "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "dots_all": jax.checkpoint_policies.dots_saveable,
    }
    if remat not in policies:
        raise ValueError(
            f"remat must be bool, 'full', 'dots', 'dots_all' or "
            f"'first<K>'; got {remat!r}")
    return True, policies[remat], None


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    causal: bool = False
    quick_gelu: bool = True
    precision: Precision = DEFAULT_PRECISION
    remat: Any = False
    use_pallas: bool = False
    # lax.scan unroll factor for the layer loop. Parameters stay stacked
    # (checkpoint layout is unchanged) but the loop body is replicated,
    # which removes the per-layer dynamic-update-slice residual stacking
    # that dominates the scanned backward pass on TPU (profiled: the
    # scan=1 bwd spends more time in DUS/copy ops than in matmuls).
    unroll: int = 1

    @nn.compact
    def __call__(self, x):
        block_cls = Block
        enabled, policy, first_k = resolve_remat_policy(self.remat)
        if enabled:
            # nn.scan traces ONE body for all steps, so a per-layer
            # prefix ('first<K>') cannot be expressed here; round it up
            # to full remat (first_k -> policy None).  Memory-safe and
            # bit-identical — and this scan tower only runs on forward-
            # only / parity paths (the training hot path is the
            # functional plain-loop tower, which honors the prefix), so
            # the extra recompute never materializes in a backward pass.
            del first_k
            block_cls = nn.remat(Block, prevent_cse=False, policy=policy)
        unroll = self.unroll if self.unroll > 0 else self.layers
        scan = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.layers,
            unroll=min(unroll, self.layers),
            metadata_params={nn.meta.PARTITION_NAME: "layers"},
        )
        x, _ = scan(self.width, self.heads, causal=self.causal,
                    quick_gelu=self.quick_gelu, precision=self.precision,
                    use_pallas=self.use_pallas, name="blocks")(x, None)
        return x


class VisionTower(nn.Module):
    cfg: VisionConfig
    precision: Precision = DEFAULT_PRECISION
    remat: Any = False
    use_pallas: bool = False
    unroll: int = 1

    @nn.compact
    def __call__(self, images, pool: bool = True):
        """images: [B, H, W, 3] float (already CLIP-normalized).
        pool=False returns all token embeddings [B, S, embed_dim]
        (class token first) — used for attention heatmaps."""
        cfg = self.cfg
        p = cfg.patch_size
        b, h, w, c = images.shape
        gh, gw = h // p, w // p
        x = images.astype(self.precision.compute_dtype)
        # unfold into patches ordered (row, col, channel) to match the
        # conv1-as-matmul weight layout produced by the loader
        x = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * gw, p * p * c)
        x = nn.Dense(cfg.width, use_bias=False,
                     dtype=self.precision.compute_dtype,
                     param_dtype=self.precision.param_dtype,
                     precision=self.precision.matmul_precision,
                     name="patch_embed")(x)

        class_emb = self.param(
            "class_embedding",
            nn.initializers.normal(stddev=cfg.width ** -0.5),
            (cfg.width,), self.precision.param_dtype)
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=cfg.width ** -0.5),
            (gh * gw + 1, cfg.width), self.precision.param_dtype)

        cls = jnp.broadcast_to(
            class_emb.astype(self.precision.compute_dtype), (b, 1, cfg.width))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos_emb.astype(self.precision.compute_dtype)

        x = _LayerNorm(self.precision.compute_dtype,
                        self.precision.ln_fast_variance, name="ln_pre")(x)
        x = Transformer(cfg.width, cfg.layers, cfg.heads, causal=False,
                        quick_gelu=cfg.quick_gelu, precision=self.precision,
                        remat=self.remat, use_pallas=self.use_pallas,
                        unroll=self.unroll, name="transformer")(x)
        x = _LayerNorm(self.precision.compute_dtype,
                       self.precision.ln_fast_variance, name="ln_post")(
            x if not pool else x[:, 0])

        proj = self.param(
            "proj", nn.initializers.normal(stddev=cfg.width ** -0.5),
            (cfg.width, cfg.embed_dim), self.precision.param_dtype)
        return jnp.dot(x, proj.astype(self.precision.compute_dtype),
                       precision=self.precision.matmul_precision,
                       preferred_element_type=self.precision.accum_dtype
                       ).astype(jnp.float32)


class TextTower(nn.Module):
    cfg: TextConfig
    precision: Precision = DEFAULT_PRECISION
    remat: Any = False
    use_pallas: bool = False
    unroll: int = 1

    @nn.compact
    def __call__(self, token_ids):
        """token_ids: [B, context_length] int32. EOT = highest token id."""
        cfg = self.cfg
        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(stddev=0.02),
            (cfg.vocab_size, cfg.width), self.precision.param_dtype)
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(stddev=0.01),
            (cfg.context_length, cfg.width), self.precision.param_dtype)

        x = tok_emb[token_ids].astype(self.precision.compute_dtype)
        x = x + pos_emb.astype(self.precision.compute_dtype)
        x = Transformer(cfg.width, cfg.layers, cfg.heads, causal=True,
                        quick_gelu=cfg.quick_gelu, precision=self.precision,
                        remat=self.remat, use_pallas=self.use_pallas,
                        unroll=self.unroll, name="transformer")(x)
        x = _LayerNorm(self.precision.compute_dtype,
                       self.precision.ln_fast_variance, name="ln_final")(x)

        # features at the EOT token (argmax works because EOT has the
        # highest id in the CLIP vocab)
        eot = jnp.argmax(token_ids, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]

        proj = self.param(
            "text_projection", nn.initializers.normal(stddev=cfg.width ** -0.5),
            (cfg.width, cfg.embed_dim), self.precision.param_dtype)
        return jnp.dot(x, proj.astype(self.precision.compute_dtype),
                       precision=self.precision.matmul_precision,
                       preferred_element_type=self.precision.accum_dtype
                       ).astype(jnp.float32)


class CLIPModel(nn.Module):
    """Two-tower CLIP. ``logit_scale`` intentionally lives *outside* the
    module — the reference manages it as a per-method optimizer param
    (reference utils/optimizers.py:80-81), so here it is a separate leaf in
    the train state."""

    cfg: CLIPConfig
    precision: Precision = DEFAULT_PRECISION
    remat: Any = False
    use_pallas: bool = False
    unroll: int = 0   # 0 = fully unroll the layer loop (fastest bwd)

    def setup(self):
        from swat_tpu.models.resnet import ModifiedResNet, ResNetConfig

        if isinstance(self.cfg.vision, ResNetConfig):
            self.visual = ModifiedResNet(self.cfg.vision, self.precision)
        else:
            self.visual = VisionTower(self.cfg.vision, self.precision,
                                      self.remat, self.use_pallas,
                                      self.unroll)
        self.text = TextTower(self.cfg.text, self.precision,
                              self.remat, self.use_pallas, self.unroll)

    def encode_image(self, images, normalize: bool = False,
                     train: bool = False):
        from swat_tpu.models.resnet import ModifiedResNet

        if isinstance(self.visual, ModifiedResNet):
            # train=True -> batch-stat BN + sown running-stat updates
            feats = self.visual(images, True, train)
        else:
            feats = self.visual(images)
        return _maybe_normalize(feats, normalize)

    def encode_image_tokens(self, images):
        """All projected token embeddings [B, S, D], class token first."""
        return self.visual(images, pool=False)

    def encode_text(self, token_ids, normalize: bool = False):
        feats = self.text(token_ids)
        return _maybe_normalize(feats, normalize)

    def __call__(self, images, token_ids):
        return (self.encode_image(images, normalize=True),
                self.encode_text(token_ids, normalize=True))


def _maybe_normalize(feats, normalize: bool):
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats


# ---------------------------------------------------------------------------
# functional conveniences


def encode_image(model: CLIPModel, params, images, normalize=True):
    return model.apply({"params": params}, images, normalize=normalize,
                       method=CLIPModel.encode_image)


def encode_text(model: CLIPModel, params, token_ids, normalize=True):
    return model.apply({"params": params}, token_ids, normalize=normalize,
                       method=CLIPModel.encode_text)


# ---------------------------------------------------------------------------
# sharding rules (tensor parallelism over the 'model' mesh axis)

def param_partition_spec(path: tuple[str, ...], leaf) -> tuple:
    """PartitionSpec rule for a parameter path.

    Attention qkv / MLP fc kernels are sharded on the output (heads / hidden)
    dim; out / proj kernels on the input dim, so each block is a
    column-parallel → row-parallel pair and XLA inserts a single
    reduce-scatter/all-gather pair per block over the ``model`` axis.
    Scanned block params carry a leading ``layers`` axis (never sharded).
    """
    from jax.sharding import PartitionSpec as P

    names = [p for p in path]
    ndim = getattr(leaf, "ndim", len(getattr(leaf, "shape", ())))
    stacked = "blocks" in names  # leading layer axis from nn.scan

    def spec(*axes):
        return P(*([None] * stacked + list(axes)))

    if "qkv" in names or "fc" in names:
        if names[-1] == "kernel":
            return spec(None, "model")
        if names[-1] == "bias":
            return spec("model")
    if ("out" in names or ("proj" in names and "mlp" in names)):
        if names[-1] == "kernel":
            return spec("model", None)
        if names[-1] == "bias":
            return spec()
    if names[-1] == "token_embedding":
        return P("model", None)  # vocab-sharded embedding
    return P(*([None] * ndim)) if ndim else P()


def partition_specs(params):
    """Full PartitionSpec pytree for a CLIP param tree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    specs = []
    for path, leaf in flat:
        names = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path)
        specs.append(param_partition_spec(names, leaf))
    return jax.tree_util.tree_unflatten(treedef, specs)
