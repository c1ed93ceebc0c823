"""Multi-device SPMD: the full train step over a dp x tp mesh (the CI face
of __graft_entry__.dryrun_multichip), plus data-parallel gradient-sync
equivalence: a dp=8-sharded step must match the single-device step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from swat_tpu.core.mesh import MeshSpec, create_mesh
from swat_tpu.core.precision import FP32_PRECISION
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.configs import get_model_config
from swat_tpu.models.head import init_head_random
from swat_tpu.train import steps as S
from swat_tpu.train.state import create_train_state

CFG = get_model_config("test_tiny")


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_hermetic():
    """The driver gate must never touch a non-CPU backend. Run the dryrun
    in a subprocess whose default platform is poisoned: any code path that
    initializes the default backend (instead of pinning cpu) errors loudly
    without reaching real hardware."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "nonexistent_poison_platform"
    env.pop("JAX_PLATFORM_NAME", None)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); "
         "from jax._src import xla_bridge; "
         "bs = list(getattr(xla_bridge, '_backends', {})); "
         "assert bs == ['cpu'], bs; print('HERMETIC', bs)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "HERMETIC ['cpu']" in proc.stdout, proc.stdout


def test_dp_sharded_step_matches_single_device(rng):
    """Batch sharded over 8 devices == unsharded: GSPMD's psum gradient
    reduction must be numerically equivalent (fp32)."""
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, CFG.text.context_length), jnp.int32))["params"]
    head = init_head_random(jax.random.PRNGKey(1), 3, CFG.embed_dim)

    batch_np = {
        "images": rng.normal(size=(16, 32, 32, 3)).astype(np.float32),
        "labels": rng.integers(0, 3, 16).astype(np.int32),
        "source": rng.integers(0, 2, 16).astype(np.int32),
    }

    def run(mesh):
        state, tx = create_train_state(
            params, head, "finetune", lr_classifier=1e-3,
            lr_backbone=1e-4, total_iter=10)
        step = S.make_ce_step(model, tx, image_size=32)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        if mesh is not None:
            batch = {k: jax.device_put(
                v, NamedSharding(mesh, P("data", *[None] * (v.ndim - 1))))
                for k, v in batch.items()}
            state = jax.device_put(state, NamedSharding(mesh, P()))
        new_state, loss = step(state, batch, jax.random.PRNGKey(3))
        return float(loss), np.asarray(new_state.head)

    loss_1, head_1 = run(None)
    mesh = create_mesh(MeshSpec(data=8, model=1))
    loss_8, head_8 = run(mesh)

    assert loss_1 == pytest.approx(loss_8, rel=1e-5)
    np.testing.assert_allclose(head_1, head_8, rtol=1e-5, atol=1e-7)


def test_dp_sharded_accum_step_matches_single_device(rng):
    """Gradient accumulation under a dp mesh: the microbatch reshape
    (B -> accum x B/accum) crosses the sharded batch dim, so GSPMD must
    reshard inside the lax.scan — the result must still equal the
    single-device single-pass step (fp32, reduction-order rounding)."""
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, CFG.text.context_length), jnp.int32))["params"]
    head = init_head_random(jax.random.PRNGKey(1), 3, CFG.embed_dim)

    batch_np = {
        "images": rng.normal(size=(16, 32, 32, 3)).astype(np.float32),
        "labels": rng.integers(0, 3, 16).astype(np.int32),
        "source": rng.integers(0, 2, 16).astype(np.int32),
    }

    def run(mesh, accum):
        state, tx = create_train_state(
            params, head, "finetune", lr_classifier=1e-3,
            lr_backbone=1e-4, total_iter=10, optim_type="SGD")
        step = S.make_ce_step(model, tx, image_size=32, accum=accum)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        if mesh is not None:
            batch = {k: jax.device_put(
                v, NamedSharding(mesh, P("data", *[None] * (v.ndim - 1))))
                for k, v in batch.items()}
            state = jax.device_put(state, NamedSharding(mesh, P()))
        new_state, loss = step(state, batch, jax.random.PRNGKey(3))
        return float(loss), np.asarray(new_state.head)

    loss_1, head_1 = run(None, 1)
    mesh = create_mesh(MeshSpec(data=8, model=1))
    loss_8, head_8 = run(mesh, 2)

    assert loss_1 == pytest.approx(loss_8, rel=1e-5)
    np.testing.assert_allclose(head_1, head_8, rtol=1e-5, atol=1e-7)


def test_tp_sharded_forward_matches_replicated(rng):
    """Tensor-parallel param sharding (column/row-parallel attention+MLP,
    models/clip.partition_specs) must not change the forward result."""
    from swat_tpu.models.clip import partition_specs

    model = CLIPModel(CFG, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, CFG.text.context_length), jnp.int32))["params"]
    images = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))

    @jax.jit
    def encode(params, images):
        return model.apply({"params": params}, images, True,
                           method=CLIPModel.encode_image)

    ref = np.asarray(encode(params, images))

    mesh = create_mesh(MeshSpec(data=4, model=2))
    specs = partition_specs(params)
    sharded = jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: isinstance(x, jnp.ndarray))
    images_s = jax.device_put(
        images, NamedSharding(mesh, P("data", None, None, None)))
    out = np.asarray(encode(sharded, images_s))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def _shard_state_tp(state, mesh):
    """Shard a full TrainState (params + optimizer moments) with the
    tensor-parallel partition specs — the same leaf rule the driver gate
    uses (__graft_entry__.dryrun_multichip)."""
    from swat_tpu.models.clip import param_partition_spec

    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    leaves = []
    for path, leaf in flat:
        names = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path)
        leaves.append(jax.device_put(
            leaf, NamedSharding(mesh, param_partition_spec(names, leaf))))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _trainable_allclose(a, b, rtol=1e-5, atol=5e-6, lr_max=1e-3):
    # atol 5e-6 = 5% of one lr_backbone Adam step: for elements whose
    # gradient is near rounding-zero, the m/sqrt(v) ratio itself shifts
    # with reduction order (measured 1.4e-6 on 1/32k elements under tp2);
    # a wrong partition spec moves whole tensors by ~lr, orders above.
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for (path, la), lb in zip(fa, fb):
        key = jax.tree_util.keystr(path)
        la, lb = np.asarray(la), np.asarray(lb)
        if "qkv" in key and "bias" in key:
            # the K third has EXACTLY zero gradient (softmax shift
            # invariance), so Adam's first step there is +-lr x
            # sign(rounding noise) — and the tp reduce-scatter changes
            # the reduction order, flipping signs.  Same exemption as
            # the torch twins: compare Q/V, magnitude-bound K.
            d = la.shape[-1] // 3
            k_a, k_b = la[..., d:2 * d], lb[..., d:2 * d]
            assert np.abs(k_a).max() <= 1.5 * lr_max, key
            assert np.abs(k_b).max() <= 1.5 * lr_max, key
            sel = np.concatenate([np.arange(d), np.arange(2 * d, 3 * d)])
            la, lb = la[..., sel], lb[..., sel]
        np.testing.assert_allclose(la, lb, rtol=rtol, atol=atol,
                                   err_msg=key)


@pytest.mark.parametrize("mesh_spec", [MeshSpec(data=4, model=2),
                                       MeshSpec(data=1, model=2)],
                         ids=["dp4xtp2", "tp2"])
def test_tp_sharded_cutmix_train_step_matches_single_device(rng, mesh_spec):
    """Tensor-parallel TRAINING correctness (VERDICT r4 item 4): a cutmix
    train step with params AND optimizer moments sharded column/row-
    parallel over 'model' must produce the same loss and the same updated
    parameter tree as the unsharded single-device step — i.e. the
    backward through every tp-sharded matmul (and GSPMD's reduce-scatter/
    all-gather insertions) is numerically the identity transformation.
    The forward-only test above cannot catch a wrong partition spec whose
    transpose only enters the backward."""
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, CFG.text.context_length), jnp.int32))["params"]
    head = init_head_random(jax.random.PRNGKey(1), 3, CFG.embed_dim)

    batch_np = {
        "images": rng.normal(size=(16, 32, 32, 3)).astype(np.float32),
        "labels": rng.integers(0, 3, 16).astype(np.int32),
        "source": rng.integers(0, 2, 16).astype(np.int32),
    }

    def run(mesh):
        state, tx = create_train_state(
            params, head, "cutmix", lr_classifier=1e-3,
            lr_backbone=1e-4, total_iter=10)
        step = S.make_mixing_step(model, tx, "cutmix", mix_prob=1.0,
                                  image_size=32)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        if mesh is not None:
            batch = {k: jax.device_put(
                v, NamedSharding(mesh, P("data", *[None] * (v.ndim - 1))))
                for k, v in batch.items()}
            state = _shard_state_tp(state, mesh)
        new_state, loss = step(state, batch, jax.random.PRNGKey(3))
        return float(loss), jax.device_get(new_state.trainable)

    loss_1, tr_1 = run(None)
    loss_tp, tr_tp = run(create_mesh(mesh_spec))
    assert loss_1 == pytest.approx(loss_tp, rel=1e-5)
    _trainable_allclose(tr_1, tr_tp)


def test_tp_sharded_flyp_train_step_matches_single_device(rng):
    """FLYP under dp=4 x tp=2: the text tower trains too (so the causal-
    attention and token-embedding backward cross the tp axis) and the
    [B, B] InfoNCE couples the dp axis — both parallel dimensions must be
    gradient-exact at once."""
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, CFG.text.context_length), jnp.int32))["params"]
    head = init_head_random(jax.random.PRNGKey(1), 3, CFG.embed_dim)

    batch_np = {
        "images": rng.normal(size=(16, 32, 32, 3)).astype(np.float32),
        "labels": rng.integers(0, 3, 16).astype(np.int32),
        "source": rng.integers(0, 2, 16).astype(np.int32),
        "prompt_tokens": rng.integers(
            1, CFG.text.vocab_size - 1,
            (16, CFG.text.context_length)).astype(np.int32),
    }
    batch_np["prompt_tokens"][:, -1] = CFG.text.vocab_size - 1  # EOT

    def run(mesh):
        state, tx = create_train_state(
            params, head, "FLYP", lr_classifier=1e-3,
            lr_backbone=1e-4, total_iter=10)
        step = S.make_flyp_step(model, tx, image_size=32)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        if mesh is not None:
            batch = {k: jax.device_put(
                v, NamedSharding(mesh, P("data", *[None] * (v.ndim - 1))))
                for k, v in batch.items()}
            state = _shard_state_tp(state, mesh)
        new_state, loss = step(state, batch, jax.random.PRNGKey(3))
        return float(loss), jax.device_get(new_state.trainable)

    loss_1, tr_1 = run(None)
    loss_tp, tr_tp = run(create_mesh(MeshSpec(data=4, model=2)))
    assert loss_1 == pytest.approx(loss_tp, rel=1e-5)
    _trainable_allclose(tr_1, tr_tp)


def test_dp_sharded_scan_epoch_matches_single_device(rng):
    """The resident scan fast path (the flagship execution mode) trains
    dp-sharded: ResidentData sharded over 'data' + batch sharding
    constraints inside the scan body must reproduce the single-device
    epoch exactly (fp32) — VERDICT r2 item 3."""
    from swat_tpu.core.mesh import resident_sharding
    from swat_tpu.train.scan_loop import ResidentData, make_scan_epoch

    model = CLIPModel(CFG, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, CFG.text.context_length), jnp.int32))["params"]
    head = init_head_random(jax.random.PRNGKey(1), 3, CFG.embed_dim)

    n = 32
    canv = rng.integers(0, 255, (n, 40, 40, 3)).astype(np.uint8)
    hw = np.full((n, 2), 40, np.int32)
    labels = rng.integers(0, 3, n).astype(np.int32)
    source = rng.integers(0, 2, n).astype(np.int32)
    perm = rng.permutation(n)[:16].reshape(2, 8).astype(np.int32)

    def run(mesh):
        state, tx = create_train_state(
            params, head, "cutmix", lr_classifier=1e-3,
            lr_backbone=1e-4, total_iter=10)
        sh = resident_sharding(mesh, n)
        put = (lambda x: jax.device_put(x, sh)) if sh is not None \
            else jnp.asarray
        data = ResidentData(put(canv), put(hw), put(labels), put(source))
        if mesh is not None:
            state = jax.device_put(state, NamedSharding(mesh, P()))
        epoch = make_scan_epoch(model, tx, "cutmix", image_size=32,
                                mesh=mesh)
        new_state, loss = epoch(state, data, perm, jax.random.PRNGKey(3))
        return float(loss), np.asarray(new_state.head)

    loss_1, head_1 = run(None)
    mesh = create_mesh(MeshSpec(data=8, model=1))
    loss_8, head_8 = run(mesh)
    assert loss_1 == pytest.approx(loss_8, rel=1e-5)
    np.testing.assert_allclose(head_1, head_8, rtol=1e-5, atol=1e-7)


def test_dp_sharded_twin_scan_epoch_matches_single_device(rng):
    """The TWIN-loader scan family (cutmix-fs: concat fs batch then mix)
    must also be dp-exact with both resident datasets sharded."""
    from swat_tpu.core.mesh import resident_sharding
    from swat_tpu.train.scan_loop import ResidentData, make_scan_epoch

    model = CLIPModel(CFG, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, CFG.text.context_length), jnp.int32))["params"]
    head = init_head_random(jax.random.PRNGKey(1), 3, CFG.embed_dim)

    n, nt = 32, 16
    canv = rng.integers(0, 255, (n, 40, 40, 3)).astype(np.uint8)
    tcanv = rng.integers(0, 255, (nt, 40, 40, 3)).astype(np.uint8)
    labels = rng.integers(0, 3, n).astype(np.int32)
    tlabels = rng.integers(0, 3, nt).astype(np.int32)
    perm = rng.permutation(n)[:16].reshape(2, 8).astype(np.int32)
    tperm = rng.integers(0, nt, (2, 8)).astype(np.int32)

    def mk(mesh, c, l, m):
        sh = resident_sharding(mesh, c.shape[0])
        put = (lambda x: jax.device_put(x, sh)) if sh is not None \
            else jnp.asarray
        return ResidentData(put(c), put(np.full((c.shape[0], 2), 40,
                                                np.int32)),
                            put(l), put(m))

    def run(mesh):
        state, tx = create_train_state(
            params, head, "cutmix", lr_classifier=1e-3,
            lr_backbone=1e-4, total_iter=10)
        data = mk(mesh, canv, labels, np.ones(n, np.int32))
        twin = mk(mesh, tcanv, tlabels, np.ones(nt, np.int32))
        if mesh is not None:
            state = jax.device_put(state, NamedSharding(mesh, P()))
        epoch = make_scan_epoch(model, tx, "cutmix-fs", image_size=32,
                                mesh=mesh)
        new_state, loss = epoch(state, data, perm, jax.random.PRNGKey(3),
                                twin, tperm)
        return float(loss), np.asarray(new_state.head)

    loss_1, head_1 = run(None)
    mesh = create_mesh(MeshSpec(data=8, model=1))
    loss_8, head_8 = run(mesh)
    assert loss_1 == pytest.approx(loss_8, rel=1e-5)
    np.testing.assert_allclose(head_1, head_8, rtol=1e-5, atol=1e-7)


def test_dp_sharded_flyp_step_matches_single_device(rng):
    """FLYP's [B, B] bidirectional InfoNCE is the one loss with
    cross-sample coupling: under dp sharding GSPMD must all-gather the
    text features to form the full contrastive matrix — a sharding bug
    here would silently train on per-shard negatives only (reference
    InfoNCE, utils/training.py:459-476).  dp=8 must equal single-device
    to fp32 rounding (VERDICT r3 item 5)."""
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, CFG.text.context_length), jnp.int32))["params"]
    head = init_head_random(jax.random.PRNGKey(1), 3, CFG.embed_dim)

    batch_np = {
        "images": rng.normal(size=(16, 32, 32, 3)).astype(np.float32),
        "labels": rng.integers(0, 3, 16).astype(np.int32),
        "source": rng.integers(0, 2, 16).astype(np.int32),
        "prompt_tokens": rng.integers(
            1, CFG.text.vocab_size - 1,
            (16, CFG.text.context_length)).astype(np.int32),
    }
    batch_np["prompt_tokens"][:, -1] = CFG.text.vocab_size - 1  # EOT

    def run(mesh):
        state, tx = create_train_state(
            params, head, "FLYP", lr_classifier=1e-3,
            lr_backbone=1e-4, total_iter=10)
        step = S.make_flyp_step(model, tx, image_size=32)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        if mesh is not None:
            batch = {k: jax.device_put(
                v, NamedSharding(mesh, P("data", *[None] * (v.ndim - 1))))
                for k, v in batch.items()}
            state = jax.device_put(state, NamedSharding(mesh, P()))
        new_state, loss = step(state, batch, jax.random.PRNGKey(3))
        vis_leaf = np.asarray(jax.tree_util.tree_leaves(
            new_state.model["visual"])[0])
        return float(loss), float(new_state.logit_scale), vis_leaf

    loss_1, ls_1, leaf_1 = run(None)
    mesh = create_mesh(MeshSpec(data=8, model=1))
    loss_8, ls_8, leaf_8 = run(mesh)

    assert loss_1 == pytest.approx(loss_8, rel=1e-5)
    assert ls_1 == pytest.approx(ls_8, rel=1e-6)
    np.testing.assert_allclose(leaf_1, leaf_8, rtol=1e-5, atol=1e-7)


def test_dp_sharded_fixmatch_step_matches_single_device(rng):
    """FixMatch's confidence threshold and the mask-MEAN consistency
    weighting are global-batch statistics: mask.mean() over the full
    unlabeled batch must not become a per-shard mean under dp
    (reference :893-908).  The full on-device weak/strong augmentation
    path runs sharded (VERDICT r3 item 5)."""
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, CFG.text.context_length), jnp.int32))["params"]
    head = init_head_random(jax.random.PRNGKey(1), 3, CFG.embed_dim)

    batch_np = {
        "images": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
        "labels": rng.integers(0, 3, 8).astype(np.int32),
        "source": rng.integers(0, 2, 8).astype(np.int32),
        "canvases_u": rng.integers(0, 255, (16, 40, 40, 3)
                                   ).astype(np.uint8),
        "valid_hw_u": np.full((16, 2), 40, np.int32),
    }

    def run(mesh):
        state, tx = create_train_state(
            params, head, "fixmatch", lr_classifier=1e-3,
            lr_backbone=1e-4, total_iter=10)
        # threshold 0.38 so the pseudo-label mask engages PARTIALLY
        # (measured 0.56 on this fixture) on an untrained 3-class model:
        # 0.95 would zero the consistency term, 0 would saturate it —
        # either way hiding a per-shard-mean bug
        step = S.make_fixmatch_step(model, tx, threshold=0.38,
                                    image_size=32, aux=True)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        if mesh is not None:
            batch = {k: jax.device_put(
                v, NamedSharding(mesh, P("data", *[None] * (v.ndim - 1))))
                for k, v in batch.items()}
            state = jax.device_put(state, NamedSharding(mesh, P()))
        new_state, (loss, mask_rate, loss_u) = step(
            state, batch, jax.random.PRNGKey(3))
        return (float(loss), float(mask_rate), float(loss_u),
                np.asarray(new_state.head))

    loss_1, mask_1, lu_1, head_1 = run(None)
    mesh = create_mesh(MeshSpec(data=8, model=1))
    loss_8, mask_8, lu_8, head_8 = run(mesh)

    # the consistency term must engage PARTIALLY for this to test anything
    assert 0.0 < mask_1 < 1.0 and lu_1 > 0.0
    assert loss_1 == pytest.approx(loss_8, rel=1e-5)
    assert mask_1 == pytest.approx(mask_8, abs=1e-9)
    assert lu_1 == pytest.approx(lu_8, rel=1e-5)
    np.testing.assert_allclose(head_1, head_8, rtol=1e-5, atol=1e-7)


def test_dp_sharded_validate_matches_single_device(rng):
    """The eval path every trainer calls: a dp=8 mesh-sharded Evaluator
    must return the same accuracy, loss, and confusion matrix as the
    single-device one (batches ride shard_batch; pallas inference
    attention shard_maps or falls back — either way values match)."""
    from swat_tpu.eval.validate import Evaluator

    model = CLIPModel(CFG, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, CFG.text.context_length), jnp.int32))["params"]
    head = np.asarray(
        init_head_random(jax.random.PRNGKey(1), 3, CFG.embed_dim))

    def batches():
        out = []
        r = np.random.default_rng(0)
        for b in range(3):
            mask = np.ones(16, bool)
            if b == 2:
                mask[10:] = False  # ragged final batch, padded + masked
            out.append({
                "images": r.normal(size=(16, 32, 32, 3)).astype(np.float32),
                "labels": r.integers(0, 3, 16).astype(np.int32),
                "source": r.integers(0, 2, 16).astype(np.int32),
                "mask": mask,
            })
        return out

    ev1 = Evaluator(model, num_classes=3)
    acc1, loss1, cm1 = ev1.validate(params, head, np.log(100.0), batches(),
                                    return_confusion=True)

    mesh = create_mesh(MeshSpec(data=8, model=1))
    ev8 = Evaluator(model, num_classes=3, mesh=mesh)
    p8 = jax.device_put(params, NamedSharding(mesh, P()))
    acc8, loss8, cm8 = ev8.validate(p8, head, np.log(100.0), batches(),
                                    return_confusion=True)

    assert acc1 == pytest.approx(acc8, abs=1e-9)
    assert loss1 == pytest.approx(loss8, rel=1e-6)
    np.testing.assert_array_equal(cm1, cm8)
