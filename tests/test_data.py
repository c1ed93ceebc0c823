"""Split files, prompts, pipeline loaders, eval metrics."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from swat_tpu.data.prompts import (
    class_embedding_matrix,
    encode_prompts,
    load_class_metrics,
    make_prompts,
    tokenize_prompts,
)
from swat_tpu.data.pipeline import (
    CyclingLoader,
    EvalLoader,
    FeatureBatches,
    TrainLoader,
    WeightedTrainLoader,
)
from swat_tpu.data.splits import Sample, class_counts, read_split, write_split
from swat_tpu.eval.metrics import calculate_scores, confusion_matrix_update
from swat_tpu.models.tokenizer import HashTokenizer


@pytest.fixture
def image_dataset(tmp_path, rng):
    """Synthetic split dir: 3 classes x 10 images, reference line format."""
    root = tmp_path / "ds"
    os.makedirs(root / "imgs")
    samples = []
    for i in range(30):
        label = i % 3
        arr = rng.integers(0, 255, (37 + i, 53, 3)).astype(np.uint8)
        p = root / "imgs" / f"{i}.jpg"
        Image.fromarray(arr).save(p)
        samples.append(Sample(str(p), label, int(i % 2)))
    write_split(str(root / "train.txt"),
                [Sample(f"imgs/{i}.jpg", s.label, s.is_fewshot)
                 for i, s in enumerate(samples)])
    return str(root), samples


def test_read_split_multi_source(image_dataset):
    root, _ = image_dataset
    samples = read_split(root, ([os.path.join(root, "train.txt")], ["BASE"]))
    assert len(samples) == 30
    assert samples[0].path == "BASE/imgs/0.jpg"
    assert class_counts(samples, 3) == [10, 10, 10]


def test_eval_loader_pads_and_masks(image_dataset):
    root, samples = image_dataset
    loader = EvalLoader(samples, batch_size=8, n_px=32, num_workers=4)
    batches = list(loader)
    assert len(batches) == 4
    assert batches[-1]["images"].shape == (8, 32, 32, 3)
    assert batches[-1]["mask"].sum() == 30 - 24
    total = sum(int(b["mask"].sum()) for b in batches)
    assert total == 30


def test_loaders_accept_zero_workers(image_dataset):
    """--num_workers 0 = in-process loading (torch DataLoader semantics;
    the reference passes it straight into DataLoader).  Regression: a raw
    ThreadPoolExecutor(0) raises ValueError."""
    root, samples = image_dataset
    ev = EvalLoader(samples, batch_size=8, n_px=32, num_workers=0)
    assert sum(int(b["mask"].sum()) for b in ev) == 30
    tr = TrainLoader(samples, batch_size=8, seed=1, canvas=64, num_workers=0)
    assert next(iter(tr))["canvases"].shape[0] == 8


def test_train_loader_canvas_mode(image_dataset):
    root, samples = image_dataset
    loader = TrainLoader(samples, batch_size=8, seed=1, canvas=64,
                         num_workers=4)
    batches = list(loader)
    assert len(batches) == 3  # drop_last
    b = batches[0]
    assert b["canvases"].shape == (8, 64, 64, 3)
    assert b["canvases"].dtype == np.uint8
    assert b["valid_hw"].shape == (8, 2)
    # valid dims: aspect preserved, longest side == canvas
    assert (b["valid_hw"].max(axis=1) == 64).all()


def test_train_loader_prompt_sampling(image_dataset):
    root, samples = image_dataset
    toks = {str(c): np.full((5, 77), c + 1, np.int32) for c in range(3)}
    loader = TrainLoader(samples, batch_size=8, seed=1, canvas=32,
                         tokenized_prompts=toks, num_workers=2)
    b = next(iter(loader))
    assert b["prompt_tokens"].shape == (8, 77)
    np.testing.assert_array_equal(b["prompt_tokens"][:, 0], b["labels"] + 1)


def test_cycling_loader(image_dataset):
    root, samples = image_dataset
    loader = TrainLoader(samples[:16], batch_size=8, seed=1, canvas=32,
                         num_workers=2)
    cyc = CyclingLoader(loader)
    for _ in range(7):  # > 2 epochs worth
        b = cyc.next()
        assert b["labels"].shape == (8,)


def test_weighted_loader_oversamples_minority(rng, tmp_path):
    # class 0: 90 samples, class 1: 10 -> weighted should balance
    os.makedirs(tmp_path / "i", exist_ok=True)
    arr = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    Image.fromarray(arr).save(tmp_path / "i" / "x.jpg")
    p = str(tmp_path / "i" / "x.jpg")
    samples = [Sample(p, 0, 1)] * 90 + [Sample(p, 1, 1)] * 10
    loader = WeightedTrainLoader(samples, num_classes=2, cmo_alpha=1.0,
                                 batch_size=20, seed=0, canvas=16,
                                 num_workers=2)
    counts = np.zeros(2)
    for b in loader:
        counts += np.bincount(b["labels"], minlength=2)
    assert counts[1] / counts.sum() > 0.3  # vs 0.1 unweighted


def test_feature_batches(rng):
    feats = rng.normal(size=(25, 8)).astype(np.float32)
    labels = rng.integers(0, 3, 25)
    fb = FeatureBatches(feats, labels, batch_size=8)
    bs = list(fb)
    assert len(bs) == 4
    assert sum(int(b["mask"].sum()) for b in bs) == 25


def test_prompts_pipeline(tmp_path):
    metrics = {
        "1": {"name": "b", "most_common_name": "bee"},
        "0": {"name": "a", "most_common_name": "ant"},
    }
    prompts = make_prompts(metrics, "flowers102", "most_common_name")
    assert list(prompts) == ["0", "1"]  # sorted by int id
    assert prompts["0"] == ["a photo of a ant, a type of flower."]

    tok = HashTokenizer(512)
    tokenized = tokenize_prompts(prompts, tok, context_length=16)
    assert tokenized["0"].shape == (1, 16)

    def fake_encode(tokens):
        out = np.zeros((tokens.shape[0], 4), np.float32)
        out[:, 0] = tokens[:, 1]  # deterministic per-class
        out[:, 1] = 1.0
        return out / np.linalg.norm(out, axis=-1, keepdims=True)

    tensors = encode_prompts(fake_encode, tokenized)
    mat = class_embedding_matrix(tensors)
    assert mat.shape == (2, 4)
    np.testing.assert_allclose(np.linalg.norm(mat, axis=-1), 1.0, rtol=1e-5)


def test_alternates_prompts():
    metrics = {"0": {"alternates": "{'Foo': 3, 'Bar': 5}"}}
    prompts = make_prompts(metrics, "flowers102", "alternates")
    assert len(prompts["0"]) == 2


def test_calculate_scores_and_cm():
    cm = np.zeros((3, 3), np.int64)
    preds = np.array([0, 1, 2, 0, 0])
    labels = np.array([0, 1, 1, 2, 0])
    cm = confusion_matrix_update(cm, preds, labels)
    assert cm.sum() == 5
    assert cm[1, 1] == 1 and cm[1, 2] == 1 and cm[2, 0] == 1
    scores = calculate_scores(cm)
    assert scores["acc"] == pytest.approx(3 / 5)
    assert scores["per_class_recall"][1] == pytest.approx(0.5)
    # mask drops padded entries
    cm2 = confusion_matrix_update(np.zeros((3, 3), np.int64), preds, labels,
                                  np.array([1, 1, 1, 0, 0], bool))
    assert cm2.sum() == 3


def test_device_confusion_matches_host_path():
    """The device-side scatter-add confusion carry (Evaluator.validate
    with return_confusion, VERDICT r3 item 6) must equal the host
    bincount path over the same padded multi-batch stream, including
    masked padding rows."""
    import jax.numpy as jnp

    from swat_tpu.eval.validate import Evaluator

    num_classes, dim, bsz = 5, 6, 4
    rng = np.random.default_rng(3)
    head = rng.normal(size=(num_classes, dim)).astype(np.float32)
    batches = []
    for i in range(3):
        feats = rng.normal(size=(bsz, dim)).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        mask = np.ones(bsz, bool)
        if i == 2:
            mask[2:] = False         # ragged final batch padding
        batches.append({"features": feats,
                        "labels": rng.integers(0, num_classes, bsz),
                        "source": np.zeros(bsz, np.int64),
                        "mask": mask})

    ev = Evaluator(None, num_classes)   # model unused on the feature path
    acc, loss, cm = ev.validate(None, jnp.asarray(head), 0.0, batches,
                                pre_extracted=True, return_confusion=True)

    host_cm = np.zeros((num_classes, num_classes), np.int64)
    n_correct = n_valid = 0
    for b in batches:
        preds = np.argmax(b["features"] @ head.T, axis=-1)
        host_cm = confusion_matrix_update(host_cm, preds, b["labels"],
                                          b["mask"])
        n_correct += int(((preds == b["labels"]) & b["mask"]).sum())
        n_valid += int(b["mask"].sum())
    np.testing.assert_array_equal(cm, host_cm)
    assert cm.sum() == n_valid          # padding rows contributed nothing
    assert acc == pytest.approx(n_correct / n_valid * 100.0)
    assert np.isfinite(loss)


def test_attribute_prompts():
    from swat_tpu.data.prompts import make_attribute_prompts

    metrics = {"0": {"most_common_name": "robin"}}
    attributes = {"0": {"corpus": ["Has red breast", "small beak"]}}
    prompts = make_attribute_prompts(metrics, "flowers102", attributes)
    assert prompts["0"][0] == "a photo of a robin, a type of flower."
    assert ("a photo of a robin, a type of flower. robin has red breast"
            in prompts["0"])
    assert len(prompts["0"]) == 3


def test_worst_k_classes():
    from swat_tpu.eval.analysis import worst_k_classes

    cm = np.array([[8, 2, 0], [0, 5, 5], [1, 9, 0]])
    scores = calculate_scores(cm)
    out = worst_k_classes(scores, cm, n_worst=2, top_confusions=3,
                          id_to_name={"0": "a", "1": "b", "2": "c"})
    assert list(out) == ["2", "1"]  # recall 0.0 then 0.5
    top = out["2"]["confused_with"][0]
    assert top[0] == 1 and top[1] == "b" and top[2] == 9


def test_legacy_inat_reader(tmp_path):
    from swat_tpu.data.legacy import read_legacy_split

    with open(tmp_path / "l_train.txt", "w") as f:
        f.write("trainval_images/a.jpg 3\ntrainval_images/b.jpg 7\n")
    samples = read_legacy_split(str(tmp_path), "l_train")
    assert len(samples) == 2 and samples[1].label == 7
    assert samples[0].path.endswith("trainval_images/a.jpg")
    # semi-fungi '.JPG ' separator quirk + pseudo-label merge
    with open(tmp_path / "u_train.txt", "w") as f:
        f.write("images/x y.JPG 2\n")
    s2 = read_legacy_split(str(tmp_path), "u_train", task="semi_fungi",
                           pl_list=["images/z.JPG 5"])
    assert s2[0].path.endswith("images/x y.JPG") and s2[0].label == 2
    assert s2[1].label == 5


def test_topk_prompt_scoring(rng):
    from swat_tpu.eval.topk_prompts import validate_topk

    D = 8
    # class 0 has 4 prompts near e0; class 1 has 2 prompts near e1
    e = np.eye(2, D).astype(np.float32)
    tensors = {
        "0": {"all": e[0] + rng.normal(0, .01, (4, D)).astype(np.float32)},
        "1": {"all": e[1] + rng.normal(0, .01, (2, D)).astype(np.float32)},
    }
    feats = np.stack([e[0], e[1], e[0]])
    labels = np.array([0, 1, 0])
    acc = validate_topk(feats, labels, tensors, k=3)
    assert acc == 100.0


def test_cub200_reader(tmp_path):
    """CUB-200-2011 metadata join (reference utils/datasets/CUB200.py)."""
    import os

    from swat_tpu.data.legacy import read_cub200_split

    meta = tmp_path / "CUB_200_2011"
    os.makedirs(meta)
    (meta / "images.txt").write_text(
        "1 001.Black_footed_Albatross/a.jpg\n"
        "2 001.Black_footed_Albatross/b.jpg\n"
        "3 002.Laysan_Albatross/c.jpg\n")
    (meta / "image_class_labels.txt").write_text("1 1\n2 1\n3 2\n")
    (meta / "train_test_split.txt").write_text("1 1\n2 0\n3 1\n")

    train = read_cub200_split(str(tmp_path), train=True)
    test = read_cub200_split(str(tmp_path), train=False)
    assert [s.label for s in train] == [0, 1]  # 1-indexed -> 0-indexed
    assert len(test) == 1 and test[0].path.endswith("b.jpg")
    assert all("CUB_200_2011/images" in s.path for s in train)


def test_make_prompts_semi_aves_name_types():
    """semi-aves name types resolve dedicated metrics fields; t-name
    formats species AND common name into its two-placeholder template
    (reference prompt_maker_aves, utils/prompt.py:108-141)."""
    from swat_tpu.data.prompts import make_prompts

    metrics = {"0": {"species": "Turdus merula",
                     "common_name": "common blackbird",
                     "most_freq_synonym": "blackbird",
                     "most_common_name": "blackbird"}}
    t = make_prompts(metrics, "semi-aves", "t-name")
    assert t["0"] == ["a photo of a Turdus merula, a type of bird, "
                      "commonally known as common blackbird."]
    s = make_prompts(metrics, "semi-aves", "s-name")
    assert s["0"] == ["a photo of a Turdus merula, a type of bird."]
    c = make_prompts(metrics, "semi-aves", "c-name")
    assert c["0"] == ["a photo of a common blackbird, a type of bird."]
    f = make_prompts(metrics, "semi-aves", "f-name")
    assert f["0"] == ["a photo of a blackbird, a type of bird."]


# ---------------------------------------------------------------------------
# transform parity regressions (torchvision semantics, hand-derived —
# torchvision is not installed in this image)


def test_rrc_fallback_is_ratio_clamped_center_crop():
    """A 3:2 image fails all 10 RandomResizedCrop attempts with
    scale=(0.9,1.0) (max feasible area (4/3)h^2 < 0.9*1.5h^2), so
    torchvision's get_params falls back to the ratio-clamped CENTER crop
    — not the whole stretched image (reference utils/extras.py:69-71)."""
    from PIL import Image

    from swat_tpu.data.transforms import host_train_preprocess

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (60, 90, 3)).astype(np.uint8)
    img = Image.fromarray(arr)
    got = host_train_preprocess(img, np.random.default_rng(7), n_px=32)

    # replicate the function's rng consumption exactly: 10 failed
    # attempts (2 draws each), then the flip draw
    r = np.random.default_rng(7)
    for _ in range(10):
        r.uniform(0.9, 1.0)
        r.uniform(np.log(3 / 4), np.log(4 / 3))
    # expected box: in_ratio 1.5 > 4/3 -> ch=60, cw=round(60*4/3)=80,
    # centered: j=(90-80)//2=5, i=0
    exp = img.crop((5, 0, 85, 60)).resize((32, 32), Image.BICUBIC)
    if r.random() < 0.5:
        exp = exp.transpose(Image.FLIP_LEFT_RIGHT)
    from swat_tpu.kernels.augment import CLIP_MEAN, CLIP_STD

    x = np.asarray(exp.convert("RGB"), np.float32) / 255.0
    x = (x - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(
        CLIP_STD, np.float32)
    np.testing.assert_allclose(got, x, atol=1e-6)


def test_center_crop_rounds_like_torchvision():
    """torchvision F.center_crop uses int(round(d/2.0)) (round-half-even)
    for the crop offset; floor-divide shifts d%4==3 crops by one pixel."""
    from PIL import Image

    from swat_tpu.data.transforms import eval_crop

    # w=32, h=35: short side already 32 -> nh=int(35*32/32)=35, d=3 ->
    # torchvision top=round(1.5)=2 (half-even), floor would give 1
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (35, 32, 3)).astype(np.uint8)
    img = Image.fromarray(arr)
    got = np.asarray(eval_crop(img, 32))
    exp = np.asarray(img.crop((0, 2, 32, 34)))
    np.testing.assert_array_equal(got, exp)


def test_palette_image_converts_after_resize():
    """The reference converts to RGB AFTER the geometric transforms
    (_convert_image_to_rgb placement, utils/extras.py:75,84), so palette
    images resample in P mode (PIL silently uses NEAREST) and only then
    convert — convert-first would bicubic-interpolate instead."""
    from PIL import Image

    from swat_tpu.data.transforms import eval_crop

    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (48, 48, 3)).astype(np.uint8)
    pimg = Image.fromarray(arr).convert("P", palette=Image.ADAPTIVE)

    got = np.asarray(eval_crop(pimg, 32))
    exp = np.asarray(
        pimg.resize((32, 32), Image.BICUBIC).convert("RGB"))
    np.testing.assert_array_equal(got, exp)
    convert_first = np.asarray(
        pimg.convert("RGB").resize((32, 32), Image.BICUBIC))
    assert np.abs(got.astype(int) - convert_first.astype(int)).max() > 0


def test_device_prefetch_double_buffer():
    """device_prefetch yields every batch sharded over the data axis, in
    order, with up to `depth` uploads in flight; breaking the consumer
    closes the source generator (thread pools shut down)."""
    import jax

    from swat_tpu.core.mesh import MeshSpec, create_mesh
    from swat_tpu.data.pipeline import device_prefetch

    mesh = create_mesh(MeshSpec(data=8, model=1))
    batches = [{"x": np.full((16, 3), i, np.float32),
                "y": np.arange(16) + i} for i in range(5)]

    out = list(device_prefetch(iter(batches), mesh, depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])
        np.testing.assert_array_equal(np.asarray(b["y"]), batches[i]["y"])
        assert "data" in str(b["x"].sharding.spec)

    closed = []

    def src():
        try:
            for b in batches:
                yield b
        finally:
            closed.append(True)

    gen = device_prefetch(src(), mesh, depth=1)
    next(gen)
    gen.close()
    assert closed == [True]


def test_text_encoder_bakes_no_param_constants(rng):
    """make_text_encoder must bind params as a runtime ARGUMENT: closing
    the jit over the tree serializes every touched leaf into the lowered
    module as a dense literal, and the axon remote-compile endpoint
    rejects an L/14-sized request body with HTTP 413 (measured r4 — the
    bug that killed L/14 prompt encoding while B/32 slipped under the
    limit).  Guard: the arg-bound lowering must be an order of magnitude
    smaller than the closure lowering of the same program, and must
    produce identical features."""
    import jax
    import jax.numpy as jnp

    from swat_tpu.data.features import make_text_encoder
    from swat_tpu.models import functional as F
    from swat_tpu.models.clip import CLIPModel
    from swat_tpu.models.configs import get_model_config

    cfg = get_model_config("test_tiny")
    model = CLIPModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3)),
        jnp.zeros((1, cfg.text.context_length), jnp.int32))["params"]
    tokens = np.asarray(
        rng.integers(0, cfg.text.vocab_size, (4, cfg.text.context_length)),
        np.int32)

    enc = make_text_encoder(model, params)
    arg_text = enc._jitted.lower(params, tokens).as_text()

    closure = jax.jit(lambda t: F.encode_text(model, params, t,
                                              normalize=True, mode="infer"))
    closure_text = closure.lower(tokens).as_text()

    # the vocab embedding table must appear as a dense literal only in
    # the closure lowering; the arg-bound program is shape-only
    vocab_ty = f"tensor<{cfg.text.vocab_size}x{cfg.text.width}xf32>"
    baked_closure = any(vocab_ty in ln and "dense<" in ln
                        for ln in closure_text.splitlines())
    baked_arg = any(vocab_ty in ln and "dense<" in ln
                    for ln in arg_text.splitlines())
    assert baked_closure and not baked_arg, (baked_closure, baked_arg)
    # and the literal bloat dominates the module size
    assert len(arg_text) * 5 < len(closure_text), (
        len(arg_text), len(closure_text))

    got = np.asarray(enc(tokens))
    want = np.asarray(closure(tokens))
    np.testing.assert_array_equal(got, want)
    assert got.shape == (4, cfg.embed_dim)
