"""Differential oracle: EXECUTE the reference's own main.py and lock-step
it against swat_tpu on identical weights, prompts, and data (VERDICT r5
item 2 — the FTS5 lesson applied to the training/orchestration side: the
expected values come from the reference's executed code, not from a
re-reading of it).

The reference runs in a subprocess under tests/reference_shims/ (real
torch + PIL + cv2; shimmed open_clip/torchvision/torchmetrics), on a
ShimCLIP whose math is torch_oracle_lib's OpenCLIP oracle — the same
oracle the JAX towers are parity-tested against — with weights generated
here and shared with the swat side through the normal checkpoint loader.

Match: /root/reference/main.py:544-606 (orchestration),
utils/training.py:296-412/1422-1556 (train_ce/train_cutmix),
testing.py:403-486 (validate), utils/optimizers.py (param groups +
schedule), utils/models.py:22-43 (set_classifier).
"""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest
import torch
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIMS = os.path.join(REPO, "tests", "reference_shims")
REFERENCE = os.environ.get("SWAT_REFERENCE_DIR", "/root/reference")
sys.path.insert(0, SHIMS)

from swat_tpu.core.config import RunConfig
from swat_tpu.data import prompts as P
from swat_tpu.data.registry import NUM_CLASSES_DICT
from swat_tpu.models.configs import (CLIPConfig, MODEL_REGISTRY, TextConfig,
                                     VisionConfig)
from swat_tpu.models.tokenizer import HashTokenizer

from torch_oracle_lib import make_oracle_sd

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE, "main.py")),
    reason="reference tree not mounted")

DS = "semi-aves"          # the reference CLI constrains --dataset choices
NUM_CLASSES = 3
MODEL_CFG = "refdiff_tiny"

# tiny-but-real-geometry CLIP: 224^2 / patch 32 so the reference's
# hardcoded transform(224, ...) (utils/dataloader.py:111) runs natively
CFG = CLIPConfig(
    name="refdiff-tiny",
    vision=VisionConfig(image_size=224, patch_size=32, width=64, layers=2,
                        heads=4, embed_dim=32, quick_gelu=True),
    text=TextConfig(context_length=16, vocab_size=512, width=32, layers=2,
                    heads=4, embed_dim=32, quick_gelu=True),
)


@pytest.fixture(scope="module", autouse=True)
def register():
    MODEL_REGISTRY[MODEL_CFG] = CFG
    saved = NUM_CLASSES_DICT.get(DS)
    NUM_CLASSES_DICT[DS] = NUM_CLASSES
    yield
    MODEL_REGISTRY.pop(MODEL_CFG, None)
    NUM_CLASSES_DICT[DS] = saved


def _encode_text_torch(sd_model, tokens):
    """Reference get_text_features semantics (utils/features.py:27-63):
    per-prompt normalized embeddings + normalized mean."""
    with torch.no_grad():
        feats = sd_model.encode_text(tokens)
        feats = feats / feats.norm(dim=-1, keepdim=True)
        mean = feats.mean(dim=0)
        mean = mean / mean.norm(dim=-1, keepdim=True)
    return feats, mean


def make_ref_sandbox(box, clip_cfg, *, sd_seed=5, img_seed=7,
                     fs_name="fewshot4_seed1.txt", n_fs=4, n_test=20,
                     n_retr=8):
    """Build the reference's CWD tree inside `box`: config.yml +
    data/<ds>/{splits, imgs, metrics json, prompts/*.pth caches} + the
    shim weight bundle.  Parameterized so method-specific differentials
    (dataset-cls needs embed_dim 512, CMLP needs split size == effective
    bsz == text-bank size) can build their own sandboxes."""
    from shim_open_clip import ShimCLIP

    v, t = clip_cfg.vision, clip_cfg.text
    data = box / "data"
    root = data / DS
    os.makedirs(root / "imgs")
    os.makedirs(root / "prompts")

    # ---- weights: one oracle sd, three consumers (shim bundle for the
    # reference, raw sd for swat's checkpoint loader, ShimCLIP here)
    sd = make_oracle_sd(seed=sd_seed, w=v.width, layers=v.layers,
                        embed=v.embed_dim, patch=v.patch_size,
                        img=v.image_size, ctx=t.context_length,
                        vocab=t.vocab_size, text_w=t.width,
                        text_layers=t.layers)
    bundle = {"sd": sd, "vision_layers": v.layers,
              "vision_heads": v.heads, "patch": v.patch_size,
              "text_layers": t.layers, "text_heads": t.heads,
              "vocab_size": t.vocab_size,
              "context_length": t.context_length,
              "image_size": v.image_size}
    torch.save(bundle, box / "shim_clip.pt")
    torch.save(sd, box / "openclip_sd.pt")
    model = ShimCLIP(sd, v.layers, v.heads, v.patch_size, t.layers,
                     t.heads)

    # ---- images: class-colored (exactly the model's resolution so the
    # eval Resize is geometry-free; pixel parity of the resample path
    # itself is covered by tests/test_data.py's PIL parity suite)
    rng = np.random.default_rng(img_seed)
    colors = np.asarray([[205, 40, 40], [40, 205, 40], [40, 40, 205]])
    px = v.image_size

    def write_split(name, n_per_class, fewshot, prefix):
        lines = []
        for c in range(NUM_CLASSES):
            for i in range(n_per_class):
                fname = f"imgs/{prefix}_{c}_{i}.jpg"
                arr = (colors[c] + rng.integers(-40, 40, (px, px, 3))
                       ).clip(0, 255).astype(np.uint8)
                Image.fromarray(arr).save(root / fname, quality=92)
                lines.append(f"{fname} {c} {fewshot}")
        with open(root / name, "w") as f:
            f.write("\n".join(lines) + "\n")

    write_split(fs_name, n_fs, 1, "fs")
    write_split("test.txt", n_test, 0, "te")
    write_split("T2T30.txt", n_retr, 0, "rt")

    # ---- metrics json (consumed by BOTH sides' prompt construction)
    metrics = {str(c): {"name": f"class{c}",
                        "most_common_name":
                            ["crimson warbler", "emerald finch",
                             "azure swift"][c],
                        "alternates": {f"class{c}": 3}}
               for c in range(NUM_CLASSES)}
    with open(root / f"{DS}_metrics-LAION400M.json", "w") as f:
        json.dump(metrics, f)

    # ---- prompt caches: the reference loads these .pth files instead of
    # encoding (utils/prompt.py:38-48), which also keeps it off the
    # .cuda() path in operate_on_prompt.  Built from the SAME prompt
    # strings swat generates (data/prompts.py == reference prompt_maker,
    # already parity-tested) and the SAME hash tokenizer.
    text_prompts = P.make_prompts(metrics, DS, "most_common_name")
    tok = HashTokenizer(t.vocab_size)
    tp_pth, tok_pth, ten_pth = {}, {}, {}
    for cid in sorted(text_prompts, key=int):
        corpus = text_prompts[cid]
        tokens = torch.from_numpy(
            np.asarray(tok(corpus, t.context_length))).long()
        feats, mean = _encode_text_torch(model, tokens)
        tp_pth[cid] = {"corpus": list(corpus)}
        tok_pth[cid] = {"all": tokens}
        ten_pth[cid] = {"all": feats, "mean": mean}
    base = f"{DS}_vitb32_openclip_laion400m_most_common_name"
    torch.save(tp_pth, root / "prompts" / f"{base}_text_prompts.pth")
    torch.save(tok_pth,
               root / "prompts" / f"{base}_tokenized_text_prompts.pth")
    torch.save(ten_pth, root / "prompts" / f"{base}_prompt_tensors.pth")

    with open(box / "config.yml", "w") as f:
        f.write(f"dataset_path: {data}\nretrieved_path: {data}\n")
    return box


@pytest.fixture(scope="module")
def sandbox(tmp_path_factory):
    """The reference's CWD tree: config.yml + data/<ds>/{splits, imgs,
    metrics json, prompts/*.pth caches} + the shim weight bundle."""
    return make_ref_sandbox(tmp_path_factory.mktemp("refbox"), CFG)


def run_reference(sandbox, *main_args, det_aug=False, expect_error=None,
                  env_extra=None, require_summary=True):
    """Run main.py under the shims.

    Default: asserts success and returns (summary_csv_line, stdout+err).
    With expect_error=<str>: asserts the reference CRASHED and that the
    string appears in its output (used to pin executed-dead-code paths),
    returning the combined output."""
    args = [sys.executable,
            os.path.join(SHIMS, "run_reference.py"), str(sandbox)]
    if det_aug:
        args.append("--deterministic-train-aug")
    args += ["--"] + list(main_args)
    env = dict(os.environ)
    env["SWAT_SHIM_CLIP"] = str(sandbox / "shim_clip.pt")
    env.pop("SWAT_BPE_PATH", None)
    if env_extra:
        env.update(env_extra)
    proc = subprocess.run(args, capture_output=True, text=True,
                          timeout=1200, env=env)
    out = proc.stdout + "\n" + proc.stderr
    if expect_error is not None:
        assert proc.returncode != 0, (
            f"expected the reference to crash with {expect_error!r} but "
            f"it exited 0:\n" + out[-4000:])
        assert expect_error in out, out[-4000:]
        return out
    assert proc.returncode == 0, out[-4000:]
    lines = [l for l in proc.stdout.strip().splitlines()
             if l.startswith(f"{DS},")]
    if not require_summary:
        # dataset-cls exit()s right after training (main.py:329-330)
        # and never prints a summary row
        return (lines[-1] if lines else None), out
    assert lines, out[-4000:]
    return lines[-1], out


def swat_cfg(sandbox, tmp_path, **kw):
    defaults = dict(
        dataset=DS, model_cfg=MODEL_CFG, shots=4, seed=1, training_seed=1,
        dataset_path=str(sandbox / "data"),
        retrieved_path=str(sandbox / "data"),
        checkpoint_path=str(sandbox / "openclip_sd.pt"),
        folder=str(tmp_path / "swat_out"), bsz=8, num_workers=0,
        epochs=1, mesh_data=1, mesh_model=1, retrieval_split="T2T30.txt")
    defaults.update(kw)
    return RunConfig(**defaults).derived()


# ---------------------------------------------------------------------------
# zeroshot: fully deterministic end to end on both sides — the executed
# reference's test accuracy is the expected value (argmax agreement on
# every test image through two independent stacks)


def test_zeroshot_matches_reference(sandbox, tmp_path):
    summary, out = run_reference(
        sandbox, "--dataset", DS, "--method", "zeroshot",
        "--cls_init", "REAL-Prompt", "--shots", "4", "--seed", "1",
        "--num_workers", "0", "--retrieval_split", "T2T30.txt",
        "--folder", "out_ref")
    # summary: ds,method,data_source,cls_init,shots,seed,split,acc(1dp)
    parts = summary.split(",")
    assert parts[1] == "zeroshot" and parts[4] == "4"
    ref_acc_1dp = float(parts[-1])
    m = re.search(r"Zero-shot Test Acc: ([0-9.]+)", out)
    assert m, out[-2000:]
    ref_acc = float(m.group(1))

    from swat_tpu.train.stages import SwatPipeline

    cfg = swat_cfg(sandbox, tmp_path, method="zeroshot")
    pipe = SwatPipeline(cfg)
    swat_acc = pipe.run_zeroshot()

    # the reference logs round(acc, 3); 60 test images -> acc is a
    # multiple of 5/3 %, so 3-decimal equality == per-image argmax
    # agreement on all 60
    assert round(swat_acc, 3) == pytest.approx(ref_acc, abs=2e-3), (
        f"swat {swat_acc} vs reference {ref_acc}")
    assert round(swat_acc, 1) == pytest.approx(ref_acc_1dp, abs=0.051)


# ---------------------------------------------------------------------------
# training trajectories: both sides train full-batch (bsz == split size, so
# DataLoader shuffle only permutes WITHIN the batch — loss/gradients are
# order-invariant to fp32 reduction rounding) under the deterministic
# train transform (augmentation parity has its own PIL-bit-exact suite).
# The reference's executed loss.csv IS the expected trajectory.


def _read_loss_csv(path):
    rows = []
    with open(path) as f:
        header = f.readline().strip()
        assert header == "Epoch,Iter,Train_loss,Val_loss,Val_acc,Test_acc"
        for line in f:
            rows.append([float(x) for x in line.strip().split(",")])
    return rows


def _ref_output_dir(sandbox, folder, method, epochs, source="fewshot"):
    case = (f"{DS}_{method}_{source}_REAL-Prompt_4shots_seed1_{epochs}eps")
    return sandbox / folder / f"output_{DS}" / case


def _compare_loss_csv(ref_rows, swat_rows):
    assert len(ref_rows) == len(swat_rows), (
        f"row count {len(ref_rows)} vs {len(swat_rows)}")
    for r, s in zip(ref_rows, swat_rows):
        assert r[0] == s[0] and r[1] == s[1], (r, s)   # epoch, iter
        np.testing.assert_allclose(s[2], r[2], rtol=5e-4, atol=2e-5,
                                   err_msg=f"train_loss {r} vs {s}")
        np.testing.assert_allclose(s[3], r[3], rtol=5e-4, atol=2e-5,
                                   err_msg=f"val_loss {r} vs {s}")
        # accuracies are argmax counts: exact agreement expected; the
        # reference rounds to 6 decimals
        assert abs(s[4] - r[4]) < 2e-3, f"val_acc {r} vs {s}"
        assert abs(s[5] - r[5]) < 2e-3, f"test_acc {r} vs {s}"


def test_finetune_trajectory_matches_reference(sandbox, tmp_path):
    """3 epochs of train_ce (reference utils/training.py:296-412) under
    --early_stop (validate every epoch): per-epoch train/val loss, val/test
    acc, and the stage-1 summary acc, all from the reference's executed
    run."""
    summary, out = run_reference(
        sandbox, "--dataset", DS, "--method", "finetune",
        "--cls_init", "REAL-Prompt", "--shots", "4", "--seed", "1",
        "--training_seed", "1", "--epochs", "3", "--bsz", "12",
        "--num_workers", "0", "--early_stop", "True",
        "--retrieval_split", "T2T30.txt", "--no_wsft", "--no_tau",
        "--skip_stage2", "--folder", "out_ce", det_aug=True)
    ref_rows = _read_loss_csv(
        _ref_output_dir(sandbox, "out_ce", "finetune", 3) / "loss.csv")
    ref_stage1_acc = float(summary.split(",")[7])

    from swat_tpu.train.stages import SwatPipeline

    cfg = swat_cfg(sandbox, tmp_path, method="finetune", epochs=3,
                   bsz=12, early_stop=True, aug_mode="eval",
                   resident="off", no_wsft=True, no_tau=True,
                   skip_stage2=True)
    pipe = SwatPipeline(cfg)
    swat_summary = pipe.run()
    swat_rows = _read_loss_csv(os.path.join(cfg.output_dir, "loss.csv"))

    _compare_loss_csv(ref_rows, swat_rows)
    assert float(swat_summary.split(",")[7]) == pytest.approx(
        ref_stage1_acc, abs=0.051)


def test_full_swat_orchestration_matches_reference(sandbox, tmp_path):
    """The flagship flow the reference's __main__ executes (main.py:
    544-606): stage-1 train_cutmix (mix_prob=0 makes the gate
    deterministic while exercising the cutmix trainer; the mixing MATH is
    twin-verified at full scale separately) -> WiSE-FT -> tau-norm ->
    stage-2 probing (args-mutation semantics: method/pre_extracted/epochs
    /early_stop, main.py:421-425) -> stage-2 FSFT -> the 11-field CSV
    summary.  Every loss.csv row across all three stages and all four
    summary accuracies come from the reference's executed run."""
    summary, out = run_reference(
        sandbox, "--dataset", DS, "--method", "cutmix",
        "--cls_init", "REAL-Prompt", "--shots", "4", "--seed", "1",
        "--training_seed", "1", "--epochs", "2", "--bsz", "12",
        "--num_workers", "0", "--early_stop", "True", "--mix_prob", "0",
        "--data_source", "fewshot+retrieved",
        "--retrieval_split", "T2T30.txt", "--folder", "out_swat",
        det_aug=True)
    parts = summary.split(",")
    assert len(parts) == 11, summary
    ref_accs = [float(x) for x in parts[7:]]
    ref_rows = _read_loss_csv(
        _ref_output_dir(sandbox, "out_swat", "cutmix", 2,
                        source="fewshot+retrieved") / "loss.csv")

    from swat_tpu.train.stages import SwatPipeline

    cfg = swat_cfg(sandbox, tmp_path, method="cutmix", epochs=2, bsz=12,
                   early_stop=True, mix_prob=0.0,
                   data_source="fewshot+retrieved", aug_mode="eval",
                   resident="off")
    pipe = SwatPipeline(cfg)
    swat_summary = pipe.run()
    swat_parts = swat_summary.split(",")
    assert len(swat_parts) == 11, swat_summary
    swat_rows = _read_loss_csv(os.path.join(cfg.output_dir, "loss.csv"))

    _compare_loss_csv(ref_rows, swat_rows)
    for name, r, s in zip(("stage1", "wsft", "stage2lp", "stage2fsft"),
                          ref_accs, (float(x) for x in swat_parts[7:])):
        assert s == pytest.approx(r, abs=0.051), (
            f"{name}: swat {s} vs reference {r}")


def test_probing_trajectory_matches_reference(sandbox, tmp_path):
    """train_probing on the PRE-EXTRACTED fast path (reference
    utils/training.py:47-161 + pre_extract_feature,
    utils/dataloader.py:35-104): frozen encoder, one train-transform
    feature snapshot, head-only CE at the FIXED ln(100) logit scale
    (utils/optimizers.py:51-59).  --pre_extracted matches how the
    reference's own REAL-Linear script invokes probing
    (scripts/run_dataset_REAL-Linear.sh:78) — EXECUTING the reference
    showed the streaming flavor crashes in main.py:352 (it validates the
    streaming loaders with pre_extracted=True when no --model_path is
    given), so pre-extracted IS the reference's executed standalone
    probing config."""
    summary, out = run_reference(
        sandbox, "--dataset", DS, "--method", "probing",
        "--cls_init", "REAL-Prompt", "--shots", "4", "--seed", "1",
        "--training_seed", "1", "--epochs", "3", "--bsz", "12",
        "--num_workers", "0", "--early_stop", "True",
        "--pre_extracted", "--recal_fea",
        "--retrieval_split", "T2T30.txt", "--no_wsft", "--no_tau",
        "--skip_stage2", "--folder", "out_probe", det_aug=True)
    ref_rows = _read_loss_csv(
        _ref_output_dir(sandbox, "out_probe", "probing", 3) / "loss.csv")
    ref_stage1_acc = float(summary.split(",")[7])

    from swat_tpu.train.stages import SwatPipeline

    cfg = swat_cfg(sandbox, tmp_path, method="probing", epochs=3,
                   bsz=12, early_stop=True, aug_mode="eval",
                   resident="off", no_wsft=True, no_tau=True,
                   pre_extracted=True, recal_fea=True,
                   skip_stage2=True)
    pipe = SwatPipeline(cfg)
    swat_summary = pipe.run()
    swat_rows = _read_loss_csv(os.path.join(cfg.output_dir, "loss.csv"))

    _compare_loss_csv(ref_rows, swat_rows)
    assert float(swat_summary.split(",")[7]) == pytest.approx(
        ref_stage1_acc, abs=0.051)


# ---------------------------------------------------------------------------
# retrieval sampler dispatch: the reference's sampling()
# (sample_retrieval.py:1471-1670) executed on synthetic features IS the
# expected selection — previously our sampler was verified against
# hand-computed semantics only (VERDICT r5 item 2, second half)


@pytest.fixture(scope="module")
def sampler_sandbox(tmp_path_factory):
    box = tmp_path_factory.mktemp("samplerbox")
    ds_dir = box / "data" / DS
    os.makedirs(ds_dir / "prompts")
    os.makedirs(ds_dir / "pre_extracted")
    os.makedirs(box / "retrieval")

    rng = np.random.default_rng(11)
    dim, per_class = 32, 40

    def unit(n):
        x = rng.normal(size=(n, dim)).astype(np.float32)
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    feats, cap_feats, labels, paths = [], [], [], []
    caption_map = {}
    for c in range(NUM_CLASSES):
        f = unit(per_class)
        # plant two near-duplicate pairs per class (cos ~ 0.999 > 0.9)
        f[1] = f[0] + 1e-2 * unit(1)[0]
        f[1] /= np.linalg.norm(f[1])
        f[7] = f[6] + 1e-2 * unit(1)[0]
        f[7] /= np.linalg.norm(f[7])
        feats.append(f)
        cap_feats.append(unit(per_class))
        labels.extend([c] * per_class)
        caption_map[str(c)] = {}
        # numeric file stems equal to the within-class position: the
        # reference's dedup maps duplicate ROW indices to files by
        # parsing the filename as an int (remove_near_duplicates2,
        # sample_retrieval.py:262-267) — the downloader's restructure
        # step names mined images by their per-class index, and the
        # executed sampler depends on that
        for i in range(per_class):
            paths.append(f"mined/{c}/{i:03d}.jpg")
            caption_map[str(c)][f"{i:03d}"] = f"caption {c} {i}"

    import pickle

    import torch as _t

    bundle = {
        "image_features": _t.from_numpy(np.concatenate(feats)),
        "caption_features": _t.from_numpy(np.concatenate(cap_feats)),
        "labels": _t.tensor(labels),
        "filepath": paths,
    }
    _t.save(bundle, ds_dir / f"{DS}_vitb32_openclip_laion400m_mined.pth")
    with open(ds_dir / "caption.map", "wb") as f:
        pickle.dump(caption_map, f)

    # prompt tensors: per-class 'mean' embedding (the samplers read only
    # 'mean', sample_retrieval.py:751-752)
    prompt_tensors = {}
    for c in range(NUM_CLASSES):
        m = unit(1)[0]
        prompt_tensors[str(c)] = {
            "all": _t.from_numpy(unit(2)), "mean": _t.from_numpy(m)}
    _t.save(prompt_tensors,
            ds_dir / "prompts" /
            f"{DS}_vitb32_openclip_laion400m_most_common_name_"
            "prompt_tensors.pth")

    # few-shot probing features for I2I/I2T strategies
    # (get_fewshot_features asserts 16 per class, :1011)
    fs = unit(16 * NUM_CLASSES)
    fs_labels = np.repeat(np.arange(NUM_CLASSES), 16)
    _t.save({"image_features": _t.from_numpy(fs),
             "labels": _t.tensor(fs_labels)},
            ds_dir / "pre_extracted" /
            f"{DS}_probing_vitb32_openclip_laion400m_1_train_features.pth")

    pool_args = dict(file_paths=paths, labels=np.asarray(labels),
                     image_feats=np.concatenate(feats),
                     caption_feats=np.concatenate(cap_feats))
    fewshot_by_class = {c: fs[fs_labels == c] for c in range(NUM_CLASSES)}
    return box, pool_args, prompt_tensors, fewshot_by_class


@pytest.mark.parametrize("strategy,dedup", [
    ("T2T-rank", False), ("T2T-rank", True),
    ("T2T-rank-T2I-tshd", False),
    ("T2I-rank", False),
    ("I2T-rank", False),
    ("I2I-rank", True),
    ("Random", False),   # num_samples >= pool: selects all, rng-free
])
def test_sampler_matches_reference(sampler_sandbox, tmp_path, strategy,
                                   dedup):
    box, pool_args, prompt_tensors, fewshot_by_class = sampler_sandbox
    num = 1000 if strategy == "Random" else 12
    out_json = tmp_path / f"{strategy}_{dedup}.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(SHIMS, "run_sampler.py"), str(box),
         DS, strategy, str(num), str(int(dedup)), str(out_json)],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, (proc.stdout + proc.stderr)[-4000:]
    ref = json.loads(out_json.read_text())

    from swat_tpu.retrieval.sampler import (MinedPool, sample_retrieved,
                                            sample_retrieved_fused)

    pool = MinedPool(**pool_args)
    pt = {cid: {"mean": np.asarray(v["mean"]), "all": np.asarray(v["all"])}
          for cid, v in prompt_tensors.items()}
    for fn in (sample_retrieved, sample_retrieved_fused):
        res = fn(pool, pt, strategy=strategy, num_samples=num,
                 fewshot_feats_by_class=fewshot_by_class,
                 remove_duplicates=dedup)
        got = [f"{p} {l} 0" for p, l in zip(res["file_list"],
                                            res["label_list"])]
        if strategy == "Random":
            # reference order is random.shuffle on an unseeded global RNG
            # (sample_retrieval.py:633) — the SELECTION is deterministic
            # (num_samples >= pool, threshold 0), the order is not
            got, ref_rows = sorted(got), sorted(ref["rows"])
        else:
            ref_rows = ref["rows"]
        assert got == ref_rows, (
            f"{fn.__name__}/{strategy} dedup={dedup}: "
            f"{len(got)} vs {len(ref_rows)} rows; first diff: "
            f"{next(((a, b) for a, b in zip(got, ref_rows) if a != b), None)}")


def test_flyp_trajectory_matches_reference(sandbox, tmp_path):
    """train_flyp (reference utils/training.py:415-552): the bidirectional
    InfoNCE trains BOTH towers and rebuilds the classifier head from the
    updated text tower at every eval (build_classifier_head,
    utils/models.py:75-82).  One prompt per class makes the per-sample
    prompt draw deterministic, so the executed reference trajectory is
    comparable row by row."""
    summary, out = run_reference(
        sandbox, "--dataset", DS, "--method", "FLYP",
        "--cls_init", "REAL-Prompt", "--shots", "4", "--seed", "1",
        "--training_seed", "1", "--epochs", "3", "--bsz", "12",
        "--num_workers", "0", "--early_stop", "True",
        "--retrieval_split", "T2T30.txt", "--no_wsft", "--no_tau",
        "--skip_stage2", "--folder", "out_flyp", det_aug=True)
    ref_rows = _read_loss_csv(
        _ref_output_dir(sandbox, "out_flyp", "FLYP", 3) / "loss.csv")
    ref_stage1_acc = float(summary.split(",")[7])

    from swat_tpu.train.stages import SwatPipeline

    cfg = swat_cfg(sandbox, tmp_path, method="FLYP", epochs=3, bsz=12,
                   early_stop=True, aug_mode="eval", resident="off",
                   no_wsft=True, no_tau=True, skip_stage2=True)
    pipe = SwatPipeline(cfg)
    swat_summary = pipe.run()
    swat_rows = _read_loss_csv(os.path.join(cfg.output_dir, "loss.csv"))

    _compare_loss_csv(ref_rows, swat_rows)
    assert float(swat_summary.split(",")[7]) == pytest.approx(
        ref_stage1_acc, abs=0.051)
