"""Reproduction tests against the data artifacts the reference repo ships.

The upstream repo checks REAL outputs of its own data-prep and retrieval
pipelines into ``data/{dataset}/``: the few-shot splits sampled from the
shipped train lists (prepare_fewshot_txt.py), the LAION-400M string-match
metrics JSONs with the selected ``most_common_name`` (laion_parser.py),
and the retrieved ``T2T500+T2I0.25.txt`` splits.  These are the exact
inputs behind the paper's accuracy tables (BASELINE.md), so reproducing
them from the shipped raw inputs is the strongest accuracy-reproduction
evidence available without the image assets: drift here changes WHICH
images/prompts a paper run trains on, before any model math runs.

Gated: these tests run only where a reference checkout is present
(SWAT_REFERENCE_DATA or /root/reference/data); they read it, never write.
"""

import glob
import json
import os

import pytest

REF_DATA = os.environ.get("SWAT_REFERENCE_DATA", "/root/reference/data")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA),
    reason="reference data artifacts not present")

# datasets whose raw train list ships alongside the derived fewshot files
FEWSHOT_DATASETS = [
    "semi-aves", "dtd", "fgvc-aircraft", "eurosat", "flowers102",
    "oxford_pets", "food101", "stanford_cars",
]


@pytest.mark.parametrize("dataset", FEWSHOT_DATASETS)
def test_fewshot_splits_reproduce_shipped(dataset, tmp_path):
    """Our fewshot sampler reproduces every shipped fewshot{K}_seed{S}.txt
    byte-for-byte from the shipped train list (reference
    prepare_fewshot_txt.py:26-105: one random.seed(seed) then per-class
    random.sample in file-encounter order).  These files define the paper's
    few-shot subsets for seeds {1,2,3} x shots {4,8,16}."""
    import shutil

    from swat_tpu.cli.prepare_data import random_sample_fewshot

    train_fn = "ltrain+val.txt" if dataset == "semi-aves" else "train.txt"
    src = os.path.join(REF_DATA, dataset, train_fn)
    if not os.path.exists(src):
        pytest.skip(f"{dataset} train list not shipped")
    shutil.copy(src, tmp_path / train_fn)

    checked = 0
    for shots in (4, 8, 16):
        for seed in (1, 2, 3):
            shipped = os.path.join(REF_DATA, dataset,
                                   f"fewshot{shots}_seed{seed}.txt")
            if not os.path.exists(shipped):
                continue
            out = random_sample_fewshot(str(tmp_path), dataset, shots, seed)
            with open(out) as f_ours, open(shipped) as f_ref:
                assert f_ours.read() == f_ref.read(), (
                    f"{dataset} fewshot{shots}_seed{seed}.txt diverges "
                    f"from the shipped artifact")
            checked += 1
    assert checked == 9, f"expected 9 shipped fewshot files for {dataset}"


def _metrics_files():
    return sorted(glob.glob(os.path.join(REF_DATA,
                                         "*/*_metrics-LAION400M.json")))


# Datasets whose shipped metrics are self-consistent: re-running the
# selection rule on the shipped alternates reproduces the shipped
# most_common_name for every class.
SELF_CONSISTENT = {"eurosat", "oxford_pets", "fgvc-aircraft", "flowers102"}

# For the rest, the shipped most_common_name fields predate the shipped
# alternates (regenerated/hand-tweaked upstream: stanford_cars year-first
# renames, imagenet lowercase forms, semi-aves common-name corrections) —
# the reference's own find_most_common_name run on the shipped alternates
# disagrees with the shipped field on exactly these entries, verified by
# transliterating laion_parser.py:261-311 line for line.  Pin the counts
# so any change to OUR rule (which would shift them) fails loudly.
KNOWN_STALE = {"dtd": 1, "food101": 1, "semi-aves": 31,
               "stanford_cars": 146, "imagenet": 162}


def test_most_common_name_reproduces_shipped_metrics():
    """find_most_common_name (RELAXED) on the shipped REAL alternates
    frequencies reproduces the shipped selections (reference
    laion_parser.py:261-311), modulo the documented stale entries."""
    from swat_tpu.retrieval.stringmatch import find_most_common_name

    files = _metrics_files()
    assert len(files) >= 9, "expected metrics JSONs for the 9 benchmarks"
    seen = set()
    for path in files:
        dataset = os.path.basename(os.path.dirname(path))
        seen.add(dataset)
        with open(path) as f:
            metrics = json.load(f)
        mismatches = []
        for class_id, entry in metrics.items():
            if "alternates" not in entry or "most_common_name" not in entry:
                continue
            got = find_most_common_name(entry, "RELAXED")
            if got != entry["most_common_name"]:
                mismatches.append((class_id, got,
                                   entry["most_common_name"]))
            # the selection must come from the shipped candidates either way
            official = entry.get("changed_name", entry["name"])
            assert got == official or got in entry["alternates"]
        if dataset in SELF_CONSISTENT:
            assert not mismatches, (
                f"{dataset}: rule drift vs shipped metrics: "
                f"{mismatches[:3]}")
        else:
            assert len(mismatches) == KNOWN_STALE[dataset], (
                f"{dataset}: {len(mismatches)} mismatches vs the pinned "
                f"{KNOWN_STALE[dataset]} stale entries — the selection "
                f"rule changed behavior; first: {mismatches[:3]}")
    assert SELF_CONSISTENT <= seen and set(KNOWN_STALE) <= seen


def test_prompts_build_from_every_shipped_metrics_file():
    """make_prompts consumes every REAL shipped metrics JSON (all 9
    benchmarks) with the method-default name types and produces one
    non-empty prompt corpus per class (reference prompt_maker,
    utils/prompt.py:83-105)."""
    from swat_tpu.data.prompts import make_prompts

    for path in _metrics_files():
        dataset = os.path.basename(os.path.dirname(path))
        with open(path) as f:
            metrics = json.load(f)
        prompts = make_prompts(metrics, dataset,
                               name_type="most_common_name")
        assert len(prompts) == len(metrics)
        for class_id, corpus in prompts.items():
            assert corpus and all(isinstance(p, str) and p for p in corpus)
            # the selected name is formatted into each template
            assert any(metrics[class_id]["most_common_name"] in p
                       for p in corpus), (dataset, class_id, corpus[:2])


def test_shipped_retrieved_split_parses():
    """The shipped retrieved split (T2T500+T2I0.25.txt, the paper's
    headline retrieval config) parses through our split reader: source
    flag 0 on every line, labels dense in range (reference
    save_sample_file_list format, sample_retrieval.py:1457-1469)."""
    from swat_tpu.data.splits import read_split

    path = os.path.join(REF_DATA, "semi-aves", "T2T500+T2I0.25.txt")
    if not os.path.exists(path):
        pytest.skip("retrieved split not shipped")
    samples = read_split(REF_DATA, (["semi-aves/T2T500+T2I0.25.txt"], [""]))
    assert len(samples) > 10_000  # ~500/class x 200 classes
    labels = {s.label for s in samples}
    assert min(labels) == 0 and max(labels) == 199
    assert all(s.is_fewshot == 0 for s in samples)

    fs = read_split(REF_DATA, (["semi-aves/fewshot4_seed1.txt"], [""]))
    assert len(fs) == 800 and all(s.is_fewshot == 1 for s in fs)
