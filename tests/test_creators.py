"""Per-benchmark label creators (swat_tpu.data.creators) reproduce the
reference's dataset-specific bootstrap quirks on synthetic raw trees
(reference prepare_datasets_labels.py:47-284; VERDICT r2 item 8)."""

import json
import os

import pytest

from swat_tpu.data.creators import CREATORS, create_labels


def _read(path):
    with open(path) as f:
        return f.read().splitlines()


def test_coop_json_creator(tmp_path):
    raw = tmp_path / "raw"
    os.makedirs(raw / "oxford_pets")
    splits = {
        "train": [["a/x1.jpg", 1, "cat"], ["b/x2.jpg", 0, "dog"]],
        "val": [["a/v.jpg", 0, "dog"]],
        "test": [["a/t.jpg", 1, "cat"]],
    }
    with open(raw / "oxford_pets" / "split_zhou_OxfordPets.json", "w") as f:
        json.dump(splits, f)
    out = tmp_path / "data" / "oxford_pets"
    create_labels("oxford_pets", str(raw), str(out))
    # sorted by label, prefix images/, source flag 1
    assert _read(out / "train.txt") == ["images/b/x2.jpg 0 1",
                                        "images/a/x1.jpg 1 1"]
    assert _read(out / "val.txt") == ["images/a/v.jpg 0 1"]
    assert _read(out / "test.txt") == ["images/a/t.jpg 1 1"]


def test_stanford_cars_has_no_prefix(tmp_path):
    raw = tmp_path / "raw"
    os.makedirs(raw / "stanford_cars")
    with open(raw / "stanford_cars" / "split_zhou_StanfordCars.json",
              "w") as f:
        json.dump({"train": [["cars/img.jpg", 0, "ford"]],
                   "val": [], "test": []}, f)
    out = tmp_path / "data" / "stanford_cars"
    create_labels("stanford_cars", str(raw), str(out))
    assert _read(out / "train.txt") == ["cars/img.jpg 0 1"]


def test_imagenet_rewrites_paths_and_merges_train_val(tmp_path):
    raw = tmp_path / "raw"
    os.makedirs(raw / "imagenet")
    splits = {
        "train": [["train/n01440764/n01440764_10026.JPEG", 0, "tench"]],
        "val": [["train/n01440764/n01440764_999.JPEG", 0, "tench"]],
        "test": [["val/n01440764/ILSVRC2012_val_00000293.JPEG", 0,
                  "tench"]],
    }
    with open(raw / "imagenet" / "split_ImageNet.json", "w") as f:
        json.dump(splits, f)
    out = tmp_path / "data" / "imagenet"
    create_labels("imagenet", str(raw), str(out))
    # train = train+val merged, rewritten {cls}_{id}_{cls}.JPEG
    assert _read(out / "train.txt") == [
        "images/train/n01440764_10026_n01440764.JPEG 0 1",
        "images/train/n01440764_999_n01440764.JPEG 0 1"]
    # test split doubles as val.txt and test.txt, val-style rewrite
    expect = ["images/val/ILSVRC2012_val_00000293_n01440764.JPEG 0 1"]
    assert _read(out / "val.txt") == expect
    assert _read(out / "test.txt") == expect


def test_aircraft_variant_labels(tmp_path):
    raw = tmp_path / "raw"
    base = raw / "fgvc-aircraft" / "fgvc-aircraft-2013b" / "data"
    os.makedirs(base)
    with open(base / "variants.txt", "w") as f:
        f.write("707-320\nA300 B4\n")
    for split, rows in [("train", ["0034309 A300 B4", "0034958 707-320"]),
                        ("val", ["1111111 A300 B4"]),
                        ("test", ["2222222 707-320"])]:
        with open(base / f"images_variant_{split}.txt", "w") as f:
            f.write("\n".join(rows) + "\n")
    out = tmp_path / "data" / "fgvc-aircraft"
    create_labels("fgvc-aircraft", str(raw), str(out))
    pre = "fgvc-aircraft/fgvc-aircraft-2013b/data/images/"
    # multi-word variant names resolve through variants.txt, .jpg appended
    assert _read(out / "train.txt") == [f"{pre}0034958.jpg 0 1",
                                        f"{pre}0034309.jpg 1 1"]
    assert _read(out / "test.txt") == [f"{pre}2222222.jpg 0 1"]


def test_semi_aves_merges_ltrain_val(tmp_path):
    raw = tmp_path / "raw"
    base = raw / "dataset" / "semi-aves"
    os.makedirs(base)
    with open(base / "l_train.txt", "w") as f:
        f.write("trainval_images/a.jpg 5 0\ntrainval_images/b.jpg 2 0\n")
    with open(base / "val.txt", "w") as f:
        f.write("trainval_images/c.jpg 2 0\n")
    with open(base / "test.txt", "w") as f:
        f.write("test_images/d.jpg 5 0\n")
    out = tmp_path / "data" / "semi-aves"
    create_labels("semi-aves", str(raw), str(out))
    assert _read(out / "ltrain.txt") == ["semi-aves/trainval_images/b.jpg 2 1",
                                         "semi-aves/trainval_images/a.jpg 5 1"]
    # the merged pool the few-shot sampler reads (ltrain+val.txt)
    assert _read(out / "ltrain+val.txt") == [
        "semi-aves/trainval_images/b.jpg 2 1",
        "semi-aves/trainval_images/c.jpg 2 1",
        "semi-aves/trainval_images/a.jpg 5 1"]
    assert _read(out / "test.txt") == ["semi-aves/test_images/d.jpg 5 1"]


def test_all_nine_benchmarks_have_creators():
    assert set(CREATORS) == {
        "oxford_pets", "food101", "stanford_cars", "imagenet", "dtd",
        "eurosat", "flowers102", "fgvc-aircraft", "semi-aves"}


def test_unknown_dataset_exits():
    with pytest.raises(SystemExit):
        create_labels("nope", ".", ".")
