"""End-to-end retrieval ingest chain: LAION-style metadata shards ->
sharded caption index + metadata store -> stringmatch -> URL parquet
(reference laion_parser.py:48-79 create tables, :129-182 matching;
laion_downloader.py:132-195 create_parquet/process_sample)."""

import json
import os

import numpy as np
import pytest

from swat_tpu.retrieval.downloader import build_url_rows, write_url_parquet
from swat_tpu.retrieval.ingest import (
    MetaStore,
    ShardedCaptionIndex,
    ingest_shards,
)
from swat_tpu.retrieval.stringmatch import CaptionIndex, match_all_classes

SHARD0 = [
    {"TEXT": "a photo of a red-winged blackbird", "URL": "http://a/0.jpg",
     "NSFW": "UNLIKELY"},
    {"TEXT": "sunset over the ocean", "URL": "http://a/1.jpg",
     "NSFW": "UNLIKELY"},
    {"TEXT": "blackbird singing at dawn", "URL": "http://a/2.jpg",
     "NSFW": "NSFW"},
]
SHARD1 = [
    {"TEXT": "the common blackbird in a tree", "URL": "http://b/0.jpg",
     "NSFW": "UNSURE"},
    {"TEXT": None, "URL": "http://b/1.jpg", "NSFW": None},
    {"TEXT": "a blackbird photo", "URL": "", "NSFW": "UNLIKELY"},
]


@pytest.fixture()
def store(tmp_path):
    for i, rows in enumerate([SHARD0, SHARD1]):
        with open(tmp_path / f"part{i}.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    out = tmp_path / "store"
    manifest = ingest_shards([str(tmp_path / "part0.jsonl"),
                              str(tmp_path / "part1.jsonl")], str(out))
    assert manifest["num_shards"] == 2
    assert manifest["offsets"] == [0, 3, 6]
    return str(out)


def test_parquet_ingest(tmp_path):
    """Parquet input path (the real LAION format)."""
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    table = pa.Table.from_pylist(SHARD0)
    pq.write_table(table, str(tmp_path / "part-00000.parquet"))
    out = tmp_path / "store"
    manifest = ingest_shards([str(tmp_path / "*.parquet")], str(out))
    assert manifest["counts"] == [3]
    meta = MetaStore(str(out))
    assert meta.lookup(0)["url"] == "http://a/0.jpg"
    assert meta.lookup(2)["nsfw"] == "NSFW"


def test_meta_store_lookup(store):
    meta = MetaStore(store)
    assert len(meta) == 6
    m = meta.lookup(3)  # first row of shard 1
    assert m == {"url": "http://b/0.jpg",
                 "caption": "the common blackbird in a tree",
                 "nsfw": "UNSURE", "shard": 1, "rowid": 0}
    # empty caption normalizes to N.A. (reference laion_parser.py:72)
    assert meta.lookup(4)["caption"] == "N.A."


def test_sharded_index_global_ids(store):
    idx = ShardedCaptionIndex(store)
    assert len(idx) == 6
    ids = sorted(idx.query("blackbird"))
    assert ids == [0, 2, 3, 5]
    # matches the reference-semantics single index over the whole corpus
    all_caps = [r["TEXT"] or "" for r in SHARD0 + SHARD1]
    ref = sorted(CaptionIndex(all_caps).query("blackbird"))
    assert ids == ref


def test_full_chain_to_url_parquet(store, tmp_path):
    """stringmatch over the sharded index -> metadata join -> URL parquet:
    the end-to-end path the reference runs via SQLite + find_by_id."""
    idx = ShardedCaptionIndex(store)
    metrics = {"0": {"name": "blackbird",
                     "alternates": {"blackbird": 0, "common blackbird": 0}}}
    retrieved, metrics, freq = match_all_classes(idx, metrics,
                                                 num_threads=2)
    assert freq["0"] == 4  # deduped across synonyms

    meta = MetaStore(store)
    rows, metadata = build_url_rows(retrieved, meta, sampling="all")
    # NSFW row (gid 2) and empty-URL row (gid 5) dropped
    got = {r["caption_id"] for r in rows}
    assert got == {0, 3}
    assert all(r["url"].startswith("http") for r in rows)
    assert len(metadata["0"]) == 2
    assert metadata["0"][0][0] in (0, 1)  # (shard, rowid, caption, url)

    out = str(tmp_path / "urls.parquet")
    write_url_parquet(out, rows)
    import pyarrow.parquet as pq

    table = pq.read_table(out)
    assert table.num_rows == 2
    assert set(table.column_names) >= {"class_id", "caption", "url",
                                       "caption_id"}


def test_build_url_rows_sampling(store):
    meta = MetaStore(store)
    matches = {"0": [("x", 0), ("x", 1), ("x", 3), ("x", 4)]}
    rows_few, _ = build_url_rows(matches, meta, sampling="few")
    assert len(rows_few) <= 5
    rows_rand, _ = build_url_rows(matches, meta, sampling="random",
                                  max_images=2, seed=1)
    assert len(rows_rand) <= 2
    rows_all, _ = build_url_rows(matches, meta, sampling="all",
                                 skip_nsfw=False)
    assert {r["caption_id"] for r in rows_all} == {0, 1, 3, 4}


def test_sharded_phrase_query_and_evict(store):
    idx = ShardedCaptionIndex(store)
    # phrase 'common blackbird' only matches the shard-1 caption
    ids = idx.query("common blackbird", phrase=True)
    assert sorted(ids) == [3]
    # AND (non-phrase) also matches nothing extra here
    ids2 = idx.query("common blackbird", phrase=False)
    assert sorted(ids2) == [3]
    idx.evict()
    assert sorted(idx.query("blackbird")) == [0, 2, 3, 5]  # reload works


def test_global_ids_beyond_int32_laion2b_scale(store):
    """LAION-2B has ~2.3B captions, so global caption ids exceed int32
    range (the reference scales by adding FTS shard tables,
    laion_parser.py:21-24; our global id = offset[shard] + rowid must be
    64-bit clean end to end). Simulate 2B-scale shard offsets on a tiny
    store and assert query / lookup round-trip above 2**31."""
    off1 = 2_200_000_000  # shard 1 starts past int32 range; 2.3B total
    with open(os.path.join(store, "manifest.json")) as f:
        manifest = json.load(f)
    manifest["counts"] = [off1, 2_300_000_000 - off1]
    manifest["offsets"] = [0, off1, 2_300_000_000]
    with open(os.path.join(store, "manifest.json"), "w") as f:
        json.dump(manifest, f)

    idx = ShardedCaptionIndex(store)
    assert len(idx) == 2_300_000_000
    ids = idx.query("blackbird")
    assert ids.dtype == np.int64
    assert sorted(ids) == [0, 2, off1 + 0, off1 + 2]
    assert max(ids) > 2**31  # would wrap negative under int32

    meta = MetaStore(store)
    assert len(meta) == 2_300_000_000
    rec = meta.lookup(off1 + 2)  # shard 1 rowid 2
    assert rec["shard"] == 1 and rec["rowid"] == 2
    assert rec["caption"] == "a blackbird photo"
    rows, _ = build_url_rows(
        {"0": [("blackbird", int(i)) for i in ids]}, meta, skip_nsfw=True)
    # gid 2 is NSFW-flagged and gid off1+2 has an empty URL; the
    # survivors keep their 64-bit ids intact
    assert {r["caption_id"] for r in rows} == {0, off1 + 0}
