"""Synonym zero-shot filter (reference
query_synonyms/clip_text_filtering.py:29-76)."""

import numpy as np

from swat_tpu.retrieval.synonyms import filter_synonyms


class _FakeTokenizer:
    """Maps each text to a deterministic 'token' row (hash-based)."""

    def __call__(self, texts, context_length=77):
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), np.int32)
        for i, t in enumerate(texts):
            out[i, 0] = abs(hash(t)) % 10_000
        return out


def _encode_factory(embedding_of):
    """encode_fn that looks up a text's embedding via its hash token."""

    def encode(tokens):
        return np.stack([embedding_of[int(t[0])] for t in np.asarray(tokens)])

    return encode


def test_filter_synonyms_keeps_matching_drops_mismatched():
    names = {
        "0": {"query_name": "sparrow",
              "synonyms": {"house sparrow": 3, "eagle": 1}},
        "1": {"query_name": "eagle", "synonyms": {"bald eagle": 2}},
    }
    tok = _FakeTokenizer()
    # class-0 direction = e0, class-1 direction = e1
    e0 = np.array([1.0, 0.0]); e1 = np.array([0.0, 1.0])
    emb = {
        int(tok(["a photo of a sparrow"])[0, 0]): e0,
        int(tok(["a photo of a eagle"])[0, 0]): e1,
        int(tok(["a photo of a house sparrow"])[0, 0]): e0,      # -> class 0
        int(tok(["a photo of a bald eagle"])[0, 0]): e1,         # -> class 1
    }
    logs = []
    out = filter_synonyms(_encode_factory(emb), tok, names,
                          log=logs.append)
    assert set(out["0"]["synonyms_filtered"]) == {"house sparrow"}
    assert set(out["1"]["synonyms_filtered"]) == {"bald eagle"}
    # the mismatched synonym ('eagle' under class 0) is logged like the
    # reference (:73-74)
    assert any("unmatch eagle" in l for l in logs)


def test_filter_synonyms_empty():
    names = {"0": {"query_name": "cat", "synonyms": {}}}
    tok = _FakeTokenizer()
    emb = {int(tok(["a photo of a cat"])[0, 0]): np.array([1.0, 0.0])}
    out = filter_synonyms(_encode_factory(emb), tok, names)
    assert out["0"]["synonyms_filtered"] == {}
