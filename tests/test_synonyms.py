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


# ---------------------------------------------------------------------------
# LLM synonym mining (swat_tpu.retrieval.query_synonyms; VERDICT r2 item 9)


def test_mine_synonyms_with_recorded_backend(tmp_path):
    import json

    from swat_tpu.retrieval.query_synonyms import (
        mine_synonyms,
        recorded_backend,
    )

    fixture = {
        "Turdus merula": "1. Common Blackbird\n2. Eurasian Blackbird (EU)",
        "Pica pica": "1. Eurasian Magpie\n2. Black-Billed_Magpie\n",
    }
    fp = tmp_path / "responses.json"
    fp.write_text(json.dumps(fixture))
    backend = recorded_backend(str(fp))

    out = mine_synonyms(
        "semi-aves",
        [("Turdus merula", "Common Blackbird"),
         ("Pica pica", "Eurasian Magpie")],
        backend)
    # numbered list parsed, brackets stripped, clean_text applied,
    # scientific + common names merged in, dedup via set
    assert out["0"]["synonyms"] == {
        "common blackbird": 0, "eurasian blackbird": 0,
        "turdus merula": 0}  # cname merged via add_names semantics
    assert out["1"]["synonyms"] == {
        "eurasian magpie": 0, "black billed magpie": 0, "pica pica": 0}
    assert out["0"]["common_name"] == "Common Blackbird"
    assert out["1"]["query_name"] == "Pica pica"


def test_prompt_templates_match_reference_phrasing():
    from swat_tpu.retrieval.query_synonyms import (
        SYSTEM_MESSAGES,
        build_messages,
    )

    msgs = build_messages("semi-aves", "Turdus merula")
    assert msgs[0]["content"] == SYSTEM_MESSAGES["semi-aves"]
    assert "a type of a bird" in msgs[1]["content"]
    assert "numbered list only" in msgs[1]["content"]

    msgs = build_messages("dtd", "banded")
    assert "a texture i.e. banded" in msgs[1]["content"]
    assert "textual data recognition" in msgs[0]["content"]

    # caltech-101 interpolates the definition (reference :59-62)
    msgs = build_messages("caltech-101", "anchor",
                          definition="a heavy object")
    assert "defined as a heavy object" in msgs[1]["content"]

    # unknown datasets fall back to the generic phrasing (reference :71-74)
    msgs = build_messages("eurosat", "forest")
    assert "referring to a forest ?" in msgs[1]["content"]
    assert "satellite recognition" in msgs[0]["content"]


def test_mine_synonyms_cli(tmp_path, capsys):
    import json

    from swat_tpu.retrieval.cli import main

    (tmp_path / "classes.json").write_text(json.dumps(["kite", "dove"]))
    (tmp_path / "rec.json").write_text(json.dumps(
        {"kite": "1. Black Kite", "dove": "1. Rock Dove\n2. Pigeon"}))
    out = tmp_path / "syn.json"
    main(["mine-synonyms", "--dataset", "test", "--class_names",
          str(tmp_path / "classes.json"), "--recorded",
          str(tmp_path / "rec.json"), "--output", str(out)])
    data = json.loads(out.read_text())
    assert data["0"]["synonyms"] == {"black kite": 0, "kite": 0}
    assert data["1"]["synonyms"] == {"rock dove": 0, "pigeon": 0,
                                     "dove": 0}
