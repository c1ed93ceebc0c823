"""BPE tokenizer parity vs HuggingFace's independent CLIP implementation.

The real ``bpe_simple_vocab_16e6.txt.gz`` asset is absent from this
environment, so ``tests/test_real_weights.py`` can only check tokenizer
exactness when a checkpoint is mounted.  This suite closes the gap
asset-free: it LEARNS a tiny byte-level BPE vocab from a corpus, writes it
in both formats — the OpenCLIP merges file our ``SimpleTokenizer``
consumes (reference tokenization path: utils/extras.py:157 via
``open_clip.get_tokenizer``) and the HF ``vocab.json``/``merges.txt`` pair
— and asserts token-id equality string by string against
``transformers.CLIPTokenizer`` (and the fast Rust variant).  The BPE merge
loop, the pre-tokenization regex, whitespace/HTML cleaning, byte-unicode
mapping, and the special-token layout are all exercised for arbitrary
vocabularies, so mounting the real merges file cannot introduce an
algorithmic divergence.

CJK strings are deliberately absent: without ``ftfy``, HF's *fallback*
cleaner space-separates CJK characters (a BasicTokenizer quirk) while the
reference's ftfy path — and ours — does not.
"""

import collections
import json
import os

import pytest

from swat_tpu.models.tokenizer import (SimpleTokenizer, _bytes_to_unicode,
                                       tokenize_batch)

transformers = pytest.importorskip("transformers")

CORPUS = (
    "a photo of a dog . a photo of a cat . the quick brown fox jumps over "
    "the lazy dog . this is a low resolution photo of the small bird . "
    "a bad photo of the aircraft . a sculpture of a flower . a cropped "
    "photo of the food . a blurry photo of a car . itap of a pet . "
    "a photo of many things . art of the animal . a close-up photo of "
    "a plant . a doodle of the insect ."
).split()

STRINGS = [
    "a photo of a dog.",
    "A  Photo   OF a CAT!",
    "the quick brown fox jumps over the lazy dog",
    "it's a dog's life, isn't it?",
    "we'll see 42 dogs & 7 cats...",
    "café résumé",            # precomposed accents
    "café resumé",               # combining accents (NFC fold)
    "a    photo\tof\na bird",
    "semi-aves: black-footed albatross (no. 001)",
    "",
    "   ",
    "supercalifragilisticexpialidocious",
    "a photo of a dog . " * 20,              # > 77 tokens once encoded
]


def _learn_merges(corpus, n_merges):
    """Greedy byte-level BPE trainer (the standard scheme: most frequent
    adjacent symbol pair merges first; words end in an explicit </w>)."""
    b2u = _bytes_to_unicode()
    words = collections.Counter()
    for w in corpus:
        sym = [b2u[b] for b in w.encode("utf-8")]
        sym[-1] = sym[-1] + "</w>"
        words[tuple(sym)] += 1
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for word, freq in words.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += freq
        if not pairs:
            break
        best = max(pairs, key=lambda p: (pairs[p], p))
        merges.append(best)
        first, second = best
        new_words = collections.Counter()
        for word, freq in words.items():
            out, i = [], 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    out.append(first + second)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_words[tuple(out)] += freq
        words = new_words
    return merges


def _write_assets(merges, d):
    """The same vocab in both on-disk formats.

    * ``bpe_tiny.txt`` — OpenCLIP merges-file layout (one header line, then
      one merge per line); ``SimpleTokenizer`` derives the vocab as
      256 bytes + 256 byte</w> + merges + 2 specials, exactly like
      open_clip's simple_tokenizer.
    * ``vocab.json``/``merges.txt`` — the HF pair, with ids assigned in the
      identical order so the two tokenizers MUST agree id-for-id.
    """
    os.makedirs(d, exist_ok=True)
    our_path = os.path.join(d, "bpe_tiny.txt")
    with open(our_path, "w") as f:
        f.write("tiny bpe vocab, test fixture\n")
        f.write("\n".join(f"{a} {b}" for a, b in merges))
    b2u = _bytes_to_unicode()
    vocab = list(b2u.values())
    vocab += [v + "</w>" for v in vocab]
    vocab += ["".join(m) for m in merges]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    with open(os.path.join(d, "vocab.json"), "w") as f:
        # keep-last on duplicate merge products matches dict(zip(...)) in
        # both SimpleTokenizer and HF's json.load
        json.dump({t: i for i, t in enumerate(vocab)}, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(f"{a} {b}" for a, b in merges))
    return our_path


@pytest.fixture(scope="module")
def tokenizers(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tok_fixture"))
    our_path = _write_assets(_learn_merges(CORPUS, 120), d)
    ours = SimpleTokenizer(our_path)
    hf = transformers.CLIPTokenizer(
        vocab_file=os.path.join(d, "vocab.json"),
        merges_file=os.path.join(d, "merges.txt"))
    return d, ours, hf


def test_special_token_layout(tokenizers):
    _, ours, hf = tokenizers
    assert ours.vocab_size == hf.vocab_size
    assert ours.sot_token == hf.bos_token_id
    assert ours.eot_token == hf.eos_token_id
    # argmax pooling in the text tower relies on EOT being the top id
    assert ours.eot_token == ours.vocab_size - 1


@pytest.mark.parametrize("s", STRINGS, ids=range(len(STRINGS)))
def test_ids_match_hf_slow(tokenizers, s):
    _, ours, hf = tokenizers
    assert ours.encode(s) == hf.encode(s, add_special_tokens=False)


def test_ids_match_hf_fast(tokenizers):
    d, ours, _ = tokenizers
    hff = transformers.CLIPTokenizerFast(
        vocab_file=os.path.join(d, "vocab.json"),
        merges_file=os.path.join(d, "merges.txt"))
    for s in STRINGS:
        assert ours.encode(s) == hff.encode(s, add_special_tokens=False), s


def test_hf_adapter_batch_layout_matches(tokenizers):
    """The HFTokenizerAdapter (directory path of get_tokenizer) and the
    SimpleTokenizer produce the identical [N, 77] id matrix — sot/eot
    placement, zero padding, and truncate-with-final-EOT included."""
    import numpy as np

    from swat_tpu.models.tokenizer import HFTokenizerAdapter

    d, ours, _ = tokenizers
    adapter = HFTokenizerAdapter(d)
    np.testing.assert_array_equal(tokenize_batch(ours, STRINGS),
                                  adapter(STRINGS))


def test_decode_roundtrip(tokenizers):
    """decode() is lossy on spacing (each </w> becomes a space) but must be
    id-stable: re-encoding the decoded text reproduces the ids."""
    _, ours, _ = tokenizers
    ids = ours.encode("it's a low resolution photo of a dog, isn't it?")
    assert ours.encode(ours.decode(ids)) == ids
