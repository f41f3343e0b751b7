"""Validate the self-contained CLIP BPE against transformers.CLIPTokenizer
loaded from the same (synthetic) vocab/merges files."""

import json
import numpy as np
import pytest

from adaprompt_tpu.utils.tokenizer import CLIPTokenizer, bytes_to_unicode


@pytest.fixture(scope="module")
def synthetic_assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    chars = list(bytes_to_unicode().values())
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    merges = ["t h", "th e</w>", "p h", "ph o", "pho t", "phot o</w>",
              "o f</w>", "a</w> a</w>"]  # last one is never applicable
    for m in merges:
        tok = m.replace(" ", "")
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vocab_json = d / "vocab.json"
    merges_txt = d / "merges.txt"
    vocab_json.write_text(json.dumps(vocab))
    merges_txt.write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
    return str(vocab_json), str(merges_txt), vocab


@pytest.mark.parametrize("text", [
    "photo of the cat",
    "a THE    photo",
    "the-photo, of: thethe!",
    "of of of",
])
def test_matches_transformers(synthetic_assets, text):
    from transformers import CLIPTokenizer as HFTok
    vocab_json, merges_txt, _ = synthetic_assets
    hf = HFTok(vocab_file=vocab_json, merges_file=merges_txt)
    ours = CLIPTokenizer.from_files(vocab_json, merges_txt)
    ref = hf(text, truncation=True, max_length=77, padding="max_length")["input_ids"]
    got = ours(text, max_length=77)[0]
    np.testing.assert_array_equal(np.asarray(ref), got)


def test_fallback_roundtrip():
    tok = CLIPTokenizer.fallback()
    assert tok.is_fallback
    ids = tok("hello world", max_length=77)
    assert ids.shape == (1, 77)
    assert ids[0, 0] == tok.bos_id
    assert tok.decode(ids[0]) == "hello world"


def test_add_tokens():
    tok = CLIPTokenizer.fallback()
    placeholders = [f"z_{i}" for i in range(16)]
    assert tok.add_tokens(placeholders) == 16
    assert tok.add_tokens(placeholders) == 0  # idempotent
    ids = tok.convert_tokens_to_ids(placeholders)
    assert ids == list(range(49408, 49424))
    enc = tok("a photo of " + " ".join(placeholders), max_length=77)[0]
    for i in ids:
        assert i in enc
