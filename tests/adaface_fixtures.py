"""Shared fixtures for AdaFace parity tests: a synthetic BPE vocab where the
Arc2Face templates tokenize exactly like real CLIP ('id' at position 4,
the 16 ',' placeholders at 4..19), plus a torch-style tokenizer adapter so
the reference functions can run on the same vocabulary."""

import json
import types

import numpy as np
import torch

from adaprompt_tpu.utils.tokenizer import CLIPTokenizer, bytes_to_unicode

WORDS = ["photo", "of", "a", "id", "person", "smiling", "face", "the", "cat",
         "portrait", "z", "y", "in", "park"]


def build_word_vocab(tmpdir):
    """vocab.json + merges.txt where each WORD merges to a single token."""
    chars = list(bytes_to_unicode().values())
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    merges = []

    def add_word(w):
        # build merge chain: w = c0 c1 ... cn</w>
        parts = list(w[:-1]) + [w[-1] + "</w>"]
        while len(parts) > 1:
            a, b = parts[0], parts[1]
            merges.append(f"{a} {b}")
            parts = [a + b] + parts[2:]
            if parts[0] not in vocab:
                vocab[parts[0]] = len(vocab)

    for w in WORDS:
        add_word(w)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)

    vj = tmpdir / "vocab.json"
    mt = tmpdir / "merges.txt"
    vj.write_text(json.dumps(vocab))
    mt.write_text("#version: 0.2\n" + "\n".join(dict.fromkeys(merges)) + "\n")
    return CLIPTokenizer.from_files(str(vj), str(mt))


class TorchTokenizerAdapter:
    """Duck-typed HF tokenizer over our CLIPTokenizer, sufficient for the
    reference adaface/util.py functions."""

    def __init__(self, tok: CLIPTokenizer):
        self.tok = tok
        self.pad_token_id = tok.eos_id

    def encode(self, text, add_special_tokens=False):
        assert not add_special_tokens
        return self.tok.encode_raw(text)

    def __call__(self, texts, truncation=True, padding="max_length",
                 max_length=77, return_tensors="pt", **kw):
        ids = self.tok(texts, max_length=max_length, truncate=truncation)
        return types.SimpleNamespace(input_ids=torch.tensor(np.asarray(ids)))


def assert_template_positions(tok: CLIPTokenizer):
    ids = tok("photo of a id person", max_length=77)[0]
    id_tok = tok.encode_raw("id")[0]
    assert ids[4] == id_tok, ids[:8]
    ids2 = tok("photo of a " + ", " * 16, max_length=77)[0]
    comma = tok.encode_raw(",")[0]
    assert (ids2[4:20] == comma).all()
