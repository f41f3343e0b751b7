"""Parity: adaprompt_tpu.adaface.arc2face vs the reference
/root/reference/adaface/util.py arc2face_forward_face_embs /
arc2face_inverse_face_prompt_embs, on a shared synthetic vocabulary and a
shared tiny CLIPTextModelWrapper."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from transformers import CLIPTextConfig as HFCLIPTextConfig

from adaprompt_tpu.adaface import arc2face
from adaprompt_tpu.models import clip_text

import torch_oracle
from adaface_fixtures import build_word_vocab, TorchTokenizerAdapter, assert_template_positions

HIDDEN = 576  # >= 512 so ArcFace vectors fit after zero-padding


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tok = build_word_vocab(tmp_path_factory.mktemp("vocab"))
    assert_template_positions(tok)

    am = torch_oracle.load("adaface.arc2face_models")
    torch.manual_seed(0)
    hf_cfg = HFCLIPTextConfig(vocab_size=tok.vocab_size_with_added,
                              hidden_size=HIDDEN, intermediate_size=HIDDEN * 2,
                              num_hidden_layers=2, num_attention_heads=8,
                              max_position_embeddings=77, hidden_act="quick_gelu",
                              bos_token_id=tok.bos_id, eos_token_id=tok.eos_id)
    ref_model = am.CLIPTextModelWrapper(hf_cfg).eval()
    # CLIPTextModelWrapper.dtype property comes from nn.Module
    cfg = clip_text.CLIPTextConfig(vocab_size=hf_cfg.vocab_size, hidden_size=HIDDEN,
                                   intermediate_size=HIDDEN * 2, num_layers=2,
                                   num_heads=8, eos_token_id=tok.eos_id)
    params = clip_text.from_torch(ref_model.state_dict(), cfg)
    return tok, ref_model, cfg, params


def test_forward_face_embs_parity(setup):
    tok, ref_model, cfg, params = setup
    util = torch_oracle.load("adaface.util")
    rng = np.random.default_rng(0)
    face = rng.standard_normal((2, 512)).astype(np.float32)
    face /= np.linalg.norm(face, axis=-1, keepdims=True)

    with torch.no_grad():
        ref_full, ref_core = util.arc2face_forward_face_embs(
            TorchTokenizerAdapter(tok), ref_model, torch.tensor(face),
            input_max_length=77, return_full_and_core_embs=True)

    full, core = arc2face.forward_face_embs(params, tok, jnp.asarray(face),
                                            text_cfg=cfg)
    np.testing.assert_allclose(np.asarray(full), ref_full.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(core), ref_core.numpy(), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("emb_types", [
    ("full", "core"),
    ("full_pad", "core"),
    ("full_half_pad", "core"),
    ("full_zeroed_extra", "b_core_e"),
])
def test_inverse_face_prompt_embs_parity(setup, emb_types):
    tok, ref_model, cfg, params = setup
    util = torch_oracle.load("adaface.util")
    rng = np.random.default_rng(1)
    face_prompt = rng.standard_normal((2, 16, HIDDEN)).astype(np.float32)
    pad_np = rng.standard_normal((77, HIDDEN)).astype(np.float32)
    hw = np.array([[1.0], [2.0], [4.0]], np.float32)

    with torch.no_grad():
        refs = util.arc2face_inverse_face_prompt_embs(
            TorchTokenizerAdapter(tok), ref_model, torch.tensor(face_prompt),
            list_extra_words=None, return_emb_types=list(emb_types),
            pad_embeddings=torch.tensor(pad_np),
            hidden_state_layer_weights=torch.tensor(hw), input_max_length=77)

    outs = arc2face.inverse_face_prompt_embs(
        params, tok, jnp.asarray(face_prompt), emb_types, jnp.asarray(pad_np),
        hidden_state_layer_weights=jnp.asarray(hw), text_cfg=cfg)

    for ref, got in zip(refs, outs):
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=3e-5, rtol=1e-4)


def test_inverse_with_extra_words(setup):
    tok, ref_model, cfg, params = setup
    util = torch_oracle.load("adaface.util")
    rng = np.random.default_rng(2)
    face_prompt = rng.standard_normal((2, 16, HIDDEN)).astype(np.float32)
    pad_np = rng.standard_normal((77, HIDDEN)).astype(np.float32)
    extra = ["smiling face", "the cat"]

    with torch.no_grad():
        (ref_core,) = util.arc2face_inverse_face_prompt_embs(
            TorchTokenizerAdapter(tok), ref_model, torch.tensor(face_prompt),
            list_extra_words=extra, return_emb_types=["core"],
            pad_embeddings=torch.tensor(pad_np), input_max_length=77,
            zs_extra_words_scale=0.5)

    (core,) = arc2face.inverse_face_prompt_embs(
        params, tok, jnp.asarray(face_prompt), ("core",), jnp.asarray(pad_np),
        list_extra_words=extra, zs_extra_words_scale=0.5, text_cfg=cfg)
    assert core.shape == (2, 18, HIDDEN)
    np.testing.assert_allclose(np.asarray(core), ref_core.numpy(), atol=3e-5, rtol=1e-4)


def test_generate_pad_embeddings(setup):
    tok, ref_model, cfg, params = setup
    with torch.no_grad():
        pad_tokens = torch.tensor([tok.eos_id]).repeat(77)
        ref = ref_model.text_model.embeddings(pad_tokens)[0].numpy()
    got = arc2face.generate_pad_embeddings(params, tok, cfg)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)
