"""Parity: adaprompt_tpu.adaface.subj_basis_generator vs the reference
SubjBasisGenerator (/root/reference/adaface/subj_basis_generator.py),
with from_pretrained monkeypatched to tiny local models."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from transformers import CLIPTextConfig as HFCLIPTextConfig

from adaprompt_tpu.adaface import subj_basis_generator as jsbg
from adaprompt_tpu.adaface import arc2face
from adaprompt_tpu.models import clip_text

import torch_oracle
from adaface_fixtures import build_word_vocab, TorchTokenizerAdapter

HIDDEN = 576
IMG_DIM = 96   # stand-in for the 1280-d CLIP-H features
N_BG_TOKENS = 17  # stand-in for 257


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    tok = build_word_vocab(tmp_path_factory.mktemp("vocab"))
    am = torch_oracle.load("adaface.arc2face_models")
    sbg_mod = torch_oracle.load("adaface.subj_basis_generator")

    hf_cfg = HFCLIPTextConfig(vocab_size=tok.vocab_size_with_added,
                              hidden_size=HIDDEN, intermediate_size=HIDDEN * 2,
                              num_hidden_layers=2, num_attention_heads=8,
                              max_position_embeddings=77, hidden_act="quick_gelu",
                              bos_token_id=tok.bos_id, eos_token_id=tok.eos_id)

    class FakeHFTok:
        @staticmethod
        def from_pretrained(*a, **k):
            return TorchTokenizerAdapter(tok)

    class FakeWrapper(am.CLIPTextModelWrapper):
        @classmethod
        def from_pretrained(cls, *a, **k):
            torch.manual_seed(0)
            return cls(hf_cfg)

    sbg_mod.CLIPTokenizer = FakeHFTok
    sbg_mod.CLIPTextModelWrapper = FakeWrapper
    text_cfg = clip_text.CLIPTextConfig(vocab_size=hf_cfg.vocab_size,
                                        hidden_size=HIDDEN,
                                        intermediate_size=HIDDEN * 2,
                                        num_layers=2, num_heads=8,
                                        eos_token_id=tok.eos_id)
    return tok, sbg_mod, text_cfg


def test_subject_branch_parity(env):
    tok, sbg_mod, text_cfg = env
    torch.manual_seed(1)
    ref = sbg_mod.SubjBasisGenerator(
        num_out_embs_per_layer=16, num_out_layers=16,
        image_embedding_dim=IMG_DIM, output_dim=HIDDEN,
        placeholder_is_bg=False, prompt2token_proj_grad_scale=0.4).eval()

    cfg = jsbg.SubjBasisConfig(placeholder_is_bg=False, num_out_embs_per_layer=16,
                               image_embedding_dim=IMG_DIM, output_dim=HIDDEN,
                               text_cfg=text_cfg)
    params = jsbg.from_torch(ref.state_dict(), cfg)

    rng = np.random.default_rng(0)
    id_embs = rng.standard_normal((2, 16, HIDDEN)).astype(np.float32)

    with torch.no_grad():
        ref_subj, ref_prompt = ref(torch.tensor(id_embs), None, None,
                                   out_id_embs_scale=1.0, is_face=True,
                                   is_training=False,
                                   adaface_prompt_embs_inf_type="full_half_pad")

    subj, prompt = jsbg.forward(params, cfg, tok, jnp.asarray(id_embs),
                                out_id_embs_scale=1.0, is_face=True,
                                is_training=False,
                                adaface_prompt_embs_inf_type="full_half_pad")
    assert subj.shape == (2, 16, 16, HIDDEN)
    np.testing.assert_allclose(np.asarray(subj), ref_subj.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(prompt), ref_prompt.numpy(), atol=3e-5, rtol=1e-4)


def test_subject_branch_pad_blend(env):
    tok, sbg_mod, text_cfg = env
    torch.manual_seed(2)
    ref = sbg_mod.SubjBasisGenerator(
        num_out_embs_per_layer=16, num_out_layers=16,
        image_embedding_dim=IMG_DIM, output_dim=HIDDEN,
        placeholder_is_bg=False).eval()
    cfg = jsbg.SubjBasisConfig(placeholder_is_bg=False, num_out_embs_per_layer=16,
                               image_embedding_dim=IMG_DIM, output_dim=HIDDEN,
                               text_cfg=text_cfg)
    params = jsbg.from_torch(ref.state_dict(), cfg)

    rng = np.random.default_rng(3)
    id_embs = rng.standard_normal((1, 16, HIDDEN)).astype(np.float32)
    with torch.no_grad():
        ref_subj, _ = ref(torch.tensor(id_embs), None, None,
                          out_id_embs_scale=0.7, is_face=True, is_training=False)
    subj, _ = jsbg.forward(params, cfg, tok, jnp.asarray(id_embs),
                           out_id_embs_scale=0.7, is_face=True, is_training=False)
    np.testing.assert_allclose(np.asarray(subj), ref_subj.numpy(), atol=3e-5, rtol=1e-4)


def test_bg_branch_parity(env):
    tok, sbg_mod, text_cfg = env
    torch.manual_seed(4)
    ref = sbg_mod.SubjBasisGenerator(
        num_id_vecs={"subj": 77, "bg": N_BG_TOKENS},
        num_out_embs_per_layer=4, num_out_layers=16,
        image_embedding_dim=IMG_DIM, output_dim=HIDDEN,
        placeholder_is_bg=True,
        bg_prompt_translator_has_to_out_proj=False).eval()

    cfg = jsbg.SubjBasisConfig(placeholder_is_bg=True, num_out_embs_per_layer=4,
                               num_id_vecs_bg=N_BG_TOKENS,
                               image_embedding_dim=IMG_DIM, output_dim=HIDDEN,
                               num_heads=6, text_cfg=text_cfg)
    params = jsbg.from_torch(ref.state_dict(), cfg)

    rng = np.random.default_rng(5)
    clip_feats = rng.standard_normal((2, N_BG_TOKENS, IMG_DIM)).astype(np.float32)
    with torch.no_grad():
        ref_subj, ref_prompt = ref(None, torch.tensor(clip_feats), None,
                                   out_id_embs_scale=1.0, is_face=True,
                                   is_training=False)
    subj, prompt = jsbg.forward(params, cfg, tok, None,
                                clip_features=jnp.asarray(clip_feats),
                                out_id_embs_scale=1.0, is_training=False)
    assert prompt is None and ref_prompt is None
    assert subj.shape == (2, 16, 4, HIDDEN)
    np.testing.assert_allclose(np.asarray(subj), ref_subj.numpy(), atol=3e-5, rtol=1e-4)


def test_object_branch_shapes(env):
    tok, sbg_mod, text_cfg = env
    cfg = jsbg.SubjBasisConfig(placeholder_is_bg=False, num_out_embs_per_layer=16,
                               image_embedding_dim=IMG_DIM, output_dim=HIDDEN,
                               text_cfg=text_cfg)
    params = jsbg.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(6)
    dino = rng.standard_normal((2, cfg.dino_embedding_dim)).astype(np.float32)
    subj, prompt = jsbg.forward(
        params, cfg, tok, None, raw_id_embs=jnp.asarray(dino), is_face=False,
        pad_embeddings=jnp.zeros((77, HIDDEN)))
    assert subj.shape == (2, 16, 16, HIDDEN)
    assert prompt is None


def test_mkv_extension_changes_output(env):
    tok, sbg_mod, text_cfg = env
    cfg = jsbg.SubjBasisConfig(placeholder_is_bg=False, output_dim=HIDDEN,
                               text_cfg=text_cfg)
    params = jsbg.init_params(jax.random.PRNGKey(1), cfg)
    ext = jsbg.extend_prompt2token_proj_attention(params, jax.random.PRNGKey(2),
                                                  multiplier=2, noise_std=0.1)
    rng = np.random.default_rng(7)
    id_embs = jnp.asarray(rng.standard_normal((1, 16, HIDDEN)), jnp.float32)
    a, _ = jsbg.forward(params, cfg, tok, id_embs, is_training=False)
    b, _ = jsbg.forward(ext, cfg, tok, id_embs, is_training=False)
    assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    k = ext["prompt2token_proj"]["layers"][0]["attn"]["k"]["kernel"]
    assert k.shape == (HIDDEN, 2 * HIDDEN)
