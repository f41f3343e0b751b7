"""Tests for PromptConditioner (EmbeddingManager-equivalent splicing) and
AdaFacePipeline (product API)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from adaprompt_tpu.adaface import conditioner as cond_mod
from adaprompt_tpu.adaface import subj_basis_generator as sbg
from adaprompt_tpu.models import clip_text
from adaprompt_tpu.utils.tokenizer import CLIPTokenizer

from adaface_fixtures import build_word_vocab

HIDDEN = 64


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    tok = build_word_vocab(tmp_path_factory.mktemp("vocab"))
    cfg = clip_text.CLIPTextConfig(vocab_size=50000, hidden_size=HIDDEN,
                                   intermediate_size=128, num_layers=2,
                                   num_heads=4, eos_token_id=tok.eos_id)
    params = clip_text.init_params(jax.random.PRNGKey(0), cfg)
    specs = cond_mod.make_placeholders(tok, ("z",), ("y",),
                                       num_vectors_subj=16, num_vectors_bg=4)
    pc = cond_mod.PromptConditioner(params, tok, specs, cfg)
    return tok, cfg, params, pc


def test_splice_changes_only_placeholder_positions(env):
    tok, cfg, params, pc = env
    prompts = ["photo of a z in the park", "photo of a cat"]
    ids = pc.tokenize(prompts)
    spec = pc.placeholders["z"]
    bi, pos = cond_mod.find_placeholder_indices(ids, spec)
    np.testing.assert_array_equal(bi, [0])
    assert pos[0] == 4

    base = pc(prompts, {})
    rng = np.random.default_rng(0)
    subj = jnp.asarray(rng.standard_normal((1, 1, 16, HIDDEN)), jnp.float32)
    out = pc(prompts, {"z": subj})
    assert out.shape == base.shape == (1, 2, 77, HIDDEN)
    # prompt without placeholder unchanged
    np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(base[0, 1]), atol=1e-6)
    # prompt with placeholder changed
    assert not np.allclose(np.asarray(out[0, 0]), np.asarray(base[0, 0]), atol=1e-4)


def test_layerwise_splice(env):
    tok, cfg, params, pc = env
    prompts = ["photo of a z"]
    rng = np.random.default_rng(1)
    subj_l = jnp.asarray(rng.standard_normal((1, 16, 16, HIDDEN)), jnp.float32)
    out = pc(prompts, {"z": subj_l})
    assert out.shape == (16, 1, 77, HIDDEN)
    # identical per-layer embeddings -> all layers equal
    subj_same = jnp.tile(subj_l[:, :1], (1, 16, 1, 1))
    out_same = pc(prompts, {"z": subj_same})
    for l in range(1, 16):
        np.testing.assert_allclose(np.asarray(out_same[l]), np.asarray(out_same[0]), atol=1e-6)
    # and equals the L=1 fast path
    fast = pc(prompts, {"z": subj_l[:, :1]})
    assert fast.shape == (1, 1, 77, HIDDEN)
    np.testing.assert_allclose(np.asarray(fast[0]), np.asarray(out_same[0]), atol=1e-6)


def test_bg_placeholder(env):
    tok, cfg, params, pc = env
    prompts = ["photo of a z in the y"]
    rng = np.random.default_rng(2)
    subj = jnp.asarray(rng.standard_normal((1, 1, 16, HIDDEN)), jnp.float32)
    bg = jnp.asarray(rng.standard_normal((1, 1, 4, HIDDEN)), jnp.float32)
    out = pc(prompts, {"z": subj, "y": bg})
    assert out.shape == (1, 1, 77, HIDDEN)


def test_noise_injection_shapes():
    rng = np.random.default_rng(3)
    embs = jnp.asarray(rng.standard_normal((2, 16, 16, HIDDEN)), jnp.float32)
    out = cond_mod.add_noise_to_embedding(embs, jax.random.PRNGKey(0),
                                          (0.02, 0.04), 0.5,
                                          jnp.asarray([1.0, 0.0]))
    assert out.shape == embs.shape
    # unmasked row unchanged
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(embs[1]), atol=1e-7)
    assert not np.allclose(np.asarray(out[0]), np.asarray(embs[0]), atol=1e-6)


def test_adaface_pipeline_product_path(tmp_path_factory):
    """Full product path on tiny models: photos -> subject vectors -> token
    table -> personalized generation."""
    from adaprompt_tpu import pipeline as pl
    from adaprompt_tpu.adaface.wrapper import AdaFacePipeline
    from adaprompt_tpu.models import unet as unet_mod, vae as vae_mod

    tok = build_word_vocab(tmp_path_factory.mktemp("vocab2"))
    hidden = 576
    tcfg = clip_text.CLIPTextConfig(vocab_size=50000, hidden_size=hidden,
                                    intermediate_size=hidden * 2, num_layers=2,
                                    num_heads=8, eos_token_id=tok.eos_id)
    ucfg = unet_mod.UNetConfig(model_channels=32, channel_mult=(1, 2, 4, 4),
                               num_res_blocks=2, attention_ds=(1, 2, 4),
                               num_heads=4, context_dim=hidden, use_checkpoint=False)
    vcfg = vae_mod.VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1)
    pipe = pl.StableDiffusionPipeline.random_init(
        0, unet_cfg=ucfg, vae_cfg=vcfg, text_cfg=tcfg, tokenizer=tok,
        compute_dtype=jnp.float32)

    scfg = sbg.SubjBasisConfig(placeholder_is_bg=False, output_dim=hidden,
                               text_cfg=tcfg)
    sparams = sbg.init_params(jax.random.PRNGKey(1), scfg)
    a2f_params = clip_text.init_params(jax.random.PRNGKey(2), tcfg)

    def fake_face_embedder(images_np=None, image_paths=None):
        rng = np.random.default_rng(42)
        return rng.standard_normal((3, 512)).astype(np.float32)

    ada = AdaFacePipeline(pipe, sparams, scfg, a2f_params, tcfg,
                          face_embedder=fake_face_embedder)
    subj_embs = ada.generate_adaface_embeddings(images_np=[None] * 3)
    assert subj_embs.shape == (16, hidden)

    # prompt rewriting
    p = ada.update_prompt("portrait of z in the park")
    assert "z_0" in p and "z_15" in p and " z " not in f" {p} ".replace("z_", "Q")

    # token table updated at the right rows
    table = pipe.params.text["token_embedding"]
    np.testing.assert_allclose(np.asarray(table[ada.placeholder_token_ids[0]]),
                               np.asarray(subj_embs[0]), atol=1e-6)

    imgs = ada("portrait of z in the park", out_image_count=2, num_steps=2,
               height=64, width=64)
    assert imgs.shape == (2, 64, 64, 3)
    assert imgs.std() > 0

    # the higher-order sampler threads through the product API
    imgs2 = ada("portrait of z in the park", out_image_count=2, num_steps=2,
                height=64, width=64, sampler="dpmpp")
    assert imgs2.shape == (2, 64, 64, 3)
    assert imgs2.std() > 0

    # AOT warmup traces the same signatures without error, and the throwaway
    # random subject rows land in the token table (overwritten by the next
    # real personalization)
    ada.warmup(out_image_counts=(2,), num_steps=2, height=64, width=64)
    subj_embs3 = ada.generate_adaface_embeddings(images_np=[None] * 3)
    np.testing.assert_allclose(
        np.asarray(pipe.params.text["token_embedding"][ada.placeholder_token_ids[0]]),
        np.asarray(subj_embs3[0]), atol=1e-6)
