"""Training-step tests on tiny models: the Stage-1 arc2face distillation
step runs, produces finite losses, and actually updates only the
SubjBasisGenerator."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from adaprompt_tpu.adaface import subj_basis_generator as sbg
from adaprompt_tpu.models import clip_text, unet as unet_mod
from adaprompt_tpu.train import steps as steps_mod
from adaprompt_tpu.train.prodigy import prodigy
from adaprompt_tpu.train.arc2face_teacher import teacher_denoise_chain

from adaface_fixtures import build_word_vocab

HIDDEN = 576


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    tok = build_word_vocab(tmp_path_factory.mktemp("vocab"))
    tcfg = clip_text.CLIPTextConfig(vocab_size=50000, hidden_size=HIDDEN,
                                    intermediate_size=HIDDEN * 2, num_layers=2,
                                    num_heads=8, eos_token_id=tok.eos_id)
    ucfg = unet_mod.UNetConfig(model_channels=32, channel_mult=(1, 2),
                               num_res_blocks=1, attention_ds=(1, 2),
                               num_heads=4, context_dim=HIDDEN,
                               use_checkpoint=False)
    keys = jax.random.split(jax.random.PRNGKey(0), 5)

    def dezero(params, seed):
        # init_params zero-inits proj_out/out convs (torch zero_module
        # parity); randomize them so outputs aren't identically zero
        leaves, treedef = jax.tree.flatten(params)
        rngs = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
        leaves = [l if l.ndim < 2 or jnp.abs(l).sum() > 0
                  else jax.random.normal(r, l.shape) * 0.02
                  for l, r in zip(leaves, rngs)]
        return jax.tree.unflatten(treedef, leaves)

    frozen = steps_mod.FrozenSD(
        unet=dezero(unet_mod.init_params(keys[0], ucfg), 10),
        text=clip_text.init_params(keys[1], tcfg),
        arc2face_text=clip_text.init_params(keys[2], tcfg),
        teacher_unet=dezero(unet_mod.init_params(keys[3], ucfg), 11),
        unet_cfg=ucfg, text_cfg=tcfg, arc2face_text_cfg=tcfg)
    scfg = sbg.SubjBasisConfig(placeholder_is_bg=False, output_dim=HIDDEN,
                               text_cfg=tcfg)
    sparams = sbg.init_params(keys[4], scfg)
    return tok, frozen, scfg, sparams


def test_teacher_chain_shapes(env):
    tok, frozen, scfg, sparams = env
    rng = np.random.default_rng(0)
    z0 = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([800, 900])
    ctx = jnp.asarray(rng.standard_normal((2, 21, HIDDEN)), jnp.float32)
    preds, x0s, noises, ts = teacher_denoise_chain(
        frozen.teacher_unet, z0, noise, t, ctx, jax.random.PRNGKey(1),
        num_denoising_steps=3, unet_cfg=frozen.unet_cfg,
        compute_dtype=jnp.float32)
    assert len(preds) == len(x0s) == len(noises) == len(ts) == 3
    # timesteps strictly decrease
    assert (np.asarray(ts[1]) < np.asarray(ts[0])).all()
    assert (np.asarray(ts[2]) < np.asarray(ts[1])).all()


@pytest.mark.parametrize("nd", [1, 2])
def test_arc2face_distill_step(env, nd):
    tok, frozen, scfg, sparams = env
    optimizer = prodigy(lr=1.0, betas=(0.9, 0.999), d_coef=2.0,
                        use_bias_correction=True)
    step = steps_mod.make_arc2face_distill_step(
        optimizer, frozen, tok, scfg, num_denoising_steps=nd,
        compute_dtype=jnp.float32)
    trainable = {"subj_basis": sparams}
    state = steps_mod.create_train_state(trainable, optimizer)

    rng = np.random.default_rng(1)
    faceid = rng.standard_normal((2, 512)).astype(np.float32)
    faceid /= np.linalg.norm(faceid, axis=-1, keepdims=True)
    batch = {
        "z0": jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32),
        "faceid": jnp.asarray(faceid),
        "fg_mask": jnp.asarray((rng.random((2, 8, 8, 1)) > 0.4), jnp.float32),
        "aug_mask": None,
    }
    fp = steps_mod.frozen_params(frozen)
    step = jax.jit(step)
    state2, metrics = step(state, fp, batch, jax.random.PRNGKey(2))
    loss = float(metrics["loss_arc2face_distill"])
    assert np.isfinite(loss) and loss > 0
    # SubjBasisGenerator got gradient signal (hidden weights or
    # prompt2token_proj moved)
    before = state.params["subj_basis"]["hidden_state_layer_weights"]
    after = state2.params["subj_basis"]["hidden_state_layer_weights"]
    moved_hw = not np.allclose(np.asarray(before), np.asarray(after))
    b_k = state.params["subj_basis"]["prompt2token_proj"]["layers"][0]["attn"]["q"]["kernel"]
    a_k = state2.params["subj_basis"]["prompt2token_proj"]["layers"][0]["attn"]["q"]["kernel"]
    moved_proj = not np.allclose(np.asarray(b_k), np.asarray(a_k))
    assert moved_hw or moved_proj
    # second step with a different ND-compiled variant still runs
    state3, metrics = step(state2, fp, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss_arc2face_distill"]))


def test_static_recon_step(env):
    """Legacy textual-inversion mode: StaticLayerwiseEmbedding trained by
    masked recon (embedding_manager.py:362-539 wiring)."""
    from adaprompt_tpu.adaface import static_embedder as se
    from adaprompt_tpu.adaface import conditioner as cond_mod
    from adaprompt_tpu.train import trainer as trainer_mod

    tok, frozen, scfg, _ = env
    static_cfg = se.StaticEmbedderConfig(num_vectors=4, rank=3,
                                         out_emb_dim=HIDDEN)
    optimizer = prodigy(lr=1.0)
    trainable = {"static_emb": se.init_params(jax.random.PRNGKey(5), static_cfg)}
    state = steps_mod.create_train_state(trainable, optimizer)
    step = jax.jit(trainer_mod.make_static_recon_step(
        optimizer, frozen, static_cfg, compute_dtype=jnp.float32))

    specs = cond_mod.make_placeholders(tok, ("z",), (), num_vectors_subj=4)
    ids = tok(["a photo of a z person", "a z in the park"], max_length=77)
    bi, pos = cond_mod.find_placeholder_indices(ids, specs[0])
    rng = np.random.default_rng(2)
    batch = {"z0": jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32),
             "caption_ids": jnp.asarray(ids),
             "subj_bi": jnp.asarray(bi, jnp.int32),
             "subj_pos": jnp.asarray(pos, jnp.int32),
             "fg_mask": None, "aug_mask": None,
             "skip_weights": jnp.asarray([0.5, 0.5], jnp.float32)}
    state2, metrics = step(state, steps_mod.frozen_params(frozen), batch,
                           jax.random.PRNGKey(6))
    assert np.isfinite(float(metrics["loss_recon"]))
    moved = not np.allclose(
        np.asarray(state.params["static_emb"]["basis_rand_weights"]),
        np.asarray(state2.params["static_emb"]["basis_rand_weights"]))
    assert moved


def test_zs_recon_step_with_bg_and_regs(env):
    """BG-token branch + fg/bg attention regularizers in the recon step
    (embedding_manager.py:1148-1178; ddpm.py:3459-3530)."""
    from adaprompt_tpu.adaface import conditioner as cond_mod
    from adaprompt_tpu.train import trainer as trainer_mod

    tok, frozen, scfg, sparams = env
    bg_cfg = sbg.SubjBasisConfig(placeholder_is_bg=True, output_dim=HIDDEN,
                                 num_out_embs_per_layer=2, num_id_vecs_bg=10,
                                 image_embedding_dim=24, text_cfg=scfg.text_cfg)
    optimizer = prodigy(lr=1.0)
    trainable = {"subj_basis": sparams,
                 "bg_basis": sbg.init_params(jax.random.PRNGKey(7), bg_cfg),
                 "emb_scales": jnp.zeros((2,), jnp.float32)}
    state = steps_mod.create_train_state(trainable, optimizer)
    step = jax.jit(trainer_mod.make_zs_recon_step(
        optimizer, frozen, tok, scfg, bg_basis_cfg=bg_cfg, use_bg=True,
        fgbg_reg=True, compute_dtype=jnp.float32))

    specs = cond_mod.make_placeholders(
        tok, ("z",), ("y",), num_vectors_subj=scfg.num_out_embs_per_layer,
        num_vectors_bg=2)
    ids = tok(["a photo of a z person with background y",
               "a z person with background y"], max_length=77)
    bi, pos = cond_mod.find_placeholder_indices(ids, specs[0])
    bbi, bpos = cond_mod.find_placeholder_indices(ids, specs[1])
    rng = np.random.default_rng(3)
    faceid = rng.standard_normal((2, 512)).astype(np.float32)
    faceid /= np.linalg.norm(faceid, axis=-1, keepdims=True)
    batch = {"z0": jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32),
             "faceid": jnp.asarray(faceid),
             "caption_ids": jnp.asarray(ids),
             "subj_bi": jnp.asarray(bi, jnp.int32),
             "subj_pos": jnp.asarray(pos, jnp.int32),
             "bg_bi": jnp.asarray(bbi, jnp.int32),
             "bg_pos": jnp.asarray(bpos, jnp.int32),
             "clip_features": jnp.asarray(
                 rng.standard_normal((2, 10, 24)), jnp.float32),
             "fg_mask": jnp.asarray((rng.random((2, 8, 8, 1)) > 0.4), jnp.float32),
             "aug_mask": None,
             "skip_weights": jnp.asarray([0.5, 0.5], jnp.float32),
             "emb_noise_std": jnp.asarray(0.03, jnp.float32),
             "emb_scale_perturb": jnp.asarray([1.1, 0.9], jnp.float32)}
    state2, metrics = step(state, steps_mod.frozen_params(frozen), batch,
                           jax.random.PRNGKey(8))
    for k in ("loss_recon", "loss_fg_bg_complementary", "loss_subj_mb_suppress",
              "loss_fg_xlayer_consist"):
        assert np.isfinite(float(metrics[k])), k
    # the bg basis generator must receive gradient
    b0 = state.params["bg_basis"]["bg_proj_in"]["kernel"]
    b1 = state2.params["bg_basis"]["bg_proj_in"]["kernel"]
    assert not np.allclose(np.asarray(b0), np.asarray(b1))
    # global scale scores must receive gradient too
    assert not np.allclose(np.asarray(state.params["emb_scales"]),
                           np.asarray(state2.params["emb_scales"]))


def test_zs_recon_step_with_conv_attn(env):
    """--use_conv_attn_kernel_size threading: the recon step with conv-attn
    enabled replaces the subject attention rows and changes the loss
    (main.py:225; openaimodel.py:922-932; attention.py:208-216)."""
    from adaprompt_tpu.adaface import conditioner as cond_mod
    from adaprompt_tpu.train import trainer as trainer_mod

    tok, frozen, scfg, sparams = env
    optimizer = prodigy(lr=1.0)
    trainable = {"subj_basis": sparams}
    state = steps_mod.create_train_state(trainable, optimizer)

    specs = cond_mod.make_placeholders(tok, ("z",), (),
                                       num_vectors_subj=scfg.num_out_embs_per_layer)
    ids = tok(["a photo of a z person", "a z in the park"], max_length=77)
    bi, pos = cond_mod.find_placeholder_indices(ids, specs[0])
    rng = np.random.default_rng(4)
    faceid = rng.standard_normal((2, 512)).astype(np.float32)
    faceid /= np.linalg.norm(faceid, axis=-1, keepdims=True)
    batch = {"z0": jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32),
             "faceid": jnp.asarray(faceid),
             "caption_ids": jnp.asarray(ids),
             "subj_bi": jnp.asarray(bi, jnp.int32),
             "subj_pos": jnp.asarray(pos, jnp.int32),
             "fg_mask": None, "aug_mask": None,
             "skip_weights": jnp.asarray([0.5, 0.5], jnp.float32)}
    fp = steps_mod.frozen_params(frozen)

    losses = {}
    for ks in (0, 3):
        step = jax.jit(trainer_mod.make_zs_recon_step(
            optimizer, frozen, tok, scfg, compute_dtype=jnp.float32,
            conv_attn_kernel_size=ks))
        _, metrics = step(state, fp, batch, jax.random.PRNGKey(11))
        losses[ks] = float(metrics["loss_recon"])
        assert np.isfinite(losses[ks])
    # the replaced subject rows must actually change the prediction
    assert abs(losses[0] - losses[3]) > 1e-8, losses
