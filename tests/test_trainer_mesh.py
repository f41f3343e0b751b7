"""Trainer over the 8-device virtual mesh: distribute() + sharded steps."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from adaprompt_tpu.adaface import subj_basis_generator as sbg
from adaprompt_tpu.data import dataset as ds
from adaprompt_tpu.models import clip_text, unet as unet_mod, vae as vae_mod
from adaprompt_tpu.train import steps as steps_mod
from adaprompt_tpu.train import trainer as trainer_mod

from adaface_fixtures import build_word_vocab

HIDDEN = 576
IMG = 32


def test_trainer_distributed_step(tmp_path):
    tok = build_word_vocab(tmp_path)
    tcfg = clip_text.CLIPTextConfig(vocab_size=50000, hidden_size=HIDDEN,
                                    intermediate_size=HIDDEN * 2, num_layers=2,
                                    num_heads=8, eos_token_id=tok.eos_id)
    ucfg = unet_mod.UNetConfig(model_channels=32, channel_mult=(1, 2),
                               num_res_blocks=1, attention_ds=(1, 2),
                               num_heads=4, context_dim=HIDDEN,
                               use_checkpoint=False)
    vcfg = vae_mod.VAEConfig(ch=32, ch_mult=(1, 2, 4), num_res_blocks=1)
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    frozen = steps_mod.FrozenSD(
        unet=unet_mod.init_params(keys[0], ucfg),
        text=clip_text.init_params(keys[1], tcfg),
        arc2face_text=clip_text.init_params(keys[2], tcfg),
        teacher_unet=unet_mod.init_params(keys[3], ucfg),
        unet_cfg=ucfg, text_cfg=tcfg, arc2face_text_cfg=tcfg)
    scfg = sbg.SubjBasisConfig(placeholder_is_bg=False, output_dim=HIDDEN,
                               text_cfg=tcfg)
    sparams = sbg.init_params(keys[4], scfg)
    vae_params = vae_mod.init_params(jax.random.PRNGKey(9), vcfg)

    root = tmp_path / "subjects" / "alice"
    root.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (IMG, IMG, 3), dtype=np.uint8)).save(root / f"i{i}.jpg")
    subjects = ds.scan_subject_folders(str(tmp_path / "subjects"))
    dset = ds.PersonalizedDataset(subjects, size=IMG, seed=0,
                                  num_vectors_per_subj_token=16)
    it = ds.make_batch_iterator(dset, ds.SubjectSampler(subjects, seed=0),
                                batch_size=8)  # divisible by dp=4

    # fgbg_reg off: the attention-regularizer graph makes the 8-thread CPU
    # collective rendezvous starve under parallel test load (covered
    # single-program by test_train_steps.test_zs_recon_step_with_bg_and_regs)
    cfg = trainer_mod.TrainerConfig(max_steps=10, grad_accum=1,
                                    arc2face_distill_iter_prob=0.0,
                                    composition_regs_iter_gap=0,
                                    fgbg_reg=False,
                                    ckpt_every=100, out_dir=str(tmp_path / "run"),
                                    compute_dtype="float32", seed=0)
    tr = trainer_mod.AdaPromptTrainer(frozen, vae_params, vcfg, tok, scfg,
                                      sparams, it, cfg,
                                      synthetic_faces=True)
    mesh = tr.distribute(fsdp=2)
    assert mesh.shape == {"dp": 4, "fsdp": 2}
    with mesh:
        m = tr.train_step(0)
    assert np.isfinite(m["loss_recon"])
