"""End-to-end trainer smoke test on tiny models + synthetic subjects."""

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
IMG = 32  # training image size -> 4x4 latents


@pytest.fixture(scope="module")
def subject_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("subjects")
    rng = np.random.default_rng(0)
    d = root / "alice"
    d.mkdir()
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (IMG, IMG, 3), dtype=np.uint8)).save(d / f"i{i}.jpg")
        m = np.zeros((IMG, IMG), np.uint8)
        m[8:24, 8:24] = 255
        Image.fromarray(m).save(d / f"i{i}_mask.png")
    return str(root)


def test_trainer_two_steps(subject_tree, tmp_path):
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

    subjects = ds.scan_subject_folders(subject_tree)
    dset = ds.PersonalizedDataset(subjects, size=IMG, seed=0,
                                  num_vectors_per_subj_token=16)
    it = ds.make_batch_iterator(dset, ds.SubjectSampler(subjects, seed=0),
                                batch_size=2)

    cfg = trainer_mod.TrainerConfig(
        max_steps=10, grad_accum=1, arc2face_distill_iter_prob=0.5,
        max_num_denoising_steps=1, ckpt_every=100,
        composition_regs_iter_gap=2, no_teacher_filter=True,
        out_dir=str(tmp_path / "run"), compute_dtype="float32", seed=0)
    tr = trainer_mod.AdaPromptTrainer(frozen, vae_params, vcfg, tok, scfg,
                                      sparams, it, cfg,
                                      synthetic_faces=True)
    seen = set()
    for i in range(4):
        m = tr.train_step(i)
        loss = m.get("loss_recon",
                     m.get("loss_arc2face_distill", m.get("loss_compos")))
        assert np.isfinite(loss), m
        # grads must be finite too — a NaN here poisons Prodigy state for
        # every later step (regression: zero delta rows used to NaN the
        # cosine-loss backward)
        if "grad_norm" in m:
            assert np.isfinite(float(m["grad_norm"])), m
        seen.add(m["iter_type"])
    assert "compos_distill" in seen  # step 2 is a compositional iter

    p = tr.save_checkpoint(3)
    meta = tr.load_checkpoint(p)
    assert meta["step"] == 3

    # with a CLIP scorer attached, compositional iters go through teacher
    # filtering (and either train or report a skip)
    from adaprompt_tpu.eval.clip_scorer import CLIPScorer
    from adaprompt_tpu.models import clip_vision
    sc_tcfg = clip_text.CLIPTextConfig(vocab_size=50000, hidden_size=64,
                                       intermediate_size=128, num_layers=2,
                                       num_heads=4, eos_token_id=tok.eos_id)
    sc_vcfg = clip_vision.CLIPVisionConfig(image_size=32, patch_size=8,
                                           hidden_size=64, intermediate_size=128,
                                           num_layers=2, num_heads=4,
                                           projection_dim=32)
    tr.clip_scorer = CLIPScorer.random_init(0, tokenizer=tok, text_cfg=sc_tcfg,
                                            vision_cfg=sc_vcfg)
    tr._cached_inits.cache.clear()
    m = tr.train_step(4)  # 4 % 2 == 0 -> compositional iter, fresh -> filter
    assert m["iter_type"] in ("compos_distill", "compos_distill_skipped")

    # ImageLogger-style sample grid
    import os
    path = tr.log_samples(5, prompt="photo of a z", num_steps=2, n=2,
                          height=IMG, width=IMG)
    assert os.path.exists(path)

    # full-state resume: params AND optimizer state (Prodigy D) round-trip
    sp = tr.save_full_state(5)
    d_before = float(tr.state.opt_state.inner_opt_state[1].d) \
        if hasattr(tr.state.opt_state, "inner_opt_state") else None
    before = jax.tree.leaves(tr.state.params)
    frozen_before = jax.tree.leaves(tr._frozen_sbg_params)
    tr.state = trainer_mod.steps_mod.create_train_state(tr.state.params,
                                                        tr.optimizer)
    # a resumed process re-inits the frozen SBG copy randomly; load must
    # restore the saved one or the 0.9/0.1 blend is corrupted
    tr._frozen_sbg_params = jax.tree.map(
        lambda x: x + 1.0 if hasattr(x, "dtype") else x, tr._frozen_sbg_params)
    meta = tr.load_full_state(sp)
    assert meta["step"] == 5
    after = jax.tree.leaves(tr.state.params)
    for a, b in zip(before, after):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(frozen_before, jax.tree.leaves(tr._frozen_sbg_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_half_bs_on_multistep_distill(subject_tree, tmp_path, monkeypatch):
    """ND>1 distill iters train on only the first ceil(B/ND) rows
    (HALF_BS, ddpm.py:1855-1880) to bound the ND-chained UNet cost."""
    tok = build_word_vocab(tmp_path)
    tcfg = clip_text.CLIPTextConfig(vocab_size=50000, hidden_size=HIDDEN,
                                    intermediate_size=HIDDEN * 2, num_layers=2,
                                    num_heads=8, eos_token_id=tok.eos_id)
    ucfg = unet_mod.UNetConfig(model_channels=32, channel_mult=(1, 2),
                               num_res_blocks=1, attention_ds=(1, 2),
                               num_heads=4, context_dim=HIDDEN,
                               use_checkpoint=False)
    vcfg = vae_mod.VAEConfig(ch=32, ch_mult=(1, 2, 4), num_res_blocks=1)
    keys = jax.random.split(jax.random.PRNGKey(1), 5)
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
    subjects = ds.scan_subject_folders(subject_tree)
    dset = ds.PersonalizedDataset(subjects, size=IMG, seed=0,
                                  num_vectors_per_subj_token=16)
    it = ds.make_batch_iterator(dset, ds.SubjectSampler(subjects, seed=0),
                                batch_size=4)
    cfg = trainer_mod.TrainerConfig(
        max_steps=10, grad_accum=1, arc2face_distill_iter_prob=1.0,
        max_num_denoising_steps=3, ckpt_every=100, fgbg_reg=False,
        out_dir=str(tmp_path / "run_hb"), compute_dtype="float32", seed=0)
    tr = trainer_mod.AdaPromptTrainer(frozen, vae_params, vcfg, tok, scfg,
                                      sparams, it, cfg,
                                      synthetic_faces=True)
    monkeypatch.setattr(tr, "_sample_num_denoising_steps", lambda: 3)
    m = tr.train_step(1)
    assert m["iter_type"] == "arc2face_distill"
    assert m["num_denoising_steps"] == 3
    assert m["distill_bs"] == 2          # ceil(4/3) = 2
    assert np.isfinite(m["loss_arc2face_distill"])
    # ND=1 keeps the full batch
    monkeypatch.setattr(tr, "_sample_num_denoising_steps", lambda: 1)
    m = tr.train_step(2)
    assert m["distill_bs"] == 4


def test_deferred_metrics_flush(tmp_path):
    """Strided metrics fetch: rows are queued and written in one
    device_get batch every cfg.metrics_flush_every steps, with identical
    metrics.jsonl content (one line per step, host fields preserved)."""
    import json
    import os

    tr = object.__new__(trainer_mod.AdaPromptTrainer)
    tr.cfg = trainer_mod.TrainerConfig(out_dir=str(tmp_path),
                                       metrics_flush_every=3)
    path = os.path.join(str(tmp_path), "metrics.jsonl")
    tr._metrics_file = open(path, "a")
    tr._pending_metrics = []

    for i in range(5):
        m = tr._emit_metrics(i, {"loss": jnp.float32(i * 0.5),
                                 "iter_type": "recon"},
                             {"step_time_s": 0.1})
        assert m["iter_type"] == "recon"
        assert m["step"] == i
    # steps 0-2 flushed (window of 3), 3-4 still pending
    tr._metrics_file.flush()
    lines = [json.loads(l) for l in open(path)]
    assert [l["step"] for l in lines] == [0, 1, 2]
    assert len(tr._pending_metrics) == 2

    last = tr._flush_metrics()
    lines = [json.loads(l) for l in open(path)]
    assert [l["step"] for l in lines] == [0, 1, 2, 3, 4]
    assert lines[3]["loss"] == pytest.approx(1.5)
    assert all(l["step_time_s"] == 0.1 for l in lines)
    assert last["step"] == 4 and last["loss"] == pytest.approx(2.0)
    tr._metrics_file.close()


def test_compos_without_scorer_refused(subject_tree, tmp_path):
    """Compositional training with clip_scorer=None must refuse unless the
    no_teacher_filter opt-in is set (round-4 verdict item 5): without the
    CLIP teacher filter every fresh compos iter is treated as teachable,
    while the reference keeps only ~30-40% (ddpm.py:3649-3664)."""
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
    subjects = ds.scan_subject_folders(subject_tree)
    dset = ds.PersonalizedDataset(subjects, size=IMG, seed=0,
                                  num_vectors_per_subj_token=16)
    it = ds.make_batch_iterator(dset, ds.SubjectSampler(subjects, seed=0),
                                batch_size=2)
    cfg = trainer_mod.TrainerConfig(
        max_steps=10, grad_accum=1, composition_regs_iter_gap=2,
        out_dir=str(tmp_path / "run2"), compute_dtype="float32", seed=0)
    with pytest.raises(ValueError, match="teachable"):
        trainer_mod.AdaPromptTrainer(frozen, vae_params, vcfg, tok, scfg,
                                     sparams, it, cfg, synthetic_faces=True)
