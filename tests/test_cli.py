"""CLI smoke tests with tiny models (load_pipeline monkeypatched)."""

import numpy as np
import pytest
import jax.numpy as jnp

from adaprompt_tpu.cli import common as cli_common
from adaprompt_tpu.models import clip_text, unet as unet_mod, vae as vae_mod
from adaprompt_tpu import pipeline as pl

from adaface_fixtures import build_word_vocab

HIDDEN = 576


@pytest.fixture()
def tiny_pipe(tmp_path):
    tok = build_word_vocab(tmp_path)
    tcfg = clip_text.CLIPTextConfig(vocab_size=50000, hidden_size=HIDDEN,
                                    intermediate_size=HIDDEN * 2, num_layers=2,
                                    num_heads=8, eos_token_id=tok.eos_id)
    ucfg = unet_mod.UNetConfig(model_channels=32, channel_mult=(1, 2),
                               num_res_blocks=1, attention_ds=(1, 2),
                               num_heads=4, context_dim=HIDDEN,
                               use_checkpoint=False)
    vcfg = vae_mod.VAEConfig(ch=32, ch_mult=(1, 2, 4), num_res_blocks=1)
    return pl.StableDiffusionPipeline.random_init(
        0, unet_cfg=ucfg, vae_cfg=vcfg, text_cfg=tcfg, tokenizer=tok,
        compute_dtype=jnp.float32)


@pytest.fixture()
def subject_dir(tmp_path):
    from PIL import Image
    d = tmp_path / "subj"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(d / f"i{i}.jpg")
    return str(d)


def test_txt2img_cli(tiny_pipe, tmp_path, monkeypatch):
    from adaprompt_tpu.cli import txt2img
    monkeypatch.setattr(cli_common, "load_pipeline", lambda a: tiny_pipe)
    out = str(tmp_path / "out")
    paths = txt2img.main([
        "--prompt", "photo of a z in the park", "--n_samples", "1",
        "--ddim_steps", "2", "--H", "32", "--W", "32", "--outdir", out,
        "--neg_prompt", "photo of the cat",
    ])
    assert len(paths) == 1
    import os
    assert os.path.exists(paths[0])


def test_train_static_cli(tiny_pipe, subject_dir, tmp_path, monkeypatch):
    """--mode static must run end-to-end: regression for the CLI passing
    (state, batch, key) to a step whose signature is (state, fp, batch, key)."""
    import os
    from adaprompt_tpu.cli import train as train_cli
    monkeypatch.setattr(cli_common, "load_pipeline", lambda a: tiny_pipe)
    out = str(tmp_path / "static_run")
    train_cli.main([
        "--mode", "static", "--data_roots", str(tmp_path),
        "--num_steps", "1", "--bs", "2", "--size", "64",
        "--ckpt_every", "1", "--out_dir", out,
        "--num_vectors_per_subj_token", "2", "--static_rank", "2",
    ])
    assert any(f.startswith("static_emb_gs-") for f in os.listdir(out))


def test_infer_cli(tiny_pipe, subject_dir, tmp_path, monkeypatch):
    from adaprompt_tpu.cli import infer
    monkeypatch.setattr(cli_common, "load_pipeline", lambda a: tiny_pipe)
    out = str(tmp_path / "out2")
    paths = infer.main([
        "--subject", subject_dir, "--prompt", "portrait of z",
        "--out_image_count", "1", "--num_steps", "2", "--outdir", out,
    ])
    assert len(paths) == 1
