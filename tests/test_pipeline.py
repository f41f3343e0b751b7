"""End-to-end pipeline smoke tests (tiny configs, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from adaprompt_tpu import pipeline as pl
from adaprompt_tpu.models import clip_text, unet as unet_mod, vae as vae_mod


def tiny_pipeline(dtype=jnp.float32):
    ucfg = unet_mod.UNetConfig(model_channels=32, channel_mult=(1, 2, 4, 4),
                               num_res_blocks=2, attention_ds=(1, 2, 4),
                               num_heads=4, context_dim=64, use_checkpoint=False)
    vcfg = vae_mod.VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1)
    tcfg = clip_text.CLIPTextConfig(vocab_size=49408, hidden_size=64,
                                    intermediate_size=128, num_layers=2,
                                    num_heads=4)
    return pl.StableDiffusionPipeline.random_init(
        0, unet_cfg=ucfg, vae_cfg=vcfg, text_cfg=tcfg, compute_dtype=dtype)


def test_txt2img_e2e():
    pipe = tiny_pipeline()
    imgs = pipe.generate(["a photo of a cat"], num_steps=3,
                         height=64, width=64, seed=1)
    assert imgs.shape == (1, 64, 64, 3)
    assert imgs.dtype == np.uint8
    # not a constant image
    assert imgs.std() > 0


def test_txt2img_layerwise_context():
    pipe = tiny_pipeline()
    ctx = pipe.encode_prompt(["a photo of a cat"])          # [1,77,64]
    ctx16 = jnp.tile(ctx[None], (16, 1, 1, 1))
    un = pipe.encode_prompt([pl.DEFAULT_NEGATIVE_PROMPT])
    imgs_shared = pipe.generate(None, context=ctx[None], context_uncond=un[None],
                                num_steps=2, height=64, width=64, seed=2)
    imgs_lw = pipe.generate(None, context=ctx16, context_uncond=jnp.tile(un[None], (16, 1, 1, 1)),
                            num_steps=2, height=64, width=64, seed=2)
    np.testing.assert_allclose(imgs_shared.astype(np.int32), imgs_lw.astype(np.int32), atol=1)


def test_deterministic_seeding():
    pipe = tiny_pipeline()
    a = pipe.generate(["x"], num_steps=2, height=64, width=64, seed=3)
    b = pipe.generate(["x"], num_steps=2, height=64, width=64, seed=3)
    c = pipe.generate(["x"], num_steps=2, height=64, width=64, seed=4)
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_encode_image_roundtrip_shapes():
    pipe = tiny_pipeline()
    imgs = jnp.zeros((2, 64, 64, 3))
    z = pipe.encode_image(imgs)
    assert z.shape == (2, 8, 8, 4)
    out = pipe.decode_latents(z)
    assert out.shape == (2, 64, 64, 3)


def test_distributed_generate_matches_single_device():
    """generate() over an 8-device dp mesh == single-device output (the
    graph is batch-parallel; GSPMD sharding must not change numerics)."""
    from adaprompt_tpu.parallel import mesh as mesh_mod

    pipe = tiny_pipeline()
    prompts = ["a photo of a cat"] * 8
    ref = pipe.generate(prompts, num_steps=2, height=64, width=64, seed=5)

    dist = tiny_pipeline().distribute(mesh_mod.make_mesh(8))
    out = dist.generate(prompts, num_steps=2, height=64, width=64, seed=5)
    assert out.shape == (8, 64, 64, 3)
    np.testing.assert_allclose(ref.astype(np.int32), out.astype(np.int32),
                               atol=1)

    # batch not divisible by dp -> loud failure, not silent misplacement
    import pytest
    with pytest.raises(ValueError, match="divisible"):
        dist.generate(["x"] * 3, num_steps=1, height=64, width=64)


def test_distributed_generate_fastpath():
    """The FastConfig path also runs over the mesh (cond-only CFG-tail steps
    slice the sharded context: shape change, same dp layout)."""
    from adaprompt_tpu.parallel import mesh as mesh_mod

    dist = tiny_pipeline().distribute(mesh_mod.make_mesh(8))
    fast = pl.FastConfig(tome_ratio=0.0, tome_mlp=False, cache_interval=2,
                         cache_depth=2, cfg_tail_frac=0.5)
    out = dist.generate(["x"] * 8, num_steps=4, height=64, width=64, seed=6,
                        fast=fast)
    assert out.shape == (8, 64, 64, 3)
    assert out.std() > 0
