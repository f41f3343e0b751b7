"""Parity tests: adaprompt_tpu.models.vae vs the reference ldm VAE
(/root/reference/ldm/modules/diffusionmodules/model.py Encoder/Decoder)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from adaprompt_tpu.models import vae as jvae

import torch_oracle

# Tiny VAE: 32x32 images, f=4, two levels.
TINY = dict(ch=32, ch_mult=(1, 2), num_res_blocks=2, z_channels=4,
            embed_dim=4, double_z=True)


@pytest.fixture(scope="module")
def tiny_pair():
    model_mod = torch_oracle.load("ldm.modules.diffusionmodules.model")
    torch.manual_seed(0)
    enc = model_mod.Encoder(ch=TINY["ch"], out_ch=3, ch_mult=TINY["ch_mult"],
                            num_res_blocks=TINY["num_res_blocks"],
                            attn_resolutions=[], dropout=0.0, in_channels=3,
                            resolution=32, z_channels=TINY["z_channels"],
                            double_z=True).eval()
    dec = model_mod.Decoder(ch=TINY["ch"], out_ch=3, ch_mult=TINY["ch_mult"],
                            num_res_blocks=TINY["num_res_blocks"],
                            attn_resolutions=[], dropout=0.0, in_channels=3,
                            resolution=32, z_channels=TINY["z_channels"]).eval()
    quant = torch.nn.Conv2d(2 * TINY["z_channels"], 2 * TINY["embed_dim"], 1)
    post_quant = torch.nn.Conv2d(TINY["embed_dim"], TINY["z_channels"], 1)

    sd = {}
    sd.update({f"encoder.{k}": v for k, v in enc.state_dict().items()})
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    sd.update({f"quant_conv.{k}": v for k, v in quant.state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v for k, v in post_quant.state_dict().items()})

    cfg = jvae.VAEConfig(ch=TINY["ch"], ch_mult=TINY["ch_mult"],
                         num_res_blocks=TINY["num_res_blocks"],
                         z_channels=TINY["z_channels"], embed_dim=TINY["embed_dim"])
    params = jvae.from_torch(sd, cfg)
    return (enc, dec, quant, post_quant), cfg, params


def test_encode_parity(tiny_pair):
    (enc, dec, quant, post_quant), cfg, params = tiny_pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        moments = quant(enc(torch.tensor(x)))
        ref_mean, ref_logvar = moments.chunk(2, dim=1)
    mean, logvar = jvae.encode(params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg=cfg)
    np.testing.assert_allclose(np.asarray(mean).transpose(0, 3, 1, 2),
                               ref_mean.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logvar).transpose(0, 3, 1, 2),
                               ref_logvar.numpy(), atol=1e-4, rtol=1e-3)


def test_decode_parity(tiny_pair):
    (enc, dec, quant, post_quant), cfg, params = tiny_pair
    rng = np.random.default_rng(1)
    z = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = dec(post_quant(torch.tensor(z))).numpy()
    got = jvae.decode(params, jnp.asarray(z.transpose(0, 2, 3, 1)), cfg=cfg)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=1e-4, rtol=1e-3)


def test_encode_masked_attention(tiny_pair):
    """fg/bg pairwise attention masking in the encoder mid attention
    (model.py:196-233)."""
    (enc, dec, quant, post_quant), cfg, params = tiny_pair
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    fg = (rng.random((2, 1, 32, 32)) > 0.5).astype(np.float32)
    mask = {"fg_mask": torch.tensor(fg), "aug_mask": None}
    with torch.no_grad():
        moments = quant(enc(torch.tensor(x), mask))
        ref_mean, _ = moments.chunk(2, dim=1)
    jmask = {"fg_mask": jnp.asarray(fg.transpose(0, 2, 3, 1)), "aug_mask": None}
    mean, _ = jvae.encode(params, jnp.asarray(x.transpose(0, 2, 3, 1)), mask=jmask, cfg=cfg)
    np.testing.assert_allclose(np.asarray(mean).transpose(0, 3, 1, 2),
                               ref_mean.numpy(), atol=1e-4, rtol=1e-3)


def test_roundtrip_shapes():
    cfg = jvae.SD15_VAE_CONFIG
    params = jvae.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 64, 64, 3))
    mean, logvar = jvae.encode(params, x, cfg=cfg)
    assert mean.shape == (1, 8, 8, 4)
    z = jvae.sample_latent(jax.random.PRNGKey(1), mean, logvar)
    y = jvae.decode(params, z, cfg=cfg)
    assert y.shape == (1, 64, 64, 3)
