"""diffusers-layout porter tests: rename an ldm-layout state dict into the
standard diffusers naming (the public conversion mapping) and check
unet_from_diffusers / vae_from_diffusers reproduce from_torch outputs."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from adaprompt_tpu.models import unet as junet, vae as jvae
from adaprompt_tpu.utils import diffusers_port as dp

import torch_oracle

TINY = dict(model_channels=32, channel_mult=(1, 2, 4, 4), num_res_blocks=2,
            attention_ds=(1, 2, 4), num_heads=4, context_dim=16,
            in_channels=4, out_channels=4)


def _rename_resnet(sd, src, dst, out):
    m = {"in_layers.0": "norm1", "in_layers.2": "conv1",
         "emb_layers.1": "time_emb_proj", "out_layers.0": "norm2",
         "out_layers.3": "conv2", "skip_connection": "conv_shortcut"}
    for k, v in sd.items():
        if k.startswith(src + "."):
            rest = k[len(src) + 1:]
            for a, b in m.items():
                if rest.startswith(a + "."):
                    out[f"{dst}.{b}.{rest[len(a) + 1:]}"] = v


def _rename_attn(sd, src, dst, out):
    for k, v in sd.items():
        if k.startswith(src + "."):
            out[f"{dst}.{k[len(src) + 1:]}"] = v


def ldm_to_diffusers_unet(sd, cfg):
    out = {}
    nr = cfg.num_res_blocks
    n_levels = len(cfg.channel_mult)
    for k in ("time_embed.0", "time_embed.2"):
        for suf in (".weight", ".bias"):
            out[("time_embedding.linear_1" if k.endswith("0") else
                 "time_embedding.linear_2") + suf] = sd[k + suf]
    out["conv_in.weight"] = sd["input_blocks.0.0.weight"]
    out["conv_in.bias"] = sd["input_blocks.0.0.bias"]
    idx = 1
    for lvl in range(n_levels):
        for j in range(nr):
            _rename_resnet(sd, f"input_blocks.{idx}.0", f"down_blocks.{lvl}.resnets.{j}", out)
            _rename_attn(sd, f"input_blocks.{idx}.1", f"down_blocks.{lvl}.attentions.{j}", out)
            idx += 1
        if lvl != n_levels - 1:
            for suf in (".weight", ".bias"):
                out[f"down_blocks.{lvl}.downsamplers.0.conv{suf}"] = sd[f"input_blocks.{idx}.0.op{suf}"]
            idx += 1
    _rename_resnet(sd, "middle_block.0", "mid_block.resnets.0", out)
    _rename_attn(sd, "middle_block.1", "mid_block.attentions.0", out)
    _rename_resnet(sd, "middle_block.2", "mid_block.resnets.1", out)
    idx = 0
    for lvl in range(n_levels):
        for j in range(nr + 1):
            _rename_resnet(sd, f"output_blocks.{idx}.0", f"up_blocks.{lvl}.resnets.{j}", out)
            _rename_attn(sd, f"output_blocks.{idx}.1", f"up_blocks.{lvl}.attentions.{j}", out)
            for sub in (1, 2):
                for suf in (".weight", ".bias"):
                    k = f"output_blocks.{idx}.{sub}.conv{suf}"
                    if k in sd:
                        out[f"up_blocks.{lvl}.upsamplers.0.conv{suf}"] = sd[k]
            idx += 1
    for suf in (".weight", ".bias"):
        out["conv_norm_out" + suf] = sd["out.0" + suf]
        out["conv_out" + suf] = sd["out.2" + suf]
    return out


def test_unet_diffusers_port_matches_ldm():
    om = torch_oracle.load("ldm.modules.diffusionmodules.openaimodel")
    torch.manual_seed(0)
    ref = om.UNetModel(image_size=32, in_channels=4, out_channels=4,
                       model_channels=TINY["model_channels"],
                       attention_resolutions=list(TINY["attention_ds"]),
                       num_res_blocks=TINY["num_res_blocks"],
                       channel_mult=list(TINY["channel_mult"]),
                       num_heads=TINY["num_heads"], use_spatial_transformer=True,
                       transformer_depth=1, context_dim=TINY["context_dim"],
                       use_checkpoint=False, legacy=False).eval()
    with torch.no_grad():
        for _, p in ref.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)
    cfg = junet.UNetConfig(**TINY, use_checkpoint=False)
    sd = {k: v for k, v in ref.state_dict().items()}
    params_ldm = junet.from_torch(sd, cfg)
    params_dif = dp.unet_from_diffusers(ldm_to_diffusers_unet(sd, cfg), cfg)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 4)), jnp.float32)
    t = jnp.asarray([123])
    ctx = jnp.asarray(rng.standard_normal((1, 77, 16)), jnp.float32)
    a = junet.forward(params_ldm, x, t, ctx, cfg=cfg)
    b = junet.forward(params_dif, x, t, ctx, cfg=cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def ldm_to_diffusers_vae(sd, cfg):
    out = {}
    n = cfg.num_resolutions

    def res(src, dst):
        for k, v in sd.items():
            if k.startswith(src + "."):
                rest = k[len(src) + 1:].replace("nin_shortcut", "conv_shortcut")
                out[f"{dst}.{rest}"] = v

    def attn(src, dst):
        m = {"norm": "group_norm", "q": "to_q", "k": "to_k", "v": "to_v",
             "proj_out": "to_out.0"}
        for k, v in sd.items():
            if k.startswith(src + "."):
                rest = k[len(src) + 1:]
                name, suf = rest.rsplit(".", 1)
                nm = m[name]
                # diffusers stores attention projections as Linear
                if nm.startswith("to_") and v.ndim == 4:
                    v = v[:, :, 0, 0]
                out[f"{dst}.{nm}.{suf}"] = v

    for tower, updown, nblocks in (("encoder", "down", cfg.num_res_blocks),
                                   ("decoder", "up", cfg.num_res_blocks + 1)):
        for suf in (".weight", ".bias"):
            out[f"{tower}.conv_in{suf}"] = sd[f"{tower}.conv_in{suf}"]
            out[f"{tower}.conv_norm_out{suf}"] = sd[f"{tower}.norm_out{suf}"]
            out[f"{tower}.conv_out{suf}"] = sd[f"{tower}.conv_out{suf}"]
        for i in range(n):
            di = i if updown == "down" else n - 1 - i
            dst = f"{tower}.{updown}_blocks.{di}"
            for j in range(nblocks):
                res(f"{tower}.{updown}.{i}.block.{j}", f"{dst}.resnets.{j}")
            for suf in (".weight", ".bias"):
                k = f"{tower}.{updown}.{i}.downsample.conv{suf}"
                if k in sd:
                    out[f"{dst}.downsamplers.0.conv{suf}"] = sd[k]
                k = f"{tower}.{updown}.{i}.upsample.conv{suf}"
                if k in sd:
                    out[f"{dst}.upsamplers.0.conv{suf}"] = sd[k]
        res(f"{tower}.mid.block_1", f"{tower}.mid_block.resnets.0")
        res(f"{tower}.mid.block_2", f"{tower}.mid_block.resnets.1")
        attn(f"{tower}.mid.attn_1", f"{tower}.mid_block.attentions.0")
    for suf in (".weight", ".bias"):
        out["quant_conv" + suf] = sd["quant_conv" + suf]
        out["post_quant_conv" + suf] = sd["post_quant_conv" + suf]
    return out


def test_vae_diffusers_port_matches_ldm():
    model_mod = torch_oracle.load("ldm.modules.diffusionmodules.model")
    torch.manual_seed(0)
    tiny = dict(ch=32, ch_mult=(1, 2), num_res_blocks=2, z_channels=4, embed_dim=4)
    enc = model_mod.Encoder(ch=tiny["ch"], out_ch=3, ch_mult=tiny["ch_mult"],
                            num_res_blocks=tiny["num_res_blocks"], attn_resolutions=[],
                            dropout=0.0, in_channels=3, resolution=32,
                            z_channels=4, double_z=True).eval()
    dec = model_mod.Decoder(ch=tiny["ch"], out_ch=3, ch_mult=tiny["ch_mult"],
                            num_res_blocks=tiny["num_res_blocks"], attn_resolutions=[],
                            dropout=0.0, in_channels=3, resolution=32,
                            z_channels=4).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post = torch.nn.Conv2d(4, 4, 1)
    sd = {}
    sd.update({f"encoder.{k}": v for k, v in enc.state_dict().items()})
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    sd.update({f"quant_conv.{k}": v for k, v in quant.state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v for k, v in post.state_dict().items()})

    cfg = jvae.VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=2)
    p_ldm = jvae.from_torch(sd, cfg)
    p_dif = dp.vae_from_diffusers(ldm_to_diffusers_vae(sd, cfg), cfg)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    a = jvae.encode(p_ldm, x, cfg=cfg)[0]
    b = jvae.encode(p_dif, x, cfg=cfg)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    z = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    a = jvae.decode(p_ldm, z, cfg=cfg)
    b = jvae.decode(p_dif, z, cfg=cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
