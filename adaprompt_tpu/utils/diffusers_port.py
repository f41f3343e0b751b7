"""Porters for diffusers-format checkpoints.

The Arc2Face teacher is distributed as a diffusers `UNet2DConditionModel`
(+ CLIP encoder) directory (reference Arc2FaceWrapper, ddpm.py:5405-5414),
and many SD-1.5 forks ship diffusers layouts. These functions map the
diffusers state-dict naming onto our UNet/VAE param trees (the architecture
is identical to the ldm layout the models were built from).

Handles both Conv2d- and Linear-parameterized `proj_in/proj_out` (diffusers
changed this across versions) and both attention namings in the VAE
mid-block (`to_q`/`query`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from adaprompt_tpu.models import unet as unet_mod
from adaprompt_tpu.models import vae as vae_mod


def _np(v):
    if hasattr(v, "detach"):
        v = v.detach().float().cpu().numpy()
    return np.asarray(v)


def _conv(sd, p, dtype):
    w = _np(sd[p + ".weight"])
    return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype),
            "bias": jnp.asarray(_np(sd[p + ".bias"]), dtype)}


def _conv_or_linear_as_conv1x1(sd, p, dtype):
    """proj_in/proj_out: Conv2d [O,I,1,1] or Linear [O,I] -> HWIO 1x1."""
    w = _np(sd[p + ".weight"])
    if w.ndim == 2:
        w = w[:, :, None, None]
    return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype),
            "bias": jnp.asarray(_np(sd[p + ".bias"]), dtype)}


def _lin(sd, p, dtype, bias=True):
    out = {"kernel": jnp.asarray(_np(sd[p + ".weight"]).T, dtype)}
    if bias and p + ".bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[p + ".bias"]), dtype)
    return out


def _norm(sd, p, dtype):
    return {"scale": jnp.asarray(_np(sd[p + ".weight"]), dtype),
            "bias": jnp.asarray(_np(sd[p + ".bias"]), dtype)}


def _resnet(sd, p, dtype):
    out = {"norm_in": _norm(sd, p + ".norm1", dtype),
           "conv_in": _conv(sd, p + ".conv1", dtype),
           "emb": _lin(sd, p + ".time_emb_proj", dtype),
           "norm_out": _norm(sd, p + ".norm2", dtype),
           "conv_out": _conv(sd, p + ".conv2", dtype)}
    if p + ".conv_shortcut.weight" in sd:
        out["skip"] = _conv(sd, p + ".conv_shortcut", dtype)
    return out


def _st(sd, p, dtype):
    b = p + ".transformer_blocks.0"

    def ca(q):
        out = {"to_q": _lin(sd, q + ".to_q", dtype, bias=False),
               "to_k": _lin(sd, q + ".to_k", dtype, bias=False),
               "to_v": _lin(sd, q + ".to_v", dtype, bias=False),
               "to_out": _lin(sd, q + ".to_out.0", dtype)}
        return out

    return {"norm": _norm(sd, p + ".norm", dtype),
            "proj_in": _conv_or_linear_as_conv1x1(sd, p + ".proj_in", dtype),
            "block": {"norm1": _norm(sd, b + ".norm1", dtype), "attn1": ca(b + ".attn1"),
                      "norm2": _norm(sd, b + ".norm2", dtype), "attn2": ca(b + ".attn2"),
                      "norm3": _norm(sd, b + ".norm3", dtype),
                      "ff": {"proj": _lin(sd, b + ".ff.net.0.proj", dtype),
                             "out": _lin(sd, b + ".ff.net.2", dtype)}},
            "proj_out": _conv_or_linear_as_conv1x1(sd, p + ".proj_out", dtype)}


def unet_from_diffusers(state_dict, cfg: unet_mod.UNetConfig = unet_mod.SD15_UNET_CONFIG,
                        dtype=jnp.float32) -> dict:
    sd = dict(state_dict)
    inp_plan, mid_plan, out_plan = unet_mod._build_plan(cfg)
    n_levels = len(cfg.channel_mult)

    input_blocks = [{"conv": _conv(sd, "conv_in", dtype)}]
    for level in range(n_levels):
        n_attn = 0
        for j in range(cfg.num_res_blocks):
            p = f"down_blocks.{level}"
            bp = {"res": _resnet(sd, f"{p}.resnets.{j}", dtype)}
            if f"{p}.attentions.{j}.proj_in.weight" in sd:
                bp["attn"] = _st(sd, f"{p}.attentions.{j}", dtype)
            input_blocks.append(bp)
        if f"down_blocks.{level}.downsamplers.0.conv.weight" in sd:
            input_blocks.append({"downsample": _conv(sd, f"down_blocks.{level}.downsamplers.0.conv", dtype)})

    middle = {"res1": _resnet(sd, "mid_block.resnets.0", dtype),
              "attn": _st(sd, "mid_block.attentions.0", dtype),
              "res2": _resnet(sd, "mid_block.resnets.1", dtype)}

    output_blocks = []
    for k in range(n_levels):  # up_blocks[0] is the deepest level
        p = f"up_blocks.{k}"
        for j in range(cfg.num_res_blocks + 1):
            bp = {"res": _resnet(sd, f"{p}.resnets.{j}", dtype)}
            if f"{p}.attentions.{j}.proj_in.weight" in sd:
                bp["attn"] = _st(sd, f"{p}.attentions.{j}", dtype)
            if j == cfg.num_res_blocks and f"{p}.upsamplers.0.conv.weight" in sd:
                bp["upsample"] = _conv(sd, f"{p}.upsamplers.0.conv", dtype)
            output_blocks.append(bp)

    return {
        "time_embed": {"fc1": _lin(sd, "time_embedding.linear_1", dtype),
                       "fc2": _lin(sd, "time_embedding.linear_2", dtype)},
        "input_blocks": input_blocks,
        "middle_block": middle,
        "output_blocks": output_blocks,
        "out": {"norm": _norm(sd, "conv_norm_out", dtype),
                "conv": _conv(sd, "conv_out", dtype)},
    }


def vae_from_diffusers(state_dict, cfg: vae_mod.VAEConfig = vae_mod.SD15_VAE_CONFIG,
                       dtype=jnp.float32) -> dict:
    sd = dict(state_dict)

    def vae_resnet(p):
        out = {"norm1": _norm(sd, p + ".norm1", dtype), "conv1": _conv(sd, p + ".conv1", dtype),
               "norm2": _norm(sd, p + ".norm2", dtype), "conv2": _conv(sd, p + ".conv2", dtype)}
        if p + ".conv_shortcut.weight" in sd:
            out["nin_shortcut"] = _conv(sd, p + ".conv_shortcut", dtype)
        return out

    def vae_attn(p):
        def qkv(name, alt):
            key = p + f".{name}.weight"
            if key not in sd:
                key = p + f".{alt}.weight"
                name = alt
            w = _np(sd[p + f".{name}.weight"])
            if w.ndim == 2:
                w = w[:, :, None, None]
            return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype),
                    "bias": jnp.asarray(_np(sd[p + f".{name}.bias"]), dtype)}

        norm_name = ".group_norm" if p + ".group_norm.weight" in sd else ".norm"
        to_out = ".to_out.0" if p + ".to_out.0.weight" in sd else ".proj_attn"
        return {"norm": _norm(sd, p + norm_name, dtype),
                "q": qkv("to_q", "query"), "k": qkv("to_k", "key"),
                "v": qkv("to_v", "value"),
                "proj_out": qkv(to_out.lstrip("."), to_out.lstrip("."))}

    def tower(name, n_blocks, updown):
        levels = []
        n_levels = cfg.num_resolutions
        for i in range(n_levels):
            # diffusers decoder up_blocks[0] is the DEEPEST level; our
            # decoder 'up' list is indexed shallow-to-deep like ldm
            di = i if updown == "down" else n_levels - 1 - i
            p = f"{name}.{'down_blocks' if updown == 'down' else 'up_blocks'}.{di}"
            lvl = {"block": [vae_resnet(f"{p}.resnets.{j}") for j in range(n_blocks)]}
            if f"{p}.downsamplers.0.conv.weight" in sd:
                lvl["downsample"] = _conv(sd, f"{p}.downsamplers.0.conv", dtype)
            if f"{p}.upsamplers.0.conv.weight" in sd:
                lvl["upsample"] = _conv(sd, f"{p}.upsamplers.0.conv", dtype)
            levels.append(lvl)
        return {
            "conv_in": _conv(sd, f"{name}.conv_in", dtype),
            "down" if updown == "down" else "up": levels,
            "mid": {"block_1": vae_resnet(f"{name}.mid_block.resnets.0"),
                    "attn_1": vae_attn(f"{name}.mid_block.attentions.0"),
                    "block_2": vae_resnet(f"{name}.mid_block.resnets.1")},
            "norm_out": _norm(sd, f"{name}.conv_norm_out", dtype),
            "conv_out": _conv(sd, f"{name}.conv_out", dtype),
        }

    return {"encoder": tower("encoder", cfg.num_res_blocks, "down"),
            "decoder": tower("decoder", cfg.num_res_blocks + 1, "up"),
            "quant_conv": _conv(sd, "quant_conv", dtype),
            "post_quant_conv": _conv(sd, "post_quant_conv", dtype)}
