"""SD-1.5 VAE (AutoencoderKL) as pure JAX functions, NHWC.

Re-architecture of the reference first stage
(/root/reference/ldm/models/autoencoder.py:285-424 AutoencoderKL;
 /root/reference/ldm/modules/diffusionmodules/model.py Encoder:408-502,
 Decoder:502-610, ResnetBlock:83-143, AttnBlock:151-247, Down/Upsample:43-81).

SD-1.5 shape: f=8, z=4 channels, 512x512 -> 64x64 latents, scale 0.18215
(configs/stable-diffusion/v1-finetune-ada.yaml:24).

TPU-first choices:
  * NHWC activations / HWIO kernels (XLA:TPU native layout).
  * 1x1 convs (attn q/k/v/proj, quant convs) run as matmuls on the MXU.
  * GroupNorm+SiLU fused in one float32 pass (ops.layers.group_norm).
  * The mid-block single-head attention over 4096 tokens uses the shared
    attention primitive (flash kernel on TPU).

The encoder's optional fg/bg mask (zeroing post-softmax attention between
heterogeneous fg/bg pixel pairs, model.py:196-233) is kept for the
compositional-distillation data path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from adaprompt_tpu.ops.layers import conv2d, conv1x1, group_norm

SD_SCALE_FACTOR = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    in_channels: int = 3
    out_channels: int = 3
    z_channels: int = 4
    embed_dim: int = 4
    double_z: bool = True

    @property
    def num_resolutions(self):
        return len(self.ch_mult)


SD15_VAE_CONFIG = VAEConfig()


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    bound = 1.0 / np.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(k1, (kh, kw, cin, cout), dtype, -bound, bound),
        "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound),
    }


def _gn_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _res_init(key, cin, cout, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _gn_init(cin, dtype),
        "conv1": _conv_init(k1, 3, 3, cin, cout, dtype),
        "norm2": _gn_init(cout, dtype),
        "conv2": _conv_init(k2, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["nin_shortcut"] = _conv_init(k3, 1, 1, cin, cout, dtype)
    return p


def _attn_init(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm": _gn_init(c, dtype),
        "q": _conv_init(ks[0], 1, 1, c, c, dtype),
        "k": _conv_init(ks[1], 1, 1, c, c, dtype),
        "v": _conv_init(ks[2], 1, 1, c, c, dtype),
        "proj_out": _conv_init(ks[3], 1, 1, c, c, dtype),
    }


def init_params(key: jax.Array, cfg: VAEConfig = SD15_VAE_CONFIG, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 256))
    nk = lambda: next(keys)
    ch = cfg.ch

    # encoder
    in_mult = (1,) + tuple(cfg.ch_mult)
    down = []
    for i in range(cfg.num_resolutions):
        cin, cout = ch * in_mult[i], ch * cfg.ch_mult[i]
        blocks = []
        for _ in range(cfg.num_res_blocks):
            blocks.append(_res_init(nk(), cin, cout, dtype))
            cin = cout
        lvl = {"block": blocks}
        if i != cfg.num_resolutions - 1:
            lvl["downsample"] = _conv_init(nk(), 3, 3, cout, cout, dtype)
        down.append(lvl)
    block_in = ch * cfg.ch_mult[-1]
    enc_out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    encoder = {
        "conv_in": _conv_init(nk(), 3, 3, cfg.in_channels, ch, dtype),
        "down": down,
        "mid": {"block_1": _res_init(nk(), block_in, block_in, dtype),
                "attn_1": _attn_init(nk(), block_in, dtype),
                "block_2": _res_init(nk(), block_in, block_in, dtype)},
        "norm_out": _gn_init(block_in, dtype),
        "conv_out": _conv_init(nk(), 3, 3, block_in, enc_out_ch, dtype),
    }

    # decoder
    up = []
    block_in_d = ch * cfg.ch_mult[-1]
    cin = block_in_d
    for i in reversed(range(cfg.num_resolutions)):
        cout = ch * cfg.ch_mult[i]
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_res_init(nk(), cin, cout, dtype))
            cin = cout
        lvl = {"block": blocks}
        if i != 0:
            lvl["upsample"] = _conv_init(nk(), 3, 3, cout, cout, dtype)
        up.insert(0, lvl)
    decoder = {
        "conv_in": _conv_init(nk(), 3, 3, cfg.z_channels, block_in_d, dtype),
        "mid": {"block_1": _res_init(nk(), block_in_d, block_in_d, dtype),
                "attn_1": _attn_init(nk(), block_in_d, dtype),
                "block_2": _res_init(nk(), block_in_d, block_in_d, dtype)},
        "up": up,
        "norm_out": _gn_init(ch * cfg.ch_mult[0], dtype),
        "conv_out": _conv_init(nk(), 3, 3, ch * cfg.ch_mult[0], cfg.out_channels, dtype),
    }

    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": _conv_init(nk(), 1, 1, 2 * cfg.z_channels, 2 * cfg.embed_dim, dtype),
        "post_quant_conv": _conv_init(nk(), 1, 1, cfg.embed_dim, cfg.z_channels, dtype),
    }


# ---------------------------------------------------------------------------
# Torch porting
# ---------------------------------------------------------------------------

def from_torch(state_dict, cfg: VAEConfig = SD15_VAE_CONFIG, dtype=jnp.float32) -> dict:
    """Port an ldm AutoencoderKL state_dict (keys: encoder.*, decoder.*,
    quant_conv.*, post_quant_conv.*; possibly under a 'first_stage_model.'
    prefix inside a full SD checkpoint)."""
    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("first_stage_model.")
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v)

    def conv(prefix):
        w = sd[prefix + ".weight"]  # OIHW
        return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype),
                "bias": jnp.asarray(sd[prefix + ".bias"], dtype)}

    def gn(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"], dtype),
                "bias": jnp.asarray(sd[prefix + ".bias"], dtype)}

    def res(prefix):
        p = {"norm1": gn(prefix + ".norm1"), "conv1": conv(prefix + ".conv1"),
             "norm2": gn(prefix + ".norm2"), "conv2": conv(prefix + ".conv2")}
        if prefix + ".nin_shortcut.weight" in sd:
            p["nin_shortcut"] = conv(prefix + ".nin_shortcut")
        return p

    def attn(prefix):
        return {"norm": gn(prefix + ".norm"), "q": conv(prefix + ".q"),
                "k": conv(prefix + ".k"), "v": conv(prefix + ".v"),
                "proj_out": conv(prefix + ".proj_out")}

    def tower(name, n_blocks, updown):
        levels = []
        for i in range(cfg.num_resolutions):
            blocks = [res(f"{name}.{updown}.{i}.block.{j}") for j in range(n_blocks)]
            lvl = {"block": blocks}
            if f"{name}.{updown}.{i}.downsample.conv.weight" in sd:
                lvl["downsample"] = conv(f"{name}.{updown}.{i}.downsample.conv")
            if f"{name}.{updown}.{i}.upsample.conv.weight" in sd:
                lvl["upsample"] = conv(f"{name}.{updown}.{i}.upsample.conv")
            levels.append(lvl)
        return {
            "conv_in": conv(f"{name}.conv_in"),
            "down" if updown == "down" else "up": levels,
            "mid": {"block_1": res(f"{name}.mid.block_1"),
                    "attn_1": attn(f"{name}.mid.attn_1"),
                    "block_2": res(f"{name}.mid.block_2")},
            "norm_out": gn(f"{name}.norm_out"),
            "conv_out": conv(f"{name}.conv_out"),
        }

    return {
        "encoder": tower("encoder", cfg.num_res_blocks, "down"),
        "decoder": tower("decoder", cfg.num_res_blocks + 1, "up"),
        "quant_conv": conv("quant_conv"),
        "post_quant_conv": conv("post_quant_conv"),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _resblock(p: dict, x: jax.Array) -> jax.Array:
    h = group_norm(x, p["norm1"]["scale"], p["norm1"]["bias"], eps=1e-6, activation="silu")
    h = conv2d(h, p["conv1"]["kernel"], p["conv1"]["bias"])
    h = group_norm(h, p["norm2"]["scale"], p["norm2"]["bias"], eps=1e-6, activation="silu")
    h = conv2d(h, p["conv2"]["kernel"], p["conv2"]["bias"])
    if "nin_shortcut" in p:
        x = conv1x1(x, p["nin_shortcut"]["kernel"][0, 0], p["nin_shortcut"]["bias"])
    return x + h


def _attnblock(p: dict, x: jax.Array, mask: dict | None = None) -> jax.Array:
    """Single-head self-attention over all spatial positions (model.py:151-247).

    mask (optional): {'fg_mask': [B,H0,W0,1] or None, 'aug_mask': ...}; zeroes
    the *post-softmax* attention between heterogeneous fg/bg pixel pairs.
    """
    b, h, w, c = x.shape
    hn = group_norm(x, p["norm"]["scale"], p["norm"]["bias"], eps=1e-6)
    q = conv1x1(hn, p["q"]["kernel"][0, 0], p["q"]["bias"]).reshape(b, h * w, c)
    k = conv1x1(hn, p["k"]["kernel"][0, 0], p["k"]["bias"]).reshape(b, h * w, c)
    v = conv1x1(hn, p["v"]["kernel"][0, 0], p["v"]["bias"]).reshape(b, h * w, c)

    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * (c ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1)

    if mask is not None and mask.get("fg_mask") is not None:
        fg = _resize_mask_nearest(mask["fg_mask"], (h, w))
        bg = 1.0 - fg
        aug = mask.get("aug_mask")
        if aug is not None:
            aug = _resize_mask_nearest(aug, (h, w))
            fg = fg * aug
            bg = bg * aug
        fg2 = fg.reshape(b, 1, h * w)
        bg2 = bg.reshape(b, 1, h * w)
        homo = (jnp.einsum("boq,bok->bqk", fg2, fg2) > 0) | (jnp.einsum("boq,bok->bqk", bg2, bg2) > 0)
        probs = jnp.where(homo, probs, 0.0)

    out = jnp.einsum("bqk,bkc->bqc", probs.astype(v.dtype), v).reshape(b, h, w, c)
    return x + conv1x1(out, p["proj_out"]["kernel"][0, 0], p["proj_out"]["bias"])


def _resize_mask_nearest(m: jax.Array, size: tuple) -> jax.Array:
    """Nearest-neighbor resize of [B, H0, W0, 1] masks to `size`, using
    torch F.interpolate(mode='nearest') index semantics: src = floor(dst*scale)
    (jax.image.resize 'nearest' aligns on pixel centers instead)."""
    h0, w0 = m.shape[1], m.shape[2]
    h1, w1 = size
    rows = jnp.floor(jnp.arange(h1) * (h0 / h1)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(w1) * (w0 / w1)).astype(jnp.int32)
    return m[:, rows][:, :, cols]


def _downsample(p: dict, x: jax.Array) -> jax.Array:
    # torch pads (left=0, right=1, top=0, bottom=1) then VALID stride-2 conv
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(x, p["kernel"], p["bias"], stride=2, padding=((0, 0), (0, 0)))


def _upsample(p: dict, x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv2d(x, p["kernel"], p["bias"])


def encode(params: dict, x: jax.Array, mask: dict | None = None,
           cfg: VAEConfig = SD15_VAE_CONFIG):
    """Image [B, H, W, 3] in [-1, 1] -> (mean, logvar) each [B, H/8, W/8, 4]."""
    enc = params["encoder"]
    h = conv2d(x, enc["conv_in"]["kernel"], enc["conv_in"]["bias"])
    for i, lvl in enumerate(enc["down"]):
        for bp in lvl["block"]:
            h = _resblock(bp, h)
        if "downsample" in lvl:
            h = _downsample(lvl["downsample"], h)
    h = _resblock(enc["mid"]["block_1"], h)
    h = _attnblock(enc["mid"]["attn_1"], h, mask)
    h = _resblock(enc["mid"]["block_2"], h)
    h = group_norm(h, enc["norm_out"]["scale"], enc["norm_out"]["bias"], eps=1e-6, activation="silu")
    h = conv2d(h, enc["conv_out"]["kernel"], enc["conv_out"]["bias"])
    moments = conv1x1(h, params["quant_conv"]["kernel"][0, 0], params["quant_conv"]["bias"])
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    return mean, logvar


def sample_latent(key: jax.Array, mean: jax.Array, logvar: jax.Array) -> jax.Array:
    """DiagonalGaussianDistribution.sample
    (/root/reference/ldm/modules/distributions/distributions.py:24-42)."""
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def decode(params: dict, z: jax.Array, cfg: VAEConfig = SD15_VAE_CONFIG) -> jax.Array:
    """Latent [B, h, w, 4] -> image [B, 8h, 8w, 3] (unscaled z, i.e. after
    dividing by SD_SCALE_FACTOR)."""
    dec = params["decoder"]
    z = conv1x1(z, params["post_quant_conv"]["kernel"][0, 0], params["post_quant_conv"]["bias"])
    h = conv2d(z, dec["conv_in"]["kernel"], dec["conv_in"]["bias"])
    h = _resblock(dec["mid"]["block_1"], h)
    h = _attnblock(dec["mid"]["attn_1"], h)
    h = _resblock(dec["mid"]["block_2"], h)
    for i in reversed(range(cfg.num_resolutions)):
        lvl = dec["up"][i]
        for bp in lvl["block"]:
            h = _resblock(bp, h)
        if "upsample" in lvl:
            h = _upsample(lvl["upsample"], h)
    h = group_norm(h, dec["norm_out"]["scale"], dec["norm_out"]["bias"], eps=1e-6, activation="silu")
    return conv2d(h, dec["conv_out"]["kernel"], dec["conv_out"]["bias"])
