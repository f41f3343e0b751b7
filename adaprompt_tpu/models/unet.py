"""SD-1.5 UNet as pure JAX functions, NHWC, with per-layer cross-attention
contexts.

Re-architecture of the reference UNet
(/root/reference/ldm/modules/diffusionmodules/openaimodel.py UNetModel:417-1053,
ResBlock:167-280, SpatialTransformer & friends in ldm/modules/attention.py).

Structure (v1-finetune-ada.yaml:107-122): model_channels 320, channel_mult
(1,2,4,4), 2 ResBlocks/level, spatial transformers at downsample factors
{1,2,4}, 8 heads, context_dim 768, depth 1. 25 addressable layers
(input 0-11, middle 12, output 13-24), 16 of which carry cross-attention.

The reference feeds 16 *layerwise* contexts by tucking them into the batch
dim ([16*B,77,768], embedding_manager.py:1341-1353) and fetching slices via a
closure (openaimodel.py:869-920). Here the context is an explicit tensor:

    context: [L, B, S, D] with L in {1, 16} — CA layer `ca_idx` reads
    context[min(ca_idx, L-1)]. Separate K and V contexts (the reference's
    'mix_hijk' V/K split, openaimodel.py:894-905) are the optional
    `context_k` argument.

Everything here is jit-traceable with static shapes: masks are dense
tensors, activation capture is a static flag producing a pytree output,
and gradient rematerialization is `jax.checkpoint` at block level (the
reference's use_checkpoint).

TPU notes: NHWC/HWIO layouts; 1x1 convs as MXU matmuls; fused
GroupNorm-SiLU; flash attention for big self-attn via ops.attention.
"""

from __future__ import annotations

import dataclasses
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from adaprompt_tpu.ops.attention import dot_product_attention
from adaprompt_tpu.ops.layers import conv2d, conv1x1, group_norm, layer_norm, linear

# layer_idx -> cross-attention layer idx (openaimodel.py:730-731)
LAYER_IDX2CA_IDX = {1: 0, 2: 1, 4: 2, 5: 3, 7: 4, 8: 5, 12: 6, 16: 7,
                    17: 8, 18: 9, 19: 10, 20: 11, 21: 12, 22: 13, 23: 14, 24: 15}
CA_LAYER_INDICES = tuple(LAYER_IDX2CA_IDX)
# layers whose CA activations feed the distillation losses (openaimodel.py:937-941)
DISTILL_LAYER_INDICES = (7, 8, 12, 16, 17, 18, 19, 20, 21, 22, 23, 24)
NUM_CA_LAYERS = 16

# Remat-policy knob (read at import, like ops.attention's flags):
# ADAPROMPT_REMAT_POLICY selects what jax.checkpoint may SAVE inside each
# rematerialized block instead of recomputing it on the backward pass.
#   "none"         save nothing — the reference's use_checkpoint semantics:
#                  minimum memory, maximum recompute
#   "dots"         (default) jax.checkpoint_policies.dots_saveable — keep
#                  every matmul output (MXU work is never redone;
#                  elementwise/VPU is)
#   "dots_nobatch" dots_with_no_batch_dims_saveable — keep only contraction
#                  results with no batch dims (weights-side dots)
# Round-5 chip A/B (tools/train_step_probe.py --remat, full Stage-1 step,
# bs=4/512px): save-nothing 0.492 s/step, dots 0.483, dots_nobatch 0.483 —
# both saving policies fit the 16GB chip and win ~2%, so `dots` is the
# default; export ADAPROMPT_REMAT_POLICY=none to reclaim maximum memory
# headroom (e.g. bigger batches on smaller-HBM parts). docs/PERF.md.
_REMAT_POLICY = os.environ.get("ADAPROMPT_REMAT_POLICY", "dots")


def _block_remat(fn):
    """Block-level rematerialization with the env-selected save policy."""
    if _REMAT_POLICY == "dots":
        return jax.checkpoint(fn, policy=jax.checkpoint_policies.dots_saveable)
    if _REMAT_POLICY == "dots_nobatch":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    if _REMAT_POLICY not in ("", "none"):
        # a typo (e.g. the full JAX name "dots_saveable") must not silently
        # run the save-nothing policy and mislabel an A/B (round-4 ADVICE)
        raise ValueError(
            f"ADAPROMPT_REMAT_POLICY={_REMAT_POLICY!r}: expected 'none', "
            "'dots', or 'dots_nobatch'")
    return jax.checkpoint(fn)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    channel_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attention_ds: tuple = (1, 2, 4)  # downsample factors with cross-attn
    num_heads: int = 8
    context_dim: int = 768
    use_checkpoint: bool = True
    # fuse GroupNorm-SiLU into the ResBlock convs via the Pallas halo kernel
    # (TPU/bf16/spatial>=16 only; +20-80% on those convs, ops/conv_halo.py)
    fused_conv: bool = False
    # opt-in quantized inference: "int8" runs the transformer linears
    # (self-attn q/k/v/out, cross-attn q/out, GEGLU FF) as w8a8 MXU int8
    # matmuls (ops/quant.py; v5e int8 rate is 2x bf16). Forward-only —
    # never enable for training (round() has no gradient).
    quant: str | None = None
    # opt-in token merging (ToMe-SD, ops/tome.py) for transformer blocks
    # with >= tome_min_tokens tokens: merge `tome_ratio` of the tokens
    # before the sub-layers, unmerge before the residual adds. Sampler-only
    # approximation (disabled automatically on capture/conv-attn/img-mask
    # paths); see docs/PERF.md for the quality/throughput trade.
    tome_ratio: float = 0.0
    tome_min_tokens: int = 4096
    tome_attn: bool = True     # merge for self-attention
    tome_cross: bool = False   # merge queries for cross-attention
    tome_mlp: bool = False     # merge for the GEGLU feed-forward

    @property
    def time_embed_dim(self):
        return self.model_channels * 4


import os as _os0

# perf knobs: ADAPROMPT_FUSED_CONV=1 enables the Pallas GN-SiLU-conv halo
# kernel; ADAPROMPT_QUANT=int8 enables the w8a8 sampler path;
# ADAPROMPT_TOME=<ratio> enables token merging (docs/PERF.md)
SD15_UNET_CONFIG = UNetConfig(
    fused_conv=bool(_os0.environ.get("ADAPROMPT_FUSED_CONV")),
    quant=_os0.environ.get("ADAPROMPT_QUANT") or None,
    tome_ratio=float(_os0.environ.get("ADAPROMPT_TOME", "0") or 0))


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: int = 10000) -> jax.Array:
    """Sinusoidal embeddings, cos-then-sin order
    (ldm/modules/diffusionmodules/util.py:154-174)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


# ---------------------------------------------------------------------------
# Plan: static description of the block sequence (drives init/port/forward)
# ---------------------------------------------------------------------------

def _build_plan(cfg: UNetConfig):
    """Returns (input_plan, middle_plan, output_plan, skip_channels).

    Each entry: dict(kind='conv'|'res'|'down'|'up', cin, cout, attn: bool).
    Mirrors the constructor loop of openaimodel.py:526-704.
    """
    ch = cfg.model_channels
    inp = [dict(kind="conv", cin=cfg.in_channels, cout=ch, attn=False)]
    skips = [ch]
    ds = 1
    cur = ch
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            out = mult * cfg.model_channels
            inp.append(dict(kind="res", cin=cur, cout=out, attn=ds in cfg.attention_ds))
            cur = out
            skips.append(cur)
        if level != len(cfg.channel_mult) - 1:
            inp.append(dict(kind="down", cin=cur, cout=cur, attn=False))
            skips.append(cur)
            ds *= 2

    mid = dict(kind="mid", ch=cur, attn=True)

    outp = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = skips.pop()
            out = cfg.model_channels * mult
            entry = dict(kind="res", cin=cur + ich, cout=out, attn=ds in cfg.attention_ds,
                         up=(level and i == cfg.num_res_blocks))
            cur = out
            outp.append(entry)
            if entry["up"]:
                ds //= 2
    return inp, mid, outp


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout, dtype, zero=False):
    if zero:
        return {"kernel": jnp.zeros((kh, kw, cin, cout), dtype),
                "bias": jnp.zeros((cout,), dtype)}
    bound = 1.0 / np.sqrt(kh * kw * cin)
    k1, k2 = jax.random.split(key)
    return {"kernel": jax.random.uniform(k1, (kh, kw, cin, cout), dtype, -bound, bound),
            "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound)}


def _lin_init(key, cin, cout, dtype, bias=True, zero=False):
    if zero:
        p = {"kernel": jnp.zeros((cin, cout), dtype)}
    else:
        bound = 1.0 / np.sqrt(cin)
        key, k2 = jax.random.split(key)
        p = {"kernel": jax.random.uniform(key, (cin, cout), dtype, -bound, bound)}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype) if zero else jax.random.uniform(k2, (cout,), dtype, -bound, bound)
    return p


def _gn_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _res_init(key, cin, cout, temb_dim, dtype):
    ks = jax.random.split(key, 4)
    p = {
        "norm_in": _gn_init(cin, dtype),
        "conv_in": _conv_init(ks[0], 3, 3, cin, cout, dtype),
        "emb": _lin_init(ks[1], temb_dim, cout, dtype),
        "norm_out": _gn_init(cout, dtype),
        "conv_out": _conv_init(ks[2], 3, 3, cout, cout, dtype, zero=True),
    }
    if cin != cout:
        p["skip"] = _conv_init(ks[3], 1, 1, cin, cout, dtype)
    return p


def _st_init(key, c, cfg: UNetConfig, dtype):
    """SpatialTransformer params (attention.py:287-341)."""
    ks = iter(jax.random.split(key, 16))
    d = c  # inner_dim == channels (heads * (c // heads))
    ctx = cfg.context_dim

    def ca(context_dim):
        return {
            "to_q": _lin_init(next(ks), d, d, dtype, bias=False),
            "to_k": _lin_init(next(ks), context_dim, d, dtype, bias=False),
            "to_v": _lin_init(next(ks), context_dim, d, dtype, bias=False),
            "to_out": _lin_init(next(ks), d, d, dtype),
        }

    def ln():
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    return {
        "norm": _gn_init(c, dtype),
        "proj_in": _conv_init(next(ks), 1, 1, c, d, dtype),
        "block": {
            "norm1": ln(), "attn1": ca(d),
            "norm2": ln(), "attn2": ca(ctx),
            "norm3": ln(),
            "ff": {"proj": _lin_init(next(ks), d, d * 8, dtype),  # GEGLU: 2*4d
                   "out": _lin_init(next(ks), d * 4, d, dtype)},
        },
        "proj_out": _conv_init(next(ks), 1, 1, d, c, dtype, zero=True),
    }


def init_params(key: jax.Array, cfg: UNetConfig = SD15_UNET_CONFIG, dtype=jnp.float32) -> dict:
    inp, mid, outp = _build_plan(cfg)
    keys = iter(jax.random.split(key, 128))
    nk = lambda: next(keys)
    te = cfg.time_embed_dim

    def block_params(entry):
        if entry["kind"] == "conv":
            return {"conv": _conv_init(nk(), 3, 3, entry["cin"], entry["cout"], dtype)}
        if entry["kind"] == "down":
            return {"downsample": _conv_init(nk(), 3, 3, entry["cin"], entry["cout"], dtype)}
        p = {"res": _res_init(nk(), entry["cin"], entry["cout"], te, dtype)}
        if entry["attn"]:
            p["attn"] = _st_init(nk(), entry["cout"], cfg, dtype)
        if entry.get("up"):
            p["upsample"] = _conv_init(nk(), 3, 3, entry["cout"], entry["cout"], dtype)
        return p

    return {
        "time_embed": {"fc1": _lin_init(nk(), cfg.model_channels, te, dtype),
                       "fc2": _lin_init(nk(), te, te, dtype)},
        "input_blocks": [block_params(e) for e in inp],
        "middle_block": {"res1": _res_init(nk(), mid["ch"], mid["ch"], te, dtype),
                         "attn": _st_init(nk(), mid["ch"], cfg, dtype),
                         "res2": _res_init(nk(), mid["ch"], mid["ch"], te, dtype)},
        "output_blocks": [block_params(e) for e in outp],
        "out": {"norm": _gn_init(cfg.model_channels, dtype),
                "conv": _conv_init(nk(), 3, 3, cfg.model_channels, cfg.out_channels, dtype, zero=True)},
    }


# ---------------------------------------------------------------------------
# Torch porting (openaimodel.py UNetModel state_dict, optionally under
# 'model.diffusion_model.' as in SD checkpoints)
# ---------------------------------------------------------------------------

def from_torch(state_dict, cfg: UNetConfig = SD15_UNET_CONFIG, dtype=jnp.float32) -> dict:
    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("model.diffusion_model.").removeprefix("diffusion_model.")
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v)

    def conv(p):
        return {"kernel": jnp.asarray(sd[p + ".weight"].transpose(2, 3, 1, 0), dtype),
                "bias": jnp.asarray(sd[p + ".bias"], dtype)}

    def lin(p, bias=True):
        out = {"kernel": jnp.asarray(sd[p + ".weight"].T, dtype)}
        if bias:
            out["bias"] = jnp.asarray(sd[p + ".bias"], dtype)
        return out

    def norm(p):
        return {"scale": jnp.asarray(sd[p + ".weight"], dtype),
                "bias": jnp.asarray(sd[p + ".bias"], dtype)}

    def res(p):
        out = {"norm_in": norm(p + ".in_layers.0"), "conv_in": conv(p + ".in_layers.2"),
               "emb": lin(p + ".emb_layers.1"),
               "norm_out": norm(p + ".out_layers.0"), "conv_out": conv(p + ".out_layers.3")}
        if p + ".skip_connection.weight" in sd:
            out["skip"] = conv(p + ".skip_connection")
        return out

    def st(p):
        b = p + ".transformer_blocks.0"

        def ca(q):
            return {"to_q": lin(q + ".to_q", bias=False), "to_k": lin(q + ".to_k", bias=False),
                    "to_v": lin(q + ".to_v", bias=False), "to_out": lin(q + ".to_out.0")}

        return {
            "norm": norm(p + ".norm"), "proj_in": conv(p + ".proj_in"),
            "block": {"norm1": norm(b + ".norm1"), "attn1": ca(b + ".attn1"),
                      "norm2": norm(b + ".norm2"), "attn2": ca(b + ".attn2"),
                      "norm3": norm(b + ".norm3"),
                      "ff": {"proj": lin(b + ".ff.net.0.proj"), "out": lin(b + ".ff.net.2")}},
            "proj_out": conv(p + ".proj_out"),
        }

    inp_plan, mid_plan, out_plan = _build_plan(cfg)

    input_blocks = []
    for i, entry in enumerate(inp_plan):
        p = f"input_blocks.{i}"
        if entry["kind"] == "conv":
            input_blocks.append({"conv": conv(p + ".0")})
        elif entry["kind"] == "down":
            input_blocks.append({"downsample": conv(p + ".0.op")})
        else:
            bp = {"res": res(p + ".0")}
            if entry["attn"]:
                bp["attn"] = st(p + ".1")
            input_blocks.append(bp)

    output_blocks = []
    for i, entry in enumerate(out_plan):
        p = f"output_blocks.{i}"
        bp = {"res": res(p + ".0")}
        nxt = 1
        if entry["attn"]:
            bp["attn"] = st(p + f".{nxt}")
            nxt += 1
        if entry.get("up"):
            bp["upsample"] = conv(p + f".{nxt}.conv")
        output_blocks.append(bp)

    return {
        "time_embed": {"fc1": lin("time_embed.0"), "fc2": lin("time_embed.2")},
        "input_blocks": input_blocks,
        "middle_block": {"res1": res("middle_block.0"), "attn": st("middle_block.1"),
                         "res2": res("middle_block.2")},
        "output_blocks": output_blocks,
        "out": {"norm": norm("out.0"), "conv": conv("out.2")},
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layer_ca_map(inp_plan, out_plan) -> dict:
    """layer_idx -> CA idx derived from the plan (attention layers numbered
    in order); reproduces LAYER_IDX2CA_IDX exactly for the SD-1.5 plan."""
    l2ca = {}
    li = 0
    for e in inp_plan:
        if e.get("attn"):
            l2ca[li] = len(l2ca)
        li += 1
    l2ca[li] = len(l2ca)  # middle block
    li += 1
    for e in out_plan:
        if e.get("attn"):
            l2ca[li] = len(l2ca)
        li += 1
    return l2ca


def precompute_cross_kv(params: dict, context: jax.Array,
                        context_k: jax.Array | None = None,
                        cfg: UNetConfig = SD15_UNET_CONFIG) -> dict:
    """Hoist the cross-attention K/V projections out of a sampler loop.

    The text context is constant across DDIM steps, so each CA layer's
    K = ctx_k @ W_k and V = ctx_v @ W_v can be computed once per prompt
    instead of once per step (50x fewer projections at DDIM-50).

    Returns {layer_idx: (k [B,S,H,hd], v [B,S,H,hd])} to pass as
    forward(..., cross_kv=...). context layouts as in forward.
    """
    if context.ndim == 3:
        context = context[None]
    if context_k is None:
        context_k = context
    elif context_k.ndim == 3:
        context_k = context_k[None]
    L = context.shape[0]
    inp_plan, _, out_plan = _build_plan(cfg)
    l2ca = _layer_ca_map(inp_plan, out_plan)

    def attn2_params(layer_idx):
        n_inp = len(inp_plan)
        if layer_idx < n_inp:
            return params["input_blocks"][layer_idx]["attn"]["block"]["attn2"]
        if layer_idx == n_inp:
            return params["middle_block"]["attn"]["block"]["attn2"]
        return params["output_blocks"][layer_idx - n_inp - 1]["attn"]["block"]["attn2"]

    out = {}
    for layer_idx, ca in l2ca.items():
        p = attn2_params(layer_idx)
        i = min(ca, L - 1)
        cv, ck = context[i], context_k[i]
        b = cv.shape[0]
        hd = p["to_k"]["kernel"].shape[-1] // cfg.num_heads
        k = linear(ck, p["to_k"]["kernel"]).reshape(b, -1, cfg.num_heads, hd)
        v = linear(cv, p["to_v"]["kernel"]).reshape(b, -1, cfg.num_heads, hd)
        out[layer_idx] = (k, v)
    return out


def _resblock(p: dict, x: jax.Array, emb: jax.Array,
              fused_conv: bool = False) -> jax.Array:
    # GroupNorm32 -> SiLU -> conv; +time; GroupNorm32 -> SiLU -> conv(zero)
    # (openaimodel.py:205-280; GroupNorm default eps 1e-5)
    if "res" in _ABLATE:  # ablation stand-in: skip path only
        if "skip" in p:
            return conv1x1(x, p["skip"]["kernel"][0, 0], p["skip"]["bias"])
        return x
    def gn_silu_conv(v, norm, conv):
        # per-conv dispatch: the Pallas fused kernel only for shapes measured
        # faster than XLA's pipeline (conv_halo._FUSED_TABLE)
        if fused_conv:
            from adaprompt_tpu.ops.conv_halo import (gn_silu_conv3x3_halo,
                                                     fused_conv_eligible)
            if fused_conv_eligible(v, conv["kernel"].shape[-1]):
                return gn_silu_conv3x3_halo(v, norm["scale"], norm["bias"],
                                            conv["kernel"], conv["bias"])
        hh = group_norm(v, norm["scale"], norm["bias"], eps=1e-5,
                        activation="silu")
        return conv2d(hh, conv["kernel"], conv["bias"])

    h = gn_silu_conv(x, p["norm_in"], p["conv_in"])
    e = linear(jax.nn.silu(emb), p["emb"]["kernel"], p["emb"]["bias"])
    h = h + e[:, None, None, :].astype(h.dtype)
    h = gn_silu_conv(h, p["norm_out"], p["conv_out"])
    if "skip" in p:
        x = conv1x1(x, p["skip"]["kernel"][0, 0], p["skip"]["bias"])
    return x + h


def _qlinear(x, kernel, bias=None, quant=None):
    """Projection linear on the quantized path.

    Measured on the v5e slice (docs/PERF.md round-3 A/B): XLA-level
    dynamic-quant int8 matmuls at the projection shapes ([M,320]@[320,320]
    etc.) are NET-NEGATIVE — the unfused abs-max/round/clip passes cost
    more than the int8 MXU rate saves (end-to-end bench 1.055 vs 1.086
    img/s). int8 only pays where the quantization is fused INSIDE a Pallas
    kernel (geglu_int8, fused_cross_attention_int8), so quant="int8" keeps
    plain bf16 projections here."""
    del quant
    return linear(x, kernel, bias)


def _cross_attention(p: dict, x: jax.Array, ctx_v: jax.Array, ctx_k: jax.Array,
                     num_heads: int, self_mask: jax.Array | None = None,
                     capture: bool = False, kv=None,
                     conv_attn: dict | None = None,
                     infeat_size: tuple | None = None,
                     quant: str | None = None):
    """LDM CrossAttention (attention.py:147-257) with separate V/K contexts.

    x: [B, N, C]; ctx_*: [B, S, Dctx]. self_mask: [B, N] key mask (1=keep)
    applied only for self-attention (img_mask semantics). kv: optional
    precomputed ([B,S,H,hd], [B,S,H,hd]) K/V — the context is constant
    across DDIM steps, so samplers hoist these projections out of the scan
    (precompute_cross_kv). conv_attn (cross-attention only): the subject-row
    conv-attn replacement (attention.py:208-216 / ldm/util.py:700-881),
    dict(subj_pos [BS, M], kernel_size int, mix_weight float).
    Returns out [B, N, C] and, when capture, dict(q, attn, attnscore) in the
    reference's cached_activations layout ([B, H, ...], q scaled by
    sqrt(scale)).
    """
    b, n, c = x.shape
    hd = c // num_heads
    scale = hd ** -0.5
    from adaprompt_tpu.ops.attention import pallas_ok
    if (kv is not None and not capture and conv_attn is None
            and n >= 512 and quant in (None, "int8") and pallas_ok()):
        # sampler fast path: fused q-proj+attn+out-proj kernel over the
        # tiny precomputed context K/V (ops/attention.py); the int8 variant
        # additionally runs both projections as w8a8 MXU matmuls
        from adaprompt_tpu.ops.attention import (fused_cross_attention,
                                                 fused_cross_attention_int8)
        fn = (fused_cross_attention_int8 if quant == "int8"
              else fused_cross_attention)
        return fn(
            x, p["to_q"]["kernel"], kv[0], kv[1],
            p["to_out"]["kernel"], p["to_out"]["bias"], scale,
            num_heads), None
    is_self = ctx_v is None
    if is_self:
        ctx_v = ctx_k = x
    q = _qlinear(x, p["to_q"]["kernel"], quant=quant).reshape(b, n, num_heads, hd)
    if kv is not None:
        k, v = kv
    else:
        k = _qlinear(ctx_k, p["to_k"]["kernel"], quant=quant).reshape(b, -1, num_heads, hd)
        v = _qlinear(ctx_v, p["to_v"]["kernel"], quant=quant).reshape(b, -1, num_heads, hd)

    key_bias = None
    if self_mask is not None:
        # additive per-key bias (1=keep -> 0, 0=drop -> -1e9); the flash
        # kernel consumes it directly so masked training stays on Pallas
        from adaprompt_tpu.ops.attention import NEG_BIG
        key_bias = (self_mask.astype(jnp.float32) - 1.0) * (-NEG_BIG)

    use_conv_attn = (conv_attn is not None
                     and conv_attn.get("kernel_size", 0) > 1)
    if capture or use_conv_attn:
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        if key_bias is not None:
            logits = logits + key_bias[:, None, None, :]
        if use_conv_attn:
            from adaprompt_tpu.ops.conv_attn import replace_rows_by_conv_attn
            logits = replace_rows_by_conv_attn(
                logits, q.transpose(0, 2, 1, 3).astype(jnp.float32),
                k.transpose(0, 2, 1, 3).astype(jnp.float32),
                conv_attn["subj_pos"], infeat_size,
                conv_attn["kernel_size"], scale,
                conv_attn_mix_weight=conv_attn.get("mix_weight", 1.0))
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v).reshape(b, n, c)
        out = linear(out, p["to_out"]["kernel"], p["to_out"]["bias"])
        cached = None
        if capture:
            cached = {
                "q": q.transpose(0, 2, 1, 3) * math.sqrt(scale),
                "attn": probs,
                "attnscore": logits,
            }
        return out, cached

    # NOTE: an int8-QK flash kernel exists (ops/attention.py
    # flash_attention_int8, SageAttention-style) but measured EXACTLY the
    # bf16 kernel's speed on this slice (9.2-10.7ms both, docs/PERF.md) —
    # at D=40 the MXU is lane-padding-bound either way, so the bf16 kernel
    # stays the only self-attention path even under quant="int8".
    out = dot_product_attention(q, k, v, key_bias=key_bias, scale=scale)
    out = _qlinear(out.reshape(b, n, c), p["to_out"]["kernel"],
                   p["to_out"]["bias"], quant=quant)
    return out, None


import os as _os

# differential profiling: comma-list of {self,cross,ff} ops to replace with
# cheap stand-ins, e.g. ADAPROMPT_ABLATE=self,ff python bench.py — the
# bench delta attributes end-to-end time per op class (tools/perf_probe.py)
_ABLATE = frozenset(filter(None, _os.environ.get("ADAPROMPT_ABLATE", "").split(",")))


def _geglu_ff(p: dict, x: jax.Array, quant: str | None = None) -> jax.Array:
    if "ff" in _ABLATE:
        return x
    from adaprompt_tpu.ops.attention import pallas_ok
    if pallas_ok():
        from adaprompt_tpu.ops.geglu import (fused_eligible,
                                             fused_int8_eligible, geglu,
                                             geglu_int8)
        if quant == "int8" and fused_int8_eligible(x, p["proj"]["kernel"]):
            # w8a8 fused FF: VMEM-resident intermediates AND 2x int8 MXU
            # rate; int8 weights also let the C=640 layers fuse
            return geglu_int8(x, p["proj"]["kernel"], p["proj"]["bias"],
                              p["out"]["kernel"], p["out"]["bias"])
        if quant is None and fused_eligible(x, p["proj"]["kernel"]):
            # fused proj->gelu-gate->out Pallas kernel: the [M, 8C] and
            # [M, 4C] intermediates stay in VMEM (~3x less HBM traffic;
            # the FF stack is ~26% of DDIM time, docs/PERF.md)
            return geglu(x, p["proj"]["kernel"], p["proj"]["bias"],
                         p["out"]["kernel"], p["out"]["bias"])
    h = _qlinear(x, p["proj"]["kernel"], p["proj"]["bias"], quant=quant)
    a, gate = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.gelu(gate, approximate=False)
    return _qlinear(h, p["out"]["kernel"], p["out"]["bias"], quant=quant)


def _spatial_transformer(p: dict, x: jax.Array, ctx_v, ctx_k, num_heads: int,
                         img_mask=None, capture: bool = False, kv=None,
                         conv_attn: dict | None = None,
                         quant: str | None = None,
                         tome_cfg: tuple | None = None):
    b, h, w, c = x.shape
    x_in = x
    y = group_norm(x, p["norm"]["scale"], p["norm"]["bias"], eps=1e-6)
    y = conv1x1(y, p["proj_in"]["kernel"][0, 0], p["proj_in"]["bias"])
    y = y.reshape(b, h * w, c)

    bp = p["block"]
    self_mask = None
    if img_mask is not None:
        # img_mask [B, H0, W0, 1] -> nearest-resized key mask [B, h*w]
        from adaprompt_tpu.models.vae import _resize_mask_nearest
        self_mask = _resize_mask_nearest(img_mask, (h, w)).reshape(b, h * w)

    # ToMe (ops/tome.py): sampler-only token merging — never on capture /
    # conv-attn / masked (training) paths, whose semantics need all tokens
    ident = lambda t: t
    m_a = u_a = m_c = u_c = m_f = u_f = ident
    if tome_cfg is not None and not capture and conv_attn is None \
            and self_mask is None and h * w >= tome_cfg[1] > 0 \
            and tome_cfg[0] > 0:
        from adaprompt_tpu.ops.tome import build_merge
        mm, uu, n_kept = build_merge(y, h, w, tome_cfg[0])
        if n_kept < h * w:
            if tome_cfg[2]:
                m_a, u_a = mm, uu
            if tome_cfg[3]:
                m_c, u_c = mm, uu
            if tome_cfg[4]:
                m_f, u_f = mm, uu

    if "self" not in _ABLATE:
        # NOTE: a fused qkv+attn+out self-attention kernel exists
        # (ops/attention.fused_self_attention) but measured net-NEGATIVE
        # end-to-end (1.03 vs 1.11 img/s): the per-head lane slicing of the
        # VMEM-resident K/V outweighs the transpose traffic it saves.
        # The separate flash kernel stays the self-attention path.
        a1, _ = _cross_attention(bp["attn1"],
                                 m_a(layer_norm(y, bp["norm1"]["scale"], bp["norm1"]["bias"])),
                                 None, None, num_heads, self_mask=self_mask,
                                 quant=quant)
        y = y + u_a(a1)
    if "cross" not in _ABLATE:
        a2, cached = _cross_attention(bp["attn2"],
                                      m_c(layer_norm(y, bp["norm2"]["scale"], bp["norm2"]["bias"])),
                                      ctx_v, ctx_k, num_heads, capture=capture,
                                      kv=kv, conv_attn=conv_attn,
                                      infeat_size=(h, w), quant=quant)
        y = y + u_c(a2)
    else:
        cached = None
    y = y + u_f(_geglu_ff(bp["ff"],
                          m_f(layer_norm(y, bp["norm3"]["scale"], bp["norm3"]["bias"])),
                          quant=quant))

    y = y.reshape(b, h, w, c)
    y = conv1x1(y, p["proj_out"]["kernel"][0, 0], p["proj_out"]["bias"])
    return x_in + y, cached


def forward(params: dict, x: jax.Array, timesteps: jax.Array, context: jax.Array,
            *, context_k: jax.Array | None = None,
            img_mask: jax.Array | None = None,
            capture_ca: bool = False,
            cross_kv: dict | None = None,
            conv_attn: dict | None = None,
            cache_depth: int = 0,
            cache: jax.Array | None = None,
            cfg: UNetConfig = SD15_UNET_CONFIG):
    """Predict epsilon.

    Args:
      x: [B, H, W, 4] noisy latents (NHWC).
      timesteps: [B] int/float timesteps.
      context: [L, B, S, 768] layerwise contexts (L=1 shared or L=16), or
        [B, S, 768] (auto-promoted to L=1).
      context_k: optional separate K-context of the same shape (V/K split of
        'mix_hijk' iters); defaults to `context`.
      img_mask: optional [B, H0, W0, 1] foreground mask restricting
        self-attention keys (openaimodel img_mask -> attention.py:223-232).
      capture_ca: capture per-CA-layer activations {outfeat, attn, attnscore,
        q} for the distill layers (openaimodel.py:947-952, 984-1034).
      conv_attn: subject-row conv-attn replacement in cross-attention
        (set_cross_attn_flags 'use_conv_attn_kernel_size',
        openaimodel.py:723-824 + attention.py:208-216):
        dict(subj_pos [BS, M] traced token positions, kernel_size int or
        {layer_idx: int} layerwise, mix_weight float=1).
      cache_depth / cache: DeepCache-style deep-feature reuse (Ma et al.
        2023, arXiv:2312.00858; sampler-only, no reference counterpart).
        With cache_depth=j > 0 and cache=None this is a FULL pass that
        additionally returns the deep feature entering output block
        (n_out - j) — the hidden state the shallow pass resumes from. With
        `cache` given, only input blocks [0:j] and output blocks
        [n_out-j:] run; the middle of the UNet is replaced by `cache`.

    Returns eps [B, H, W, 4]; with capture_ca, (eps, ca_activations dict
    keyed 'q'/'attn'/'attnscore'/'outfeat' -> {layer_idx: array}); with
    cache_depth > 0, (eps, deep_cache).
    """
    if cache_depth > 0:
        assert not capture_ca, "deep-cache is a sampler-only fast path"
    if context.ndim == 3:
        context = context[None]
    if context_k is None:
        context_k = context
    elif context_k.ndim == 3:
        context_k = context_k[None]
    L = context.shape[0]

    t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(x.dtype)
    emb = linear(t_emb, params["time_embed"]["fc1"]["kernel"], params["time_embed"]["fc1"]["bias"])
    emb = jax.nn.silu(emb)
    emb = linear(emb, params["time_embed"]["fc2"]["kernel"], params["time_embed"]["fc2"]["bias"])

    inp_plan, mid_plan, out_plan = _build_plan(cfg)
    captures = {}
    l2ca = _layer_ca_map(inp_plan, out_plan)
    # ToMe is a sampler-only approximation: any training-semantics path
    # (activation capture, img-mask training, conv-attn) disables it for the
    # WHOLE forward, not just the affected blocks
    tome_cfg = ((cfg.tome_ratio, cfg.tome_min_tokens, cfg.tome_attn,
                 cfg.tome_cross, cfg.tome_mlp)
                if (cfg.tome_ratio > 0 and not capture_ca
                    and img_mask is None and conv_attn is None) else None)

    def ctx_for(layer_idx):
        ca = l2ca.get(layer_idx)
        if ca is None:
            return None, None
        i = min(ca, L - 1)
        return context[i], context_k[i]

    def conv_attn_for(layer_idx):
        if conv_attn is None:
            return None
        ks = conv_attn.get("kernel_size", 0)
        if isinstance(ks, dict):
            ks = ks.get(layer_idx, 0)
        elif ks > 0 and l2ca.get(layer_idx) in (6, 7, 8, 9, 10):
            # the reference disables conv attn on CA layers 6-10 (layers
            # 12,16..19 — 8x8-32x32 maps too small for a 3x3 conv head),
            # openaimodel.py:922-932
            ks = 1
        if ks <= 1:
            return None
        return {**conv_attn, "kernel_size": ks}

    def make_block_fn(entry, layer_idx, cap):
        """Pure per-block fn (h, cached|None) = f(bp, h, emb, cv, ck, mask,
        kv, cattn) so jax.checkpoint can wrap it: captured activations are
        OUTPUTS, not side effects (side effects would leak recompute-trace
        tracers)."""
        def block_fn(bp, h, emb, cv, ck, mask, kv, cattn):
            if "conv" in bp:
                return conv2d(h, bp["conv"]["kernel"], bp["conv"]["bias"]), None
            if "downsample" in bp:
                return conv2d(h, bp["downsample"]["kernel"], bp["downsample"]["bias"],
                              stride=2, padding=1), None
            h = _resblock(bp["res"], h, emb, cfg.fused_conv)
            cached = None
            if "attn" in bp:
                h, cached = _spatial_transformer(bp["attn"], h, cv, ck,
                                                 cfg.num_heads, img_mask=mask,
                                                 capture=cap, kv=kv,
                                                 conv_attn=cattn,
                                                 quant=cfg.quant,
                                                 tome_cfg=tome_cfg)
            if "upsample" in bp:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = conv2d(h, bp["upsample"]["kernel"], bp["upsample"]["bias"])
            if cap and cached is not None:
                # outfeat AFTER the whole output block incl. Upsample
                # (openaimodel.py: h = module(...) then outfeat = h;
                #  distill losses resize it back, ddpm.py:4445-4447)
                cached["outfeat"] = h
            return h, cached
        if cfg.use_checkpoint:
            # block-level gradient rematerialization (openaimodel.py
            # use_checkpoint, v1-finetune-ada.yaml:121); identity when the
            # graph is not differentiated
            block_fn = _block_remat(block_fn)
        return block_fn

    def run_block(bp, entry, h, layer_idx):
        cap = (capture_ca and "attn" in bp
               and layer_idx in DISTILL_LAYER_INDICES)
        cv, ck = ctx_for(layer_idx)
        kv = cross_kv.get(layer_idx) if cross_kv is not None else None
        h, cached = make_block_fn(entry, layer_idx, cap)(
            bp, h, emb, cv, ck, img_mask, kv, conv_attn_for(layer_idx))
        if cached is not None:
            captures[layer_idx] = cached
        return h

    n_inp, n_out = len(inp_plan), len(out_plan)
    shallow = cache is not None and cache_depth > 0
    deep_cache = None

    hs = []
    h = x
    for i, (bp, entry) in enumerate(zip(params["input_blocks"], inp_plan)):
        if shallow and i >= cache_depth:
            break
        h = run_block(bp, entry, h, i)
        hs.append(h)

    if shallow:
        h = cache.astype(x.dtype)
    else:
        def mid_fn(mb, h, emb, cv, ck, mask, kv, cattn):
            h = _resblock(mb["res1"], h, emb, cfg.fused_conv)
            h, cached = _spatial_transformer(mb["attn"], h, cv, ck, cfg.num_heads,
                                             img_mask=mask, capture=mid_cap, kv=kv,
                                             conv_attn=cattn, quant=cfg.quant,
                                             tome_cfg=tome_cfg)
            h = _resblock(mb["res2"], h, emb, cfg.fused_conv)
            if mid_cap and cached is not None:
                cached["outfeat"] = h
            return h, cached

        mid_cap = capture_ca and n_inp in DISTILL_LAYER_INDICES
        cv, ck = ctx_for(n_inp)
        kv = cross_kv.get(n_inp) if cross_kv is not None else None
        if cfg.use_checkpoint:
            mid_fn = _block_remat(mid_fn)
        h, cached = mid_fn(params["middle_block"], h, emb, cv, ck, img_mask, kv,
                           conv_attn_for(n_inp))
        if cached is not None:
            captures[n_inp] = cached

    first_out = n_out - cache_depth if shallow else 0
    for i in range(first_out, n_out):
        bp, entry = params["output_blocks"][i], out_plan[i]
        if cache_depth > 0 and not shallow and i == n_out - cache_depth:
            deep_cache = h
        h = jnp.concatenate([h, hs.pop()], axis=-1)
        h = run_block(bp, entry, h, n_inp + 1 + i)

    h = group_norm(h, params["out"]["norm"]["scale"], params["out"]["norm"]["bias"],
                   eps=1e-5, activation="silu")
    eps = conv2d(h, params["out"]["conv"]["kernel"], params["out"]["conv"]["bias"])

    if capture_ca:
        by_key = {key: {li: captures[li][key] for li in captures}
                  for key in ("outfeat", "attn", "attnscore", "q")}
        return eps, by_key
    if cache_depth > 0:
        return eps, (cache if shallow else deep_cache)
    return eps
