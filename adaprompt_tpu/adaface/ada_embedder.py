"""Legacy dynamic per-layer embedders: AttentionalPooler / AdaEmbedding /
Embedding3d.

Ports of the reference's non-zero-shot "Ada" path
(/root/reference/ldm/modules/embedding_manager.py:102-325 AttentionalPooler,
326-360 Embedding3d, 541-914 AdaEmbedding). STATUS NOTE: in the reference
these classes are dormant — `AdaEmbedding` is never instantiated anywhere in
the tree (the published zero-shot configs use SubjBasisGenerator, and even the
legacy static path only builds StaticLayerwiseEmbedding), and the lone
`AttentionalPooler()` call at embedding_manager.py:2248 is an unreachable
no-arg smoke line. We match that status: faithful modules + parity tests, no
trainer wiring — a user migrating an old Ada checkpoint gets working math via
`from_torch` + `ada_forward`.

Semantics (oracle-tested vs the torch classes in eval mode):
  * AttentionalPooler: per CA layer, pools the UNet layer's input features
    into one fg and one bg vector. The CA layer's own to_k projects the
    static subject/bg probe embeddings into feature space as queries; keys
    and values are the layer features (v = x + LN(q_feat), head-scaled); the
    fg/bg scores are LoRA-reduced per head (grouped 1x1 conv == per-head
    linear), head-smoothed 0.5/0.5 with the head average, optionally image-
    masked, then softmaxed over the JOINT (fg/bg x patches) space
    ("fgbg competitive", embedding_manager.py:268-283).
  * AdaEmbedding: per layer, cat(LN(fg), LN(bg), LN(time_emb[: C/4*H]))
    -> Linear -> K sets of r coefficients over K x r learned basis vectors
    (first N rows optionally init-word pre_vecs) -> per-K LayerNorm
    -> /sqrt(D) -> + per-layer bias.
  * Embedding3d: a [L, K, D] table with per-layer lookup/caching (used by
    the reference only as an EMA container).

TPU notes: these run at most 16 small matmuls per step on [B, 4096, C]
features — all MXU-friendly dense ops; no Pallas needed for a path that is
never hot. The grouped 1x1 convs become per-head einsums (no conv at all).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from adaprompt_tpu.adaface.gradient import grad_scale
from adaprompt_tpu.ops.layers import layer_norm

# 25 UNet layers -> 16 conditioned CA layers (openaimodel.py:730-731)
LAYER_IDX2CA = {1: 0, 2: 1, 4: 2, 5: 3, 7: 4, 8: 5, 12: 6, 16: 7,
                17: 8, 18: 9, 19: 10, 20: 11, 21: 12, 22: 13, 23: 14, 24: 15}
CA_INFEAT_DIMS = (320, 320, 640, 640, 1280, 1280, 1280, 1280,
                  1280, 1280, 640, 640, 640, 320, 320, 320)


# ---------------------------------------------------------------------------
# AttentionalPooler
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AttnPoolerConfig:
    feat_dim: int                      # C of the CA layer (320/640/1280)
    feat_reduction_ratio: int = 8      # lora_dim = C / ratio
    n_heads: int = 8
    infeat_grad_scale: float = 0.5     # 1.0 when owned by AdaEmbedding
    is_fgbg_competitive: bool = True

    @property
    def lora_dim(self) -> int:
        return self.feat_dim // self.feat_reduction_ratio


def _grouped_linear(x: jax.Array, w: jax.Array, n_heads: int) -> jax.Array:
    """torch Conv1d(C_in, C_out, 1, groups=H, bias=False) == per-head linear.

    x: [..., C_in]; w: torch layout [C_out, C_in/H] (kernel dim squeezed).
    Returns [..., C_out]."""
    c_out, c_in_g = w.shape
    wg = w.reshape(n_heads, c_out // n_heads, c_in_g)        # [H, o, c]
    xg = x.reshape(*x.shape[:-1], n_heads, c_in_g)           # [..., H, c]
    out = jnp.einsum("...hc,hoc->...ho", xg, wg)
    return out.reshape(*x.shape[:-1], c_out)


def attn_pooler_init(key: jax.Array, cfg: AttnPoolerConfig,
                     dtype=jnp.float32) -> dict:
    """torch Conv1d default init: U(-sqrt(k), sqrt(k)), k = groups/(C_in*1)."""
    ks = jax.random.split(key, 3)
    bound = float(np.sqrt(cfg.n_heads / cfg.feat_dim))
    shape = (cfg.lora_dim, cfg.feat_dim // cfg.n_heads)
    mk = lambda k: jax.random.uniform(k, shape, dtype, -bound, bound)
    return {"lora_to_k": mk(ks[0]), "lora_to_fg_q": mk(ks[1]),
            "lora_to_bg_q": mk(ks[2])}


def attn_pooler_from_torch(state_dict, prefix: str = "",
                           dtype=jnp.float32) -> dict:
    get = lambda n: np.asarray(state_dict[prefix + n].detach().float().cpu()
                               if hasattr(state_dict[prefix + n], "detach")
                               else state_dict[prefix + n])
    return {n: jnp.asarray(get(f"{n}.weight")[..., 0], dtype)
            for n in ("lora_to_k", "lora_to_fg_q", "lora_to_bg_q")}


def attn_pooler_forward(params: dict, cfg: AttnPoolerConfig,
                        layer_attn: dict, fg_q_emb: jax.Array,
                        bg_q_emb: jax.Array,
                        img_mask: jax.Array | None = None) -> dict:
    """embedding_manager.py:151-324 (eval mode: dropouts are identity).

    layer_attn: {"x": [B, L, C] layer input features, "q": [B, L, C] the CA
    layer's projected queries, "to_k_w": [D_ctx, C] the CA layer's to_k
    weight (no bias in SD), "infeat_size": (h, w) with h*w == L}.
    fg_q_emb: [D_ctx] static subject embedding probe; bg_q_emb: [B, D_ctx].
    img_mask: optional [B, 1, H0, W0] fg mask (resized here, nearest).
    Returns {"fg_out": [B, C], "bg_out": [B, C], "attn_fg", "attn_bg"}."""
    h = cfg.n_heads
    x = grad_scale(layer_attn["x"], cfg.infeat_grad_scale)
    k_feat = grad_scale(layer_attn["q"], cfg.infeat_grad_scale)
    to_k_w = layer_attn["to_k_w"]
    b, l, c = x.shape

    # v = x + LN(q_feat), scaled by H^-1/2; reused as attention keys
    v = (x + layer_norm(k_feat, None, None)) * (h ** -0.5)       # [B, L, C]

    # the CA layer's to_k turns prompt-space probes into feature-space queries
    fg_q = jnp.broadcast_to((fg_q_emb[None] @ to_k_w)[None], (b, 1, c))
    bg_q = (bg_q_emb[:, None] @ to_k_w)                          # [B, 1, C]

    extra = h ** -0.5                                  # conv1d_extra_scale
    lora_fg_q = _grouped_linear(layer_norm(fg_q, None, None),
                                params["lora_to_fg_q"], h)
    lora_bg_q = _grouped_linear(layer_norm(bg_q, None, None),
                                params["lora_to_bg_q"], h)
    lora_k = _grouped_linear(v, params["lora_to_k"], h) * extra  # [B, L, ld]
    # fg/bg stacked as 2 query tokens; double head scale on q (ref:241-246)
    lora_q = jnp.concatenate([lora_fg_q, lora_bg_q], axis=1) * (h ** -0.5) * extra

    dl, dv = cfg.lora_dim // h, c // h
    split = lambda t, d: t.reshape(t.shape[0], t.shape[1], h, d).transpose(0, 2, 1, 3)
    q_h, k_h, v_h = split(lora_q, dl), split(lora_k, dl), split(v, dv)

    sim = jnp.einsum("bhid,bhjd->bhij", q_h, k_h,
                     preferred_element_type=jnp.float32)         # [B,H,2,L]
    # smooth each head's scores 0.5/0.5 with the head average (ref:255-263)
    sim = 0.5 * sim + 0.5 * jnp.mean(sim, axis=1, keepdims=True)

    if img_mask is not None:
        hw = layer_attn["infeat_size"]
        # torch F.interpolate(mode="nearest") convention: src = floor(i*S/s)
        # (jax.image.resize samples at pixel centers — different pixels)
        ri = (np.arange(hw[0]) * img_mask.shape[2]) // hw[0]
        ci = (np.arange(hw[1]) * img_mask.shape[3]) // hw[1]
        m = img_mask[:, :, ri][:, :, :, ci]
        keep = (m.reshape(b, 1, 1, l) != 0)
        sim = jnp.where(keep, sim, jnp.finfo(sim.dtype).min)

    if cfg.is_fgbg_competitive:
        # softmax over the joint (fg/bg, patches) space
        attn = jax.nn.softmax(sim.reshape(b, h, 2 * l), axis=-1)
        attn = attn.reshape(b, h, 2, l)
    else:
        attn = jax.nn.softmax(sim, axis=-1)

    attn_fg, attn_bg = attn[:, :, :1], attn[:, :, 1:]
    pool = lambda a: jnp.einsum("bhij,bhjd->bhid", a.astype(v_h.dtype), v_h)
    merge = lambda o: o.transpose(0, 2, 1, 3).reshape(b, c)      # heads -> C
    return {"fg_out": merge(pool(attn_fg)), "bg_out": merge(pool(attn_bg)),
            "attn_fg": attn_fg, "attn_bg": attn_bg}


# ---------------------------------------------------------------------------
# AdaEmbedding
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AdaEmbedderConfig:
    num_layers: int = 16
    num_vectors: int = 1               # K
    fg_emb_count: int = 1
    bg_emb_count: int = 0
    use_cached_bg: bool = False
    out_emb_dim: int = 768
    rank: int = 12                     # r
    num_init_vecs: int = 0             # N (leading pre_vecs rows)
    ca_infeat_dims: tuple = CA_INFEAT_DIMS
    has_bias: bool = True
    attn_pooler_feat_reduction_ratio: int = 8
    do_zero_shot: bool = False         # basis vectors supplied per call

    @property
    def emb_infeat_types(self) -> tuple:
        # 0 = fg, 1 = bg, 2 = fg+bg (ref:600-602)
        rest = self.num_vectors - self.fg_emb_count - self.bg_emb_count
        return (0,) * self.fg_emb_count + (1,) * self.bg_emb_count + (2,) * rest

    @property
    def is_one_stream_only(self) -> bool:
        return (self.fg_emb_count == self.num_vectors
                or self.bg_emb_count == self.num_vectors)

    @property
    def H(self) -> int:
        return 1 if self.is_one_stream_only else 2

    @property
    def td_frac(self) -> float:
        time_h = max(2 if t == 2 else 1 for t in self.emb_infeat_types)
        return 0.25 * time_h

    def td(self, ca_layer_idx: int) -> int:
        return int(self.td_frac * self.ca_infeat_dims[ca_layer_idx])

    def pooler_cfg(self, ca_layer_idx: int) -> AttnPoolerConfig:
        return AttnPoolerConfig(
            feat_dim=self.ca_infeat_dims[ca_layer_idx],
            feat_reduction_ratio=self.attn_pooler_feat_reduction_ratio,
            infeat_grad_scale=1.0)


def reduce_fg_bg_cross_weights(params: dict, cfg: AdaEmbedderConfig,
                               max_ratio: float = 0.01) -> dict:
    """Init-time weight surgery (ref:719-771): for each fg (resp. bg)
    embedding's rows of the coeff map, scale the columns reading the OTHER
    stream down to at most `max_ratio` of the own-stream mean |w|."""
    if cfg.H == 1:
        return params
    out_w = []
    for li, w in enumerate(params["coeff_w"]):
        d = cfg.ca_infeat_dims[li]
        wk = np.array(w, np.float32).reshape(cfg.num_vectors, cfg.rank, -1)
        for k, t in enumerate(cfg.emb_infeat_types):
            fg_m = np.abs(wk[k, :, :d]).mean()
            bg_m = np.abs(wk[k, :, d:2 * d]).mean()
            if t == 0:
                wk[k, :, d:2 * d] *= min(1.0, max_ratio * fg_m / (bg_m + 1e-6))
            elif t == 1:
                wk[k, :, :d] *= min(1.0, max_ratio * bg_m / (fg_m + 1e-6))
        out_w.append(jnp.asarray(wk.reshape(w.shape), w.dtype))
    return {**params, "coeff_w": out_w}


def ada_init(key: jax.Array, cfg: AdaEmbedderConfig,
             init_vecs: jax.Array | None = None, dtype=jnp.float32) -> dict:
    L, K, r, D = cfg.num_layers, cfg.num_vectors, cfg.rank, cfg.out_emb_dim
    n = 0 if init_vecs is None else init_vecs.shape[0]
    keys = jax.random.split(key, 2 * L + 2)
    poolers, coeff_w, coeff_b = [], [], []
    for i in range(L):
        poolers.append(attn_pooler_init(keys[i], cfg.pooler_cfg(i), dtype))
        d_in = cfg.ca_infeat_dims[i] * cfg.H + cfg.td(i)
        bound = float(np.sqrt(1.0 / d_in))        # torch Linear default init
        coeff_w.append(jax.random.uniform(keys[L + i], (r * K, d_in), dtype,
                                          -bound, bound))
        coeff_b.append(jnp.zeros((r * K,), dtype))
    p = {"poolers": poolers, "coeff_w": coeff_w, "coeff_b": coeff_b}
    if not cfg.do_zero_shot:
        bv = jax.random.normal(keys[-1], (K, r - n, D), dtype)
        bv = bv / jnp.linalg.norm(bv, axis=-1, keepdims=True) / 4.0
        p["basis_vecs"] = bv.at[:, -1].set(0.0)
        if init_vecs is not None:
            p["pre_vecs"] = jnp.tile(jnp.asarray(init_vecs, dtype)[None],
                                     (K, 1, 1))
        if cfg.has_bias:
            p["bias"] = jnp.zeros((L, K, D), dtype)
    if cfg.use_cached_bg:
        p["cached_bg_weight"] = jnp.asarray(0.5, dtype)   # ckpt compat; the
        # reference defines it (ref:584-586) but never reads it in forward
    return reduce_fg_bg_cross_weights(p, cfg)


def ada_from_torch(state_dict, cfg: AdaEmbedderConfig,
                   dtype=jnp.float32) -> dict:
    sd = {k: np.asarray(v.detach().float().cpu() if hasattr(v, "detach")
                        else v) for k, v in state_dict.items()}
    poolers = [attn_pooler_from_torch(state_dict, f"poolers.{i}.", dtype)
               for i in range(cfg.num_layers)]
    coeff_w = [jnp.asarray(sd[f"layer_coeff_maps.{i}.weight"], dtype)
               for i in range(cfg.num_layers)]
    coeff_b = [jnp.asarray(sd[f"layer_coeff_maps.{i}.bias"], dtype)
               for i in range(cfg.num_layers)]
    p = {"poolers": poolers, "coeff_w": coeff_w, "coeff_b": coeff_b}
    for name in ("basis_vecs", "pre_vecs", "bias", "cached_bg_weight"):
        if name in sd:
            p[name] = jnp.asarray(sd[name], dtype)
    return p    # reference applies the cross-weight surgery before saving


def ada_forward(params: dict, cfg: AdaEmbedderConfig, layer_idx: int,
                layer_attn: dict, time_emb: jax.Array,
                layer_subj_emb_probe: jax.Array,
                layer_static_extra_emb_mean: jax.Array,
                img_mask: jax.Array | None = None,
                cached_pooler_bg_out: jax.Array | None = None,
                zs_basis_vecs: jax.Array | None = None):
    """One layer's dynamic embedding (ref:775-914, eval semantics).

    layer_idx: UNet layer index (1..24, must be a conditioned CA layer).
    layer_attn / img_mask: see attn_pooler_forward. time_emb: [B, 1280].
    layer_subj_emb_probe: [D_ctx]; layer_static_extra_emb_mean: [B, D_ctx].
    Returns (out_vecs [B, K, D], pooled {"bg_out": ...} for bg-token reuse).
    """
    ca = LAYER_IDX2CA[layer_idx]
    K, r, D = cfg.num_vectors, cfg.rank, cfg.out_emb_dim
    c = cfg.ca_infeat_dims[ca]

    cached_bg_used = cfg.use_cached_bg and cached_pooler_bg_out is not None
    if cfg.use_cached_bg and cached_pooler_bg_out is None:
        raise ValueError("use_cached_bg requires cached_pooler_bg_out")
    pooled = attn_pooler_forward(params["poolers"][ca], cfg.pooler_cfg(ca),
                                 layer_attn, layer_subj_emb_probe,
                                 layer_static_extra_emb_mean, img_mask)
    infeat_fg = pooled["fg_out"]
    infeat_bg = cached_pooler_bg_out if cached_bg_used else pooled["bg_out"]
    if cfg.H == 2:
        infeat = jnp.concatenate([infeat_fg, infeat_bg], axis=-1)
    else:
        infeat = infeat_bg if cfg.bg_emb_count == cfg.num_vectors else infeat_fg

    td = cfg.td(ca)
    time_feat = time_emb[:, :td]
    # LNCat3 (ref:40-60): non-affine LN each part, then concat
    feats = jnp.concatenate([layer_norm(infeat, None, None),
                             layer_norm(time_feat, None, None)], axis=-1)
    coeffs = (feats @ params["coeff_w"][ca].T
              + params["coeff_b"][ca]).reshape(-1, K, r)         # [B, K, r]

    if cfg.do_zero_shot:
        if zs_basis_vecs is None:
            raise ValueError("do_zero_shot requires zs_basis_vecs [B, K, r, D]")
        out = jnp.einsum("bkr,bkrd->bkd", coeffs, zs_basis_vecs)
    else:
        basis = params["basis_vecs"]                              # [K, r-N, D]
        if "pre_vecs" in params:
            basis = jnp.concatenate([params["pre_vecs"], basis], axis=1)
        out = jnp.einsum("bkr,krd->bkd", coeffs, basis)
    out = layer_norm(out, None, None) / np.sqrt(D)
    if "bias" in params and not cfg.do_zero_shot:
        out = out + params["bias"][ca][None]
    return out, {"bg_out": pooled["bg_out"]}


# ---------------------------------------------------------------------------
# Embedding3d (ref:326-360): a [L, K, D] table; the reference uses it only
# as the EMA container for ada embeddings. Plain-array helpers.
# ---------------------------------------------------------------------------

def embedding3d_init(num_layers: int = 16, num_vectors: int = 9,
                     out_emb_dim: int = 768,
                     init_embedding: jax.Array | None = None,
                     dtype=jnp.float32) -> jax.Array:
    if init_embedding is not None:
        return jnp.broadcast_to(
            jnp.asarray(init_embedding, dtype),
            (num_layers, num_vectors, out_emb_dim)).copy()
    return jnp.zeros((num_layers, num_vectors, out_emb_dim), dtype)


def embedding3d_lookup(table: jax.Array, layer_idx, token_idx=None):
    return table[layer_idx] if token_idx is None else table[layer_idx, token_idx]


def embedding3d_cache_layer(table: jax.Array, layer_idx,
                            new_embedding: jax.Array) -> jax.Array:
    return table.at[layer_idx].set(new_embedding)
