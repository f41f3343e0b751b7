"""StableDiffusionPipeline — the TPU-native txt2img / img2img engine.

The minimum end-to-end slice of the framework (SURVEY.md §7 step 3): CLIP
text encoding (with clip-skip and optional subject-embedding splicing),
the DDIM denoise loop as one `lax.scan`, and the VAE decoder, all inside a
single jitted graph per (batch, steps, size) signature.

Functional equivalent of the reference research inference path
(/root/reference/scripts/stable_txt2img.py:324-876) and of the diffusers
product path (/root/reference/adaface/adaface_wrapper.py:104-296), with the
defaults of both: DDIM-50, 512x512, CFG annealed 4->1, fixed negative prompt.

TPU-first: bf16 activations / fp32 params; NHWC; denoise-to-decode is one
XLA program (zero host sync inside the loop).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from adaprompt_tpu.models import clip_text, unet as unet_mod, vae as vae_mod
from adaprompt_tpu.sampling import ddim
from adaprompt_tpu.sampling.schedule import SD15_SCHEDULE, DiffusionSchedule
from adaprompt_tpu.utils import torch_port
from adaprompt_tpu.utils.tokenizer import CLIPTokenizer

# PuLID-style default negative prompt (adaface_wrapper.py:41-47)
DEFAULT_NEGATIVE_PROMPT = (
    "flaws in the eyes, flaws in the face, lowres, non-HDRi, low quality, "
    "worst quality, artifacts, noise, text, watermark, glitch, mutated, ugly, "
    "disfigured, hands, partially rendered objects, partially rendered eyes, "
    "deformed eyeballs, cross-eyed, blurry, mutation, duplicate, out of frame, "
    "cropped, mutilated, bad anatomy, deformed, bad proportions, nude, naked, "
    "nsfw, topless, bare breasts"
)


@dataclasses.dataclass(frozen=True)
class FastConfig:
    """Opt-in serving accelerations (docs/PERF.md 'fast preset').

    All three are published approximations of the exact sampler — quality
    must be validated per checkpoint before production use:
      * tome_ratio: ToMe token merging in the 64x64 transformer blocks
        (ops/tome.py, arXiv:2303.17604); 0 disables.
      * cache_interval/cache_depth: DeepCache deep-feature reuse
        (models/unet.py cache_depth, arXiv:2312.00858); interval 1 disables.
      * cfg_tail_frac: final fraction of steps run condition-only with the
        guidance scale pinned to exactly 1 (guidance-interval family,
        arXiv:2404.07724); 0 disables.
    """
    tome_ratio: float = 0.5
    tome_mlp: bool = True
    cache_interval: int = 3
    cache_depth: int = 3
    cfg_tail_frac: float = 0.3


@dataclasses.dataclass
class SDParams:
    unet: dict
    vae: dict
    text: dict

    def astype(self, dtype) -> "SDParams":
        cast = lambda tree: jax.tree.map(lambda x: x.astype(dtype), tree)
        return SDParams(cast(self.unet), cast(self.vae), cast(self.text))


class StableDiffusionPipeline:
    """Stateless-compute pipeline: all state is the param pytree; every
    generate() signature compiles once and is cached by jit."""

    def __init__(self, params: SDParams, tokenizer: CLIPTokenizer | None = None,
                 unet_cfg: unet_mod.UNetConfig = unet_mod.SD15_UNET_CONFIG,
                 vae_cfg: vae_mod.VAEConfig = vae_mod.SD15_VAE_CONFIG,
                 text_cfg: clip_text.CLIPTextConfig = clip_text.SD15_TEXT_CONFIG,
                 sched: DiffusionSchedule = SD15_SCHEDULE,
                 compute_dtype=jnp.bfloat16,
                 param_dtype=None,
                 quant: str | None = None):
        """quant="int8" switches the UNet transformer linears to the w8a8
        MXU path (ops/quant.py) — opt-in serving speedup, see docs/PERF.md;
        same as env ADAPROMPT_QUANT=int8."""
        if quant is not None:
            unet_cfg = dataclasses.replace(unet_cfg, quant=quant)
        if param_dtype is not None:
            params = params.astype(param_dtype)
        self.params = params
        self.tokenizer = tokenizer or CLIPTokenizer.load()
        self.unet_cfg = unet_cfg
        self.vae_cfg = vae_cfg
        self.text_cfg = text_cfg
        self.sched = sched
        self.compute_dtype = compute_dtype
        self.mesh = None

    # -- constructors ---------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "StableDiffusionPipeline":
        """Load a full SD-1.5 checkpoint (.ckpt or .safetensors)."""
        sd = torch_port.load_state_dict(path)
        parts = torch_port.split_sd_checkpoint(sd)
        params = SDParams(
            unet=unet_mod.from_torch(parts["unet"]),
            vae=vae_mod.from_torch(parts["vae"]),
            text=clip_text.from_torch(parts["text"]),
        )
        return cls(params, **kw)

    @classmethod
    def random_init(cls, key: jax.Array | int = 0, **kw) -> "StableDiffusionPipeline":
        """Random weights at full SD-1.5 size — for benchmarking/compile tests
        in environments without checkpoint assets."""
        ucfg = kw.pop("unet_cfg", unet_mod.SD15_UNET_CONFIG)
        vcfg = kw.pop("vae_cfg", vae_mod.SD15_VAE_CONFIG)
        tcfg = kw.pop("text_cfg", clip_text.SD15_TEXT_CONFIG)
        # init on the HOST CPU, transfer once: eager per-tensor RNG on the
        # accelerator costs one tunnel dispatch per parameter (~3.5 ms each,
        # docs/PERF.md) — minutes for the ~1B-param stack, vs seconds on
        # CPU + one bulk device_put. threefry RNG is backend-invariant, so
        # the weights are bit-identical either way.
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            # the key too: no accelerator op runs before the bulk transfer
            # (an eager op on a degraded tunnel can block init forever)
            key = (jax.random.PRNGKey(key) if isinstance(key, int)
                   else jax.device_put(key, cpu))
            k1, k2, k3 = jax.random.split(key, 3)
            params = SDParams(unet=unet_mod.init_params(k1, ucfg),
                              vae=vae_mod.init_params(k2, vcfg),
                              text=clip_text.init_params(k3, tcfg))
            if kw.get("param_dtype") is not None:
                # cast before the transfer (bf16 halves the bytes moved)
                params = params.astype(kw.pop("param_dtype"))
        # local_devices: in multi-process JAX the first GLOBAL device can be
        # non-addressable from this process (round-4 ADVICE)
        dev = jax.local_devices()[0]
        if dev.platform != "cpu":
            # one bulk device_put per sub-tree (3 transfers total)
            params = SDParams(unet=jax.device_put(params.unet, dev),
                              vae=jax.device_put(params.vae, dev),
                              text=jax.device_put(params.text, dev))
        return cls(params, unet_cfg=ucfg, vae_cfg=vcfg, text_cfg=tcfg, **kw)

    # -- multi-chip serving ------------------------------------------------------

    def distribute(self, mesh=None) -> "StableDiffusionPipeline":
        """Shard serving over a device mesh: params replicated (serving has
        no optimizer state; replication keeps the denoise loop free of
        weight all-gathers), batch sharded over the 'dp' axis. GSPMD emits
        any collectives; the scan/decode graph is unchanged.

        The reference's only parallelism is 2-GPU DDP *training*
        (main.py:829); serving there is single-GPU. This is the TPU-native
        serving equivalent: one jit over the mesh, throughput scales with
        dp size, generate() batches must be divisible by it.
        """
        from adaprompt_tpu.parallel import mesh as mesh_mod
        if mesh is None:
            mesh = mesh_mod.make_mesh()          # pure DP over all devices
        self.mesh = mesh
        self.params = SDParams(            # SDParams is not a pytree node
            unet=mesh_mod.replicate(self.params.unet, mesh),
            vae=mesh_mod.replicate(self.params.vae, mesh),
            text=mesh_mod.replicate(self.params.text, mesh))
        return self

    def _shard_batch(self, cond, uncond, x_T):
        from jax.sharding import NamedSharding, PartitionSpec as P
        dp = self.mesh.shape["dp"]
        b = x_T.shape[0]
        if b % dp:
            raise ValueError(
                f"batch {b} not divisible by the mesh dp size {dp}; pad the "
                "prompt list or use a smaller mesh")
        ctx_sh = NamedSharding(self.mesh, P(None, "dp"))
        lat_sh = NamedSharding(self.mesh, P("dp"))
        return (jax.device_put(cond, ctx_sh), jax.device_put(uncond, ctx_sh),
                jax.device_put(x_T, lat_sh))

    # -- text encoding ---------------------------------------------------------

    def tokenize(self, prompts) -> np.ndarray:
        return self.tokenizer(prompts, max_length=self.text_cfg.max_positions)

    def encode_prompt(self, prompts, skip_weights=(1.0, 1.0),
                      inputs_embeds: jax.Array | None = None) -> jax.Array:
        """Prompts -> [B, 77, 768] conditioning. skip_weights = clip-skip
        weights over the last N hidden states (inference default [1,1],
        stable_txt2img.py:395)."""
        ids = jnp.asarray(self.tokenize(prompts))
        return _encode_ids(self.params.text, ids,
                           jnp.asarray(np.asarray(skip_weights, np.float32)),
                           inputs_embeds, self.text_cfg)

    # -- generation -------------------------------------------------------------

    def generate(self, prompts, *, negative_prompt: str | None = None,
                 num_steps: int = 50, guidance_scale=(4.0, 1.0),
                 height: int = 512, width: int = 512,
                 seed: int = 0, skip_weights=(1.0, 1.0),
                 context: jax.Array | None = None,
                 context_uncond: jax.Array | None = None,
                 return_latents: bool = False,
                 fast: FastConfig | None = None,
                 sampler: str = "ddim") -> np.ndarray:
        """Text to images.

        Either `prompts` (list of strings) or precomputed `context`
        ([L, B, 77, 768] layerwise or [B, 77, 768]) may be given. Returns
        uint8 images [B, H, W, 3].

        `fast` enables the opt-in approximate serving accelerations
        (see FastConfig); None (the default) is the exact sampler.
        `sampler`: "ddim" (reference semantics, default) or "dpmpp"
        (DPM-Solver++(2M), sampling/dpm.py — a higher-order solver of the
        same ODE; ~20-25 steps match DDIM-50 quality, so pass a smaller
        num_steps). `fast` composes with either sampler; fast + dpmpp-20
        (+ quant="int8" at construction) is the composed serving stack
        measured in docs/PERF.md.
        """
        if sampler not in ("ddim", "dpmpp"):
            raise ValueError(f"unknown sampler {sampler!r}")
        if context is None:
            cond = self.encode_prompt(prompts, skip_weights)[None]  # [1,B,77,768]
        else:
            cond = context if context.ndim == 4 else context[None]
        b = cond.shape[1]
        if context_uncond is None:
            neg = negative_prompt if negative_prompt is not None else DEFAULT_NEGATIVE_PROMPT
            uncond = self.encode_prompt([neg] * b, skip_weights)[None]
        else:
            uncond = context_uncond if context_uncond.ndim == 4 else context_uncond[None]
        if uncond.shape[0] != cond.shape[0]:
            uncond = jnp.broadcast_to(uncond, cond.shape)

        key = jax.random.PRNGKey(seed)
        x_T = jax.random.normal(key, (b, height // 8, width // 8, 4), jnp.float32)
        if self.mesh is not None:
            cond, uncond, x_T = self._shard_batch(cond, uncond, x_T)
        if fast is not None:
            out = _generate_fast_jit(self.params.unet, self.params.vae, cond,
                                     uncond, x_T, num_steps,
                                     _as_pair(guidance_scale), return_latents,
                                     fast, self.unet_cfg, self.vae_cfg,
                                     self.sched, self.compute_dtype, sampler)
        else:
            out = _generate_jit(self.params.unet, self.params.vae, cond, uncond,
                                x_T, num_steps, _as_pair(guidance_scale),
                                return_latents, self.unet_cfg, self.vae_cfg,
                                self.sched, self.compute_dtype, sampler)
        return np.asarray(out)

    def decode_latents(self, z: jax.Array) -> np.ndarray:
        img = vae_mod.decode(self.params.vae, (jnp.asarray(z) / 0.18215).astype(self.compute_dtype),
                             cfg=self.vae_cfg)
        img = (img.astype(jnp.float32) + 1.0) * 127.5
        return np.asarray(jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8))

    def encode_image(self, images: jax.Array, key: jax.Array | None = None) -> jax.Array:
        """[-1,1] float images [B,H,W,3] -> scaled latents (mode when key is
        None, sample otherwise)."""
        mean, logvar = vae_mod.encode(self.params.vae,
                                      jnp.asarray(images, self.compute_dtype),
                                      cfg=self.vae_cfg)
        z = mean if key is None else vae_mod.sample_latent(key, mean, logvar)
        return z.astype(jnp.float32) * 0.18215


def _as_pair(g):
    if isinstance(g, (tuple, list)):
        return (float(g[0]), float(g[1]))
    return (float(g), min(2.0, float(g)))


@functools.partial(jax.jit, static_argnums=(4,))
def _encode_ids(text_params, ids, skip_weights, inputs_embeds, text_cfg):
    return clip_text.encode(text_params, ids, cfg=text_cfg,
                            inputs_embeds=inputs_embeds,
                            hidden_state_layer_weights=skip_weights)


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def _generate_jit(unet_params, vae_params, cond, uncond, x_T,
                  num_steps, guidance, return_latents, unet_cfg, vae_cfg,
                  sched, dt, sampler="ddim"):
    ctx = jnp.concatenate([cond, uncond], axis=1).astype(dt)  # [L, 2B, 77, D]
    # context is constant across DDIM steps: hoist every CA layer's K/V
    # projection out of the scan (50x fewer projections at DDIM-50)
    cross_kv = unet_mod.precompute_cross_kv(unet_params, ctx, cfg=unet_cfg)

    def model_fn(x, t):
        return unet_mod.forward(unet_params, x.astype(dt), t,
                                ctx, cross_kv=cross_kv,
                                cfg=unet_cfg).astype(jnp.float32)

    if sampler == "dpmpp":
        from adaprompt_tpu.sampling import dpm
        z = dpm.dpmpp_sample(model_fn, x_T, num_steps=num_steps,
                             guidance_scale=guidance, sched=sched)
    else:
        z = ddim.ddim_sample(model_fn, x_T, num_steps=num_steps,
                             guidance_scale=guidance, sched=sched)
    if return_latents:
        return z
    if "vae" in unet_mod._ABLATE:  # ablation stand-in: nearest-upsample decode
        img = jnp.repeat(jnp.repeat(z[..., :3], 8, axis=1), 8, axis=2)
        img = (img.astype(jnp.float32)) * 127.5
        return jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)
    img = vae_mod.decode(vae_params, (z / 0.18215).astype(dt), cfg=vae_cfg)
    img = (img.astype(jnp.float32) + 1.0) * 127.5
    return jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13))
def _generate_fast_jit(unet_params, vae_params, cond, uncond, x_T,
                       num_steps, guidance, return_latents, fast,
                       unet_cfg, vae_cfg, sched, dt, sampler="ddim"):
    """The FastConfig serving path: ToMe + DeepCache + CFG-tail truncation
    (see FastConfig / sampling/fastloop.py) under either solver.
    Approximate — opt-in only."""
    ucfg = dataclasses.replace(unet_cfg, tome_ratio=fast.tome_ratio,
                               tome_mlp=fast.tome_mlp)
    ctx = jnp.concatenate([cond, uncond], axis=1).astype(dt)  # [L, 2B, 77, D]
    cross_kv = unet_mod.precompute_cross_kv(unet_params, ctx, cfg=ucfg)
    b = cond.shape[1]
    depth = fast.cache_depth if fast.cache_interval > 1 else 1

    def _ctx_kv(xb):
        # cond-only steps run the plain batch: slice the cond halves
        if xb == ctx.shape[1]:
            return ctx, cross_kv
        return (ctx[:, :xb],
                {li: (k[:xb], v[:xb]) for li, (k, v) in cross_kv.items()})

    def model_full(x, t):
        c, kv = _ctx_kv(x.shape[0])
        eps, cache = unet_mod.forward(unet_params, x.astype(dt), t, c,
                                      cross_kv=kv, cache_depth=depth,
                                      cfg=ucfg)
        return eps.astype(jnp.float32), cache

    def model_shallow(x, t, cache):
        c, kv = _ctx_kv(x.shape[0])
        eps, _ = unet_mod.forward(unet_params, x.astype(dt), t, c,
                                  cross_kv=kv, cache_depth=depth, cache=cache,
                                  cfg=ucfg)
        return eps.astype(jnp.float32)

    if sampler == "dpmpp":
        from adaprompt_tpu.sampling import dpm
        z = dpm.dpmpp_sample_fast(model_full, model_shallow, x_T,
                                  num_steps=num_steps,
                                  guidance_scale=guidance, sched=sched,
                                  cache_interval=fast.cache_interval,
                                  cfg_tail_frac=fast.cfg_tail_frac)
    else:
        z = ddim.ddim_sample_fast(model_full, model_shallow, x_T,
                                  num_steps=num_steps,
                                  guidance_scale=guidance, sched=sched,
                                  cache_interval=fast.cache_interval,
                                  cfg_tail_frac=fast.cfg_tail_frac)
    if return_latents:
        return z
    img = vae_mod.decode(vae_params, (z / 0.18215).astype(dt), cfg=vae_cfg)
    img = (img.astype(jnp.float32) + 1.0) * 127.5
    return jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)
