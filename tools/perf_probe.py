"""Per-component TPU timing probe.

Measures (with scalar-fetch synchronization — block_until_ready returns
early on the axon platform, docs/PERF.md):
  * full UNet forward at the bench shape (B=8 CFG, 64x64 latents, bf16)
  * the L1 self-attention (4096 tokens, 8x40 heads): flash vs XLA
  * the L1 cross-attention (4096 q, 77 kv): flash vs XLA
  * flash attention backward (dq+dkv kernels)
  * conv3x3 320ch@64x64 microbench
  * VAE decoder

Usage: python tools/perf_probe.py [component ...]
Components: unet attn conv vae all (default all)
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    # scalar fetch forces real completion on axon
    return float(jnp.sum(x.astype(jnp.float32) if hasattr(x, "astype") else x))


def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000  # ms


def probe_attn():
    from adaprompt_tpu.ops import attention as attn
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    for (sq, sk, h, d, tag) in [(4096, 4096, 8, 40, "L1 self"),
                                (4096, 77, 8, 40, "L1 cross"),
                                (1024, 1024, 8, 80, "L2 self")]:
        b = 8
        q = jax.random.normal(ks[0], (b, sq, h, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, sk, h, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, sk, h, d), jnp.bfloat16)
        scale = d ** -0.5
        flops = 2 * 2 * b * h * sq * sk * d  # qk + pv
        fl = jax.jit(lambda q, k, v: attn.flash_attention(q, k, v, None, scale, False))
        xl = jax.jit(lambda q, k, v: attn._attention_xla(q, k, v, None, None, scale))
        t_f = timeit(fl, q, k, v)
        t_x = timeit(xl, q, k, v)
        print(f"attn {tag:9s} flash {t_f:7.2f} ms ({flops/t_f/1e9:6.1f} TF/s)  "
              f"xla {t_x:7.2f} ms ({flops/t_x/1e9:6.1f} TF/s)")
        if tag == "L1 self":
            g = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
                attn.flash_attention(q, k, v, None, scale, False)
                .astype(jnp.float32)), argnums=(0, 1, 2)))
            t_g = timeit(lambda q, k, v: g(q, k, v)[0], q, k, v)
            print(f"attn {tag:9s} flash fwd+bwd {t_g:7.2f} ms")


def probe_unet():
    from adaprompt_tpu.models import unet as unet_mod
    cfg = unet_mod.SD15_UNET_CONFIG
    params = unet_mod.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    b = 8
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 4), jnp.bfloat16)
    t = jnp.full((b,), 500, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (16, b, 77, 768), jnp.bfloat16)
    fwd = jax.jit(lambda x, t, ctx: unet_mod.forward(params, x, t, ctx, cfg=cfg))
    ms = timeit(fwd, x, t, ctx, iters=10)
    # SD-1.5 UNet ~677 GFLOP/image at 512px
    print(f"unet fwd B={b}: {ms:.1f} ms  (~{b*677e9/ms/1e9:.0f} GFLOP/s eff... "
          f"{b*0.677/ms*1000:.1f} TFLOP/s)")


def probe_conv():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 64, 64, 320), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 320, 320), jnp.bfloat16)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    ms = timeit(jax.jit(conv), x, w)
    flops = 2 * 8 * 64 * 64 * 320 * 320 * 9
    print(f"conv3x3 320ch@64x64: {ms:.2f} ms ({flops/ms/1e9:.1f} TF/s)")


def probe_vae():
    from adaprompt_tpu.models import vae as vae_mod
    cfg = vae_mod.SD15_VAE_CONFIG if hasattr(vae_mod, "SD15_VAE_CONFIG") else vae_mod.VAEConfig()
    params = vae_mod.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 4), jnp.bfloat16)
    dec = jax.jit(lambda z: vae_mod.decode(params, z, cfg=cfg))
    ms = timeit(dec, z, iters=5)
    print(f"vae decode B=4: {ms:.1f} ms")


if __name__ == "__main__":
    what = sys.argv[1:] or ["all"]
    print("devices:", jax.devices())
    if "attn" in what or "all" in what:
        probe_attn()
    if "unet" in what or "all" in what:
        probe_unet()
    if "conv" in what or "all" in what:
        probe_conv()
    if "vae" in what or "all" in what:
        probe_vae()
