"""adaprompt_tpu — TPU-native zero-shot face-personalization framework.

A from-scratch JAX/XLA/Pallas re-architecture with the capabilities of the
PyTorch reference `askerlee/adaprompt` (AdaFace): Stable Diffusion 1.5
(UNet / VAE / CLIP text encoder) with 16 layerwise cross-attention contexts,
the AdaFace SubjBasisGenerator (ArcFace ID embedding -> 16 text-token-space
subject vectors via an Arc2Face-inverting CLIP projection), a fully compiled
DDIM denoise-to-decode sampler, Prodigy-optimized distillation training over a
pjit data-parallel mesh, and an on-device CLIP/DINO/ArcFace evaluation harness.

Layout:
  ops/       low-level TPU ops: attention (Pallas flash kernel), fused
             GroupNorm-SiLU, linear/conv primitives
  models/    SD-1.5 model zoo as pure functions: CLIP text (clip-skip +
             embedding injection), UNet (per-layer context), VAE, CLIP vision
             (fg/bg attention mask), ArcFace, DINO
  adaface/   the personalization core: SubjBasisGenerator, Arc2Face
             forward/inverse embedding fns, prompt/embedding splicing,
             the public AdaFacePipeline API
  sampling/  DDIM as a single lax.scan with annealed CFG
  train/     pjit train steps (recon / arc2face-distill / compos-distill),
             Prodigy in optax, LR schedules, losses
  parallel/  mesh + sharding rules (dp x fsdp over ICI)
  data/      host-side dataset: mask-aware augmentation, 4-type prompt
             generation, subject-pinned batch sampling
  eval/      CLIP / DINO / ArcFace similarity scoring
"""

__version__ = "0.1.0"
