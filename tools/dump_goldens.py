"""Dump torch-reference goldens for the asset-gated real-weight fidelity tier.

Run ONCE, the day real pretrained weights appear, in an environment with
torch (CPU works; CUDA is faster). It executes the REFERENCE personalization
chain (imported from /root/reference as a numerical oracle, never copied)
on real weights and writes a single .npz that tests/test_real_weights.py
replays against the JAX framework — after this dump, the BASELINE
"ID cosine within 1% of the Torch reference" gate needs no torch at all.

Reference chain captured (file:line):
  adaface/util.py:76-125        arc2face_forward_face_embs (core ID embs)
  adaface/subj_basis_generator.py:470-567  SubjBasisGenerator forward
  adaface/adaface_wrapper.py:152-204       token-table extension + prompt rewrite
  adaface/adaface_wrapper.py:256-296       prompt encode + DDIM-50 generate
  ldm/models/diffusion/ddim.py             annealed-CFG DDIM sampling
  ldm/modules/diffusionmodules/model.py    first-stage decode

Inputs:
  --sd_ckpt           SD-1.5 .ckpt/.safetensors (ldm layout: model.diffusion_
                      model.* / first_stage_model.* / cond_stage_model.*)
  --adaface_ckpt      embeddings_gs-*.pt (EmbeddingManager.save format —
                      holds the trained SubjBasisGenerator modules)
  --arc2face_encoder  .bin/.safetensors (or a dir containing one) with the
                      Arc2Face CLIP text-encoder weights (text_model.* keys)
  --tokenizer_dir     vocab.json + merges.txt (the real CLIP BPE vocab)
  --photos            optional folder of subject photos; combined with
                      --arcface_onnx it yields the real mean faceid (via the
                      JAX ArcFace port — the SAME embedder the test uses, so
                      both frameworks are conditioned identically). Without
                      photos a --seed-derived random unit faceid is used
                      (the chain compare is still exact; only the "does it
                      look like the person" interpretation is lost).
  --arcface_onnx      ArcFace recognition .onnx (for --photos)

Output npz schema (consumed by tests/test_real_weights.py):
  faceid        [1, 512]   the conditioning ArcFace embedding
  core_id_embs  [1, 16, H] arc2face_forward_face_embs output
  subj_embs     [16, H]    SubjBasisGenerator output (the 16 subject vectors)
  cond, uncond  [77, H]    encoded prompt / negative prompt
  x_T           [N, h, w, 4]  shared DDIM start noise (NHWC, from the JAX
                              PRNG so pipe.generate(seed=...) matches)
  latents       [N, h, w, 4]  reference final DDIM latents (NHWC)
  images        [N, S, S, 3] uint8 reference generations
  __meta__      json: prompt/negative/steps/guidance/seed/size
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# the reference's PuLID-derived default negative prompt (adaface_wrapper.py:41-47)
from adaprompt_tpu.pipeline import DEFAULT_NEGATIVE_PROMPT  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def _find_weight_file(path):
    if os.path.isfile(path):
        return path
    for name in ("model.safetensors", "pytorch_model.bin",
                 "diffusion_pytorch_model.safetensors"):
        p = os.path.join(path, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no weight file under {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sd_ckpt", required=True)
    ap.add_argument("--adaface_ckpt", required=True)
    ap.add_argument("--arc2face_encoder", required=True)
    ap.add_argument("--tokenizer_dir", required=True)
    ap.add_argument("--photos", default=None)
    ap.add_argument("--arcface_onnx", default=None)
    ap.add_argument("--prompt", default="a portrait photo of a z person")
    ap.add_argument("--negative", default=DEFAULT_NEGATIVE_PROMPT)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, nargs=2, default=(4.0, 1.0),
                    help="annealed CFG max min (ddim.py:168-180)")
    ap.add_argument("--count", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--subject_string", default="z")
    ap.add_argument("--out", default="goldens.npz")
    args = ap.parse_args()

    import torch
    import torch_oracle
    from adaface_fixtures import TorchTokenizerAdapter
    from transformers import CLIPTextConfig as HFCLIPTextConfig

    from adaprompt_tpu.utils import torch_port
    from adaprompt_tpu.utils.tokenizer import CLIPTokenizer

    torch.set_grad_enabled(False)

    am = torch_oracle.load("adaface.arc2face_models")
    util = torch_oracle.load("adaface.util")
    torch_oracle.load("adaface.subj_basis_generator")  # for ckpt unpickling
    om = torch_oracle.load("ldm.modules.diffusionmodules.openaimodel")
    model_mod = torch_oracle.load("ldm.modules.diffusionmodules.model")
    ddim_mod = torch_oracle.load("ldm.models.diffusion.ddim")

    tok = CLIPTokenizer.load(args.tokenizer_dir)
    if tok.is_fallback:
        raise SystemExit(f"--tokenizer_dir {args.tokenizer_dir} did not "
                         "yield the real CLIP vocab")
    hf_tok = TorchTokenizerAdapter(tok)

    # --- faceid ---------------------------------------------------------------
    if args.photos:
        if not args.arcface_onnx:
            raise SystemExit("--photos requires --arcface_onnx")
        from adaprompt_tpu.eval.face_eval import (FaceSimilarityEvaluator,
                                                  list_images)
        from adaprompt_tpu.models import arcface
        ev = FaceSimilarityEvaluator(arcface.from_onnx(args.arcface_onnx))
        embs = ev(image_paths=list_images(args.photos))
        if embs is None or len(embs) == 0:
            raise SystemExit(f"no face found in {args.photos}")
        faceid = np.mean(np.asarray(embs), axis=0, keepdims=True)
        faceid /= np.linalg.norm(faceid, axis=-1, keepdims=True)
        log(f"faceid from {len(embs)} photo(s)")
    else:
        rng = np.random.default_rng(args.seed)
        faceid = rng.standard_normal((1, 512)).astype(np.float32)
        faceid /= np.linalg.norm(faceid, axis=-1, keepdims=True)
        log("faceid: random unit vector (no --photos)")
    faceid = faceid.astype(np.float32)

    # --- torch models with real weights ---------------------------------------
    log("loading SD checkpoint ...")
    sd = torch_port.load_state_dict(args.sd_ckpt)
    parts = torch_port.split_sd_checkpoint(sd)
    as_t = lambda d: {k: torch.tensor(np.asarray(v)) for k, v in d.items()}

    hf_cfg = HFCLIPTextConfig(  # ViT-L/14 text tower (SD-1.5)
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77, hidden_act="quick_gelu")
    ref_text = am.CLIPTextModelWrapper(hf_cfg).eval()
    missing, unexpected = ref_text.load_state_dict(as_t(parts["text"]),
                                                   strict=False)
    if [k for k in missing if "position_ids" not in k]:
        raise SystemExit(f"text encoder missing keys: {missing[:8]}")

    log("loading Arc2Face encoder ...")
    a2f_sd = torch_port.load_state_dict(
        _find_weight_file(args.arc2face_encoder))
    ref_a2f = am.CLIPTextModelWrapper(hf_cfg).eval()
    ref_a2f.load_state_dict(as_t(a2f_sd), strict=False)

    log("loading AdaFace checkpoint (reference unpickle) ...")
    ckpt = torch.load(args.adaface_ckpt, map_location="cpu",
                      weights_only=False)
    ref_sbg = ckpt["string_to_subj_basis_generator_dict"][
        args.subject_string].eval()

    log("building UNet + VAE decoder ...")
    ref_unet = om.UNetModel(
        image_size=32, in_channels=4, out_channels=4, model_channels=320,
        attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=768, use_checkpoint=False,
        legacy=False).eval()
    ref_unet.load_state_dict(as_t(parts["unet"]))
    vae_sd = parts["vae"]
    dec_kw = dict(ch=128, out_ch=3, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
                  attn_resolutions=[], dropout=0.0, in_channels=3,
                  resolution=args.size, z_channels=4)
    ref_dec = model_mod.Decoder(**dec_kw).eval()
    ref_dec.load_state_dict(as_t(
        {k.removeprefix("decoder."): v for k, v in vae_sd.items()
         if k.startswith("decoder.")}))
    ref_pq = torch.nn.Conv2d(4, 4, 1)
    ref_pq.load_state_dict(as_t(
        {k.removeprefix("post_quant_conv."): v for k, v in vae_sd.items()
         if k.startswith("post_quant_conv.")}))

    # --- the chain ------------------------------------------------------------
    log("arc2face_forward_face_embs ...")
    _, core = util.arc2face_forward_face_embs(
        hf_tok, ref_a2f, torch.tensor(faceid), input_max_length=22,
        return_full_and_core_embs=True)

    log("SubjBasisGenerator ...")
    subj, _ = ref_sbg(core, None, None, out_id_embs_scale=1.0, is_face=True,
                      is_training=False,
                      adaface_prompt_embs_inf_type="full_half_pad")
    subj = subj[0, 0]  # [16, H]

    # token-table extension + prompt rewrite (adaface_wrapper.py:152-204)
    placeholders = [f"{args.subject_string}_{i}" for i in range(16)]
    tok.add_tokens(placeholders)
    ph_ids = tok.convert_tokens_to_ids(placeholders)
    emb = ref_text.get_input_embeddings()
    need = tok.vocab_size_with_added
    if emb.weight.shape[0] < need:
        w = torch.zeros(need, emb.weight.shape[1])
        w[:emb.weight.shape[0]] = emb.weight.data
        new_emb = torch.nn.Embedding(need, emb.weight.shape[1])
        new_emb.weight.data = w
        ref_text.set_input_embeddings(new_emb)
        ref_text.config.vocab_size = need
    ref_text.get_input_embeddings().weight.data[torch.tensor(ph_ids)] = subj

    import re
    prompt = re.sub(r"\b" + args.subject_string + r"\b",
                    " ".join(placeholders), args.prompt)
    log(f"prompt: {prompt!r}")

    hw = torch.tensor([[1.0], [1.0]])  # inference clip-skip [1,1]
    ids_c = torch.tensor(np.asarray(tok([prompt], max_length=77)))
    ids_u = torch.tensor(np.asarray(tok([args.negative], max_length=77)))
    cond = ref_text(input_ids=ids_c, hidden_state_layer_weights=hw)[0]
    uncond = ref_text(input_ids=ids_u, hidden_state_layer_weights=hw)[0]

    # shared x_T: built exactly as pipeline.generate does from `seed`
    import jax
    lat = args.size // 8
    x_T = np.asarray(jax.random.normal(
        jax.random.PRNGKey(args.seed), (args.count, lat, lat, 4),
        "float32"))

    log(f"DDIM-{args.steps} x {args.count} images (torch, this is the slow "
        "part) ...")

    class _RefLDM:
        """apply_model adapter: tile the shared context to the 16 CA layers
        (openaimodel.py:863-866 layout)."""
        parameterization = "eps"

        def __init__(self):
            from adaprompt_tpu.sampling.schedule import SD15_SCHEDULE as s
            self.betas = torch.tensor(s.betas)
            self.alphas_cumprod = torch.tensor(s.alphas_cumprod)
            self.alphas_cumprod_prev = torch.tensor(s.alphas_cumprod_prev)
            self.sqrt_one_minus_alphas_cumprod = torch.tensor(
                s.sqrt_one_minus_alphas_cumprod)
            self.num_timesteps = 1000
            self.device = torch.device("cpu")

        def apply_model(self, x, t, c):
            ctx = c.unsqueeze(1).repeat(1, 16, 1, 1).reshape(
                -1, c.shape[-2], c.shape[-1])
            return ref_unet(x, timesteps=t, context=ctx, extra_info=dict(
                use_layerwise_context=True, iter_type="normal_recon",
                is_training=False, capture_distill_attn=False,
                use_conv_attn_kernel_size=-1, placeholder2indices=None,
                img_mask=None, apply_compel_cfg_prob=0, empty_context=None,
                debug_attn=False))

    sampler = ddim_mod.DDIMSampler(_RefLDM())
    sampler.register_buffer = lambda name, attr: setattr(sampler, name, attr)
    z, _ = sampler.sample(
        S=args.steps, batch_size=args.count, shape=(4, lat, lat),
        conditioning=cond.expand(args.count, -1, -1), verbose=False,
        x_T=torch.tensor(x_T.transpose(0, 3, 1, 2)),
        guidance_scale=tuple(args.guidance),
        unconditional_conditioning=uncond.expand(args.count, -1, -1))

    log("VAE decode ...")
    img = ref_dec(ref_pq(z / 0.18215))
    img = ((img.clamp(-1, 1) + 1.0) * 127.5).round().to(torch.uint8)
    images = img.numpy().transpose(0, 2, 3, 1)

    meta = dict(prompt=args.prompt, negative=args.negative, steps=args.steps,
                guidance=list(args.guidance), seed=args.seed, size=args.size,
                subject_string=args.subject_string, count=args.count,
                photos=args.photos or "")
    np.savez(
        args.out, faceid=faceid, core_id_embs=core.numpy(),
        subj_embs=subj.numpy(), cond=cond[0].numpy(), uncond=uncond[0].numpy(),
        x_T=x_T, latents=z.numpy().transpose(0, 2, 3, 1), images=images,
        __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8))
    log(f"wrote {args.out}: " + ", ".join(
        f"{k}" for k in ("faceid", "core_id_embs", "subj_embs", "cond",
                         "uncond", "x_T", "latents", "images")))


if __name__ == "__main__":
    main()
