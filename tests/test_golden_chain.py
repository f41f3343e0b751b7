"""Golden full-chain fidelity test vs the torch reference with SHARED
random weights.

One continuous run of the product chain in both frameworks:
    faceid -> Arc2Face text-encoder forward -> SubjBasisGenerator ->
    token-table splice -> CLIP text encode (prompt + negative) ->
    UNet x DDIM-5 with annealed CFG -> VAE decode
and assert latent/image agreement. This is the strongest available proxy
for the BASELINE "ID cosine within 1%" gate until real pretrained weights
exist: every module runs its full inference path and the tolerances
accumulate across the whole chain, so a layout/semantics slip anywhere
shows up at the end.

Reference chain: adaface_wrapper.py:207-296 (generate_adaface_embeddings,
update_text_encoder_subj_embs, encode_prompt, forward) +
adaface/util.py:76-238 (arc2face_forward_face_embs), sampled with
ldm/models/diffusion/ddim.py and decoded with
ldm/modules/diffusionmodules/model.py Decoder.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from transformers import CLIPTextConfig as HFCLIPTextConfig

from adaprompt_tpu import pipeline as pl
from adaprompt_tpu.adaface import subj_basis_generator as jsbg
from adaprompt_tpu.adaface.wrapper import AdaFacePipeline
from adaprompt_tpu.models import clip_text, unet as junet, vae as jvae
from adaprompt_tpu.sampling import schedule as jsched

import torch_oracle
from adaface_fixtures import build_word_vocab, TorchTokenizerAdapter

HIDDEN = 576   # >= 512 so ArcFace vectors embed
IMG_DIM = 96
LAT = 16       # latent hw -> 128px images through the f=8 tiny VAE
PROMPT = "portrait of z in the park"
NEG = "photo of the cat"


def _dezero(module, seed):
    torch.manual_seed(seed)
    with torch.no_grad():
        for _, p in module.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)


class _RefLDM:
    """Minimal LatentDiffusion stand-in for DDIMSampler: real schedule
    buffers + apply_model = the reference UNetModel with the shared-context
    layout (ctx tiled to the 16 CA layers, batch-major)."""

    parameterization = "eps"

    def __init__(self, unet, extra_info):
        sched = jsched.SD15_SCHEDULE
        self.betas = torch.tensor(sched.betas)
        self.alphas_cumprod = torch.tensor(sched.alphas_cumprod)
        self.alphas_cumprod_prev = torch.tensor(sched.alphas_cumprod_prev)
        self.sqrt_one_minus_alphas_cumprod = torch.tensor(
            sched.sqrt_one_minus_alphas_cumprod)
        self.num_timesteps = 1000
        self.device = torch.device("cpu")
        self._unet = unet
        self._extra_info = extra_info

    def apply_model(self, x, t, c):
        ctx = c.unsqueeze(1).repeat(1, 16, 1, 1).reshape(
            -1, c.shape[-2], c.shape[-1])
        return self._unet(x, timesteps=t, context=ctx,
                          extra_info=dict(self._extra_info))


def _cos(a, b):
    a = np.asarray(a, np.float64).reshape(-1)
    b = np.asarray(b, np.float64).reshape(-1)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


@pytest.mark.slow
def test_golden_full_chain(tmp_path):
    tok = build_word_vocab(tmp_path)
    vocab = tok.vocab_size_with_added + 16   # room for the z_0..z_15 rows

    am = torch_oracle.load("adaface.arc2face_models")
    util = torch_oracle.load("adaface.util")
    sbg_mod = torch_oracle.load("adaface.subj_basis_generator")
    om = torch_oracle.load("ldm.modules.diffusionmodules.openaimodel")
    model_mod = torch_oracle.load("ldm.modules.diffusionmodules.model")
    ddim_mod = torch_oracle.load("ldm.models.diffusion.ddim")

    hf_cfg = HFCLIPTextConfig(
        vocab_size=vocab, hidden_size=HIDDEN, intermediate_size=HIDDEN * 2,
        num_hidden_layers=2, num_attention_heads=8,
        max_position_embeddings=77, hidden_act="quick_gelu",
        bos_token_id=tok.bos_id, eos_token_id=tok.eos_id)
    tcfg = clip_text.CLIPTextConfig(
        vocab_size=vocab, hidden_size=HIDDEN, intermediate_size=HIDDEN * 2,
        num_layers=2, num_heads=8, eos_token_id=tok.eos_id)

    # --- shared random weights, torch modules first ------------------------
    torch.manual_seed(0)
    ref_a2f = am.CLIPTextModelWrapper(hf_cfg).eval()
    torch.manual_seed(5)
    ref_text = am.CLIPTextModelWrapper(hf_cfg).eval()

    class FakeHFTok:
        @staticmethod
        def from_pretrained(*a, **k):
            return TorchTokenizerAdapter(tok)

    class FakeWrapper(am.CLIPTextModelWrapper):
        @classmethod
        def from_pretrained(cls, *a, **k):
            torch.manual_seed(0)
            return cls(hf_cfg)

    sbg_mod.CLIPTokenizer = FakeHFTok
    sbg_mod.CLIPTextModelWrapper = FakeWrapper
    torch.manual_seed(1)
    ref_sbg = sbg_mod.SubjBasisGenerator(
        num_out_embs_per_layer=16, num_out_layers=16,
        image_embedding_dim=IMG_DIM, output_dim=HIDDEN,
        placeholder_is_bg=False).eval()

    torch.manual_seed(2)
    ref_unet = om.UNetModel(
        image_size=LAT, in_channels=4, out_channels=4, model_channels=32,
        attention_resolutions=[1, 2, 4], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=4, use_spatial_transformer=True,
        transformer_depth=1, context_dim=HIDDEN, use_checkpoint=False,
        legacy=False).eval()
    _dezero(ref_unet, 10)

    torch.manual_seed(3)
    vae_kw = dict(ch=32, out_ch=3, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                  attn_resolutions=[], dropout=0.0, in_channels=3,
                  resolution=8 * LAT, z_channels=4)
    ref_dec = model_mod.Decoder(**vae_kw).eval()
    ref_enc = model_mod.Encoder(**vae_kw, double_z=True).eval()
    ref_quant = torch.nn.Conv2d(8, 8, 1)
    ref_post_quant = torch.nn.Conv2d(4, 4, 1)

    # --- port everything to JAX --------------------------------------------
    vae_sd = {}
    vae_sd.update({f"encoder.{k}": v for k, v in ref_enc.state_dict().items()})
    vae_sd.update({f"decoder.{k}": v for k, v in ref_dec.state_dict().items()})
    vae_sd.update({f"quant_conv.{k}": v for k, v in ref_quant.state_dict().items()})
    vae_sd.update({f"post_quant_conv.{k}": v
                   for k, v in ref_post_quant.state_dict().items()})
    ucfg = junet.UNetConfig(model_channels=32, channel_mult=(1, 2, 4, 4),
                            num_res_blocks=2, attention_ds=(1, 2, 4),
                            num_heads=4, context_dim=HIDDEN,
                            use_checkpoint=False)
    vcfg = jvae.VAEConfig(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1)
    scfg = jsbg.SubjBasisConfig(placeholder_is_bg=False,
                                num_out_embs_per_layer=16,
                                image_embedding_dim=IMG_DIM,
                                output_dim=HIDDEN, text_cfg=tcfg)
    params = pl.SDParams(unet=junet.from_torch(ref_unet.state_dict(), ucfg),
                         vae=jvae.from_torch(vae_sd, vcfg),
                         text=clip_text.from_torch(ref_text.state_dict(), tcfg))
    pipe = pl.StableDiffusionPipeline(params, tokenizer=tok, unet_cfg=ucfg,
                                      vae_cfg=vcfg, text_cfg=tcfg,
                                      compute_dtype=jnp.float32)
    ada = AdaFacePipeline(pipe, jsbg.from_torch(ref_sbg.state_dict(), scfg),
                          scfg, clip_text.from_torch(ref_a2f.state_dict(), tcfg),
                          tcfg, negative_prompt=NEG)

    # --- the shared input ----------------------------------------------------
    rng = np.random.default_rng(0)
    faceid = rng.standard_normal((1, 512)).astype(np.float32)
    faceid /= np.linalg.norm(faceid, axis=-1, keepdims=True)

    # --- torch reference chain ----------------------------------------------
    with torch.no_grad():
        _, core = util.arc2face_forward_face_embs(
            TorchTokenizerAdapter(tok), ref_a2f, torch.tensor(faceid),
            input_max_length=22, return_full_and_core_embs=True)
        ref_subj, _ = ref_sbg(core, None, None, out_id_embs_scale=1.0,
                              is_face=True, is_training=False,
                              adaface_prompt_embs_inf_type="full_half_pad")
        ref_subj = ref_subj[0, 0]                              # [16, H]

    # --- JAX product chain: subject embeddings -------------------------------
    subj = ada.generate_adaface_embeddings(pre_face_embs=jnp.asarray(faceid),
                                           gen_rand_face=True)
    np.testing.assert_allclose(np.asarray(subj), ref_subj.numpy(),
                               atol=5e-5, rtol=1e-3)

    # --- splice + text encode -------------------------------------------------
    with torch.no_grad():
        ref_text.get_input_embeddings().weight.data[
            torch.tensor(ada.placeholder_token_ids)] = ref_subj
        prompt = ada.update_prompt(PROMPT)
        hw = torch.tensor([[1.0], [1.0]])
        ids_c = torch.tensor(np.asarray(tok([prompt], max_length=77)))
        ids_u = torch.tensor(np.asarray(tok([NEG], max_length=77)))
        ref_cond = ref_text(input_ids=ids_c, hidden_state_layer_weights=hw)[0]
        ref_uncond = ref_text(input_ids=ids_u, hidden_state_layer_weights=hw)[0]

    cond, uncond = ada.encode_prompt(PROMPT)
    np.testing.assert_allclose(np.asarray(cond), ref_cond.numpy(),
                               atol=1e-4, rtol=1e-3)

    # --- DDIM-5 with annealed CFG (4 -> 1) ------------------------------------
    x_T = np.asarray(jax.random.normal(jax.random.PRNGKey(0),
                                       (1, LAT, LAT, 4), jnp.float32))
    ldm = _RefLDM(ref_unet, dict(
        use_layerwise_context=True, iter_type="normal_recon",
        is_training=False, capture_distill_attn=False,
        use_conv_attn_kernel_size=-1, placeholder2indices=None,
        img_mask=None, apply_compel_cfg_prob=0, empty_context=None,
        debug_attn=False))
    sampler = ddim_mod.DDIMSampler(ldm)
    sampler.register_buffer = lambda name, attr: setattr(sampler, name, attr)
    with torch.no_grad():
        ref_z, _ = sampler.sample(
            S=5, batch_size=1, shape=(4, LAT, LAT),
            conditioning=ref_cond, verbose=False,
            x_T=torch.tensor(x_T.transpose(0, 3, 1, 2)),
            guidance_scale=(4.0, 1.0),
            unconditional_conditioning=ref_uncond)

    z = pipe.generate(None, context=cond[None], context_uncond=uncond[None],
                      num_steps=5, guidance_scale=(4.0, 1.0),
                      height=8 * LAT, width=8 * LAT, seed=0,
                      return_latents=True)
    ref_z_nhwc = ref_z.numpy().transpose(0, 2, 3, 1)
    assert _cos(z, ref_z_nhwc) > 0.999, _cos(z, ref_z_nhwc)
    np.testing.assert_allclose(np.asarray(z), ref_z_nhwc, atol=5e-3, rtol=1e-2)

    # --- VAE decode: each framework decodes ITS OWN latent --------------------
    with torch.no_grad():
        ref_img = ref_dec(ref_post_quant(ref_z / 0.18215)).numpy()
    img = np.asarray(jvae.decode(params.vae,
                                 (jnp.asarray(z) / 0.18215), cfg=vcfg))
    img_nchw = img.transpose(0, 3, 1, 2)
    assert _cos(img_nchw, ref_img) > 0.999, _cos(img_nchw, ref_img)
    # end-of-chain accumulated tolerance on [-1, 1]-scale pixels
    assert float(np.max(np.abs(img_nchw - ref_img))) < 5e-2


@pytest.mark.slow
def test_reference_pt_checkpoint_identical_embeddings(tmp_path):
    """A REAL reference SubjBasisGenerator saved the reference way
    (embeddings_gs-*.pt, pickled under string_to_subj_basis_generator_dict)
    loads through our .pt loader + from_torch and produces IDENTICAL
    subject embeddings to the torch module (main.py checkpointing format;
    embedding_manager.py save/load)."""
    import torch.nn as nn

    from adaprompt_tpu.adaface import checkpoint as ckpt_mod

    tok = build_word_vocab(tmp_path)
    am = torch_oracle.load("adaface.arc2face_models")
    sbg_mod = torch_oracle.load("adaface.subj_basis_generator")

    hf_cfg = HFCLIPTextConfig(
        vocab_size=tok.vocab_size_with_added, hidden_size=HIDDEN,
        intermediate_size=HIDDEN * 2, num_hidden_layers=2,
        num_attention_heads=8, max_position_embeddings=77,
        hidden_act="quick_gelu", bos_token_id=tok.bos_id,
        eos_token_id=tok.eos_id)
    tcfg = clip_text.CLIPTextConfig(
        vocab_size=tok.vocab_size_with_added, hidden_size=HIDDEN,
        intermediate_size=HIDDEN * 2, num_layers=2, num_heads=8,
        eos_token_id=tok.eos_id)

    import sys

    class FakeHFTok:
        @staticmethod
        def from_pretrained(*a, **k):
            return TorchTokenizerAdapter(tok)

    class FakeWrapper(am.CLIPTextModelWrapper):
        @classmethod
        def from_pretrained(cls, *a, **k):
            torch.manual_seed(0)
            return cls(hf_cfg)

    # register both under importable module paths so torch.save can pickle
    # the module instances by reference (the reference checkpoints store the
    # real CLIPTextModelWrapper the same way)
    for klass, name in ((FakeWrapper, "CLIPTextModelWrapperForGolden"),
                        (FakeHFTok, "FakeHFTokForGolden")):
        klass.__module__ = "adaface.arc2face_models"
        klass.__qualname__ = klass.__name__ = name
        setattr(sys.modules["adaface.arc2face_models"], name, klass)

    sbg_mod.CLIPTokenizer = FakeHFTok
    sbg_mod.CLIPTextModelWrapper = FakeWrapper
    torch.manual_seed(21)
    ref = sbg_mod.SubjBasisGenerator(
        num_out_embs_per_layer=16, num_out_layers=16,
        image_embedding_dim=IMG_DIM, output_dim=HIDDEN,
        placeholder_is_bg=False).eval()

    p = str(tmp_path / "embeddings_gs-1234.pt")
    torch.save({"string_to_subj_basis_generator_dict":
                nn.ModuleDict({"z": ref}),
                "string_to_token_dict": {"z": 42},
                "emb_global_scale_scores": torch.zeros(2)}, p)

    out = ckpt_mod.load_reference_checkpoint(p)
    scfg = jsbg.SubjBasisConfig(placeholder_is_bg=False,
                                num_out_embs_per_layer=16,
                                image_embedding_dim=IMG_DIM,
                                output_dim=HIDDEN, text_cfg=tcfg)
    params = jsbg.from_torch(out["subj_basis_generators"]["z"], scfg)

    rng = np.random.default_rng(7)
    id_embs = rng.standard_normal((1, 16, HIDDEN)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.tensor(id_embs), None, None,
                      out_id_embs_scale=1.0, is_face=True, is_training=False,
                      adaface_prompt_embs_inf_type="full_half_pad")
    got, _ = jsbg.forward(params, scfg, tok, jnp.asarray(id_embs),
                          out_id_embs_scale=1.0, is_face=True,
                          is_training=False,
                          adaface_prompt_embs_inf_type="full_half_pad")
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=3e-5, rtol=1e-4)
