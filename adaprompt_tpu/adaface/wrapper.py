"""AdaFacePipeline — the public zero-shot personalization API.

Functional equivalent of the reference product path
(/root/reference/adaface/adaface_wrapper.py AdaFaceWrapper): subject photos
in -> personalized SD generations out, with the same pipeline semantics:

  1. ArcFace ID embedding extraction (mean over photos, L2-normalized,
     optional noise; adaface/util.py:242-341),
  2. Arc2Face text encoder -> 16 core ID prompt embeddings
     (input_max_length=22 as in adaface_wrapper.py:230-234),
  3. SubjBasisGenerator -> 16 subject vectors in SD token space
     (num_out_layers collapses to 1 at inference, adaface_wrapper.py:59),
  4. 16 new tokens z_0..z_15 appended to the tokenizer, their embedding-table
     rows overwritten with the subject vectors (adaface_wrapper.py:152-190),
  5. prompt rewrite 'z' -> 'z_0 ... z_15' (adaface_wrapper.py:192-204),
  6. vanilla SD txt2img/img2img with DDIM-50 and the PuLID negative prompt.

Face *detection* stays host-side and pluggable (insightface is CPU/ONNX in
the reference too — SURVEY.md §2.6); ArcFace *recognition* runs on-device
via models/arcface.py when weights are provided.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

from adaprompt_tpu.adaface import arc2face
from adaprompt_tpu.adaface import subj_basis_generator as sbg
from adaprompt_tpu.models import clip_text
from adaprompt_tpu.pipeline import StableDiffusionPipeline, DEFAULT_NEGATIVE_PROMPT
from adaprompt_tpu.utils.tokenizer import CLIPTokenizer


def add_noise_keep_norm(key: jax.Array, x: jax.Array, noise_std: float) -> jax.Array:
    """add_noise_to_tensor(..., keep_norm=True) (adaface/util.py:9-24)."""
    rel = jnp.std(x, axis=-1).mean() * noise_std
    noise = jax.random.normal(key, x.shape, x.dtype) * rel
    orig_norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = x + noise
    new_norm = jax.lax.stop_gradient(jnp.linalg.norm(y, axis=-1, keepdims=True))
    return y * orig_norm / (new_norm + 1e-8)


class AdaFacePipeline:
    def __init__(self, sd_pipeline: StableDiffusionPipeline,
                 subj_basis_params: dict,
                 subj_basis_cfg: sbg.SubjBasisConfig,
                 arc2face_text_params: dict,
                 arc2face_text_cfg: clip_text.CLIPTextConfig = clip_text.SD15_TEXT_CONFIG,
                 face_embedder=None,
                 subject_string: str = "z", num_vectors: int = 16,
                 num_inference_steps: int = 50,
                 negative_prompt: str | None = None):
        self.pipe = sd_pipeline
        self.subj_basis_params = subj_basis_params
        self.subj_basis_cfg = subj_basis_cfg
        self.arc2face_text_params = arc2face_text_params
        self.arc2face_text_cfg = arc2face_text_cfg
        self.face_embedder = face_embedder
        self.subject_string = subject_string
        self.num_vectors = num_vectors
        self.num_inference_steps = num_inference_steps
        self.negative_prompt = negative_prompt or DEFAULT_NEGATIVE_PROMPT

        self._extend_tokenizer_and_text_encoder()

        # faceid -> subject vectors as ONE compiled executable: the chain
        # (Arc2Face CLIP forward + inverse + SubjBasisGenerator) is ~60
        # layers of text-encoder compute; op-by-op dispatch dominates the
        # per-subject personalization latency otherwise. Tokenizer-derived
        # ids/pads resolve to constants at trace time.
        def _id_to_subj(a2f_params, sbg_params, faceid, out_scale):
            _, id_prompt_emb = arc2face.forward_face_embs(
                a2f_params, self.pipe.tokenizer, faceid,
                text_cfg=self.arc2face_text_cfg, input_max_length=22)
            subj_embs, _ = sbg.forward(
                sbg_params, self.subj_basis_cfg, self.pipe.tokenizer,
                id_prompt_emb, out_id_embs_scale=out_scale,
                is_face=True, is_training=False,
                adaface_prompt_embs_inf_type="full_half_pad")
            return subj_embs[0, 0]

        # out_scale gates a python-level blend branch -> static (one
        # compile per distinct scale; in practice a single value)
        self._jit_id_to_subj = jax.jit(_id_to_subj, static_argnums=(3,))

    # -- token table extension (adaface_wrapper.py:152-190) --------------------

    def _extend_tokenizer_and_text_encoder(self):
        tok: CLIPTokenizer = self.pipe.tokenizer
        self.placeholder_tokens = [f"{self.subject_string}_{i}"
                                   for i in range(self.num_vectors)]
        self.placeholder_tokens_str = " ".join(self.placeholder_tokens)
        tok.add_tokens(self.placeholder_tokens)
        self.placeholder_token_ids = tok.convert_tokens_to_ids(self.placeholder_tokens)

        text = self.pipe.params.text
        table = text["token_embedding"]
        need = tok.vocab_size_with_added
        if table.shape[0] < need:
            extra = jnp.zeros((need - table.shape[0], table.shape[1]), table.dtype)
            text["token_embedding"] = jnp.concatenate([table, extra], axis=0)

    def update_text_encoder_subj_embs(self, subj_embs: jax.Array):
        """Write the 16 subject vectors into the token-embedding table."""
        text = self.pipe.params.text
        ids = jnp.asarray(self.placeholder_token_ids)
        text["token_embedding"] = text["token_embedding"].at[ids].set(
            subj_embs.astype(text["token_embedding"].dtype))

    # -- prompt rewrite (adaface_wrapper.py:192-204) -----------------------------

    def update_prompt(self, prompt: str) -> str:
        if self.placeholder_tokens_str in prompt:
            return prompt
        if re.search(r"\b" + self.subject_string + r"\b", prompt) is None:
            return self.placeholder_tokens_str + " " + prompt
        return re.sub(r"\b" + self.subject_string + r"\b",
                      self.placeholder_tokens_str, prompt)

    # -- ID embedding generation -------------------------------------------------

    def extract_faceid_embeds(self, images_np=None, image_paths=None) -> jax.Array | None:
        """Mean L2-normalized ArcFace embedding over the given photos
        ([1, 512]); None when no face found."""
        if self.face_embedder is None:
            return None
        embs = self.face_embedder(images_np=images_np, image_paths=image_paths)
        if embs is None or len(embs) == 0:
            return None
        m = jnp.mean(jnp.asarray(embs), axis=0, keepdims=True)
        return m / jnp.linalg.norm(m, axis=-1, keepdims=True)

    def generate_adaface_embeddings(self, image_paths=None, images_np=None,
                                    pre_face_embs=None, gen_rand_face: bool = False,
                                    out_id_embs_scale: float = 1.0,
                                    noise_level: float = 0.0,
                                    update_text_encoder: bool = True,
                                    seed: int = 0) -> jax.Array | None:
        """Photos (or given/random ArcFace embeddings) -> [16, 768] subject
        vectors (generate_adaface_embeddings, adaface_wrapper.py:207-254)."""
        key = jax.random.PRNGKey(seed)
        if gen_rand_face:
            k1, key = jax.random.split(key)
            faceid = pre_face_embs if pre_face_embs is not None else \
                jax.random.normal(k1, (1, 512))
        else:
            faceid = self.extract_faceid_embeds(images_np=images_np,
                                                image_paths=image_paths)
            if faceid is None and pre_face_embs is not None:
                faceid = pre_face_embs
            if faceid is None:
                return None
        faceid = jnp.asarray(faceid, jnp.float32)
        if noise_level > 0:
            k2, key = jax.random.split(key)
            faceid = add_noise_keep_norm(k2, faceid, noise_level)
        faceid = faceid / jnp.linalg.norm(faceid, axis=-1, keepdims=True)

        # Arc2Face forward (input_max_length=22: 3 template + 16 ID +
        # BOS/EOS) + SubjBasisGenerator as one compiled call; result
        # [1, L, 16, 768] -> [16, 768] (num_out_layers -> 1 at inference)
        subj_embs = self._jit_id_to_subj(
            self.arc2face_text_params, self.subj_basis_params, faceid,
            float(out_id_embs_scale))
        if update_text_encoder:
            self.update_text_encoder_subj_embs(subj_embs)
        return subj_embs

    # -- generation ---------------------------------------------------------------

    def encode_prompt(self, prompt: str, negative_prompt: str | None = None):
        negative_prompt = negative_prompt or self.negative_prompt
        prompt = self.update_prompt(prompt)
        cond = self.pipe.encode_prompt([prompt])
        uncond = self.pipe.encode_prompt([negative_prompt])
        return cond, uncond

    def __call__(self, prompt: str, *, negative_prompt: str | None = None,
                 guidance_scale: float = 4.0, out_image_count: int = 4,
                 num_steps: int | None = None, seed: int = 0,
                 height: int = 512, width: int = 512,
                 sampler: str = "ddim", fast=None) -> np.ndarray:
        """Personalized txt2img (AdaFaceWrapper.forward,
        adaface_wrapper.py:274-296). Returns uint8 [N, H, W, 3].

        sampler: "ddim" (reference semantics) or "dpmpp" (DPM-Solver++(2M),
        sampling/dpm.py — pass num_steps ~20-25 for DDIM-50 quality).
        fast: opt-in pipeline.FastConfig — composes with either sampler;
        fast + dpmpp-20 is the composed serving stack (docs/PERF.md)."""
        cond, uncond = self.encode_prompt(prompt, negative_prompt)
        cond = jnp.tile(cond, (out_image_count, 1, 1))
        uncond = jnp.tile(uncond, (out_image_count, 1, 1))
        return self.pipe.generate(
            None, context=cond[None], context_uncond=uncond[None],
            num_steps=num_steps or self.num_inference_steps,
            guidance_scale=guidance_scale, height=height, width=width,
            seed=seed, sampler=sampler, fast=fast)

    def warmup(self, *, out_image_counts=(1, 4), num_steps: int | None = None,
               height: int = 512, width: int = 512, sampler: str = "ddim",
               fast=None, seed: int = 0) -> None:
        """AOT warm-start (a TPU-native obligation — the torch-eager
        reference has no analog): trace + compile every executable a
        serving session hits — the jitted personalization chain, the face
        embedder, prompt encode, and one denoise-to-decode graph per
        requested image count — BEFORE the first user request. With the
        persistent jax compilation cache populated by an earlier process
        (cli/common.py), the compiles replay from disk in seconds instead
        of minutes; cold + warm numbers in docs/PERF.md. Writes throwaway
        random subject rows into the token table; the next real
        personalization overwrites them."""
        self.generate_adaface_embeddings(
            pre_face_embs=jax.random.normal(jax.random.PRNGKey(seed),
                                            (1, 512)),
            gen_rand_face=True, seed=seed)
        if self.face_embedder is not None:
            img = np.full((height, width, 3), 128, np.uint8)
            try:
                self.face_embedder.embed_image(img)
            except Exception:
                pass   # detector found no face on the flat image — fine
        for n in out_image_counts:
            self("portrait of a z person", out_image_count=int(n),
                 num_steps=num_steps, height=height, width=width, seed=seed,
                 sampler=sampler, fast=fast)
