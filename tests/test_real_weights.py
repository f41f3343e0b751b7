"""Asset-gated REAL-WEIGHT fidelity tier — the BASELINE.md gate
"ID cosine similarity within 1% of the PyTorch reference".

Every test here is SKIPPED unless the real pretrained assets exist (none
ship in this environment — VERDICT r3 item 3). The day weights appear:

  1. dump the torch-side goldens ONCE (needs torch, not this suite):
       python tools/dump_goldens.py --sd_ckpt sd15.ckpt \
           --adaface_ckpt embeddings_gs-120000.pt \
           --arc2face_encoder models/arc2face/encoder \
           --tokenizer_dir <dir with vocab.json+merges.txt> \
           --photos subjects-celebrity/taylorswift \
           --arcface_onnx antelopev2/glintr100.onnx --out goldens.npz
  2. run this tier against them (on the TPU — the full-size fp32 chain is
     not CPU-sized):
       ADAPROMPT_TEST_PLATFORM=tpu \
       ADAPROMPT_GOLDENS=goldens.npz ADAPROMPT_SD_CKPT=sd15.ckpt \
       ADAPROMPT_ADAFACE_CKPT=embeddings_gs-120000.pt \
       ADAPROMPT_ARC2FACE_ENCODER=models/arc2face/encoder \
       ADAPROMPT_TOKENIZER_DIR=... ADAPROMPT_ARCFACE_ONNX=... \
       ADAPROMPT_REF_PHOTOS=subjects-celebrity/taylorswift \
       python -m pytest tests/test_real_weights.py -v

Reference chain being gated: adaface_wrapper.py:207-296 (photos ->
personalized generation) scored per evaluation/eval_utils.py:268-335
(ArcFace cosine vs the subject's reference photos).
"""

import json
import os

import numpy as np
import pytest
import jax.numpy as jnp

GOLDENS = os.environ.get("ADAPROMPT_GOLDENS")
SD_CKPT = os.environ.get("ADAPROMPT_SD_CKPT")
ADAFACE_CKPT = os.environ.get("ADAPROMPT_ADAFACE_CKPT")
A2F_ENCODER = os.environ.get("ADAPROMPT_ARC2FACE_ENCODER")
ARCFACE_ONNX = os.environ.get("ADAPROMPT_ARCFACE_ONNX")
REF_PHOTOS = os.environ.get("ADAPROMPT_REF_PHOTOS")

_need = {"ADAPROMPT_GOLDENS": GOLDENS, "ADAPROMPT_SD_CKPT": SD_CKPT,
         "ADAPROMPT_ADAFACE_CKPT": ADAFACE_CKPT,
         "ADAPROMPT_ARC2FACE_ENCODER": A2F_ENCODER}
_missing = [k for k, v in _need.items() if not v or not os.path.exists(v)]
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(bool(_missing),
                       reason=f"real-weight assets absent: {_missing}"),
]


def _cos(a, b):
    a = np.asarray(a, np.float64).reshape(-1)
    b = np.asarray(b, np.float64).reshape(-1)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


@pytest.fixture(scope="module")
def goldens():
    data = np.load(GOLDENS, allow_pickle=False)
    meta = json.loads(bytes(data["__meta__"]).decode())
    return data, meta


@pytest.fixture(scope="module")
def ada(goldens):
    """The full JAX product pipeline on the real weights, fp32 end to end
    (the torch goldens are fp32; fidelity is measured without bf16 noise —
    serving speed is a different suite)."""
    from adaprompt_tpu.adaface import checkpoint as ckpt_mod
    from adaprompt_tpu.adaface import subj_basis_generator as sbg
    from adaprompt_tpu.adaface.wrapper import AdaFacePipeline
    from adaprompt_tpu.models import clip_text
    from adaprompt_tpu.pipeline import StableDiffusionPipeline
    from adaprompt_tpu.utils import torch_port
    from adaprompt_tpu.utils.tokenizer import CLIPTokenizer

    _, meta = goldens
    tok = CLIPTokenizer.load()
    if tok.is_fallback:
        pytest.skip("ADAPROMPT_TOKENIZER_DIR with the real CLIP vocab is "
                    "required for real-weight fidelity")

    pipe = StableDiffusionPipeline.from_checkpoint(
        SD_CKPT, tokenizer=tok, compute_dtype=jnp.float32)

    ref = ckpt_mod.load_reference_checkpoint(ADAFACE_CKPT)
    subject = meta.get("subject_string", "z")
    scfg = sbg.SubjBasisConfig(placeholder_is_bg=False)
    sbg_params = sbg.from_torch(ref["subj_basis_generators"][subject], scfg)

    a2f_path = A2F_ENCODER
    if os.path.isdir(a2f_path):
        for name in ("model.safetensors", "pytorch_model.bin"):
            p = os.path.join(a2f_path, name)
            if os.path.exists(p):
                a2f_path = p
                break
    a2f_params = clip_text.from_torch(torch_port.load_state_dict(a2f_path))

    face_embedder = None
    if ARCFACE_ONNX and os.path.exists(ARCFACE_ONNX):
        from adaprompt_tpu.eval.face_eval import FaceSimilarityEvaluator
        from adaprompt_tpu.models import arcface
        face_embedder = FaceSimilarityEvaluator(
            arcface.from_onnx(ARCFACE_ONNX))

    return AdaFacePipeline(pipe, sbg_params, scfg, a2f_params,
                           face_embedder=face_embedder,
                           subject_string=subject,
                           negative_prompt=meta["negative"])


def test_subject_embeddings_match_reference(goldens, ada):
    """faceid -> Arc2Face forward -> SubjBasisGenerator must reproduce the
    torch reference's 16 subject vectors on the REAL trained weights
    (adaface_wrapper.py:207-254)."""
    data, _ = goldens
    subj = np.asarray(ada.generate_adaface_embeddings(
        pre_face_embs=jnp.asarray(data["faceid"]), gen_rand_face=True))
    want = data["subj_embs"]
    assert subj.shape == want.shape
    # per-vector cosine: every one of the 16 subject vectors must align
    for i in range(want.shape[0]):
        assert _cos(subj[i], want[i]) > 0.999, (i, _cos(subj[i], want[i]))
    np.testing.assert_allclose(subj, want, atol=2e-3, rtol=1e-2)


def test_prompt_encoding_matches_reference(goldens, ada):
    """Token-table splice + CLIP encode of the rewritten prompt
    (adaface_wrapper.py:256-271)."""
    data, meta = goldens
    ada.generate_adaface_embeddings(pre_face_embs=jnp.asarray(data["faceid"]),
                                    gen_rand_face=True)
    cond, uncond = ada.encode_prompt(meta["prompt"], meta["negative"])
    assert _cos(cond, data["cond"]) > 0.999
    assert _cos(uncond, data["uncond"]) > 0.999


def _generate_ours(goldens, ada):
    data, meta = goldens
    ada.generate_adaface_embeddings(pre_face_embs=jnp.asarray(data["faceid"]),
                                    gen_rand_face=True)
    return ada(meta["prompt"], negative_prompt=meta["negative"],
               guidance_scale=tuple(meta["guidance"]),
               out_image_count=int(meta["count"]),
               num_steps=int(meta["steps"]), seed=int(meta["seed"]),
               height=int(meta["size"]), width=int(meta["size"]))


def test_final_latents_track_reference(goldens, ada):
    """Full DDIM trajectory agreement on real weights: our final latents
    vs the torch reference's, same x_T/prompt/schedule. This is the
    framework-fidelity statement that needs no face detector."""
    data, meta = goldens
    ada.generate_adaface_embeddings(pre_face_embs=jnp.asarray(data["faceid"]),
                                    gen_rand_face=True)
    cond, uncond = ada.encode_prompt(meta["prompt"], meta["negative"])
    n = int(meta["count"])
    cond = jnp.tile(cond, (n, 1, 1))
    uncond = jnp.tile(uncond, (n, 1, 1))
    z = ada.pipe.generate(None, context=cond[None],
                          context_uncond=uncond[None],
                          num_steps=int(meta["steps"]),
                          guidance_scale=tuple(meta["guidance"]),
                          height=int(meta["size"]), width=int(meta["size"]),
                          seed=int(meta["seed"]), return_latents=True)
    want = data["latents"]
    for i in range(want.shape[0]):
        c = _cos(np.asarray(z)[i], want[i])
        assert c > 0.99, (i, c)


@pytest.mark.skipif(not (ARCFACE_ONNX and os.path.exists(ARCFACE_ONNX or "")),
                    reason="ADAPROMPT_ARCFACE_ONNX required for the ID gate")
def test_id_cosine_within_1pct_of_reference(goldens, ada):
    """THE BASELINE GATE. Score both frameworks' generations against the
    subject's reference photos with the same ArcFace evaluator
    (eval_utils.py:268-335 protocol) and require ours within 0.01 of the
    torch reference's score. Falls back to cross-framework identity
    agreement when the goldens were dumped without --photos."""
    from adaprompt_tpu.eval.face_eval import (calc_faces_mean_similarity,
                                              list_images)

    data, meta = goldens
    ours = _generate_ours(goldens, ada)
    theirs = data["images"]
    ev = ada.face_embedder

    def embed_set(imgs):
        out = [ev.embed_image(np.asarray(im)) for im in imgs]
        return [e for e in out if len(e)]

    ours_e, theirs_e = embed_set(ours), embed_set(theirs)
    assert ours_e, "no face detected in ANY of our generations"
    assert theirs_e, "no face detected in the reference generations"

    if meta.get("photos") and REF_PHOTOS and os.path.isdir(REF_PHOTOS):
        ref_e = ev.embed_folder(list_images(REF_PHOTOS))
        sim_ours = calc_faces_mean_similarity(ours_e, ref_e)[0]
        sim_ref = calc_faces_mean_similarity(theirs_e, ref_e)[0]
        print(f"ID cosine vs subject photos: ours={sim_ours:.4f} "
              f"torch={sim_ref:.4f}")
        assert sim_ours >= sim_ref - 0.01, (sim_ours, sim_ref)
    else:
        # no subject photos: the identities the two frameworks generate
        # from the same trajectory must agree with each other at least as
        # well as the torch generations agree among themselves
        sim_cross = calc_faces_mean_similarity(ours_e, theirs_e)[0]
        sim_self = calc_faces_mean_similarity(theirs_e, theirs_e)[0]
        print(f"cross-framework ID cosine={sim_cross:.4f} "
              f"torch self-sim={sim_self:.4f}")
        assert sim_cross >= sim_self - 0.01, (sim_cross, sim_self)
