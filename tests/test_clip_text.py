"""Parity tests: adaprompt_tpu.models.clip_text vs transformers CLIPTextModel
and the reference's CLIPTextModelWrapper / CLIPAttentionMKV
(/root/reference/adaface/arc2face_models.py)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from transformers import CLIPTextConfig as HFCLIPTextConfig
from transformers import CLIPTextModel

from adaprompt_tpu.models import clip_text

import torch_oracle

TINY = dict(vocab_size=1000, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4,
            max_position_embeddings=77, hidden_act="quick_gelu",
            bos_token_id=998, eos_token_id=999)


@pytest.fixture(scope="module")
def tiny_pair():
    torch.manual_seed(0)
    hf_cfg = HFCLIPTextConfig(**TINY)
    hf = CLIPTextModel(hf_cfg).eval()
    cfg = clip_text.CLIPTextConfig(
        vocab_size=TINY["vocab_size"], hidden_size=TINY["hidden_size"],
        intermediate_size=TINY["intermediate_size"],
        num_layers=TINY["num_hidden_layers"], num_heads=TINY["num_attention_heads"],
        max_positions=TINY["max_position_embeddings"],
        eos_token_id=hf_cfg.eos_token_id)
    params = clip_text.from_torch(hf.state_dict(), cfg)
    return hf, cfg, params


def _ids(b=2, s=77, vocab=1000, seed=1):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, vocab - 2, size=(b, s))
    ids[:, 0] = 998           # bos
    ids[:, 50:] = 999         # eos + padding-as-eos; first match at 50
    return ids


def test_vanilla_encode_matches_transformers(tiny_pair):
    hf, cfg, params = tiny_pair
    ids = _ids()
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids))
    got, pooled = clip_text.encode(params, jnp.asarray(ids), cfg=cfg, return_pooled=True)
    np.testing.assert_allclose(np.asarray(got), out.last_hidden_state.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_inputs_embeds_injection(tiny_pair):
    """Splicing custom embeddings matches the reference wrapper's
    input_token_embs path (arc2face_models.py:186-210)."""
    hf, cfg, params = tiny_pair
    wrapper_mod = torch_oracle.load("adaface.arc2face_models")
    w = wrapper_mod.CLIPTextModelWrapper(hf.config).eval()
    w.load_state_dict(hf.state_dict())

    ids = _ids()
    tok = torch.tensor(ids)
    with torch.no_grad():
        token_embs = w(input_ids=tok, return_token_embs=True)
        token_embs[:, 4:8] = torch.randn(2, 4, TINY["hidden_size"])
        ref = w(input_ids=tok, input_token_embs=token_embs, return_token_embs=False)[0]

    got = clip_text.encode(params, jnp.asarray(ids), cfg=cfg,
                           inputs_embeds=jnp.asarray(token_embs.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("weights", [[1.0, 2.0, 4.0], [0.5, 0.5]])
def test_hidden_state_layer_weights(tiny_pair, weights):
    """Clip-skip weighted hidden-state sum matches CLIPTextModelWrapper
    (arc2face_models.py:233-248)."""
    hf, cfg, params = tiny_pair
    wrapper_mod = torch_oracle.load("adaface.arc2face_models")
    w = wrapper_mod.CLIPTextModelWrapper(hf.config).eval()
    w.load_state_dict(hf.state_dict())

    ids = _ids()
    hw = torch.tensor([[x] for x in weights])
    with torch.no_grad():
        ref = w(input_ids=torch.tensor(ids), hidden_state_layer_weights=hw)[0]
    got = clip_text.encode(params, jnp.asarray(ids), cfg=cfg,
                           hidden_state_layer_weights=jnp.asarray(np.array(weights)))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5, rtol=1e-4)


def test_mkv_attention_extension(tiny_pair):
    """K/V multiplier surgery matches CLIPAttentionMKV with noise_std=0
    (arc2face_models.py:46-135)."""
    hf, cfg, params = tiny_pair
    wrapper_mod = torch_oracle.load("adaface.arc2face_models")
    w = wrapper_mod.CLIPTextModelWrapper(hf.config).eval()
    w.load_state_dict(hf.state_dict())
    w.extend_clip_attention_MKV_multiplier(multiplier=2, noise_std=0.0)

    ext = clip_text.extend_attention_mkv(params, jax.random.PRNGKey(0),
                                         multiplier=2, noise_std=0.0)
    # kernel layout check: torch repeat(multiplier, 1) stacks row-blocks of
    # [D, D]; ours concatenates along out axis — same [D, 2D] kernel.
    ids = _ids()
    with torch.no_grad():
        ref = w(input_ids=torch.tensor(ids))[0]
    got = clip_text.encode(ext, jnp.asarray(ids), cfg=cfg)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5, rtol=1e-4)


def test_token_embed(tiny_pair):
    hf, cfg, params = tiny_pair
    ids = _ids()
    ref = hf.text_model.embeddings.token_embedding(torch.tensor(ids)).detach().numpy()
    got = clip_text.token_embed(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)
