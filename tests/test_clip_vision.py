"""Parity: adaprompt_tpu.models.clip_vision vs transformers CLIPVisionModel
and the reference CLIPVisionModelWithMask."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from transformers import CLIPVisionConfig as HFVisionConfig
from transformers import CLIPVisionModel

from adaprompt_tpu.models import clip_vision as jcv

import torch_oracle

TINY = dict(image_size=32, patch_size=8, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4, hidden_act="quick_gelu")


@pytest.fixture(scope="module")
def tiny_pair():
    torch.manual_seed(0)
    hf_cfg = HFVisionConfig(**TINY)
    hf = CLIPVisionModel(hf_cfg).eval()
    cfg = jcv.CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=64,
                               intermediate_size=128, num_layers=3, num_heads=4)
    params = jcv.from_torch(hf.state_dict(), cfg)
    return hf, cfg, params


def _imgs(b=2, hw=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, 3, hw, hw)).astype(np.float32)


def test_vanilla_parity(tiny_pair):
    hf, cfg, params = tiny_pair
    x = _imgs()
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(x))
    out = jcv.encode(params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg=cfg)
    np.testing.assert_allclose(np.asarray(out["last_hidden_state"]),
                               ref.last_hidden_state.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["pooled"]),
                               ref.pooler_output.numpy(), atol=2e-5, rtol=1e-4)


def test_masked_parity(tiny_pair):
    """fg attention mask path vs the reference CLIPVisionModelWithMask
    (subj_basis_generator.py:633-757)."""
    hf, cfg, params = tiny_pair
    sbg_mod = torch_oracle.load("adaface.subj_basis_generator")
    wrapped = sbg_mod.CLIPVisionModelWithMask(hf.config).eval()
    wrapped.load_state_dict(hf.state_dict())

    x = _imgs(seed=1)
    rng = np.random.default_rng(2)
    mask = (rng.random((2, 32, 32)) > 0.5).astype(np.float32)
    with torch.no_grad():
        ref = wrapped(pixel_values=torch.tensor(x), attn_mask=torch.tensor(mask),
                      output_hidden_states=True)
    out = jcv.encode(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     attn_mask=jnp.asarray(mask[..., None]), cfg=cfg,
                     output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(out["last_hidden_state"]),
                               ref.last_hidden_state.numpy(), atol=2e-5, rtol=1e-4)
    # 2nd-to-last hidden state is what the zs feature path consumes
    np.testing.assert_allclose(np.asarray(out["hidden_states"][-2]),
                               ref.hidden_states[-2].numpy(), atol=2e-5, rtol=1e-4)
