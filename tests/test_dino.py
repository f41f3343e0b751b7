"""Parity: adaprompt_tpu.models.dino vs transformers ViTModel (the
facebook/dino-vits16 architecture)."""

import numpy as np
import torch
import jax.numpy as jnp

from transformers import ViTConfig as HFViTConfig
from transformers import ViTModel

from adaprompt_tpu.models import dino as jdino


def test_vit_parity():
    torch.manual_seed(0)
    hf_cfg = HFViTConfig(image_size=32, patch_size=8, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=3,
                         num_attention_heads=4)
    hf = ViTModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = jdino.ViTConfig(image_size=32, patch_size=8, hidden_size=64,
                          intermediate_size=128, num_layers=3, num_heads=4)
    params = jdino.from_torch(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(x)).last_hidden_state[:, 0].numpy()
    got = jdino.encode(params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)
